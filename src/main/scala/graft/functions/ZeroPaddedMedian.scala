package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact ZERO-PADDED median aggregator (SURVEY §2.11 / §7.5 #2; reference
  * semantics: `/root/reference/impl/category/cat2ax.py:123-131` — frequency
  * vectors are padded with zeros up to the category-set size before taking
  * the median, so values absent from a member count as 0 rather than being
  * skipped).
  *
  * Input rows: (freq, setSize) where setSize is the FULL group size N
  * (constant within a group). The buffer keeps only the observed values —
  * padding is resolved arithmetically at finish (observed values are sorted;
  * the padded median index is shifted by the number of implicit zeros), so
  * buffer size is O(observed), never O(N).
  *
  * Deterministic and permutation-invariant (property-tested); merge is
  * associative+commutative, so partial aggregation (map-side combine) is
  * safe.
  */
object ZeroPaddedMedian {

  case class Buf(values: List[Double], setSize: Long)

  val agg: Aggregator[(Double, Long), Buf, Double] =
    new Aggregator[(Double, Long), Buf, Double] {
      def zero: Buf = Buf(Nil, 0L)
      def reduce(b: Buf, in: (Double, Long)): Buf =
        Buf(in._1 :: b.values, math.max(b.setSize, in._2))
      def merge(a: Buf, b: Buf): Buf =
        Buf(a.values ::: b.values, math.max(a.setSize, b.setSize))
      def finish(b: Buf): Double = paddedMedian(b.values, b.setSize)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Median of `observed` padded with zeros to length n (n >= observed
    * size; negative observed values are not expected — frequencies). */
  def paddedMedian(observed: List[Double], n: Long): Double = {
    val sorted = observed.sorted.toIndexedSeq
    val zeros = n - sorted.size
    require(zeros >= 0, s"setSize $n < observed ${sorted.size}")
    def at(i: Long): Double =
      if (i < zeros) 0.0 else sorted((i - zeros).toInt)
    if (n == 0) 0.0
    else if (n % 2 == 1) at((n - 1) / 2)
    else (at(n / 2 - 1) + at(n / 2)) / 2.0
  }

  /** Column form: zero_padded_median(freq, set_size). */
  def column(freq: Column, setSize: Column): Column =
    udaf(agg).apply(freq, setSize)
}
