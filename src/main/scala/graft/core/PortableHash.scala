package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's single spelling of the PORTABLE content hash: a hex prefix
  * of md5 read as an integer. md5 is bit-identical in Spark and DuckDB
  * (xxhash64 is not), so every decision derived from it — shingle ids,
  * sampling buckets, split assignment — reproduces exactly in the oracle,
  * across re-runs, and under any repartitioning.
  *
  * DuckDB spells the same value `('0x' || substr(md5(x), 1, N))::BIGINT`.
  * Width guidance: 4 hex chars = 16-bit bucket, 6 = 24-bit (safe under a
  * 32-bit Knuth multiplier in a Long), 8 = 32-bit id.
  */
object PortableHash {

  /** First `nHexChars` hex chars of md5(col), as an unsigned Long. */
  def md5PrefixLong(c: Column, nHexChars: Int): Column =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 1, nHexChars), 16, 10)
      .cast("long")
}
