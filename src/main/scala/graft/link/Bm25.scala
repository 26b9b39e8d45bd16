package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** BM25 top-k lexical candidate retrieval (J9's third matcher family;
  * reference: `/root/reference/impl/subject_entity/entity_disambiguation/matching/lexical.py:52-96`
  * — tokenize, inverted index, BM25 score, top-k per query).
  *
  * Relational shape: postings = explode(tokens) → (term, doc, tf); the
  * query⋈postings equi-join on term IS the inverted-index probe (Catalyst
  * picks broadcast for small query sets); scores = groupBy(query, doc) sum;
  * top-k via window. One corpus shuffle (postings groupBy), one score
  * shuffle — both keyed by (term)/(query,doc), no hot keys after the
  * stopword-sized df-cut that any real deployment adds upstream.
  *
  * Scores are rounded to 6 decimals BEFORE ranking so the rank order is
  * identical under any floating summation order (and in the DuckDB oracle).
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Self-retrieval demo over `documents`: queries = docs with id < 5;
    * output (query_id, doc_id, rnk, score). */
  def topK(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docLen = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val nDocs = Tables.documents(s, d).count()
    val avgLen = docLen.agg(avg("len")).first().getDouble(0)
    val idf = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    val postings = tf.join(docLen, "doc_id").join(idf, "term")
      .withColumn("w",
        col("idf") * (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("len") / avgLen)))
      .select(col("term"), col("doc_id"), col("w"))
    val queries = toks.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("term")).distinct()
    val scores = queries.join(postings, "term")
      .groupBy("query_id", "doc_id")
      .agg(round(sum("w"), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scores.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "rnk", "score")
  }

  val topKSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1,2),
        dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        al AS (SELECT avg(len) AS avg_len FROM dl),
        idf AS (SELECT term, count(DISTINCT doc_id) AS df,
                  ln((( SELECT n FROM stats) - count(DISTINCT doc_id) + 0.5)
                     / (count(DISTINCT doc_id) + 0.5) + 1.0) AS idf
                FROM tf GROUP BY term),
        postings AS (SELECT tf.term, tf.doc_id,
            idf.idf * (tf.tf * ($K1 + 1)) /
              (tf.tf + $K1 * (1 - $B + $B * dl.len / (SELECT avg_len FROM al)))
            AS w
          FROM tf JOIN dl USING (doc_id) JOIN idf USING (term)),
        queries AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
                    WHERE doc_id < 5),
        scores AS (SELECT query_id, p.doc_id, round(sum(w), 6) AS score
                   FROM queries q JOIN postings p USING (term) GROUP BY 1,2),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id ASC) AS rnk FROM scores)
        SELECT query_id, doc_id, rnk, score FROM r WHERE rnk <= 3"""
}
