package graft.taxonomy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Listing-based type/relation rule mining, re-expressed as DataFrame
  * aggregations (the reference stage that is ALREADY relational — pandas
  * groupbys/merges at `/root/reference/impl/listing/extract.py:22-73,90-139,
  * 206-258` — and therefore the most direct Spark mapping in the codebase).
  *
  * Per-listing rule: if >= `MinShare` of the listing's LINKED subject
  * entities share a type (resp. a (pred, obj) relation), with support >=
  * `MinSupport`, assert it for every subject entity of the listing that
  * lacks it (anti-join, ≙ extract.py:158-159 / 286-289). Disjointness-guarded
  * type assertions are handled in [[Disjointness]].
  *
  * Shuffle shape: two groupBys keyed by (url, listing_key[, value]) — the
  * listing key inherits the page-level balance; no global hot keys. The
  * seed-type/relation joins are dimension joins (taxonomy ≤ 10^6 rows →
  * broadcast at scale).
  */
object RuleMining {

  val MinShare = 0.75
  val MinSupport = 2

  /** subjectListings(url, listing_key, ent) × seedTypes(ent, tpe) →
    * listing-level type rules (url, listing_key, tpe). Duplicate input
    * triples are harmless (every aggregate below is countDistinct), so
    * callers pass the pipeline's shared deduplicated `subject_listings`
    * checkpoint WITHOUT re-paying a corpus-wide distinct shuffle here. */
  def listingTypeRules(subjectListings: DataFrame,
                       seedTypes: DataFrame): DataFrame =
    shareQualified(
      subjectListings.select("url", "listing_key", "ent").join(seedTypes, "ent"),
      Seq("url", "listing_key"), "tpe")

  /** Same shape for (pred, obj) relations per (listing, pred)
    * (≙ extract.py:206-258). Dup-safe like [[listingTypeRules]] — no
    * internal distinct. */
  def listingRelationRules(subjectListings: DataFrame,
                           seedRels: DataFrame): DataFrame =
    shareQualified(
      subjectListings.select("url", "listing_key", "ent")
        .join(seedRels.select(col("sub").as("ent"), col("pred"), col("obj")),
              "ent"),
      Seq("url", "listing_key", "pred"), "obj")

  /** EVERY value whose entity share within the group passes MinShare +
    * MinSupport qualifies — not just the argmax. With multi-typed entities
    * several types can clear the 0.75 bar at once (all-Person-and-Agent
    * listings), and the reference asserts each qualifying rule
    * (`extract.py:150-160` iterates every valid rule row); an argmax with
    * a name tie-break systematically kept the most GENERIC type when
    * transitive seed types tie by count.
    *
    * SINGLE SCAN (VERDICT r4 #1 — the two-aggregate + join-back form
    * evaluated the corpus-sized subject×seed join twice, and type_rules +
    * relation_rules had become the top two full-run stages at ~27% of the
    * soak wall): ONE map-side-combinable groupBy collects the group's
    * distinct (ent, value) pairs — bounded by listing size × values per
    * entity, the same page-local bound as every listing aggregate — and
    * the share test runs ROW-LOCALLY over that set (distinct-ent total,
    * per-value distinct-ent count, explode of the qualifying values). One
    * shuffle, no join, join input scanned once. */
  private def shareQualified(linked: DataFrame, groupKeys: Seq[String],
                             valCol: String): DataFrame = {
    val grouped = linked.groupBy(groupKeys.map(col): _*)
      .agg(collect_set(struct(col("ent"), col(valCol).as("v"))).as("pairs"))
    val total = size(array_distinct(transform(col("pairs"), p => p("ent"))))
    val qualified = filter(
      array_distinct(transform(col("pairs"), p => p("v"))),
      v => {
        val cnt = size(filter(col("pairs"), p => p("v") === v))
        cnt >= lit(MinSupport) && cnt / total >= lit(MinShare)
      })
    grouped.select(groupKeys.map(col) :+ explode(qualified).as(valCol): _*)
  }

  /** The reference's bespoke two-level pattern statistics with ZERO-FILLING
    * (`extract.py:90-139`, micro_std at 135-138): per pattern (listing_key
    * across pages):
    *   micro_mean = sum(hits)/sum(total)  over all pages
    *   macro_mean = mean(per-page conf)
    *   micro_std  = mean ABSOLUTE deviation of per-page conf from
    *                micro_mean, where pages carrying the pattern but no hits
    *                enter as conf=0 (the zero-fill — omitting them is the
    *                subtle bug SURVEY.md §7.5 #4 warns about).
    * Input: perPage(pattern, url, hits, total). */
  def patternStats(perPage: DataFrame): DataFrame = {
    val conf = perPage.withColumn("conf",
      coalesce(col("hits"), lit(0L)) / col("total"))
    val micro = conf.groupBy("pattern")
      .agg((sum(coalesce(col("hits"), lit(0L))) / sum("total")).as("micro_mean"),
           avg("conf").as("macro_mean"),
           count(lit(1)).as("page_count"))
    conf.join(micro, "pattern")
      .groupBy("pattern")
      .agg(first("micro_mean").as("micro_mean"),
           first("macro_mean").as("macro_mean"),
           avg(abs(col("conf") - col("micro_mean"))).as("micro_std"),
           first("page_count").as("page_count"))
  }
}
