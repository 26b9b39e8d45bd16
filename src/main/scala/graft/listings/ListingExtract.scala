package graft.listings

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text → listings → items → subject mentions, all windows partitioned by
  * url (page-local state never crosses a page boundary, so every window
  * shuffles once on url and stays balanced — pages are the unit of
  * parallelism at corpus scale, exactly like the reference's per-page
  * mp.Pool fan-out `/root/reference/impl/wikipedia/page_parser.py:186-195`).
  *
  * Semantics (reference citations):
  *  - section tracking + meta-section drop ≙ `page_parser.py:86-91`
  *  - enum items = "* " lines, table rows inside "{|...|}" blocks
  *    ≙ `page_parser.py:355-441`
  *  - listing usefulness: >=3 items ≙ `page_parser.py:254-258,411-412` (F2)
  *  - mention = first wikilink of the item, label validity length>2 and not
  *    all-digits ≙ `page_parser.py:436-437`, `mention_detection:111-112` (F8)
  */
object ListingExtract {

  val MetaSections: Seq[String] =
    Seq("See also", "References", "External links", "Notes")

  case class MentionRow(url: String, listing_key: String, item_idx: Int,
                        mention_id: String, label: String)

  private val wikilink = java.util.regex.Pattern.compile("\\[\\[([^\\]|]+)")
  private val header = java.util.regex.Pattern.compile("^== (.*) ==$")
  private val allDigits = java.util.regex.Pattern.compile("^[0-9]+$")

  /** Page-local parse: one page's listing state never crosses the row
    * boundary, so the whole extraction is a flatMap — ZERO shuffle, perfect
    * row-parallelism (the property that makes extraction scale linearly to
    * 10^12 docs; ≙ the reference's per-page mp.Pool fan-out,
    * `/root/reference/impl/wikipedia/page_parser.py:186-195`). Pure
    * function of (url, text): no RNG, no partition-order dependence. */
  def parsePage(url: String, text: String): Seq[MentionRow] = {
    var section = ""
    var depth = 0
    // (kind, section) -> items in order
    val listings = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[String]]
    text.split("\n", -1).foreach { line =>
      val h = header.matcher(line)
      if (h.matches()) section = h.group(1)
      else if (line == "{|") depth += 1
      else if (line == "|}") depth -= 1
      else if (!MetaSections.contains(section)) {
        if (line.startsWith("* ") && depth == 0)
          listings.getOrElseUpdate(s"enum:$section",
            scala.collection.mutable.ArrayBuffer.empty) += line.substring(2)
        else if (line.startsWith("| ") && depth == 1)
          listings.getOrElseUpdate(s"table:$section",
            scala.collection.mutable.ArrayBuffer.empty) +=
              line.substring(2).split(" \\|\\| ", 2)(0)
      }
    }
    listings.iterator.flatMap { case (key, items) =>
      if (items.size < 3) Iterator.empty // F2 usefulness
      else items.iterator.zipWithIndex.flatMap { case (item, i) =>
        val m = wikilink.matcher(item)
        val label = if (m.find()) m.group(1) else ""
        if (label.length > 2 && !allDigits.matcher(label).matches()) // F8
          Iterator.single(MentionRow(url, key, i + 1, s"$url#$key#${i + 1}",
                                     label))
        else Iterator.empty
      }
    }.toSeq
  }

  /** (url, text) → mentions — the pipeline's hot path (flatMap form). */
  def mentions(pagesText: DataFrame): DataFrame = {
    val spark = pagesText.sparkSession
    import spark.implicits._
    pagesText.select("url", "text").as[(String, String)]
      .flatMap { case (url, text) => parsePage(url, text) }
      .toDF()
  }

  /** Relational (window-based) form of the same semantics — kept as the
    * cross-checked reference implementation: same output as [[mentions]]
    * (asserted in ListingSpec), but pays one url-keyed shuffle for the
    * window state, which the flatMap form avoids entirely. */
  def mentionsRelational(pagesText: DataFrame): DataFrame = {
    val lines = pagesText.select(
      col("url"), posexplode(split(col("text"), "\n")).as(Seq("line_idx", "line")))

    val byUrl = Window.partitionBy("url").orderBy("line_idx")
    val cum = byUrl.rowsBetween(Window.unboundedPreceding, 0)

    val sectioned = lines
      .withColumn("section_hdr",
        when(col("line").rlike("^== .* ==$"),
             regexp_extract(col("line"), "^== (.*) ==$", 1)))
      .withColumn("section",
        coalesce(last("section_hdr", ignoreNulls = true).over(cum), lit("")))
      .withColumn("table_depth",
        sum(when(col("line") === "{|", 1)
            .when(col("line") === "|}", -1).otherwise(0)).over(cum))

    val items = sectioned
      .filter(!col("section").isin(MetaSections: _*))
      .withColumn("kind",
        when(col("line").startsWith("* ") && col("table_depth") === 0, "enum")
          .when(col("line").startsWith("| ") && col("table_depth") === 1, "table"))
      .filter(col("kind").isNotNull)
      .withColumn("item_text",
        when(col("kind") === "enum", expr("substring(line, 3)"))
          .otherwise(split(expr("substring(line, 3)"), " \\|\\| ").getItem(0)))
      .withColumn("listing_key", concat(col("kind"), lit(":"), col("section")))

    val byListing = Window.partitionBy("url", "listing_key")
    val withIdx = items
      .withColumn("item_idx",
        row_number().over(byListing.orderBy("line_idx")))
      .withColumn("n_items", count(lit(1)).over(byListing))
      .filter(col("n_items") >= 3) // F2 usefulness

    withIdx
      .withColumn("label",
        regexp_extract(col("item_text"), "\\[\\[([^\\]|]+)", 1))
      .filter(length(col("label")) > 2 &&
              !col("label").rlike("^[0-9]+$")) // F8 validity
      .withColumn("mention_id",
        concat_ws("#", col("url"), col("listing_key"), col("item_idx")))
      .select("url", "listing_key", "item_idx", "mention_id", "label")
  }
}
