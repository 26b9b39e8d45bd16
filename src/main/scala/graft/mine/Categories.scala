package graft.mine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Normalize

/** Category-table filters (F3/F4/F5; reference:
  * meta-category drop `/root/reference/impl/dbpedia/category.py:72-91`,
  * meta-resource flag `/root/reference/impl/dbpedia/resource.py:100-113`,
  * conceptual filter (plural lexical head)
  * `/root/reference/impl/category/graph.py:62-71`). */
object Categories {

  val MetaNameTokens: Seq[String] = Seq(
    "hidden", "tracking", "maintenance", "stub", "redirect", "template",
    "wikipedia", "wikiproject", "disambiguation")

  /** F3: drop hidden/maintenance/tracking categories by name-token denylist
    * (broadcast set inside a predicate; the parent-set variant is a
    * left_anti against a meta-parents table). */
  def dropMeta(categories: DataFrame): DataFrame = {
    val lowered = lower(col("label"))
    val isMeta = MetaNameTokens
      .map(t => lowered.contains(t))
      .reduce((a, b) => a || b)
    categories.filter(!isMeta)
  }

  /** F4: flag resources that are redirect sources or disambiguations as
    * meta (left_anti keeps the clean ones). */
  def nonMetaResources(resources: DataFrame, redirects: DataFrame,
                       disambiguations: DataFrame): DataFrame =
    resources
      .join(redirects.select(col("src").as("name")), Seq("name"), "left_anti")
      .join(disambiguations.select(col("name")), Seq("name"), "left_anti")

  /** F5: conceptual categories = plural lexical-head SUBJECTS — the
    * trailing connector-joined noun run must be ALL plural (a singular
    * subject vetoes: "Film and books" is not conceptual;
    * ≙ has_plural_lexhead_subjects, `impl/util/nlp.py:109-115` +
    * `components.py:47-68`; native expression, codegen'd). */
  def conceptual(categories: DataFrame): DataFrame =
    categories.filter(Normalize.pluralLexhead(col("label")))
}
