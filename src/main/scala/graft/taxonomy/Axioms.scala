package graft.taxonomy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-level relation AXIOMS and the instance facts they imply — the
  * engine-side analogue of Cat2Ax axioms over CaLiGraph classes
  * (reference: axiom mining `/root/reference/impl/category/cat2ax.py:27-90`,
  * restriction serialization `/root/reference/impl/caligraph/serialize.py:117-146`,
  * axiom-derived entity facts `/root/reference/impl/caligraph/entity.py`
  * get_axiom_properties, serialized at `serialize.py:209-220`).
  *
  * Where the reference attaches axioms to fine-grained category-derived
  * classes, this engine mines them at the type level from the listing
  * rules: a type T carries axiom (pred, obj) when at least `minShare` of
  * the listings that mine T also mine the relation rule (pred, obj), with
  * support ≥ `minSupport` — the same two-threshold discipline as
  * [[RuleMining]].
  *
  * Scale: both inputs are LISTING-sized rule tables (one row per listing),
  * never the corpus; the join is keyed by (url, listing_key) and the
  * output is taxonomy × predicate sized. Fact derivation joins
  * entity-types against a broadcast taxonomy closure and broadcast axioms
  * — linear in the entity-type table, no corpus shuffle.
  */
object Axioms {

  /** typeRules(url, listing_key, tpe) × relationRules(url, listing_key,
    * pred, obj) → axioms(tpe, pred, obj). */
  def typeAxioms(typeRules: DataFrame, relationRules: DataFrame,
                 minShare: Double = RuleMining.MinShare,
                 minSupport: Int = RuleMining.MinSupport): DataFrame = {
    val totals = typeRules.groupBy("tpe").agg(count(lit(1)).as("total"))
    val co = typeRules.join(relationRules, Seq("url", "listing_key"))
      .groupBy("tpe", "pred", "obj").agg(count(lit(1)).as("cnt"))
    co.join(totals, "tpe")
      .filter(col("cnt") >= minSupport &&
              col("cnt") / col("total") >= minShare)
      .select("tpe", "pred", "obj")
  }

  /** Axiom-derived instance facts (≙ get_axiom_properties → restriction-
    * relations): an axiom on type T applies to every entity whose type set
    * contains T or a DESCENDANT of T (membership inherits upward).
    * entTypes(ent, tpe) may mix seed and mined types; closureSelf is
    * [[Disjointness.closureWithSelf]]'s (node, anc) table. */
  def axiomFacts(axioms: DataFrame, entTypes: DataFrame,
                 closureSelf: DataFrame): DataFrame = {
    // the axiom table fans out over the closure FIRST — both sides are
    // axiom-/taxonomy-sized — so the corpus-scale entTypes joins ONCE
    // against a small broadcast. The other order (every entity row ×
    // all its ancestors, probe axioms after) is O(|entTypes| × depth)
    // intermediate rows, nearly all discarded when few types carry axioms.
    val applicable = axioms
      .join(broadcast(closureSelf), axioms("tpe") === closureSelf("anc"))
      .select(closureSelf("node").as("atype"), col("pred"), col("obj"))
    entTypes
      .join(broadcast(applicable), entTypes("tpe") === col("atype"))
      .select("ent", "pred", "obj").distinct()
  }
}
