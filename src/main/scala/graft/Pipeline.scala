package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Normalize
import graft.ingest.TextExtract
import graft.listings.ListingExtract
import graft.link.AliasLink
import graft.canonical.{AlignmentGraph, NilCluster}
import graft.taxonomy.{Disjointness, RuleMining}
import graft.emit.TripleEmit
import graft.runtime.StageRunner

/** The end-to-end KG-construction pipeline (north rule): pages → invariant
  * text extraction → listings/mentions → salted alias linking → NIL
  * canonicalization (connected components) → listing rule mining +
  * disjointness-guarded, taxonomy-aware type inference → (subj, pred, obj)
  * triples partitioned by predicate, with per-stage checkpoints + lineage.
  *
  * Physical shape (SURVEY.md §4): scan → pushed lang filter → codegen'd
  * extraction chain → per-url windows (one shuffle keyed by url) →
  * broadcast dictionary join (salted hot slice) → CC loop (log-bounded
  * shuffle rounds) → taxonomy-sized dimension joins (broadcast) → one
  * partitionBy(pred) write. The corpus is shuffled ONCE on url and once per
  * candidate-dedup; everything taxonomy-side is broadcast.
  */
object Pipeline {

  case class Seeds(aliases: DataFrame, entityTypes: DataFrame,
                   taxonomyEdges: DataFrame, disjointPairs: DataFrame,
                   seedRelations: DataFrame, redirects: DataFrame = null)

  /** How mentions become canonical entities (step 4). */
  sealed trait Canonicalization
  object Canonicalization {
    /** Linked mentions keep their broadcast-argmax entity; NIL mentions
      * cluster via connected components over the mention↔key bipartite
      * graph ([[NilCluster]]). The cheap default. */
    case object Components extends Canonicalization

    /** The reference's PRODUCTION ED path
      * (`entity_disambiguation/__init__.py:20-89`): ALL kept mentions +
      * their scored dictionary candidates form the alignment graph
      * ([[AlignmentGraph]]), split by [[graft.canonical.NastyLinker]] —
      * a mention attaches to an entity only when its best path score
      * exceeds `pathThreshold`, so a weak-prior candidate (or a weak
      * `meScore` Column — the bi-encoder seam) is DEMOTED to a new NIL
      * entity even when the argmax join would have linked it. NIL cluster
      * ids stay content-derived ("new:<alias key>" — every NIL cluster is
      * same-key-connected because mention–mention edges only join equal
      * keys), so ids match [[Components]] and stay partition-invariant. */
    case class ScoredEd(meThreshold: Double = 0.5, mmThreshold: Double = 0.5,
                        pathThreshold: Double = 0.75,
                        meScore: Column = DefaultMeScore,
                        /** When set, replaces `meScore` with the
                          * whole-DataFrame scorer seam — the batched-model
                          * path ([[graft.link.BatchedScorer]]). */
                        scoreFn: Option[DataFrame => DataFrame] = None)
        extends Canonicalization {
      // the two scorer knobs are alternatives: passing both would silently
      // drop the Column — fail at construction instead (reference equality
      // on the shared default detects "caller did not pass meScore")
      require(scoreFn.isEmpty || (meScore eq DefaultMeScore),
              "ScoredEd: pass EITHER meScore or scoreFn, not both " +
              "(scoreFn replaces the Column scorer)")
    }

    /** The prior scorer (alias-dictionary frequency) — `ScoredEd`'s
      * default `meScore`. */
    val DefaultMeScore: Column = col("freq")
  }

  /** NIL labels more frequent than this with no known entity are boilerplate
    * and dropped (F9, ≙ `/root/reference/impl/wikipedia/__init__.py:59-67`,
    * threshold 50 there; lower here because the fixture corpus is small). */
  val MaxUnknownLabelFreq = 20

  /** Run (or resume) the full pipeline; returns the triple table.
    * `canon` picks the canonicalization mode; resume is per-stage by name,
    * so use a FRESH outDir when changing modes (mode-specific stages are
    * name-suffixed, but downstream stages are shared). */
  def run(spark: SparkSession, pages: DataFrame, seeds: Seeds,
          outDir: String, runId: String = "run-1",
          canon: Canonicalization = Canonicalization.Components): DataFrame = {
    Normalize.register(spark)
    val runner = new StageRunner(spark, outDir, runId)

    // 0. crawl manifest: the (url, warc_ts) fingerprint of the consumed
    // crawl slice. A later [[runDelta]] anti-joins its new crawl against
    // this to find changed/added pages — the capture timestamp is the
    // change signal, so unchanged pages skip extraction entirely.
    runner.run("crawl_manifest") { manifestOf(pages) }

    // 1. invariant text extraction (byte-identical per url)
    val pagesText = runner.run("pages_text") { TextExtract.extract(pages) }

    // 2. listings → items → subject mentions
    val mentions = runner.run("mentions") { ListingExtract.mentions(pagesText) }

    // 3. entity linking (broadcast alias dict incl. folded spelling
    // redirects)
    val dict = buildDict(seeds)
    // ONE broadcast-join execution; linked/unlinked are filters over the
    // checkpointed join output (ent nullable), not two separate stages.
    // Stage name is "linked_all", NOT the pre-r3 "linked": the checkpoint
    // shape changed (nullable ent, unlinked rows included) and StageRunner
    // resumes by name — a stale "linked" checkpoint must never resume into
    // the new shape (it would silently empty the NIL path).
    val linkedAll = runner.run("linked_all") { AliasLink.linkAll(mentions, dict) }

    // 1b. corpus hypernym mining over page prose (A5/N9 — Hearst patterns)
    locally {
      val sp = spark
      import sp.implicits._
      runner.run("hypernyms") {
        graft.mine.Hearst.corpusCounts(
          pagesText.select("url", "text").as[(String, String)])
      }
    }

    corpusStages(spark, runner, pagesText, linkedAll, dict, seeds, canon)
  }

  /** Incremental run over a RE-CRAWL (the recurring-snapshot shape the
    * reference handles by full re-extraction per dump): pages whose
    * (url, warc_ts) capture already appears in `prevDir`'s crawl manifest
    * carry their extracted text and linked mentions over from the previous
    * run's checkpoints; only changed/added captures pass through the
    * per-page prefix (extract → parse → link) — the cost that dominates at
    * corpus scale. Pages absent from the new crawl drop out (deletions).
    * Corpus-level stages (hypernyms, F9, canonicalization, mining, triples)
    * recompute over the merged state — they are aggregation-bound and
    * cheap relative to parsing, and their semantics are global.
    *
    * Assumes `seeds` are unchanged since the previous run (a dictionary
    * change invalidates carried links; use [[run]] on a fresh outDir for
    * that). Output is IDENTICAL to a full [[run]] over the new crawl:
    * extraction/parsing/linking are deterministic per (url, text), which is
    * exactly the per-row invariant the north rule pins. */
  def runDelta(spark: SparkSession, newPages: DataFrame, seeds: Seeds,
               outDir: String, prevDir: String, runId: String = "delta-1",
               canon: Canonicalization = Canonicalization.Components): DataFrame = {
    Normalize.register(spark)
    require(new java.io.File(outDir).getCanonicalPath !=
              new java.io.File(prevDir).getCanonicalPath,
            "runDelta: outDir must differ from prevDir — running in place " +
            "would resume every stage from the previous checkpoints and " +
            "silently ignore the new crawl")
    val runner = new StageRunner(spark, outDir, runId)
    for (stage <- Seq("crawl_manifest", "pages_text", "linked_all",
                      "hypernyms"))
      require(StageRunner.completed(prevDir, stage),
              s"runDelta: $prevDir lacks the '$stage' checkpoint — prevDir " +
              "must be the outDir of a completed run() or runDelta() " +
              "(pre-manifest outDirs cannot seed a delta; run full once)")
    val prevManifest = spark.read.parquet(s"$prevDir/crawl_manifest")
    val prevText = spark.read.parquet(s"$prevDir/pages_text")
    val prevLinked = spark.read.parquet(s"$prevDir/linked_all")

    val manifest = runner.run("crawl_manifest") { manifestOf(newPages) }
    // The join must be keyed by the SMALL side — the delta, not the corpus.
    // A re-crawl changes ~1% of captures, so the changed/vanished key sets
    // broadcast and every carry below is a broadcast (anti/semi) hash join
    // with the corpus side unshuffled; joining on the 99% unchanged set
    // instead would shuffle the whole corpus twice and cost more than the
    // full run it replaces (measured — see BENCH/BASELINE.md). At 10^12
    // docs, where even 1% outgrows a broadcast, the same shape holds with
    // url-bucketed checkpoint tables (SCALE.md).
    //
    // A url is TOUCHED when its capture set changed in either direction:
    // new/changed captures (manifest ∖ prev) or vanished captures
    // (prev ∖ manifest — which covers fully deleted urls too). Touched
    // urls drop their carried state and re-extract whatever captures the
    // new crawl still has — so a url that merely LOST one of several
    // captures re-derives from the survivors instead of carrying the
    // deleted capture forward.
    val changedCaptures = manifest
      .join(prevManifest, Seq("url", "warc_ts"), "left_anti")
    val vanishedCaptures = prevManifest
      .join(manifest, Seq("url", "warc_ts"), "left_anti")
    val dropUrls = changedCaptures.select("url")
      .unionByName(vanishedCaptures.select("url"))
      .distinct()

    // extract ONLY the touched slice (its own stage: the fresh mentions and
    // the merged text both reuse it without re-extracting)
    val freshText = runner.run("pages_text_fresh") {
      TextExtract.extract(newPages.join(
        broadcast(dropUrls), Seq("url"), "left_semi"))
    }
    val pagesText = runner.run("pages_text") {
      prevText.join(broadcast(dropUrls), Seq("url"), "left_anti")
        .unionByName(freshText)
    }

    // parse + link ONLY the touched slice; carried links rejoin afterwards.
    // Stage name is delta-scoped ("mentions_fresh", like "pages_text_fresh")
    // — run()'s corpus-wide "mentions" checkpoint must never resume into
    // this delta-only shape or vice versa (the linked_all/linked lesson).
    val mentions = runner.run("mentions_fresh") {
      ListingExtract.mentions(freshText)
    }
    val dict = buildDict(seeds)
    val linkedAll = runner.run("linked_all") {
      prevLinked.join(broadcast(dropUrls), Seq("url"), "left_anti")
        .unionByName(AliasLink.linkAll(mentions, dict))
    }

    // 1b. hypernym counts, DELTA-MAINTAINED: corpusCounts is an additive
    // per-page aggregation, so new = prev − counts(dropped old captures) +
    // counts(fresh captures) — the materialized-view maintenance identity.
    // A full recompute here scans the whole corpus's prose (it dominated
    // the measured delta wall); maintenance touches only the ~1% delta.
    // Pairs whose count cancels to 0 drop out, so the result is EXACTLY the
    // full-run aggregate (asserted by DeltaSpec).
    locally {
      val sp = spark
      import sp.implicits._
      val prevHyp = spark.read.parquet(s"$prevDir/hypernyms")
      runner.run("hypernyms") {
        val droppedOld = prevText
          .join(broadcast(dropUrls), Seq("url"), "left_semi")
        val minus = graft.mine.Hearst.corpusCounts(
            droppedOld.select("url", "text").as[(String, String)])
          .withColumn("cnt", -col("cnt"))
        val plus = graft.mine.Hearst.corpusCounts(
          freshText.select("url", "text").as[(String, String)])
        prevHyp.unionByName(plus).unionByName(minus)
          .groupBy("sub", "obj").agg(sum("cnt").as("cnt"))
          .filter(col("cnt") > 0)
      }
    }

    corpusStages(spark, runner, pagesText, linkedAll, dict, seeds, canon)
  }

  /** The change fingerprint of a crawl slice (shared by [[run]] and
    * [[runDelta]] — both sides of the delta anti-join MUST use the same
    * expression, or delta detection silently desynchronizes from the
    * recorded manifest). */
  private def manifestOf(pages: DataFrame): DataFrame =
    pages.filter(col("lang") === "en").select("url", "warc_ts")

  /** Alias dictionary incl. folded spelling redirects (shared by [[run]]
    * and [[runDelta]]). */
  private def buildDict(seeds: Seeds): DataFrame = {
    val aliasTable =
      if (seeds.redirects == null) seeds.aliases
      else AliasLink.foldRedirects(seeds.aliases, seeds.redirects)
    AliasLink.buildDict(aliasTable)
  }

  /** The corpus-level stages downstream of the per-page prefix: hypernym
    * mining, F9, canonicalization (either mode), rule mining + taxonomy-
    * guarded type inference, relations, and the pred-partitioned triple
    * write. Shared verbatim by [[run]] and [[runDelta]] — both feed it the
    * full-corpus `pagesText` and `linkedAll` checkpoints. */
  private def corpusStages(spark: SparkSession, runner: StageRunner,
                           pagesText: DataFrame, linkedAll: DataFrame,
                           dict: DataFrame, seeds: Seeds,
                           canon: Canonicalization): DataFrame = {
    val (linked, unlinked) = AliasLink.splitLinked(linkedAll)

    // 3b. F9: drop frequent unknown labels (boilerplate) before clustering
    val keptUnlinked = runner.run("unlinked_kept") {
      val frequent = unlinked.groupBy("label")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > MaxUnknownLabelFreq)
        .select("label")
      unlinked.join(broadcast(frequent), Seq("label"), "left_anti")
    }

    // 4 + 5. canonicalization → subject-entity table (known + new)
    def fresh(df: DataFrame): DataFrame =
      df.select(df.columns.map(c => col(c).as(c)): _*)
    val subjects = canon match {
      case Canonicalization.Components =>
        // 4a. NIL canonicalization via connected components
        val nilAssign = runner.run("nil_entities") {
          NilCluster.cluster(keptUnlinked)
        }
        runner.run("subjects") {
          linked.select("url", "listing_key", "mention_id", "label", "ent")
            .withColumn("is_new", lit(false))
            .unionByName(
              keptUnlinked.join(nilAssign, "mention_id")
                .select("url", "listing_key", "mention_id", "label", "ent")
                .withColumn("is_new", lit(true)))
        }
      case Canonicalization.ScoredEd(meT, mmT, pathT, meScore, scoreFn) =>
        // 4b. scored ED over ALL kept mentions: alignment graph (full
        // candidate dictionary, not the argmax-reduced one) → NastyLinker.
        // ONE corpus-side pass builds the graph; the split decides linked
        // vs NIL, overriding the prior-argmax join above.
        runner.run("subjects_ed") {
          val keptAll = fresh(linked)
            .unionByName(fresh(keptUnlinked)
              .withColumn("ent", lit(null).cast("string")))
          val assign = AlignmentGraph.disambiguateScored(
            keptAll.select("mention_id", "label"), dict,
            scoreFn.getOrElse(cand => cand.withColumn("score", meScore)),
            meT, mmT, pathT)
          keptAll.drop("ent")
            .join(assign.select(col("mention_id"),
                                col("ent").as("ed_ent")), "mention_id")
            .select(col("url"), col("listing_key"), col("mention_id"),
                    col("label"),
                    coalesce(col("ed_ent"),
                             concat(lit("new:"), col("key"))).as("ent"),
                    col("ed_ent").isNull.as("is_new"))
        }
    }

    // 6. rule mining + taxonomy-aware type inference
    val seedTypes = seeds.entityTypes.select(col("ent"), col("tpe"))
    val closureSelf = Disjointness.closureWithSelf(seeds.taxonomyEdges)

    // the distinct (url, listing_key, ent) projection feeds FIVE consumers
    // (both rule miners, both assertion joins, provenance) — checkpoint it
    // once instead of paying the corpus-wide distinct shuffle per consumer
    val subjectListings = runner.run("subject_listings") {
      subjects.select("url", "listing_key", "ent").distinct()
    }

    // type rules get their own stage: downstream they feed BOTH the typed
    // assertions and the ontology-class provenance
    val listingTypes = runner.run("type_rules") {
      RuleMining.listingTypeRules(subjectListings, seedTypes)
    }
    val types = runner.run("types") {
      val cand = subjectListings
        .join(listingTypes, Seq("url", "listing_key"))
        .select("ent", "tpe").distinct()
        .join(seedTypes, Seq("ent", "tpe"), "left_anti") // J8: drop existing
      val guarded = Disjointness.filterCandidates(
        cand, seedTypes, closureSelf, seeds.disjointPairs)
      // transitive typing: mined type + all its ancestors, minus existing
      guarded
        .join(broadcast(closureSelf), guarded("tpe") === closureSelf("node"))
        .select(col("ent"), col("anc").as("tpe")).distinct()
        .join(seedTypes, Seq("ent", "tpe"), "left_anti")
    }

    val relations = runner.run("relations") {
      val listingRels = RuleMining.listingRelationRules(subjectListings,
                                                        seeds.seedRelations)
      subjectListings
        .join(listingRels, Seq("url", "listing_key"))
        .select("ent", "pred", "obj").distinct()
        .join(seeds.seedRelations
                .select(col("sub").as("ent"), col("pred"), col("obj")),
              Seq("ent", "pred", "obj"), "left_anti") // J7: only NEW relations
    }

    // 7. triples, partitioned by predicate. Provenance (both reference
    // flavors): INSTANCE — every subject entity wasDerivedFrom the pages
    // mentioning it (serialize.py:231-239); ONTOLOGY-CLASS — every mined
    // type wasDerivedFrom the listings whose rule asserted it
    // (serialize.py:158-164, classes ← their associated source pages).
    runner.runPartitioned("triples", "pred") {
      // (ent, url) provenance pairs come from the deduplicated listing
      // projection — same set as distinct-ing mention-level subjects,
      // minus the corpus-wide shuffle over the wider table
      val provenance = fresh(subjectListings.select("ent", "url").distinct())
        .unionByName(fresh(listingTypes
          .select(col("tpe").as("ent"), col("url")).distinct()))
      TripleEmit.assemble(
        labels = subjects.select("ent", "label"),
        types = types,
        rels = relations,
        provenance = provenance)
    }
  }
}
