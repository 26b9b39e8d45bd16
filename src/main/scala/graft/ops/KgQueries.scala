package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** KG-construction stages expressed over the driver's `documents` table
  * (treated as a mini page corpus: url := source/doc_id, text := text) so the
  * DuckDB oracle can check them. The full pipeline over `(url, warc_ts, html,
  * text, lang)` pages lives in graft.{ingest,listings,link,taxonomy,
  * canonical,emit} and is exercised by the ScalaTest suites + Bench.
  */
object KgQueries {

  /** The alias dictionary used by the mini-pipeline (≙ surface-form store,
    * reference `impl/dbpedia/resource.py:163-194`). Deliberately tiny and
    * inline so the oracle SQL can embed identical VALUES. */
  val miniAliases: Seq[(String, String)] = Seq(
    "spark"    -> "ent:Spark",
    "vector"   -> "ent:Vector",
    "customer" -> "ent:Customer",
    "stream"   -> "ent:Stream",
    "window"   -> "ent:Window",
  )

  /** Byte-identity invariant stage (north rule): deterministic text
    * normalization + md5 content hash per url — the per-row invariant the
    * driver can re-check bit-for-bit (reference analogue: markup
    * normalization `impl/wikipedia/page_parser.py:224-251`). */
  def extractInvariant(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(to_binary(trim(regexp_replace(col("text"), "\\s+", " ")), lit("utf-8")))
        .as("text_md5"),
      length(col("text")).as("text_len"))

  /** Mini triple emit: tokenize → broadcast alias join → distinct
    * (subj, pred, obj) triples (≙ `impl/caligraph/serialize.py:21-46`).
    * The alias join broadcasts the dictionary — zero shuffle of the corpus
    * side; `distinct` is the only shuffle, keyed by the triple itself. */
  def triples(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dict = miniAliases.toDF("tok", "ent")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
              explode(split(col("text"), " ")).as("tok"))
    val mentions = toks.join(broadcast(dict), "tok")
      .select(concat(lit("doc:"), col("doc_id")).as("subj"),
              lit("mentions").as("pred"), col("ent").as("obj"))
    val langs = Tables.documents(s, d)
      .select(concat(lit("doc:"), col("doc_id")).as("subj"),
              lit("lang").as("pred"), col("lang").as("obj"))
    mentions.unionByName(langs).distinct()
  }

  def triplesOracle: String = {
    val vals = miniAliases.map { case (t, e) => s"('$t','$e')" }.mkString(",")
    s"""WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        dict(tok, ent) AS (VALUES $vals),
        mentions AS (
          SELECT 'doc:'||t.doc_id AS subj, 'mentions' AS pred, dict.ent AS obj
          FROM toks t JOIN dict ON t.tok=dict.tok),
        langs AS (
          SELECT 'doc:'||doc_id AS subj, 'lang' AS pred, lang AS obj
          FROM documents)
        SELECT DISTINCT subj, pred, obj FROM
          (SELECT * FROM mentions UNION ALL SELECT * FROM langs)"""
  }

  def extractInvariantOracle: String =
    """SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5,
       length(text) AS text_len FROM documents"""

  /** The alignment-graph EDGE BUILD (the scored-ED input,
    * `greedy_clustering.py:26-35`) as a driver oracle row: deterministic
    * mentions (one per part row, ~6-7 sharing each "Widget n%300" label so
    * MM buckets stay under the cap) × a 100-entry prior dictionary (only
    * priors > 0.5 survive the ME threshold). Exercises the real
    * [[graft.canonical.AlignmentGraph.build]] — broadcast dict join, null
    * handling, bucket-capped MM self-join — against a pure-SQL twin. */
  def alignmentEdges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.core.Normalize.register(s)
    val mentions = Tables.part(s, d).select(
      concat(lit("m"), col("p_partkey")).as("mention_id"),
      concat(lit("Widget "), col("p_partkey") % 300).as("label"))
    val dict = s.range(100).select(
      concat(lit("widget"), col("id")).as("key"),
      concat(lit("e"), col("id")).as("ent"),
      (col("id") / 100.0).as("freq"))
    graft.canonical.AlignmentGraph.build(mentions, dict)
      .select(col("src"), col("dst"), round(col("weight"), 6).as("weight"))
  }

  /** Restriction derivation as a driver oracle row (r3 VERDICT ask #4):
    * axiom-derived instance facts = axioms × taxonomy closure × entity
    * types ([[graft.taxonomy.Axioms.axiomFacts]], ≙ get_axiom_properties →
    * `serialize.py:209-220`). Taxonomy = nation→region; entities =
    * customers typed by their nation; axioms attach at BOTH levels (two on
    * region ancestors — exercising closure inheritance — one directly on a
    * nation). */
  def axiomFactsQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = Tables.nation(s, d).select(
      concat(lit("n"), col("n_nationkey")).as("child"),
      concat(lit("r"), col("n_regionkey")).as("parent"))
    val closure = graft.taxonomy.Disjointness.closureWithSelf(edges)
    val entTypes = Tables.customer(s, d).select(
      concat(lit("c"), col("c_custkey")).as("ent"),
      concat(lit("n"), col("c_nationkey")).as("tpe"))
    val axioms = Seq(("r0", "clg:inZone", "zone0"),
                     ("r1", "clg:inZone", "zone1"),
                     ("n3", "clg:flag", "f3")).toDF("tpe", "pred", "obj")
    graft.taxonomy.Axioms.axiomFacts(axioms, entTypes, closure)
  }

  val axiomFactsOracle: String =
    """WITH et AS (SELECT 'c'||c_custkey AS ent, c_nationkey AS nk
                   FROM customer),
       ax(tpe,pred,obj) AS (VALUES ('r0','clg:inZone','zone0'),
                                   ('r1','clg:inZone','zone1'),
                                   ('n3','clg:flag','f3')),
       anc AS (SELECT ent, 'n'||nk AS anc FROM et
               UNION
               SELECT ent, 'r'||n.n_regionkey FROM et
               JOIN nation n ON et.nk=n.n_nationkey)
       SELECT DISTINCT ent, pred, obj FROM anc JOIN ax ON anc.anc=ax.tpe"""

  /** The DELTA-IDENTITY gate as a driver oracle row (r3 VERDICT ask #3):
    * full run over crawl v1 → [[graft.Pipeline.runDelta]] to crawl v2 →
    * fresh full run over v2; returns one row (delta_cnt, diff_cnt,
    * full_cnt) where diff_cnt is the SYMMETRIC triple-set difference
    * between the delta and the fresh full run (must be 0), and both counts
    * must equal the corpus's expected triple count by construction
    * (the oracle embeds that constant — the deterministic
    * [[graft.testkit.CorpusGen]] world makes it computable). The v1→v2
    * mutation exercises all four delta classes at once: a page ADDED, a
    * page MODIFIED (new capture, different body), a page DELETED, and a
    * capture-level deletion (a url losing one of two captures). */
  def deltaIdentity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import java.sql.Timestamp
    graft.core.Normalize.register(s)
    val world = deltaIdentityWorld
    val seeds = world.seeds(s)
    val v2 = world.pages
    val addedUrl = v2.find(_.url.contains("table-of-scientists")).get.url
    val modifiedUrl = v2.find(_.url.contains("list-of-artists")).get.url
    val staleBody = (Seq("== Old items ==") ++
      (0 until 4).map(j => s"* [[Stale Item $j]] — superseded.")).mkString("\n")
    val ghostBody = (Seq("A ghost is a spook.", "== Ghosts ==") ++
      (0 until 4).map(j => s"* [[Ghost Row $j]] — removed.")).mkString("\n")
    val deleted = graft.core.Schemas.Page(
      "https://example.org/deleted-page", new Timestamp(1500000000000L),
      world.htmlFor(ghostBody), ghostBody, "en")
    val host = v2.find(_.url.contains("list-of-books")).get
    val extraCap = host.copy(
      warc_ts = new Timestamp(host.warc_ts.getTime + 123456L),
      html = world.htmlFor(staleBody), text = staleBody)
    val v1 = v2.filterNot(_.url == addedUrl).map { p =>
      if (p.url == modifiedUrl)
        p.copy(warc_ts = new Timestamp(p.warc_ts.getTime - 999999L),
               html = world.htmlFor(staleBody), text = staleBody)
      else p
    } ++ Seq(deleted, extraCap)
    val base = java.nio.file.Files
      .createTempDirectory("graft-delta-id").toString
    graft.Pipeline.run(s, v1.toDS().toDF(), seeds, s"$base/prev")
    val delta = graft.Pipeline.runDelta(s, v2.toDS().toDF(), seeds,
                                        s"$base/out", s"$base/prev")
    val full = graft.Pipeline.run(s, v2.toDS().toDF(), seeds, s"$base/full")
    val cols = Seq("subj", "pred", "obj", "is_literal")
    val diff = delta.join(full, cols, "left_anti").count() +
      full.join(delta, cols, "left_anti").count()
    Seq((delta.count(), diff, full.count()))
      .toDF("delta_cnt", "diff_cnt", "full_cnt")
  }

  private def deltaIdentityWorld =
    // nCountries=3 keeps the boilerplate label above the F9 threshold
    // (24 listing pages > MaxUnknownLabelFreq) so expectedTriples holds
    graft.testkit.CorpusGen.World(nCountries = 3, knownPerListing = 4)

  def deltaIdentityOracle: String = {
    val n = deltaIdentityWorld.expectedTriples.size
    s"""SELECT CAST($n AS BIGINT) AS delta_cnt, CAST(0 AS BIGINT) AS diff_cnt,
        CAST($n AS BIGINT) AS full_cnt"""
  }

  /** Ontology-class serialization as an oracle row: nation→region edges
    * as the taxonomy (regions are roots — never children — so they get no
    * class/label rows), two disjoint pairs of which one survives the
    * emit-once a<b guard ([[graft.emit.TripleEmit.ontologyClassTriples]],
    * ≙ serialize.py:85-116). */
  def ontologyClassesQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = Tables.nation(s, d).select(
      concat(lit("n"), col("n_nationkey")).as("child"),
      concat(lit("r"), col("n_regionkey")).as("parent"))
    val disjoint = Seq(("r0", "r1"), ("r2", "r1"))
      .toDF("type_a", "type_b")
    graft.emit.TripleEmit.ontologyClassTriples(edges, disjoint)
  }

  val ontologyClassesOracle: String =
    """WITH e AS (SELECT DISTINCT 'n'||n_nationkey AS child,
                         'r'||n_regionkey AS parent FROM nation),
       nodes AS (SELECT DISTINCT child AS t FROM e)
       SELECT t AS subj, 'rdf:type' AS pred, 'owl:Class' AS obj,
              false AS is_literal FROM nodes
       UNION ALL SELECT t, 'rdfs:label', t, true FROM nodes
       UNION ALL SELECT child, 'rdfs:subClassOf', parent, false FROM e
       UNION ALL SELECT 'r0', 'owl:disjointWith', 'r1', false"""

  /** External-KB mapping flavors as an oracle row
    * ([[graft.emit.TripleEmit.mappingTriples]], ≙ serialize.py:147-157,
    * 221-229): type/predicate/entity maps are INPUT tables. */
  def ontologyMappingsQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val typeMap = Tables.nation(s, d).select(
      concat(lit("n"), col("n_nationkey")).as("tpe"),
      concat(lit("dbo:Nation"), col("n_nationkey")).as("ext"))
    val predMap = Seq(("clg:locatedIn", "dbo:location")).toDF("pred", "ext")
    val entMap = Tables.customer(s, d)
      .filter(col("c_custkey") % 7 === 0)
      .select(concat(lit("c"), col("c_custkey")).as("ent"),
              concat(lit("dbr:C"), col("c_custkey")).as("ext"))
    graft.emit.TripleEmit.mappingTriples(typeMap, predMap, entMap)
  }

  val ontologyMappingsOracle: String =
    """SELECT 'n'||n_nationkey AS subj, 'rdfs:subClassOf' AS pred,
              'dbo:Nation'||n_nationkey AS obj, false AS is_literal
       FROM nation
       UNION ALL SELECT 'clg:locatedIn', 'owl:equivalentProperty',
              'dbo:location', false
       UNION ALL SELECT 'c'||c_custkey, 'owl:sameAs', 'dbr:C'||c_custkey,
              false FROM customer WHERE c_custkey % 7 = 0"""

  /** External-KB export (the five "DBpedia-side" flavors,
    * [[graft.emit.ExternalKbExport]], ≙ serialize.py:240-302) as ONE oracle
    * row: customers are entities (every 3rd is NEW), nations are direct
    * types, regions their ancestors; the external taxonomy mirrors both
    * levels (xn/xr), every-2nd linked entity's region typing is already
    * seed-known (exercising the subtraction), every-5th relation object is
    * itself a new entity (object re-namespacing), and every-4th relation is
    * seed-known (the containment skip — which must NOT fire when subject or
    * object is new). */
  def externalExportQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d).select(
      when(col("c_custkey") % 3 === 0,
           concat(lit("new:c"), col("c_custkey")))
        .otherwise(concat(lit("c"), col("c_custkey"))).as("ent"),
      col("c_custkey").as("k"), col("c_name").as("label"),
      col("c_nationkey").as("nk"))
    val nat = Tables.nation(s, d).select(col("n_nationkey").as("nk"),
                                         col("n_regionkey").as("rk"))
    val base = cust.join(nat, "nk")
    val labels = base.select("ent", "label")
    val direct = base.select(col("ent"),
                             concat(lit("n"), col("nk")).as("tpe"))
    val all = direct.unionByName(
      base.select(col("ent"), concat(lit("r"), col("rk")).as("tpe")))
    val typeMap = nat
      .select(concat(lit("n"), col("nk")).as("tpe"),
              concat(lit("xn"), col("nk")).as("ext"))
      .unionByName(nat.select(concat(lit("r"), col("rk")).as("tpe"),
                              concat(lit("xr"), col("rk")).as("ext"))
                     .distinct())
    val extClosure = nat
      .select(concat(lit("xn"), col("nk")).as("node"),
              concat(lit("xn"), col("nk")).as("anc"))
      .unionByName(nat.select(concat(lit("xn"), col("nk")).as("node"),
                              concat(lit("xr"), col("rk")).as("anc")))
      .unionByName(nat.select(concat(lit("xr"), col("rk")).as("node"),
                              concat(lit("xr"), col("rk")).as("anc"))
                     .distinct())
    val seedExt = base.filter(col("k") % 3 =!= 0 && col("k") % 2 === 0)
      .select(col("ent"), concat(lit("xr"), col("rk")).as("ext"))
    val rels = base.select(
      col("ent"), lit("clg:locatedIn").as("pred"),
      when(col("k") % 5 === 0, concat(lit("new:n"), col("nk")))
        .otherwise(concat(lit("n:"), col("nk"))).as("obj"))
    val predMap = Seq(("clg:locatedIn", "dbo:location")).toDF("pred", "ext")
    val seedRel = base.filter(col("k") % 4 === 0)
      .select(concat(lit("c"), col("k")).as("sub"),
              lit("dbo:location").as("pred"),
              concat(lit("n:"), col("nk")).as("obj"))
    graft.emit.ExternalKbExport.exportAll(
      labels, direct, all, rels, typeMap, extClosure, seedExt, predMap,
      seedRel, "ext:")
  }

  val externalExportOracle: String =
    """WITH cust AS (
         SELECT CASE WHEN c_custkey%3=0 THEN 'new:c'||c_custkey
                     ELSE 'c'||c_custkey END AS ent,
                c_custkey AS k, c_name AS label, c_nationkey AS nk
         FROM customer),
       nat AS (SELECT n_nationkey AS nk, n_regionkey AS rk FROM nation),
       base AS (SELECT * FROM cust JOIN nat USING (nk)),
       newinst AS (
         SELECT 'ext:'||substr(ent,5) AS subj, 'rdf:type' AS pred,
                'owl:NamedIndividual' AS obj, false AS is_literal
         FROM base WHERE ent LIKE 'new:%'
         UNION ALL
         SELECT 'ext:'||substr(ent,5), 'rdfs:label', label, true
         FROM base WHERE ent LIKE 'new:%'),
       exttypes AS (
         SELECT CASE WHEN ent LIKE 'new:%' THEN 'ext:'||substr(ent,5)
                     ELSE ent END AS subj,
                'rdf:type' AS pred, x AS obj, false AS is_literal
         FROM (SELECT ent, 'xn'||nk AS x FROM base
               UNION ALL
               SELECT ent, 'xr'||rk FROM base
               WHERE NOT (k%3<>0 AND k%2=0)) u),
       localdirect AS (
         SELECT ent AS subj, 'rdf:type' AS pred, 'n'||nk AS obj,
                false AS is_literal
         FROM base WHERE k%3<>0),
       localtrans AS (
         SELECT ent AS subj, 'rdf:type' AS pred, 'r'||rk AS obj,
                false AS is_literal
         FROM base WHERE k%3<>0),
       relsx AS (
         SELECT CASE WHEN ent LIKE 'new:%' THEN 'ext:'||substr(ent,5)
                     ELSE ent END AS subj,
                'dbo:location' AS pred,
                CASE WHEN k%5=0 THEN 'ext:n'||nk ELSE 'n:'||nk END AS obj,
                false AS is_literal
         FROM base WHERE NOT (k%4=0 AND k%3<>0 AND k%5<>0))
       SELECT * FROM newinst UNION ALL SELECT * FROM exttypes
       UNION ALL SELECT * FROM localdirect
       UNION ALL SELECT * FROM localtrans
       UNION ALL SELECT * FROM relsx"""

  /** Bottom-up union-find clustering (G11 + W5,
    * [[graft.canonical.BottomUpCluster]]) as a driver oracle row. Fixture:
    * mentions = customers, MM edges chain same-nation customers by
    * consecutive custkey rank (broken every 3rd rank and at sub-threshold
    * scores), ME candidates map each mention to its nation (sub-threshold
    * for every 7th customer, plus a sub-threshold decoy entity). Every MM
    * component therefore selects AT MOST ONE distinct entity, and under
    * that shape the ordered fold's outcome is provably order-free:
    * a merge is only ever skipped when both clusters already carry the
    * (same) entity, which the final same-entity collapse re-unites — so
    * cluster = MM component, entity = the component's selected entity,
    * entity clusters collapse globally. That closed form is what the
    * recursive-CTE oracle computes; the ORDER-SENSITIVE semantics
    * (multi-entity skip, late-ME no-overwrite) are pinned by
    * BottomUpClusterSpec's hand-traced goldens. */
  def bottomUpClusterQuery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(s, d).select(
        concat(lit("m"), lpad(col("c_custkey").cast("string"), 6, "0")).as("m"),
        concat(lit("n"), lpad(col("c_nationkey").cast("string"), 3, "0")).as("ent"),
        col("c_custkey"), col("c_nationkey"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("c_nationkey").orderBy("c_custkey")))
    val me = cust.select(col("m").as("mention_id"), col("ent"),
        when(col("c_custkey") % 7 === 0, lit(0.2))
          .otherwise(lit(0.5) + (col("c_custkey") % 40) / 100.0).as("score"))
      .unionByName(cust.select(col("m").as("mention_id"),
        concat(lit("x"), col("c_nationkey")).as("ent"), lit(0.3).as("score")))
    val nxt = cust.select(col("c_nationkey").as("nk2"),
                          (col("rk") - 1).as("rk2"), col("m").as("m2"))
    val mm = cust
      .join(nxt, col("c_nationkey") === col("nk2") && col("rk") === col("rk2"))
      .filter(col("rk") % 3 =!= 0)
      .select(col("m").as("m1"), col("m2"),
        when(col("rk") % 11 === 0, lit(0.1))
          .otherwise(lit(0.6) + (col("rk") % 4) / 10.0).as("score"))
    graft.canonical.BottomUpCluster.cluster(me, mm,
      mmThreshold = 0.5, meThreshold = 0.45)
  }

  val bottomUpClusterOracle: String =
    """WITH RECURSIVE cust AS (
         SELECT 'm'||lpad(CAST(c_custkey AS VARCHAR),6,'0') AS m,
                'n'||lpad(CAST(c_nationkey AS VARCHAR),3,'0') AS ent,
                c_custkey, c_nationkey,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_custkey) AS rk
         FROM customer),
       mm AS (SELECT a.m AS m1, b.m AS m2 FROM cust a JOIN cust b
                ON a.c_nationkey = b.c_nationkey AND b.rk = a.rk + 1
              WHERE a.rk % 3 <> 0
                AND (CASE WHEN a.rk % 11 = 0 THEN 0.1
                     ELSE 0.6 + (a.rk % 4)/10.0 END) > 0.5),
       sel AS (SELECT m, ent FROM cust WHERE c_custkey % 7 <> 0),
       ud AS (SELECT m1 AS src, m2 AS dst FROM mm UNION SELECT m2, m1 FROM mm
              UNION SELECT m, m FROM cust),
       reach(node, r) AS (SELECT src, src FROM ud UNION
              SELECT ud.dst, reach.r FROM reach JOIN ud ON reach.node = ud.src),
       comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
       compent AS (SELECT c.component, min(s.ent) AS ent FROM comp c
                   JOIN sel s ON c.node = s.m GROUP BY 1),
       base AS (SELECT comp.node AS mention_id, compent.ent, comp.component
                FROM comp LEFT JOIN compent
                  ON comp.component = compent.component),
       entmin AS (SELECT ent, min(mention_id) AS ec FROM base
                  WHERE ent IS NOT NULL GROUP BY 1)
       SELECT b.mention_id, b.ent, coalesce(e.ec, b.component) AS cluster_id
       FROM base b LEFT JOIN entmin e ON b.ent = e.ent"""

  val alignmentEdgesOracle: String =
    """WITH m AS (SELECT 'm'||p_partkey AS mention_id,
                  'Widget '||(p_partkey % 300) AS label FROM part),
       keyed AS (SELECT mention_id,
                   regexp_replace(lower(label), '[^a-z0-9]', '', 'g') AS key
                 FROM m),
       dict AS (SELECT 'widget'||n AS key, 'e'||n AS ent, n/100.0 AS freq
                FROM range(100) t(n)),
       me AS (SELECT 'm:'||k.mention_id AS src, 'e:'||d.ent AS dst,
                least(coalesce(d.freq, 0.0), 1.0) AS weight
              FROM keyed k JOIN dict d USING (key)
              WHERE least(coalesce(d.freq, 0.0), 1.0) > 0.5),
       small AS (SELECT * FROM (SELECT *,
                   count(*) OVER (PARTITION BY key) AS bsize FROM keyed)
                 WHERE bsize <= 50),
       mm AS (SELECT 'm:'||a.mention_id AS src, 'm:'||b.mention_id AS dst,
                1.0 AS weight
              FROM small a JOIN small b
                ON a.key = b.key AND a.mention_id < b.mention_id)
       SELECT src, dst, round(weight, 6) AS weight FROM
         (SELECT * FROM me UNION ALL SELECT * FROM mm)"""
}
