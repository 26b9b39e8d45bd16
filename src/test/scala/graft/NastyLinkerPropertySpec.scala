package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.canonical.NastyLinker

/** Property test: the distributed max-product split == a sequential
  * driver-side implementation of the reference algorithm (multi-source
  * best-path propagation, validity rule, NIL components) on random
  * weighted alignment graphs. NIL cluster ids are compared as a PARTITION
  * (grouping equality), attached entities exactly. */
class NastyLinkerPropertySpec extends SparkSuite {
  import spark.implicits._

  private val Threshold = 0.75

  /** Sequential reference: union-find components; per multi-entity
    * component, fixpoint best-score propagation with (score desc, ent asc)
    * preference; unassigned mentions cluster by induced-subgraph CC. */
  private def sequential(edges: Seq[(String, String, Double)])
      : (Map[String, Option[String]], Map[String, Int]) = {
    val es = edges.map { case (a, b, w) => (a, b, math.min(w, 1.0)) }
    val adj = scala.collection.mutable.Map[String, List[(String, Double)]]()
      .withDefaultValue(Nil)
    es.foreach { case (a, b, w) =>
      adj(a) = (b, w) :: adj(a); adj(b) = (a, w) :: adj(b)
    }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    // components via repeated BFS
    val comp = scala.collection.mutable.Map[String, String]()
    nodes.sorted.foreach { n =>
      if (!comp.contains(n)) {
        var frontier = List(n)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(x =>
            if (comp.contains(x)) Nil
            else { comp(x) = n; adj(x).map(_._1) })
          frontier = next.filterNot(comp.contains)
        }
      }
    }
    val byComp = nodes.groupBy(comp)
    val ment = (n: String) => n.startsWith("m:")
    val assign = scala.collection.mutable.Map[String, Option[String]]()
    val nilGroup = scala.collection.mutable.Map[String, Int]()
    var nilId = 0
    for ((_, cn) <- byComp.toSeq.sortBy(_._1)) {
      val ents = cn.filterNot(ment).sorted
      val mentions = cn.filter(ment)
      if (ents.size <= 1) {
        mentions.foreach(m => assign(m) = ents.headOption)
        if (ents.isEmpty) { mentions.foreach(nilGroup(_) = nilId); nilId += 1 }
      } else {
        // fixpoint best (score, ent) per node from entity sources
        val best = scala.collection.mutable.Map[String, (Double, String)]()
        ents.foreach(e => best(e) = (1.0, e))
        var changed = true
        while (changed) {
          changed = false
          for ((a, b, w) <- es if cn.contains(a)) {
            for ((src, dst) <- Seq((a, b), (b, a))) {
              best.get(src).foreach { case (s, ent) =>
                val ns = s * w
                if (ns > Threshold) {
                  val cur = best.get(dst)
                  val better = cur.isEmpty || ns > cur.get._1 ||
                    (ns == cur.get._1 && ent < cur.get._2)
                  if (better) { best(dst) = (ns, ent); changed = true }
                }
              }
            }
          }
        }
        val attached = mentions.filter(m =>
          best.get(m).exists(_._1 > Threshold))
        attached.foreach(m => assign(m) = Some(best(m)._2))
        val unassigned = mentions.filterNot(attached.contains).toSet
        // NIL components of the induced subgraph
        val seen = scala.collection.mutable.Set[String]()
        unassigned.toSeq.sorted.foreach { m =>
          if (!seen(m)) {
            var frontier = List(m)
            while (frontier.nonEmpty) {
              val cur = frontier.filterNot(seen)
              cur.foreach { x =>
                seen += x; assign(x) = None; nilGroup(x) = nilId
              }
              frontier = cur.flatMap(x => adj(x).map(_._1))
                .filter(unassigned).filterNot(seen)
            }
            nilId += 1
          }
        }
      }
    }
    (assign.toMap, nilGroup.toMap)
  }

  private val weightGen = Gen.oneOf(0.3, 0.5, 0.7, 0.76, 0.8, 0.9, 1.0)

  private val graphGen: Gen[Seq[(String, String, Double)]] = for {
    nM <- Gen.choose(2, 10)
    nE <- Gen.choose(0, 4)
    nEdges <- Gen.choose(1, 18)
    raw <- Gen.listOfN(nEdges, for {
      kind <- Gen.frequency(3 -> "mm", 2 -> "me")
      a <- Gen.choose(1, nM)
      b <- Gen.choose(1, math.max(1, if (kind == "mm") nM else nE))
      w <- weightGen
    } yield
      if (kind == "mm" && a != b) Some((s"m:$a", s"m:$b", w))
      else if (kind == "me" && nE > 0) Some((s"m:$a", s"e:$b", w))
      else None)
  } yield raw.flatten
    .groupBy(e => Set(e._1, e._2)).values.map(_.head).toSeq // no multi-edges

  test("distributed split == sequential reference on random graphs") {
    val prop = Prop.forAll(graphGen.suchThat(_.nonEmpty)) { edges =>
      val (wantAssign, wantNil) = sequential(edges)
      val got = NastyLinker.cluster(edges.toDF("src", "dst", "weight"))
        .as[(String, Option[String], String)].collect()
      val gotAssign = got.map(r => s"m:${r._1}" -> r._2.map("e:" + _)).toMap
      val assignOk = gotAssign == wantAssign
      // NIL partition equality: same grouping of NIL mentions
      def partition(m: Map[String, Int]): Set[Set[String]] =
        m.groupBy(_._2).values.map(_.keySet).toSet
      val gotNil = got.filter(_._2.isEmpty)
        .groupBy(_._3).values.map(_.map(r => s"m:${r._1}").toSet).toSet
      val nilOk = gotNil == partition(wantNil)
      if (!(assignOk && nilOk))
        println(s"MISMATCH edges=$edges\nwant=$wantAssign ${partition(wantNil)}" +
                s"\ngot =$gotAssign $gotNil")
      assignOk && nilOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
