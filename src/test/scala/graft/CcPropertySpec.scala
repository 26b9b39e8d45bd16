package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.canonical.ConnectedComponents

/** Property test: star-contraction CC == driver-side union-find on random
  * graphs (the strongest evidence the DataFrame algorithm is correct for
  * arbitrary topologies, not just the fixtures). */
class CcPropertySpec extends SparkSuite {
  import spark.implicits._

  private def unionFind(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.Ordering[String].max(ra, rb)) = // min wins
        math.Ordering[String].min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("CC == union-find on random graphs (ScalaCheck)") {
    val genEdges = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield edges.map { case (a, b) => (f"n$a%02d", f"n$b%02d") }
    val prop = Prop.forAll(genEdges) { edges =>
      val real = edges.filter(e => e._1 != e._2)
      if (real.isEmpty) true
      else {
        val got = ConnectedComponents.run(real.toDF("src", "dst"))
          .as[(String, String)].collect().toMap
        got == unionFind(real)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed loop == driver fast path on random graphs") {
    // force the star-contraction loop (driver path off), compare with the
    // default conf (these graphs are far below graft.cc.driverMax, so the
    // driver union-find answers) — the two paths must agree exactly
    val genEdges = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield edges.map { case (a, b) => (f"n$a%02d", f"n$b%02d") }
    val prop = Prop.forAll(genEdges) { edges =>
      val real = edges.filter(e => e._1 != e._2)
      if (real.isEmpty) true
      else {
        val viaDriver = ConnectedComponents.run(real.toDF("src", "dst"))
          .as[(String, String)].collect().toMap
        spark.conf.set("graft.cc.driverMax", "0")
        val viaLoop =
          try ConnectedComponents.run(real.toDF("src", "dst"))
            .as[(String, String)].collect().toMap
          finally spark.conf.unset("graft.cc.driverMax")
        viaDriver == viaLoop
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
