package graft

import graft.canonical.ConnectedComponents
import graft.taxonomy.Closure

class CcClosureSpec extends SparkSuite {
  import spark.implicits._

  private def cc(edges: Seq[(String, String)]): Map[String, String] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap

  test("connected components: two components, chain + star") {
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "d",      // chain
      "x" -> "y", "x" -> "z", "x" -> "w")      // star
    val got = cc(edges)
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
                      "x" -> "w", "y" -> "w", "z" -> "w", "w" -> "w"))
  }

  test("connected components: long path (diameter >> log rounds)") {
    val n = 64
    val edges = (0 until n).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val got = cc(edges)
    assert(got.size == n + 1 && got.values.forall(_ == "n000"))
  }

  test("connected components: deterministic under repartitioning") {
    val edges = Seq("a" -> "b", "c" -> "b", "d" -> "e", "f" -> "f")
    val df = edges.toDF("src", "dst")
    val r1 = ConnectedComponents.run(df.repartition(1))
      .as[(String, String)].collect().sorted
    val r2 = ConnectedComponents.run(df.repartition(8))
      .as[(String, String)].collect().sorted
    assert(r1.sameElements(r2))
    // self-loop-only node is dropped (no real edge)
    assert(!r1.map(_._1).contains("f"))
  }

  test("transitive closure on a diamond DAG") {
    val edges = Seq(("d", "b"), ("d", "c"), ("b", "a"), ("c", "a"),
                    ("a", "root")).toDF("node", "anc")
    val got = Closure.transitiveClosure(edges)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("d", "b"), ("d", "c"), ("d", "a"), ("d", "root"),
      ("b", "a"), ("b", "root"), ("c", "a"), ("c", "root"),
      ("a", "root")))
  }
}
