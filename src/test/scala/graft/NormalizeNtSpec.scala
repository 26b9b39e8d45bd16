package graft

import org.apache.spark.sql.functions._
import graft.core.{Normalize, NtCodec}
import graft.core.Normalize.AliasKeyExpr

/** Goldens for the alias key, canonical label, and NT encoding (ports of the
  * reference's unit-test SHAPES — `tests/unit/util/test_serialize.py`,
  * `tests/unit/util/test_nlp.py` — with our own semantics). */
class NormalizeNtSpec extends SparkSuite {
  import spark.implicits._

  test("alias key: lower, ascii-fold, alphanumeric only") {
    val cases = Seq(
      "Ada Prime" -> "adaprime",
      "USA!" -> "usa",
      "  Café-Über 42 " -> "cafeuber42",
      "ÉLAN vital" -> "elanvital",
      "χ-particle" -> "particle",
      "123" -> "123",
      "" -> "")
    cases.foreach { case (in, want) =>
      assert(AliasKeyExpr.key(in) == want, s"scala path: $in")
    }
    // expression path (codegen) must agree with the scala path
    val got = cases.map(_._1).toDF("s")
      .select(Normalize.aliasKey(col("s"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("canonical label strips by-phrases and disambiguators") {
    val cases = Seq(
      "Princesses by country" -> "Princesses",
      "Berlin (city)" -> "Berlin",
      "Lists  of   rivers" -> "Lists", // "of"-phrase then squash
      "Plain" -> "Plain")
    val got = cases.map(_._1).toDF("s")
      .select(Normalize.canonicalLabel(col("s"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("singularize") {
    val cases = Seq("Princesses" -> "Princesse", // naive -s rule chain: ches/shes/xes only
      "Cities" -> "City", "Films" -> "Film", "Bus" -> "Bus",
      "Churches" -> "Church", "Glass" -> "Glass")
    val got = cases.map(_._1).toDF("s")
      .select(Normalize.singularize(col("s"))).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"singularize($in)")
    }
  }

  test("NT lines: resource encoding, literal escaping, xsd typing") {
    val rows = Seq(
      ("Ada Prime", "rdfs:label", "Ada \"the first\"\nprogrammer", true),
      ("Ada Prime", "rdfs:label", "42", true),
      ("Ada Prime", "rdfs:label", "3.14", true),
      ("Ada Prime", "rdfs:label", "2026-08-16", true),
      ("A<b>|c", "rdf:type", "Person", false))
      .toDF("subj", "pred", "obj", "is_literal")
    val got = rows.select(NtCodec.ntLine(col("subj"), col("pred"),
      col("obj"), col("is_literal"))).as[String].collect()
    val B = "http://graft.example.org/resource/"
    val O = "http://graft.example.org/ontology/"
    assert(got(0) == s"<${B}Ada_Prime> <${O}label> " +
      "\"Ada \\\"the first\\\"\\nprogrammer\"@en .")
    assert(got(1) == s"<${B}Ada_Prime> <${O}label> " +
      "\"42\"^^<http://www.w3.org/2001/XMLSchema#integer> .")
    assert(got(2) == s"<${B}Ada_Prime> <${O}label> " +
      "\"3.14\"^^<http://www.w3.org/2001/XMLSchema#float> .")
    assert(got(3) == s"<${B}Ada_Prime> <${O}label> " +
      "\"2026-08-16\"^^<http://www.w3.org/2001/XMLSchema#date> .")
    assert(got(4) == s"<${B}A%3Cb%3E%7Cc> <${O}type> <${B}Person> .")
  }
}
