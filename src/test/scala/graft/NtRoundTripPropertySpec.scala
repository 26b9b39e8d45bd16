package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.NtCodec
import graft.sources.NtSource

/** Property test: serialize → parse round-trips RANDOM triples over an
  * adversarial alphabet (quotes, backslashes, angle brackets, pipes,
  * newlines, NBSP, accents, emoji, percent signs), modulo the DOCUMENTED
  * lossiness: resource underscores ≡ spaces (name2label), literal
  * whitespace squash (regularize_spaces), predicate curie-prefix strip. */
class NtRoundTripPropertySpec extends SparkSuite {
  import spark.implicits._

  private val nasty: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', '_', '"', '\\', '/', '<', '>', '|', '.', '-', ':',
                   ',', '(', ')', '\'', '&', '%', '{', '}', '^', '`'),
    1 -> Gen.oneOf('\n', '\t', ' '),
    // includes the two halves of U+1F600 — random adjacency produces both
    // valid surrogate pairs and lone surrogates (the encoder must stay
    // self-consistent on both)
    1 -> Gen.oneOf('é', 'Ü', 'ß', '北', '\ud83d', '\ude00'))

  // resource/literal values: non-empty, not all-whitespace
  private val value: Gen[String] = Gen.choose(1, 12)
    .flatMap(n => Gen.listOfN(n, nasty)).map(_.mkString)
    .suchThat(s => s.exists(c => !Character.isWhitespace(c)))

  private val pred: Gen[String] = for {
    prefix <- Gen.option(Gen.oneOf("rdf:", "rdfs:", "clg:"))
    name <- Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)
  } yield prefix.getOrElse("") + name

  /** Values live as UTF-8 inside Spark (UTF8String): a lone surrogate is
    * sanitized to '?' on entry, same as any UTF-8 engine — the expectation
    * must see the same storage normalization the rendered line saw. */
  private def utf8(x: String): String = new String(x.getBytes("UTF-8"), "UTF-8")

  /** What the round trip is SPECIFIED to return. */
  private def expectSubj(s: String): String =
    NtCodec.decodeResourceJava(NtCodec.encodeResourceJava(utf8(s)))
  private def expectLit(s: String): String =
    NtCodec.unescapeLiteralJava(NtCodec.escapeLiteralJava(utf8(s)))
  private def expectPred(p: String): String =
    p.replaceFirst("^[a-z]+:", "")

  test("ntLine → parseLine round-trips random adversarial triples") {
    val tripleGen = for {
      s <- value; p <- pred; o <- value; isLit <- Gen.oneOf(true, false)
    } yield (s, p, o, isLit)
    val prop = Prop.forAll(Gen.listOfN(12, tripleGen)) { triples =>
      val lines = triples.toDF("subj", "pred", "obj", "is_literal")
        .select(NtCodec.ntLine(col("subj"), col("pred"), col("obj"),
                               col("is_literal")).as("line"))
        .as[String].collect()
      val ok = triples.zip(lines).forall { case ((s, p, o, isLit), line) =>
        NtSource.parseLine(line) match {
          case Some((gs, gp, go, gLit)) =>
            val want =
              (expectSubj(s), expectPred(p),
               if (isLit) expectLit(o) else expectSubj(o), isLit)
            val got = (gs, gp, go, gLit)
            if (got != want) println(s"MISMATCH in=$s|$p|$o|$isLit\n" +
              s" line=$line\n got=$got\n want=$want")
            got == want
          case None =>
            // a literal that squashes to empty still serializes as ""@en
            // and must parse; resources never produce unparseable lines
            println(s"UNPARSED: $line"); false
        }
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("parseLine ignores non-triple garbage") {
    assert(NtSource.parseLine("").isEmpty)
    assert(NtSource.parseLine("# comment").isEmpty)
    assert(NtSource.parseLine("<a> <b>").isEmpty)
  }
}
