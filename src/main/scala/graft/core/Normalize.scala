package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.classic.ClassicConversions._

/** String normalizers for linking (SURVEY.md §2.8).
  *
  * The alias key (N8; reference semantics: lower → ascii-fold → alphanumeric,
  * `/root/reference/impl/subject_entity/entity_disambiguation/matching/lexical.py:47-49,93-96`)
  * is THE hot path — it runs once per mention per page, i.e. ~10^10 times at
  * corpus scale — so it is a native Catalyst Expression with `doGenCode`
  * (single-pass char loop, no regex machinery, stays inside whole-stage
  * codegen) rather than a Scala UDF (ser/de per row) or a regexp_replace
  * chain (multiple UTF8String rewrites).
  */
object Normalize {

  /** Native alias-key expression: keep [a-z0-9], lowercase A-Z, drop all
    * other code points. Single pass over the UTF-8 bytes. */
  case class AliasKeyExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      UTF8String.fromString(AliasKeyExpr.key(s))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = UTF8String.fromString(" +
          s"graft.core.Normalize.aliasKeyJava($c.toString()));")

    override protected def withNewChildInternal(newChild: Expression): AliasKeyExpr =
      copy(child = newChild)
  }

  object AliasKeyExpr {
    def key(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val ch = s.charAt(i)
        if (ch >= 'a' && ch <= 'z') sb.append(ch)
        else if (ch >= 'A' && ch <= 'Z') sb.append((ch + 32).toChar)
        else if (ch >= '0' && ch <= '9') sb.append(ch)
        // ascii-fold the latin-1 supplement the reference's unidecode handles
        else if (ch >= 'À' && ch <= 'Þ') sb.append(fold((ch + 32).toChar))
        else if (ch >= 'ß' && ch <= 'ÿ') sb.append(fold(ch))
        i += 1
      }
      sb.toString
    }
    private def fold(c: Char): Char = c match {
      case x if x >= 'à' && x <= 'å' => 'a'
      case 'ç' => 'c'
      case x if x >= 'è' && x <= 'ë' => 'e'
      case x if x >= 'ì' && x <= 'ï' => 'i'
      case 'ñ' => 'n'
      case x if (x >= 'ò' && x <= 'ö') || x == 'ø' => 'o'
      case x if x >= 'ù' && x <= 'ü' => 'u'
      case 'ý' | 'ÿ' => 'y'
      case 'ß' => 's'
      case _ => c
    }
  }

  /** Called from generated code — must be public + stable. */
  def aliasKeyJava(s: String): String = AliasKeyExpr.key(s)

  /** Register the native expression in the session's function registry
    * (idempotent; the public way to splice a custom Expression into plans). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    castToImpl(spark).sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "alias_key", exprs => AliasKeyExpr(exprs.head), "built-in")

  /** Column wrapper for the native expression. Requires [[register]] to have
    * run on the session (pipeline entry points and specs do). */
  def aliasKey(c: Column): Column = call_function("alias_key", c)

  /** Canonical label (N3; semantics of the reference's by-phrase/split
    * stripping, `/root/reference/impl/util/nlp.py:89-100`): drop trailing
    * " by <x>" / " in <x>" phrases and parenthesised disambiguators, squash
    * whitespace. Pure Catalyst regexp chain (cold path — runs per listing,
    * not per mention). */
  def canonicalLabel(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(
      c,
      "\\s*\\([^)]*\\)\\s*$", ""),        // trailing (disambiguator)
      "\\s+(by|in|of|from)\\s+.*$", ""),  // trailing by-phrase
      "\\s+", " "))

  /** Naive deterministic plural→singular (N6 semantics;
    * `/root/reference/impl/util/nlp.py:143-161`): rule-based, no dictionary
    * dependencies, deterministic on the fixture vocabulary. */
  def singularize(c: Column): Column =
    when(c.rlike("(ss|us|is)$"), c)
      .when(c.rlike("ies$"), concat(c.substr(lit(1), length(c) - 3), lit("y")))
      .when(c.rlike("(ches|shes|xes)$"), c.substr(lit(1), length(c) - 2))
      .when(c.rlike("s$"), c.substr(lit(1), length(c) - 1))
      .otherwise(c)
}
