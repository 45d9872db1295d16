package graft.parity

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** The engine's scalar-function surface for the reference semantics
  * (SURVEY.md §2.2/§2.8/§2.9). Policy per the porting table in §2.9:
  * predicates expressible as Catalyst built-ins are plain `Column`
  * functions (codegen'd, pushdown-friendly); the genuinely procedural
  * parsers are Scala UDFs delegating to the golden-tested [[RefText]].
  */
object FarmFunctions {

  // ---------------------------------------------------------------
  // Native Column expressions (no UDF — stay inside codegen)

  /** is_header_text (lambda_function.py:136-156) as a chained
    * `contains` over the phrase list; Catalyst folds the literals. */
  def isHeader(text: Column): Column =
    RefText.headerPhrases
      .map(p => lower(text).contains(lit(p)))
      .reduce(_ || _)

  /** Whitespace normalization (:264). */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Em/en-dash unification (:165 et al.). */
  def normalizeDashes(text: Column): Column =
    translate(text, "—–", "--")

  /** extract_alternate_name (:711-715): first parenthetical, trimmed. */
  def alternateName(name: Column): Column =
    trim(regexp_extract(name, "\\(([^)]+)\\)", 1))

  /** Numeric-token cleanup (:167,321,339): strip commas and dollars. */
  def cleanNumeric(tok: Column): Column =
    trim(translate(tok, ",$", ""))

  /** The structural part of is_continuation_line (:239-251) as native
    * expressions: text reduced by digit-runs and separators leaves ≤1
    * char, or ≤2 alphabetic chars total. The full reference predicate
    * additionally requires !starts_with_name — see [[isContinuationUdf]]. */
  def continuationShape(text: Column): Column = {
    val t = trim(text)
    val stripped = regexp_replace(regexp_replace(t, "\\d+", ""),
      "[,\\s\\-—–$.]", "")
    val alphaOnly = regexp_replace(t, "[^A-Za-z]", "")
    (length(t) > 0) && ((length(trim(stripped)) <= 1) || (length(alphaOnly) <= 2))
  }

  // ---------------------------------------------------------------
  // Procedural parsers as UDFs over the golden-tested port

  val isNumericTokenUdf: UserDefinedFunction =
    udf((t: String) => RefText.isNumericToken(if (t == null) "" else t))

  val startsWithNameUdf: UserDefinedFunction =
    udf((t: String) => RefText.startsWithName(if (t == null) "" else t))

  val isContinuationUdf: UserDefinedFunction =
    udf((t: String) => RefText.isContinuationLine(if (t == null) "" else t))

  /** (name, numbers[5]) struct from a structured name line. */
  val parseLineUdf: UserDefinedFunction =
    udf((t: String) => {
      val (name, nums) = RefText.parseStructuredLine(if (t == null) "" else t)
      (name, nums.toSeq)
    })

  val extractContinuationUdf: UserDefinedFunction =
    udf((t: String) =>
      RefText.extractContinuationNumbers(if (t == null) "" else t).toSeq)

  /** (surname, given, suffix) struct. */
  val splitNameUdf: UserDefinedFunction =
    udf((t: String) => RefText.splitName(if (t == null) "" else t))

  /** Register the SQL-callable names. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("farm_is_numeric_token", isNumericTokenUdf)
    spark.udf.register("farm_starts_with_name", startsWithNameUdf)
    spark.udf.register("farm_is_continuation", isContinuationUdf)
    spark.udf.register("farm_parse_line", parseLineUdf)
    spark.udf.register("farm_extract_continuation", extractContinuationUdf)
    spark.udf.register("farm_split_name", splitNameUdf)
  }
}
