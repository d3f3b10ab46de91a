package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-parity line parsers: the reference's `String.match(PATTERN)`
  * semantics re-expressed as `rlike` + `regexp_extract`, preserving the
  * verified quirks (SURVEY §5) the CSV reader intentionally fixes:
  *
  *  1. `;`-separated objective ids fail group 15 (`[0-9\.]*`) → row
  *     dropped (the intended multi-LO path is unreachable, `etl.js:76-82`);
  *  2. the greedy `(.*)` group 14 absorbs embedded commas, peeling the
  *     last two numeric-ish fields off the end;
  *  3. no trailing anchor → >16-column rows silently shift fields;
  *  4. an all-empty row (`,,,…`) matches the item pattern (all groups
  *     empty) but every field rejects the assessment pattern (`(.+)`).
  *
  * These exist for fidelity tests and as the P1/P2/P3 operators
  * (line split / header skip / regex field extraction) in their original
  * form; production pipelines use the CSV source.
  */
object ParityParsers {

  /** `ASSESSMENT_ITEM_PATTERN`, `/root/reference/etl.js:11` (verbatim:
    * 13× `([^,]*)`, greedy `(.*)`, 2× `([0-9\.]*)`, `^` but no `$`).
    */
  val itemPattern: String =
    "^" + "([^,]*)," * 13 + "(.*)," + "([0-9\\.]*)," + "([0-9\\.]*)"

  /** `ASSESSMENT_PATTERN`, `/root/reference/etl-assessment-level.js:18`
    * (13× `(.+)`, no anchors).
    */
  val assessmentPattern: String = ("(.+)," * 12) + "(.+)"

  /** Lines of a text file minus the header (the reference's index-based
    * skip, `etl.js:31` / `etl-assessment-level.js:39`). Line order inside
    * a single text file is preserved by the text source.
    */
  private def dataLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // positional skip of line index 0 (the reference's `i > 0` filter) —
    // value-based filtering would also drop data lines equal to the
    // header; zipWithIndex is deterministic for a single text file and
    // safe on empty input
    spark.read.textFile(path).rdd.zipWithIndex()
      .filter(_._2 > 0).map(_._1.trim).toDF("line")
  }

  /** Item-level lines → 16 extracted columns; non-matching lines dropped
    * (`etl.js:73-74`).
    */
  def parseItems(spark: SparkSession, path: String): DataFrame = {
    val matched = dataLines(spark, path).filter(col("line").rlike(itemPattern))
    CaliperSchemas.itemSchema.fieldNames.zipWithIndex.foldLeft(matched) {
      case (df, (name, i)) =>
        df.withColumn(name, regexp_extract(col("line"), itemPattern, i + 1))
    }.drop("line")
  }

  /** Assessment-level lines → 13 extracted columns; any-empty-field lines
    * dropped (`etl-assessment-level.js:45-52`).
    */
  def parseAssessments(spark: SparkSession, path: String): DataFrame = {
    val matched = dataLines(spark, path).filter(col("line").rlike(assessmentPattern))
    CaliperSchemas.assessmentSchema.fieldNames.zipWithIndex.foldLeft(matched) {
      case (df, (name, i)) =>
        df.withColumn(name, regexp_extract(col("line"), assessmentPattern, i + 1))
    }.drop("line")
  }
}
