package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The reference's own test inputs — the CSVs bundled in its repo — are
  * stale relative to its parsers: every row fails the regexes, so both
  * scripts produce zero output (verified experimentally, SURVEY §5).
  * Matching the reference's results on its own inputs therefore means
  * producing exactly nothing; the parity parsers must reproduce that.
  */
class ReferenceBundledInputsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bundled assessmentitems.csv (10 cols) parses to zero rows, as in the reference") {
    // the pattern needs >= 15 commas; every bundled row has 9 (etl.js:11)
    val parsed = ParityParsers.parseItems(spark, "/root/reference/assessmentitems.csv")
    assert(parsed.count() === 0)
  }

  test("bundled assessments.csv (8 cols) parses to zero rows, as in the reference") {
    // the pattern needs 13 non-empty fields; every bundled row has 8
    // (etl-assessment-level.js:18)
    val parsed = ParityParsers.parseAssessments(spark, "/root/reference/assessments.csv")
    assert(parsed.count() === 0)
  }

  test("end-to-end on the bundled items input: zero event groups (the 'no' path, etl.js:49-50)") {
    val grouped = ItemEvents.groupedByAttempt(
      ItemEvents.events(ParityParsers.parseItems(spark, "/root/reference/assessmentitems.csv")))
    assert(grouped.count() === 0)
  }
}
