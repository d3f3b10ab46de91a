package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Assessment-level pipeline vs /root/reference/etl-assessment-level.js
  * (SURVEY §3.2/§3.3, FIXTURES.md §2).
  */
class AssessmentEventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val src = AssessmentEvents.read(spark, TestSpark.resource("assessments.csv"))

  test("empty-field rows are dropped (the (.+)×13 pattern, :18,:50-52)") {
    assert(src.count() === 3)
    assert(AssessmentEvents.requireAllFields(src).count() === 2)
  }

  test("1→3 fan-out: each row emits STARTED, SUBMITTED, GRADED (F1, :108-113)") {
    val ev = AssessmentEvents.events(src)
    assert(ev.count() === 6)
    val actions = ev.select(col("event.values.action")).collect().map(_.getString(0))
    assert(actions.count(_ == "STARTED") === 2)
    assert(actions.count(_ == "SUBMITTED") === 2)
    assert(actions.count(_ == "GRADED") === 2)
  }

  test("STARTED event JSON: participants as siblings of values (:126-135)") {
    val j = AssessmentEvents.events(src)
      .filter(col("event.values.action") === "STARTED" && col("attempt_id") === "attempt-02")
      .select(to_json(col("event"))).head().getString(0)
    val expected =
      """{"type":"AssessmentEvent","values":{"action":"STARTED"},""" +
        """"actor":{"id":"stu-01"},"object":{"id":"assessment-01","version":"1.0"},""" +
        """"generated":{"id":"attempt-02","count":1}}"""
    assert(j === expected)
  }

  test("GRADED event JSON: everything nested in values (:150-160), corrected scores") {
    val j = AssessmentEvents.events(src)
      .filter(col("event.values.action") === "GRADED" && col("attempt_id") === "attempt-03")
      .select(to_json(col("event"))).head().getString(0)
    val expected =
      """{"type":"AssessmentOutcomeEvent","values":{"action":"GRADED",""" +
        """"actor":{"id":"stu-02"},"organization":{"id":"school-01"},""" +
        """"assessment":{"id":"assessment-02","version":"3.0"},""" +
        """"object":{"id":"attempt-03","count":2},""" +
        """"generated":{"totalScore":"80","normalScore":"60"}}}"""
    assert(j === expected)
  }

  test("referenceScoreSwap=true reproduces the reference's swapped orientation (:101-106)") {
    val g = AssessmentEvents.events(src, referenceScoreSwap = true)
      .filter(col("event.values.action") === "GRADED" && col("attempt_id") === "attempt-02")
      .select(col("event.values.generated.totalScore"),
        col("event.values.generated.normalScore")).head()
    // reference: totalScore ← score_earned (70), normalScore ← score_posible (100)
    assert(g.getString(0) === "70" && g.getString(1) === "100")
  }

  test("attemptnumber is cast to int (the +attemptCount cast, :91)") {
    val c = AssessmentEvents.events(src)
      .filter(col("event.values.action") === "STARTED" && col("attempt_id") === "attempt-03")
      .select(col("event.generated.count")).head().getInt(0)
    assert(c === 2)
  }

  test("rowsToExtract clamp limits input rows (P12, :14,:42-43)") {
    val out = java.nio.file.Files.createTempDirectory("assess-out").toString
    AssessmentEvents.run(spark, TestSpark.resource("assessments.csv"), out, rowsToExtract = Some(1))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.length === 1)
    val content = spark.read.text(s"$out/${dirs.head}").head().getString(0)
    assert(content.split("\\},\\{").length === 3) // 3 events in the array
  }
}
