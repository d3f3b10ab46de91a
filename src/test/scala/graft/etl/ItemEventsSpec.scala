package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Item-level pipeline vs the reference semantics at
  * /root/reference/etl.js (SURVEY §3.1, FIXTURES.md §1).
  */
class ItemEventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val items = ItemEvents.read(spark, TestSpark.resource("items.csv"))

  test("reads valid rows, drops wrong-arity rows (P4 regex-mismatch drop)") {
    // 4 data lines in the fixture; the 3-column one is malformed → dropped
    assert(items.count() === 3)
  }

  test("quoted embedded comma stays one field (intended CSV semantics)") {
    val r = items.filter(col("assmtitem_id") === "assessmet-item-02")
      .select("masterobjectives").head().getString(0)
    assert(r === "Algebra, advanced")
  }

  test("OutcomeEvent JSON matches the reference shape exactly (etl.js:84-105)") {
    val j = ItemEvents.events(items)
      .filter(col("event.values.target.id") === "assessmet-item-01")
      .select(to_json(col("event"))).head().getString(0)
    val expected =
      """{"type":"OutcomeEvent","values":{"action":"GRADED","actor":{"id":"stu-01"},""" +
        """"target":{"id":"assessmet-item-01","learningObjectives":[{"id":"1.1"}]},""" +
        """"object":{"id":"attempt-02","count":1},""" +
        """"generated":{"normalScore":"8","totalScore":"10"},""" +
        """"assessment":{"id":"assessment-01","version":"1.0"}}}"""
    assert(j === expected)
  }

  test("multi-objective ';' split → array of {id} structs (intended semantics, etl.js:76-82)") {
    val los = ItemEvents.events(items)
      .filter(col("event.values.target.id") === "assessmet-item-05")
      .select(col("event.values.target.learningObjectives.id"))
      .head().getSeq[String](0)
    assert(los === Seq("2.1", "2.2"))
  }

  test("scores keep item-level orientation: normalScore←score_earned (etl.js:98-99)") {
    val g = ItemEvents.events(items)
      .filter(col("event.values.target.id") === "assessmet-item-05")
      .select(col("event.values.generated.normalScore"),
        col("event.values.generated.totalScore")).head()
    assert(g.getString(0) === "6" && g.getString(1) === "10")
  }

  test("group-by-attempt collects per-attempt event lists (A1, etl.js:107-112)") {
    val grouped = ItemEvents.groupedByAttempt(ItemEvents.events(items))
      .orderBy("attempt_id").collect()
    assert(grouped.map(_.getString(0)).toSeq === Seq("attempt-02", "attempt-03"))
    assert(grouped.map(_.getSeq[String](1).size).toSeq === Seq(2, 1))
  }

  test("sink writes one JSON-array document per attempt directory (S4)") {
    val out = java.nio.file.Files.createTempDirectory("items-out").toString
    ItemEvents.run(spark, TestSpark.resource("items.csv"), out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("attempt_id=attempt-02", "attempt_id=attempt-03"))
    val content = spark.read.text(s"$out/attempt_id=attempt-02").head().getString(0)
    assert(content.startsWith("[{\"type\":\"OutcomeEvent\"") && content.endsWith("}]"))
    // 2 events in the attempt-02 array
    assert(content.split("\\},\\{").length === 2)
  }
}
