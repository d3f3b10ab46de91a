package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Locks down the reference parser's verified quirks (SURVEY §5) against
  * the exact patterns from `/root/reference/etl.js:11` and
  * `etl-assessment-level.js:18`.
  */
class ParityParsersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def itemsFile(rows: String*): String = {
    val f = java.nio.file.Files.createTempFile("items", ".csv")
    java.nio.file.Files.writeString(f, ("header-line" +: rows).mkString("\n"))
    f.toString
  }

  private val valid16 =
    "stu-01,login-01,school-01,assessment-01,1.0,attempt-02,item-01,1,5,FILLINBLANK,30,10,8,Algebra I,1.1,1"

  test("valid 16-column row extracts all fields") {
    val df = ParityParsers.parseItems(spark, itemsFile(valid16))
    val r = df.head()
    assert(r.getAs[String]("identity_id") === "stu-01")
    assert(r.getAs[String]("attempt_id") === "attempt-02")
    assert(r.getAs[String]("masterobjectivesid") === "1.1")
    assert(r.getAs[String]("objectivenumber") === "1")
  }

  test("quirk 1: ';' multi-objective ids reject the whole row (group 15 is [0-9.]*)") {
    val multiLo = valid16.replace(",1.1,", ",1.1;2.2,")
    assert(ParityParsers.parseItems(spark, itemsFile(multiLo)).count() === 0)
  }

  test("quirk 2: greedy group 14 absorbs embedded commas") {
    val embedded = valid16.replace("Algebra I", "Algebra, advanced, part 2")
    val r = ParityParsers.parseItems(spark, itemsFile(embedded)).head()
    assert(r.getAs[String]("masterobjectives") === "Algebra, advanced, part 2")
    assert(r.getAs[String]("masterobjectivesid") === "1.1")
  }

  test("quirk 3: no trailing anchor — 18-column rows silently shift fields") {
    val extra = valid16 + ",9.9,7"
    val r = ParityParsers.parseItems(spark, itemsFile(extra)).head()
    // the greedy group swallows the middle; last two numeric-ish fields
    // come off the (new) end — objectivenumber is no longer '1'
    assert(r.getAs[String]("objectivenumber") === "7")
    assert(r.getAs[String]("masterobjectivesid") === "9.9")
  }

  test("quirk 4a: all-empty row matches the item pattern (event of empty strings)") {
    val df = ParityParsers.parseItems(spark, itemsFile("," * 15))
    assert(df.count() === 1)
    assert(df.head().getAs[String]("attempt_id") === "")
  }

  test("quirk 4b: the assessment pattern rejects any empty field") {
    val f = java.nio.file.Files.createTempFile("assess", ".csv")
    java.nio.file.Files.writeString(f,
      "header\n" +
        "stu-01,login-01,school-01,a-01,1.0,2016-01-15,5,quiz,attempt-02,1,true,70,100\n" +
        "stu-02,login-02,,a-02,1.0,2016-01-15,5,quiz,attempt-03,1,true,70,100")
    val df = ParityParsers.parseAssessments(spark, f.toString)
    assert(df.count() === 1)
    assert(df.head().getAs[String]("identity_id") === "stu-01")
  }

  test("parity parse feeds the same event builder as the CSV path") {
    val events = ItemEvents.events(ParityParsers.parseItems(spark, itemsFile(valid16)))
    assert(events.count() === 1)
    assert(events.select("event.values.generated.normalScore").head().getString(0) === "8")
  }
}
