package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over randomly generated CSV inputs
  * (SURVEY §5 test plan): for any mix of valid / multi-LO / embedded-comma
  * / malformed rows,
  *   - item pipeline: Σ group sizes = #parseable rows, groups = distinct
  *     attempts;
  *   - assessment pipeline: #events = 3 × #fully-populated rows.
  *
  * Uses scalacheck generators with fixed seeds (reproducible failures);
  * 5 samples per property, each a full pipeline run.
  */
class PipelinePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rnd = new scala.util.Random(7) // seeded: failures must replay

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val ident = Gen.identifier.map(_.take(8))
  private val num = Gen.choose(0, 99)

  private def itemRow(attempt: String): Gen[String] = for {
    stu <- ident; item <- ident
    sp <- num; se <- num
    mo <- Gen.oneOf("Algebra I", "\"Algebra, advanced\"", "History")
    loIds <- Gen.oneOf("1.1", "1.1;2.2", "3.0")
  } yield s"$stu,login,school,assess,1.0,$attempt,$item,1,5,TF,30,$sp,$se,$mo,$loIds,1"

  private val malformedRow: Gen[String] =
    Gen.oneOf(Gen.const("too,few,columns"), ident.map(s => s"$s,x"))

  private val itemInput: Gen[(List[String], List[String])] =
    Gen.chooseNum(1, 4).flatMap { nAttempts =>
      for {
        attempts <- Gen.listOfN(nAttempts, ident.map("attempt-" + _))
        valid <- Gen.listOfN(6, Gen.oneOf(attempts).flatMap(itemRow))
        bad <- Gen.listOfN(2, malformedRow)
      } yield (valid, bad)
    }

  test("item pipeline: sum of group sizes = parseable rows; groups = distinct attempts") {
    for ((valid, bad) <- samples(itemInput, 5)) {
      val f = java.nio.file.Files.createTempFile("prop-items", ".csv")
      val header = CaliperSchemas.itemSchema.fieldNames.mkString(",")
      java.nio.file.Files.writeString(f,
        (header +: rnd.shuffle(valid ++ bad)).mkString("\n"))
      val grouped = ItemEvents.groupedByAttempt(
        ItemEvents.events(ItemEvents.read(spark, f.toString))).collect()
      val distinctAttempts = valid.map(_.split(",")(5)).distinct.size
      assert(grouped.length === distinctAttempts, s"input: $valid")
      assert(grouped.map(_.getSeq[String](1).size).sum === valid.size, s"input: $valid")
    }
  }

  private val fullRow: Gen[String] = for {
    stu <- ident; a <- ident; n <- Gen.choose(1, 5)
    se <- num; sp <- num
  } yield s"$stu,login,school,$a,1.0,2016-01-15,5,quiz,attempt-$a,$n,true,$se,$sp"

  private val assessInput: Gen[(List[String], List[String])] = for {
    good <- Gen.listOfN(5, fullRow)
    partial <- Gen.listOfN(3, fullRow.map(_.replaceFirst(",school,", ",,")))
  } yield (good, partial)

  test("assessment pipeline: events = 3 × fully-populated rows") {
    for ((good, partial) <- samples(assessInput, 5)) {
      val f = java.nio.file.Files.createTempFile("prop-assess", ".csv")
      val header = CaliperSchemas.assessmentSchema.fieldNames.mkString(",")
      java.nio.file.Files.writeString(f,
        (header +: rnd.shuffle(good ++ partial)).mkString("\n"))
      val events = AssessmentEvents.events(AssessmentEvents.read(spark, f.toString))
      assert(events.count() === 3L * good.size, s"input: $good")
      val perAction = events.groupBy(col("event.values.action")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perAction === Map("STARTED" -> good.size.toLong,
        "SUBMITTED" -> good.size.toLong, "GRADED" -> good.size.toLong))
    }
  }
}
