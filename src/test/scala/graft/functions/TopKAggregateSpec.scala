package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKPairs must be value-identical to the window formulation it
  * replaces (that equivalence is what keeps q43's oracle valid), and
  * its result must not depend on partitioning (= update/merge order).
  */
class TopKAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaAgg(parts: Int): Seq[(Long, Long, Long)] = {
    GraftExpressions.register(spark)
    import spark.implicits._
    val df = spark.range(0, 1000).repartition(parts)
      .select(col("id"),
        (col("id") * 37 % 101).as("score"), // many ties across groups
        (col("id") % 7).as("g"))
    df.groupBy(col("g"))
      .agg(GraftExpressions.topk(col("score"), col("id"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("p"))
      .select(col("g"), col("p.score"), col("p.id"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
  }

  test("agg == window formulation, and is partitioning-independent") {
    import spark.implicits._
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val expected = spark.range(0, 1000)
      .select(col("id"), (col("id") * 37 % 101).as("score"), (col("id") % 7).as("g"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), col("score"), col("id"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(viaAgg(1) === expected)     // single partition: pure update path
    assert(viaAgg(13) === expected)    // many partitions: merge path
  }

  test("groups smaller than k return all rows; nulls are skipped") {
    GraftExpressions.register(spark)
    import spark.implicits._
    val df = Seq((Some(10L), 1L), (None, 2L), (Some(30L), 3L))
      .toDF("score", "id").withColumn("g", lit(0))
    val out = df.groupBy(col("g"))
      .agg(GraftExpressions.topk(col("score"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("p")).select(col("p.score"), col("p.id"))
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((30L, 3L), (10L, 1L)))
  }

  test("serialize/deserialize roundtrips a trimmed buffer") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKPairs(Literal(1L), Literal(2L), 3)
    val buf = agg.createAggregationBuffer()
    (1L to 20L).foreach(i => buf += ((i % 7, i)))
    val rt = agg.deserialize(agg.serialize(buf))
    assert(rt.length === 3)
    assert(rt.sortBy(p => (-p._1, p._2)) ===
      buf.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(3))
  }
}
