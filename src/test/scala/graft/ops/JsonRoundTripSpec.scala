package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSON-lines sink → source round trip: the interchange format corpus
  * pipelines actually exchange (one JSON document per line, splittable,
  * schema-on-read). Written partitioned by lang — the same hive layout
  * the partition-pruning spec proves prunes at the scan.
  */
class JsonRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("documents survive a partitioned JSONL write/read round trip") {
    val sf = TestSpark.sf0001
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    try {
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    src.write.mode("overwrite").partitionBy("lang").json(dir)

    // schema-on-read: lang comes back from the directory layout
    val back = spark.read
      .schema("doc_id LONG, text STRING, lang STRING")
      .json(dir)
      .select(col("doc_id"), col("lang"), col("text"))

    assert(back.count() === src.count())
    // set equality row-by-row (JSON is unordered on disk)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)

    // a lang-filtered read prunes to that partition's files only
    val one = spark.read
      .schema("doc_id LONG, text STRING, lang STRING")
      .json(dir)
      .filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert(one.count() === src.filter(col("lang") === "en").count())
    } finally TestSpark.deleteRecursively(dir)
  }

  test("orders survive an ORC write/read round trip with pushdown intact") {
    val sf = TestSpark.sf0001
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    try {
    val src = Tables.orders(spark, sf)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // ORC scans take predicate pushdown like parquet — the filter must
    // reach the scan, not sit in a post-scan Filter only
    val q = spark.read.orc(dir).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("o_orderpriority"),
      s"filter not pushed to ORC scan:\n$plan")
    } finally TestSpark.deleteRecursively(dir)
  }

  test("corrupt JSONL lines quarantine into _corrupt_record, valid rows survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson").toString
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "part-00000.json"),
        """{"doc_id": 1, "text": "ok one"}
          |{"doc_id": 2 "text": "missing comma"}
          |not json at all
          |{"doc_id": 3, "text": "ok three"}
          |""".stripMargin)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("_corrupt_record", StringType)))
      // PERMISSIVE (default): malformed lines land whole in the corrupt
      // column with null data fields — the ingest contract a 100 TB
      // pipeline needs (quarantine, never abort, never silently drop)
      val rows = spark.read.schema(schema).json(dir)
        .select(col("doc_id"), col("_corrupt_record").isNotNull.as("bad"))
        .collect()
      assert(rows.length === 4, s"expected 4 rows, got ${rows.length}")
      assert(rows.count(_.getBoolean(1)) === 2, "exactly the 2 malformed lines quarantine")
      assert(rows.filter(!_.getBoolean(1)).map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L),
        "valid rows lost or mangled")
      // FAILFAST must abort instead — the validation-job mode
      val strict = spark.read
        .schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir)
      intercept[org.apache.spark.SparkException](strict.collect())
    } finally TestSpark.deleteRecursively(dir)
  }
}
