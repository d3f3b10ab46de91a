package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet test tables
  * (`/root/testdata/sf*`; see TESTDATA.md). All engine code reads tables
  * through here so the ns-timestamp normalization is applied in exactly
  * one place.
  *
  * Scale note: these are plain `spark.read.parquet` scans — Catalyst
  * pushes filters/column pruning into the scan, and on a real cluster the
  * same code picks up distributed file listing + vectorized readers for
  * free. Nothing here materializes on the driver.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def path(dir: String, name: String): String =
    s"${dir.stripSuffix("/")}/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(path(dir, name))

  /** `events.ts` is written as parquet INT64 TIMESTAMP(NANOS) which Spark
    * refuses by default (PARQUET_TYPE_ILLEGAL). We read it as a nanosecond
    * long and truncate to microseconds — the same truncation DuckDB applies
    * when it scans nanos into its native µs TIMESTAMP — so both engines see
    * identical values. Integer `div` (not `/`) matters: ns-since-epoch
    * (~1.7e18) exceeds a double's 2^53 exact-integer range.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
