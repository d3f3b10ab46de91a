package graft

import org.apache.spark.sql.functions._

/** w13 cost decomposition: staging vs stream run, and stream-partition
  * sensitivity. Not a test.
  */
object ProbeW13c {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      try f catch { case e: Throwable => println(s"ERR $name: ${e.getMessage}") }
      println(f"PROBE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    // first run pays staging; repeat runs don't (TrieMap memo)
    time("w13 first (stage+run)")(
      ops.StreamingQueries.w13StreamOuterJoin.run(spark, sf).count())
    time("w13 second (run only)")(
      ops.StreamingQueries.w13StreamOuterJoin.run(spark, sf).count())
    time("w7 second-ish")(
      ops.StreamingQueries.w7StreamJoin.run(spark, sf).count())
    spark.stop()
  }
}
