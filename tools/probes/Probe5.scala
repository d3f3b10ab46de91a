package graft

import org.apache.spark.sql.functions._

/** Round-5 perf dissection at sf0.1. Not a test. */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val aqe = sys.env.getOrElse("PROBE_AQE", "true")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE aqe=$aqe $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sf/region.parquet").count()
    graft.functions.GraftExpressions.register(spark)

    // cold pair-table build is what d2 pays; run it three times to see
    // through host-contention noise (unpersist between runs)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.jaccardPairsPrefix(spark, sf, 0.8)
      val n = pairs.count()
      println(f"PROBE aqe=$aqe build$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    spark.stop()
  }
}
