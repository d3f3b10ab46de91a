package graft

import org.apache.spark.sql.functions._

/** Round-5 perf dissection of the bench hotspots at sf0.1. Not a test. */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    // warmup
    spark.range(1000000).select(sum(col("id"))).collect()
    spark.read.parquet(s"$sf/region.parquet").count()
    graft.functions.GraftExpressions.register(spark)

    time("g1_pagerank")(graft.ops.Graph.g1PageRank.run(spark, sf).count())
    time("g2_bfs")(graft.ops.Graph.g2BfsHops.run(spark, sf).count())
    time("g1_pagerank#2")(graft.ops.Graph.g1PageRank.run(spark, sf).count())
    // value check vs known total from the old implementation
    val s = graft.ops.Graph.g1PageRank.run(spark, sf)
      .agg(sum(col("rank_fp"))).collect()(0).getLong(0)
    println(s"PROBE g1-ranksum $s expect 15996337526")
    spark.stop()
  }
}
