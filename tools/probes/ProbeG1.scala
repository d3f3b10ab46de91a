package graft
/** Ad-hoc timing of the graph queries at sf0.1 (forked JVM). Not a test. */
object ProbeG1 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (q <- Seq("g1_pagerank", "g2_bfs_hops")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      println(f"PROBE $q%-16s ${(System.nanoTime()-t0)/1e9}%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
