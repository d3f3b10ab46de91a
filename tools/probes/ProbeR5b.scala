package graft

/** Round-5 second-session perf triage at sf0.1: reproduce (or clear)
  * the bench-run slowness of representative queries in a fresh JVM.
  * Not a test.
  */
object ProbeR5b {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("PROBE_INTERRUPT").contains("1"))
      spark.sparkContext.setLocalProperty("spark.job.interruptOnCancel", "true")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    import org.apache.spark.sql.functions._
    spark.range(1000000).select(sum(col("id"))).collect()

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    for (n <- args.toSeq match {
        case Nil => Seq("dp1_profile", "dp3_histogram", "d2_dedup_ngram_jaccard",
          "d8_dedup_containment", "g3_supplier_affinity")
        case xs => xs.toSeq
      }) {
      if (n.startsWith("sleep:")) {
        Thread.sleep(n.stripPrefix("sleep:").toLong * 1000L)
        println(s"PROBE slept ${n.stripPrefix("sleep:")}s")
      } else if (n == "g3dissect") {
        import org.apache.spark.sql.expressions.Window
        val eg = broadcast(Tables.orders(spark, sf)
            .select(col("o_orderkey"), col("o_custkey")))
          .join(Tables.lineitem(spark, sf)
              .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .distinct()
          .persist()
        time("g3:cs")(eg.count())
        val co = eg.as("x").join(eg.as("y"),
            col("x.c") === col("y.c") && col("x.s") < col("y.s"))
          .groupBy(col("x.s").as("s1"), col("y.s").as("s2"))
          .agg(count(lit(1)).as("co"))
          .persist()
        time("g3:pairs")(co.count())
        val bidir = co.select(col("s1").as("s"), col("s2").as("p"), col("co"))
          .union(co.select(col("s2").as("s"), col("s1").as("p"), col("co")))
        val w = Window.partitionBy(col("s")).orderBy(col("co").desc, col("p"))
        time("g3:topk")(bidir.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5).count())
        eg.unpersist(); co.unpersist()
      } else time(n)(byName(n).run(spark, sf).count())
    }
    spark.stop()
  }
}
