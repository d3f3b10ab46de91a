package graft

import org.apache.spark.sql.functions._

/** Round-5 perf dissection of the bench hotspots at sf0.1. Not a test. */
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
    val sf = "/root/testdata/sf0.1"

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE aqe=$aqe $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    // warmup
    spark.range(1000000).select(sum(col("id"))).collect()
    spark.read.parquet(s"$sf/region.parquet").count()
    graft.functions.GraftExpressions.register(spark)
    import graft.functions.GraftExpressions.shingles

    val t = 0.8
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), shingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .persist()
    time("shingles+persist")(docs.count())

    val ex = docs.select(col("doc_id"), size(col("s")).as("nsh"),
        explode(col("s")).as("s"))
      .select(col("doc_id"), col("nsh"), xxhash64(col("s")).as("sh"))
    time("explode+hash")(ex.count())
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val idx = ex.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("sh")))).as("arr"),
        first(col("nsh")).as("nsh"))
      .select(col("doc_id"), explode(slice(col("arr"), lit(1),
        (col("nsh") - ceil(col("nsh") * t) + 1).cast("int"))).as("e"))
      .select(col("doc_id"), col("e.sh").as("sh"))
      .persist()
    time("prefix-idx+persist")(idx.count())
    val cand = idx.as("a").join(idx.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("cand")(cand.count())
    val nCommon = graft.functions.GraftExpressions.intersectCount(col("s_a"), col("sb.s"))
    val j = nCommon.cast("double") / (size(col("s_a")) + size(col("sb.s")) - nCommon)
    val withA = broadcast(cand)
      .join(docs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("sa.s").as("s_a"))
    time("verify-join1")(withA.count())
    val pairs = withA.hint("merge")
      .join(docs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(j >= t)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
    time("verify-join2")(pairs.count())
    time("verify-again")(pairs.count())
    spark.stop()
  }
}
