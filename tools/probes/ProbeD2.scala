package graft

import org.apache.spark.sql.functions._

/** d2 stage decomposition at sf0.1. Not a test. */
object ProbeD2 {
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
    spark.sparkContext.setLocalProperty("spark.job.interruptOnCancel", "true")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    functions.GraftExpressions.register(spark)
    val docs0 = Tables.documents(spark, sf)
    time("scan")(docs0.count())
    val sh = docs0
      .select(col("doc_id"), functions.GraftExpressions.shingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .persist()
    time("shingle kernel + persist")(sh.count())
    time("total shingles")(sh.select(sum(size(col("s")))).collect()
      .apply(0).getLong(0))
    val ex = sh.select(col("doc_id"), size(col("s")).as("nsh"), explode(col("s")).as("s0"))
      .select(col("doc_id"), col("nsh"), xxhash64(col("s0")).as("sh"))
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("dfreq groupBy")(dfreq.count())
    val t = 0.8
    val idx = ex.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("sh")))).as("arr"),
        first(col("nsh")).as("nsh"))
      .select(col("doc_id"), explode(slice(col("arr"), lit(1),
        (col("nsh") - ceil(col("nsh") * t) + 1).cast("int"))).as("e"))
      .select(col("doc_id"), col("e.sh").as("sh"))
      .persist()
    time("prefix index build")(idx.count())
    val cand = idx.as("a").join(idx.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidate self-join")(cand.count())
    spark.stop()
  }
}
