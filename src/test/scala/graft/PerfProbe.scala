package graft

import org.apache.spark.sql.functions._

/** Ad-hoc perf dissection at sf0.1 (forked JVM). Not a test. */
object PerfProbe {
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
    graft.functions.GraftExpressions.register(spark)
    import graft.functions.GraftExpressions.shingles

    // --- d2 stage dissection (mirrors Dedup.jaccardPairs) ---
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), shingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .persist()
    time("shingle-kernel+persist")(docs.count())
    val t = 0.8
    val ex = docs.select(col("doc_id"), size(col("s")).as("nsh"),
        explode(col("s")).as("s"))
      .select(col("doc_id"), col("nsh"), xxhash64(col("s")).as("sh"))
    time("explode+hash")(ex.count())
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    val prefixes = ex.join(dfreq, "sh")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("nsh") - ceil(col("nsh") * t) + 1)
      .select(col("doc_id"), col("sh"))
      .persist()
    time("prefix-index+persist")(prefixes.count())
    // variant: aggregate + per-row array sort instead of the window
    val aggPrefixes = ex.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("sh")))).as("arr"),
        first(col("nsh")).as("nsh"))
      .select(col("doc_id"), explode(slice(col("arr"), lit(1),
        (col("nsh") - ceil(col("nsh") * t) + 1).cast("int"))).as("e"))
      .select(col("doc_id"), col("e.sh").as("sh"))
    time("agg-prefix-index")(aggPrefixes.count())
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("self-join candidates")(cand.count())
    val candP = cand.persist()
    time("cand+persist")(candP.count())
    val nCommon = size(array_intersect(col("s_a"), col("sb.s")))
    val j = nCommon.cast("double") /
      (size(col("s_a")) + size(col("sb.s")) - nCommon)
    def verifyA = broadcast(candP)
      .join(docs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("sa.s").as("s_a"))
    val vBcast = broadcast(verifyA)
      .join(docs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(j >= t)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
    time("verify bcast-withA")(vBcast.count())
    val vFree = verifyA
      .join(docs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(j >= t)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
    time("verify AQE-free 2nd join")(vFree.count())
    val vMerge = verifyA.hint("merge")
      .join(docs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(j >= t)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
    time("verify shuffle 2nd join")(vMerge.count())
    time("full-d2 (fresh session path)")(
      ops.Dedup.d2NgramJaccard.run(spark, sf).count())
    time("full-d2 (cached)")(
      ops.Dedup.d2NgramJaccard.run(spark, sf).count())
    time("full-d6 (reuses pairs)")(
      ops.Dedup.d6DedupClusters.run(spark, sf).count())
    spark.stop()
  }
}
