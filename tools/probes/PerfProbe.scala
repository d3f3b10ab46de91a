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
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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

    // --- t11 stage dissection (mirrors TextAnalysis.tfidfTopK) ---
    val wcol = col("w")
    val trigrams = when(size(wcol) >= 3,
      transform(sequence(lit(1), size(wcol) - 2), i =>
        concat_ws(" ", element_at(wcol, i), element_at(wcol, i + 1),
          element_at(wcol, i + 2))))
      .otherwise(array().cast("array<string>"))
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(trigrams).as("term"))
      .select(col("doc_id"), graft.functions.DetHash.md5Long60(col("term")).as("tk"))
    time("t11 tok explode+md5")(tok.count())
    val tf = tok.groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("tf")).persist()
    time("t11 tf agg+persist")(tf.count())
    val dfq = tf.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    time("t11 df agg")(dfq.count())
    val score = col("tf").cast("double") / col("df")
    val wW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(score.desc, col("tk"))
    val topk = tf.join(dfq, "tk")
      .withColumn("rnk", row_number().over(wW))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("tk"), floor(lit(1000000.0) * score).as("w"))
      .persist()
    time("t11 topk join+window")(topk.count())
    val nrm = topk.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("n2"))
    val dotp = topk.as("a").join(topk.as("b"),
        col("a.tk") === col("b.tk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dp"))
    val cosv = col("dp").cast("double") /
      (sqrt(col("na.n2").cast("double")) * sqrt(col("nb.n2").cast("double")))
    val outv = dotp
      .join(nrm.as("na"), col("doc_a") === col("na.doc_id"))
      .join(nrm.as("nb"), col("doc_b") === col("nb.doc_id"))
      .filter(cosv >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(cosv, 6).as("cosine"))
    time("t11 pair-join+norms")(outv.count())
    spark.stop()
  }
}
