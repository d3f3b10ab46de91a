package graft

import org.apache.spark.sql.functions._

/** Ad-hoc perf dissection at sf0.1 (forked JVM). Not a test. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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

    val w = split(col("text"), " ")
    val sh = array_distinct(transform(sequence(lit(0), size(w) - 3), i =>
      concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))

    val docs = Tables.documents(spark, sf).select(col("doc_id"), sh.as("s"))
    time("shingles-only")(docs.agg(sum(size(col("s")))).head().getLong(0))
    val ex = docs.select(col("doc_id"), explode(col("s")).as("s"))
    time("explode-count")(ex.count())
    val joined = ex.as("a").join(ex.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    time("self-join-count")(joined.count())
    val common = joined.groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"))
    time("pair-group-count")(common.count())
    time("full-d2")(ops.Dedup.d2NgramJaccard.run(spark, sf).count())

    // d5 cost: interpreted HOF dot products
    val n = ops.Dedup.normedVectors(spark, sf)
    time("norm-only")(n.agg(sum(col("nrm"))).head().getDouble(0))
    time("full-d5")(ops.Dedup.d5EmbeddingCosine.run(spark, sf).count())

    graft.functions.GraftExpressions.register(spark)
    import graft.functions.GraftExpressions.{shingles, minhash}
    val sdocs = Tables.documents(spark, sf)
      .select(col("doc_id"), shingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
    time("d3-shingle-kernel")(sdocs.agg(sum(size(col("s")))).head().getLong(0))
    val sig2 = sdocs.select(col("doc_id"), minhash(col("s"), 32).as("sig"))
    time("d3-sig-kernel")(sig2.agg(sum(element_at(col("sig"), 1))).head().getLong(0))
    val bands2 = sig2.select(col("doc_id"), explode(transform(sequence(lit(0), lit(7)), b =>
      struct(b.as("band"), md5(concat_ws(",", transform(slice(col("sig"), b * 4 + 1, lit(4)),
        x => x.cast("string")))).as("bh")))).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bh").as("bh"))
    time("d3-bands")(bands2.count())
    val cand2 = bands2.as("a").join(bands2.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("d3-cand")(cand2.count())
    time("full-d3")(ops.Dedup.d3MinHashLsh.run(spark, sf).count())
    time("full-d4")(ops.Dedup.d4SimHash.run(spark, sf).count())
    spark.stop()
  }
}
