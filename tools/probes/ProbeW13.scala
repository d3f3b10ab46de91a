package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** w13 watermark-progression dissection. Not a test. */
object ProbeW13 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    // replicate eventsPathWithSentinel inline
    val out = java.nio.file.Files.createTempDirectory("probe_w13").toString
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.repartitionByRange(2, col("ts")).write.mode("overwrite").parquet(out)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    import spark.implicits._
    val t = System.currentTimeMillis()
    Seq(1, 2).foreach { k =>
      val sentTs = maxTs + k * 3600L * 1000000000L
      val sent = Seq(
        (-(2L * k - 1), sentTs, -1L, "click", 0.0, "{}"),
        (-(2L * k), sentTs, -1L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val tmp = java.nio.file.Files.createTempDirectory(s"probe_sent$k").toString
      sent.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val target = new java.io.File(out, s"zz-sentinel-$k.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(t + k * 60000)
    }
    new java.io.File(out).listFiles()
      .filterNot(_.getName.startsWith("zz-sentinel"))
      .foreach(f => f.setLastModified(t))
    println("files: " + new java.io.File(out).listFiles().map(f =>
      s"${f.getName}:${f.lastModified()}").sorted.mkString(", "))

    val purchases = streaming.EventsStream.read(spark, out)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = streaming.EventsStream.read(spark, out)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val joined = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"),
        "left_outer")
      .filter(col("p_user") >= 0)
      .select(col("purchase_id"), col("p_ts"), col("c_ts"))
    val ckpt = java.nio.file.Files.createTempDirectory("probe_ckpt").toString
    val q = joined.writeStream
      .format("memory").queryName("probe_w13")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val srcLog = new java.io.File(s"$ckpt/sources/0")
    Option(srcLog.listFiles()).getOrElse(Array.empty).sortBy(_.getName).foreach { f =>
      val body = new String(java.nio.file.Files.readAllBytes(f.toPath))
      println(s"--- sources/0/${f.getName}: " +
        body.linesIterator.map(_.takeRight(60)).mkString(" | "))
    }
    q.recentProgress.foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
      p.sources.foreach(s =>
        println(s"  src rows=${s.numInputRows} start=${s.startOffset} end=${s.endOffset}"))
    }
    val res = spark.table("probe_w13")
    println("total rows: " + res.count())
    println("has 9992: " + res.filter(col("purchase_id") === 9992).count())
    spark.stop()
  }
}
