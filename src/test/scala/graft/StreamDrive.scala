package graft

import org.apache.spark.sql.streaming.Trigger

/** Manual end-to-end drive of the streaming surface (forked JVM):
  * file-source stream → windowed agg → memory sink. Used by the verify
  * workflow; not a test.
  */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = java.nio.file.Files.createTempDirectory("sdrive")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("part-0.parquet"))
    val st = streaming.EventsStream.read(spark, d.toString)
    val q = streaming.EventsStream.tumblingCounts(st)
      .writeStream.outputMode("complete").format("memory")
      .queryName("drive_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("STREAM_ROWS=" + spark.table("drive_out").count())
    spark.table("drive_out").orderBy("window_start", "event_type").show(5)
    spark.stop()
  }
}
