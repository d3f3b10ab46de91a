package graft

import org.apache.spark.sql.functions._

/** dp4/dp5 bench-context cost: run the alphabetical predecessors first
  * (c*, d1-d9, dp1-dp3) as the bench does, then time dp4/dp5, tracking
  * GC time. Not a test.
  */
object ProbeDec2 {
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
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def time(name: String)(f: => Any): Unit = {
      val g0 = gcMs; val t0 = System.nanoTime()
      try f catch { case e: Throwable => println(s"ERR $name: ${e.getMessage}") }
      println(f"PROBE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  gc=${gcMs - g0} ms")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .takeWhile(_ != "dp4_correlation")
    for (n <- names) time(n)(SparkEntry.queries(n)(spark, sf).count())
    time("dp4_correlation")(SparkEntry.queries("dp4_correlation")(spark, sf).count())
    time("dp5_outliers")(SparkEntry.queries("dp5_outliers")(spark, sf).count())
    time("dp4 again")(SparkEntry.queries("dp4_correlation")(spark, sf).count())
    spark.stop()
  }
}
