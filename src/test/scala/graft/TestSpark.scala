package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites run in a
  * single forked JVM; building a session per suite costs ~5s each).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // no runtime broadcast demotion (see Bench.scala) — cancelled map
      // stages leave zombie tasks that slow every later suite
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // interrupt tasks of AQE-cancelled stages (see Bench.scala) — zombie
    // tasks from one suite would otherwise slow every later one
    s.sparkContext.setLocalProperty("spark.job.interruptOnCancel", "true")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"

  def resource(name: String): String =
    getClass.getResource(s"/$name").getPath

  /** Recursive delete for spec temp dirs; closes the walk stream. */
  def deleteRecursively(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
