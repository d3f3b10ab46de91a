package graft

import org.apache.spark.sql.functions._

/** dp4/dp5 decimal-aggregate cost dissection at sf0.1. Not a test. */
object ProbeDec {
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
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()

    val li = Tables.lineitem(spark, sf).select(
      round(col("l_quantity") * 100, 0).cast("bigint").as("q"))
    time("warm scan count")(li.count())
    time("sum bigint")(li.agg(sum(col("q"))).collect())
    time("sum decimal(38,0)")(li.agg(sum(col("q").cast("decimal(38,0)"))).collect())
    time("sum decimal(38,0) again")(li.agg(sum(col("q").cast("decimal(38,0)"))).collect())
    time("sum decimal(27,0)")(li.agg(sum(col("q").cast("decimal(27,0)"))).collect())
    time("sum sq decimal(38,0)")(li.agg(sum((col("q") * col("q")).cast("decimal(38,0)"))).collect())
    time("dp4 full")(ops.Relational.dp4Correlation.run(spark, sf).collect())
    time("dp5 full")(ops.Relational.dp5Outliers.run(spark, sf).collect())
    val p = li.agg(sum(col("q").cast("decimal(38,0)")))
    p.collect()
    println(p.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
