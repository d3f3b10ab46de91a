package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library packaging route: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the `graft_*`
  * functions from SQL with no imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects the graft_* functions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(dot === 11.0)
      val sh = spark.sql(
        "SELECT size(graft_shingles('a b c d', 3)) AS n").collect()(0).getInt(0)
      assert(sh === 2)
      val hist = spark.sql(
        "SELECT graft_bytehist(cast('aab' as binary)).distinct AS d")
        .collect()(0).getLong(0)
      assert(hist === 2)
      // minhash/simhash resolve and execute over a shingle array
      val mh = spark.sql(
        "SELECT size(graft_minhash(graft_shingles('a b c d e', 2), 8)) AS k")
        .collect()(0).getInt(0)
      assert(mh === 8)
      val simOk = spark.sql(
        "SELECT graft_simhash(array('x','y'), 60) AS s").collect()(0).getLong(0)
      assert(simOk >= 0L)
    } finally {
      // this spec's session is intentionally separate (different conf);
      // do NOT stop() — it shares the JVM-wide SparkContext with the
      // other suites' session
      SparkSession.clearActiveSession()
    }
  }
}
