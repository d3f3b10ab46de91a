package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library packaging route: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the `graft_*`
  * functions from SQL with no imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the graft_* functions into a fresh session") {
    // materialize the SHARED test session first so (a) this spec cannot
    // create the JVM-wide SparkContext with its own master/conf, and
    // (b) we provably build a DIFFERENT session below rather than
    // getOrCreate() handing back the shared one.
    // withExtensions is the programmatic injection route; the
    // `spark.sql.extensions=graft.GraftExtensions` conf route runs the
    // same GraftExtensions.apply but is only read from the
    // SparkContext's own conf, which this shared-context JVM can't set.
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(spark ne shared, "builder reused the shared session — injection untested")
      // the test would be vacuous if this session's functions came from
      // some earlier imperative register() call on it: a fresh session
      // has only the injected route
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
      val mh = spark.sql(
        "SELECT size(graft_minhash(graft_shingles('a b c d e', 2), 8)) AS k")
        .collect()(0).getInt(0)
      assert(mh === 8)
      val simOk = spark.sql(
        "SELECT graft_simhash(array('x','y'), 60) AS s").collect()(0).getLong(0)
      assert(simOk >= 0L)
      // the injected optimizer rule rewrites the built-in verify pattern
      // to the one-pass count kernel — and values are unchanged. The
      // input must be a file-backed relation: literal or VALUES input
      // constant-folds / ConvertToLocalRelation-evaluates away before
      // any plan inspection could see either formulation.
      val docs = s"${TestSpark.sf0001}/documents.parquet"
      val q = spark.sql(
        s"""SELECT doc_id,
           |  size(array_intersect(split(text, ' '), array('b','c','d'))) AS k,
           |  size(array_intersect(split(text, ' '), split(text, ' '))) AS self_k,
           |  size(array_distinct(split(text, ' '))) AS distinct_k
           |FROM parquet.`$docs`""".stripMargin)
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_intersect_count"),
        s"IntersectCountRewrite did not fire:\n${q.queryExecution.optimizedPlan}")
      // |A ∩ A| == |distinct(A)| — kernel value check across the corpus
      assert(q.filter("self_k != distinct_k").count() === 0)
      // guard: legacy size(null)=-1 semantics must NOT be rewritten.
      // (the legacy flag is only effective with ANSI mode off — Spark 4
      // defaults ANSI on, under which Size always carries
      // legacySizeOfNull=false and the rewrite stays semantics-safe)
      val legacyKey = "spark.sql.legacy.sizeOfNull"
      val ansiKey = "spark.sql.ansi.enabled"
      spark.conf.set(legacyKey, "true")
      spark.conf.set(ansiKey, "false")
      try {
        val ql = spark.sql(
          s"""SELECT size(array_intersect(split(text, ' '),
             |  cast(null as array<string>))) AS k
             |FROM parquet.`$docs` LIMIT 1""".stripMargin)
        assert(!ql.queryExecution.optimizedPlan.toString.contains("graft_intersect_count"),
          "rewrite fired under legacy sizeOfNull semantics")
        assert(ql.collect()(0).getInt(0) === -1)
      } finally {
        spark.conf.set(legacyKey, "false")
        spark.conf.set(ansiKey, "true")
      }
    } finally {
      // restore the shared session for the remaining suites; never stop()
      // — the SparkContext is JVM-wide
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
