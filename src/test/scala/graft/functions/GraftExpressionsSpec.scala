package graft.functions

import graft.TestSpark
import graft.functions.GraftExpressions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom kernels must be drop-in value-identical to the built-in
  * (slow) formulations they replace — that's what keeps the DuckDB
  * oracles valid.
  */
class GraftExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("DotProductD == aggregate(zip_with(...)) bit-for-bit on real vectors") {
    GraftExpressions.register(spark)
    val v = col("embedding").cast("array<double>")
    val e = graft.Tables.embeddings(spark, sf).select(col("vec_id"), v.as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = e.select((dot(col("v"), col("v")) - hof).as("d"))
      .agg(sum(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("WordShingles == split+transform+array_distinct on real documents") {
    GraftExpressions.register(spark)
    val w = split(col("text"), " ")
    val hof = array_distinct(transform(sequence(lit(0), size(w) - 3), i =>
      concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
    val mismatches = graft.Tables.documents(spark, sf)
      .select(shingles(col("text"), 3).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b")))
      .count()
    assert(mismatches === 0)
  }

  test("WordShingles edge cases: short text, empty tokens, n=1") {
    GraftExpressions.register(spark)
    import spark.implicits._
    val df = Seq("one two", "a b c d", "x  y z", "solo").toDF("text")
    val got = df.select(col("text"), shingles(col("text"), 3).as("s"),
      shingles(col("text"), 1).as("t")).collect()
      .map(r => r.getString(0) -> ((r.getSeq[String](1), r.getSeq[String](2)))).toMap
    assert(got("one two")._1 === Seq())
    assert(got("a b c d")._1 === Seq("a b c", "b c d"))
    assert(got("x  y z")._1 === Seq("x  y", " y z")) // empty token preserved
    assert(got("solo")._2 === Seq("solo"))
  }

  test("MinHashSig == explicit Carter-Wegman min over md5 halves") {
    GraftExpressions.register(spark)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), shingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
    // reference formulation: explode → per-i min of (a + i*b) % M
    val M = MinHashSig.M
    val ref = docs.select(col("doc_id"), explode(col("s")).as("sh"))
      .select(col("doc_id"),
        conv(substring(md5(col("sh")), 1, 7), 16, 10).cast("long").as("a"),
        conv(substring(md5(col("sh")), 8, 7), 16, 10).cast("long").as("b"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("i"),
        col("a"), col("b"))
      .groupBy("doc_id", "i")
      .agg(min((col("a") + col("i") * col("b")) % M).as("mh"))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("mh")))),
        x => x.getField("mh")).as("ref_sig"))
    val mismatches = docs.select(col("doc_id"), minhash(col("s"), 32).as("sig"))
      .join(ref, "doc_id")
      .filter(not(col("sig") === col("ref_sig")))
      .count()
    assert(mismatches === 0)
  }

  test("SimHashSig == explode/group sign-of-sums formulation") {
    GraftExpressions.register(spark)
    val ref = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .select(col("doc_id"), conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(59))).as("b"), col("h"))
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("(h >> b) & 1") === 1, 1).otherwise(-1)).as("sgn"))
      .groupBy("doc_id")
      .agg(sum(when(col("sgn") > 0, expr("shiftleft(cast(1 as bigint), b)"))
        .otherwise(0L)).as("ref_sim"))
    val mismatches = graft.ops.Dedup.simHashes(spark, sf)
      .join(ref, "doc_id")
      .filter(col("simhash") =!= col("ref_sim"))
      .count()
    assert(mismatches === 0)
  }

  test("IntersectCountS == size(array_intersect) incl. dups, empties, nulls") {
    GraftExpressions.register(spark)
    // corpus shingle arrays: bulk agreement on real data
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), GraftExpressions.shingles(col("text"), 3).as("s"))
    val pairs = docs.as("a").join(docs.as("b"),
        pmod(col("a.doc_id"), lit(7)) === pmod(col("b.doc_id"), lit(7)) &&
          col("a.doc_id") < col("b.doc_id"))
    val bulkMismatch = pairs.filter(
      GraftExpressions.intersectCount(col("a.s"), col("b.s")) =!=
        size(array_intersect(col("a.s"), col("b.s")))).count()
    assert(bulkMismatch === 0)
    // adversarial literals: duplicates (distinct-count semantics), empty
    // arrays, null elements, asymmetric sizes, null arrays
    val cases = Seq(
      "array('a','a','b')" -> "array('a','c','a')",
      "cast(array() as array<string>)" -> "array('a')",
      "cast(null as array<string>)" -> "array('a')",
      "array('a', cast(null as string))" -> "array(cast(null as string),'b')",
      "array('x','y','z','x')" -> "array('z','z','x','q','r','s','t')")
    cases.foreach { case (l, r) =>
      val row = spark.sql(
        s"SELECT graft_intersect_count($l, $r) AS k, size(array_intersect($l, $r)) AS ref")
        .collect()(0)
      assert(row.isNullAt(0) === row.isNullAt(1), s"null mismatch for ($l, $r)")
      if (!row.isNullAt(0))
        assert(row.getInt(0) === row.getInt(1), s"count mismatch for ($l, $r)")
    }
  }

  test("ByteHistStats == hex/explode/group-by relational formulation") {
    GraftExpressions.register(spark)
    val ref = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(regexp_extract_all(hex(col("text").cast("binary")),
          lit("[0-9A-F]{2}"), lit(0))).as("byte"))
      .groupBy(col("doc_id"), col("byte"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("rn"), count(lit(1)).as("rdistinct"),
        max(col("cnt")).as("rmaxc"), sum(col("cnt") * (col("cnt") - 1)).as("rcoll"))
    val mismatches = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), GraftExpressions.byteHist(col("text").cast("binary")).as("h"))
      .join(ref, "doc_id")
      .filter(col("h.n") =!= col("rn") || col("h.distinct") =!= col("rdistinct") ||
        col("h.maxc") =!= col("rmaxc") || col("h.coll") =!= col("rcoll"))
      .count()
    assert(mismatches === 0)
  }
}
