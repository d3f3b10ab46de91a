package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline — the composition a
  * 100 TB corpus actually runs: language gate → quality gate → exact
  * dedup (keep the lowest doc_id per content key) → per-doc stats. One
  * query, so the whole chain is planned together: the language/quality
  * predicates and the column pruning reach the scan, the only shuffle is
  * the dedup group-by on the content hash, and the survivor row is
  * picked with `min_by` inside that same aggregation (no second join
  * back).
  */
object Curation {

  private val QUALITY_MIN = 0.5

  /** THE split-bucket definition (md5(doc_id) mod 100) — p2 assigns
    * splits from it and p4 decontaminates against it; one definition in
    * each engine so they cannot drift.
    */
  private[ops] val bucketSql: String =
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100"
  private[ops] def bucketCol: org.apache.spark.sql.Column =
    pmod(graft.functions.DetHash.md5Long28(col("doc_id").cast("string")), lit(100))

  val p1Curation: Q = Q.sql(
    "p1_curation_pipeline",
    s"Curation chain: lang=en + quality >= $QUALITY_MIN + exact-dedup survivors with stats.",
    s"""WITH w AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
       |scored AS (
       |  SELECT doc_id,
       |    md5(lower(trim(text))) AS content_key,
       |    ${TextAnalysis.predLangSql("w", "text")} AS pred_lang,
       |    ${TextAnalysis.qualitySql("w")} AS quality,
       |    len(w) AS n_tokens
       |  FROM w),
       |kept AS (
       |  SELECT * FROM scored WHERE pred_lang = 'en' AND quality >= $QUALITY_MIN)
       |SELECT MIN(doc_id) AS doc_id,
       |       arg_min(quality, doc_id) AS quality,
       |       arg_min(n_tokens, doc_id) AS n_tokens,
       |       COUNT(*) AS n_copies
       |FROM kept GROUP BY content_key ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), TextAnalysis.words.as("w"))
      .select(col("doc_id"),
        md5(lower(trim(col("text")))).as("content_key"),
        TextAnalysis.predLangCol(col("w"), col("text")).as("pred_lang"),
        TextAnalysis.qualityCol(col("w")).as("quality"),
        size(col("w")).as("n_tokens"))
    scored
      .filter(col("pred_lang") === "en" && col("quality") >= QUALITY_MIN)
      .groupBy(col("content_key"))
      // the content key is case/whitespace-normalized while the stats are
      // computed on raw text, so group members can differ — every emitted
      // stat must come from the SAME survivor row (min_by doc_id), never
      // from independent per-column mins
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("quality"), col("doc_id")).as("quality"),
        min_by(col("n_tokens"), col("doc_id")).as("n_tokens"),
        count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("n_copies"))
      .orderBy("doc_id")
  }

  /** Deterministic hash-based dataset split — the train/val/test
    * assignment a corpus-scale pipeline needs to be reproducible across
    * engines, runs, and re-shards (no RNG, no row order dependence): the
    * bucket is a pure function of the stable doc key. 80/10/10 on
    * md5(doc_id) mod 100. Map-only; at 100 TB this is a free column on
    * the scan followed by partitioned writes.
    */
  val p2HashSplit: Q = Q.sql(
    "p2_hash_split",
    "Deterministic 80/10/10 train/val/test split on md5(doc_id) mod 100.",
    s"""WITH b AS (
       |  SELECT doc_id, $bucketSql AS bucket
       |  FROM documents)
       |SELECT doc_id, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), bucketCol.as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** Incremental ingestion dedup — the shape a corpus pipeline runs per
    * arriving batch: new documents are admitted only if their content
    * key collides neither with the EXISTING corpus (anti-join against
    * the corpus key set — at 100 TB that side is the persisted key
    * index, and the join broadcasts the new batch, not the corpus) nor
    * with an earlier-keyed document of the same batch (keep-min within
    * the batch). Doc_id < 250 plays the existing corpus here; the rest
    * is the arriving batch.
    */
  val p3IncrementalDedup: Q = Q.sql(
    "p3_incremental_dedup",
    "Batch-over-corpus dedup: admit new docs whose content key is unseen, keep-min within batch.",
    """WITH corpus AS (
      |  SELECT DISTINCT md5(lower(trim(text))) AS content_key
      |  FROM documents WHERE doc_id < 250),
      |batch AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS content_key
      |  FROM documents WHERE doc_id >= 250),
      |novel AS (
      |  SELECT b.doc_id, b.content_key FROM batch b
      |  LEFT JOIN corpus c ON b.content_key = c.content_key
      |  WHERE c.content_key IS NULL)
      |SELECT MIN(doc_id) AS doc_id, content_key,
      |       COUNT(*) AS batch_copies
      |FROM novel GROUP BY content_key ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("content_key"))
    val corpusKeys = keyed.filter(col("doc_id") < 250)
      .select(col("content_key")).distinct()
    keyed.filter(col("doc_id") >= 250)
      .join(corpusKeys, Seq("content_key"), "left_anti")
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("batch_copies"))
      .select(col("doc_id"), col("content_key"), col("batch_copies"))
      .orderBy("doc_id")
  }

  /** Decontamination: detect training documents that overlap an
    * evaluation set — the contamination check every benchmark-respecting
    * corpus runs before release. The eval set is p2's own `test` split;
    * a train doc is contaminated when it shares ≥ 5 distinct 3-gram
    * shingles with some test doc. Pairs meet on a shingle shuffle key
    * (the d2 inverted-index shape — never a doc×doc join); at 100 TB the
    * index side would additionally drop ultra-common shingles (df cap)
    * exactly like the d2 prefix filter trims hot shingles.
    */
  val p4Decontamination: Q = Q.sql(
    "p4_decontamination",
    "Train docs sharing >= 5 3-gram shingles with any test-split doc (contamination check).",
    s"""WITH ${Dedup.shinglesSqlCteWith(s", $bucketSql AS bucket", ", bucket")},
       |ex AS (SELECT doc_id, bucket, UNNEST(s) AS s FROM sh),
      |hits AS (
      |  SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc, COUNT(*) AS shared
      |  FROM ex tr JOIN ex te ON tr.s = te.s
      |  WHERE tr.bucket < 80 AND te.bucket >= 90
      |  GROUP BY 1, 2),
      |flagged AS (SELECT * FROM hits WHERE shared >= 5)
       |SELECT train_doc, CAST(COUNT(*) AS BIGINT) AS n_test_hits,
       |       MAX(shared) AS max_shared
       |FROM flagged GROUP BY train_doc ORDER BY train_doc""".stripMargin) { (spark, dir) =>
    import graft.functions.GraftExpressions
    GraftExpressions.register(spark)
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"), bucketCol.as("bucket"),
        GraftExpressions.shingles(col("text"), 3).as("s"))
    val ex = keyed.select(col("doc_id"), col("bucket"), explode(col("s")).as("s"))
    val train = ex.filter(col("bucket") < 80)
      .select(col("doc_id").as("train_doc"), col("s"))
    val test = ex.filter(col("bucket") >= 90)
      .select(col("doc_id").as("test_doc"), col("s"))
    train.join(test, "s")
      .groupBy(col("train_doc"), col("test_doc"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 5)
      .groupBy(col("train_doc"))
      .agg(count(lit(1)).as("n_test_hits"), max(col("shared")).as("max_shared"))
      .orderBy("train_doc")
  }

  /** Per-domain quota sampling — cap every source domain at K documents,
    * chosen by a deterministic hash rank (not arrival order, not RNG):
    * the standard down-weighting of over-represented domains in corpus
    * curation, reproducible across engines and re-runs. The rank window
    * partitions by domain; a 100 TB corpus with mega-domains computes
    * the same thing without sorting whole domains by aggregating a
    * bounded top-K heap per domain instead (quota K bounds the state,
    * the hash is the priority) — the window form is the clearest
    * statement of the semantics and what Spark plans here.
    */
  val p5DomainQuota: Q = Q.sql(
    "p5_domain_quota",
    "Cap each source domain at K=10 docs by deterministic md5 rank.",
    """WITH r AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
      |               doc_id) AS quota_rank
      |  FROM documents)
      |SELECT doc_id, source, quota_rank
      |FROM r WHERE quota_rank <= 10 ORDER BY source, doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(graft.functions.DetHash.md5Long60(col("doc_id").cast("string")),
        col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("quota_rank", row_number().over(w).cast("long"))
      .filter(col("quota_rank") <= 10)
      .select(col("doc_id"), col("source"), col("quota_rank"))
      .orderBy("source", "doc_id")
  }

  private val PACK_BUDGET = 512
  private val PACK_SHARDS = 8

  /** Sequence packing — assign documents to fixed token-budget context
    * windows (the pretraining batch-construction step). Packing is
    * inherently sequential, so it runs WITHIN hash shards: shard =
    * md5(doc_id) mod S, docs ordered by doc_id inside a shard, pack_id =
    * floor(tokens-before-this-doc / budget). One range-free shuffle on
    * the shard key + a per-shard cumulative-sum window; at 100 TB you
    * raise S until a shard fits a task — the assignment inside any shard
    * is independent of every other shard by construction, so S is a free
    * parallelism knob, not a semantics change.
    */
  val p6SequencePack: Q = Q.sql(
    "p6_sequence_pack",
    s"Pack docs into $PACK_BUDGET-token context windows within $PACK_SHARDS hash shards.",
    s"""WITH t AS (
       |  SELECT doc_id,
       |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % $PACK_SHARDS AS shard,
       |    len(string_split(text, ' ')) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / $PACK_BUDGET) AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"),
        pmod(graft.functions.DetHash.md5Long28(col("doc_id").cast("string")),
          lit(PACK_SHARDS)).as("shard"),
        size(TextAnalysis.words).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast("double") / PACK_BUDGET)
          .as("pack_id"))
      .orderBy("doc_id")
  }

  /** Stratified deterministic sampling — keep a fixed hash-fraction of
    * documents per (source, split) stratum and report kept vs total.
    * Unlike [[p5DomainQuota]]'s fixed cap this is RATE sampling: no
    * window, no rank — a pure filter on the md5 bucket (a free column
    * on the scan at any scale) followed by one aggregation. The same
    * WHERE clause reproduces the sample on any engine, any run, any
    * shard layout — the property RNG sampling can't give a pipeline.
    */
  val p7StratifiedSample: Q = Q.sql(
    "p7_stratified_sample",
    "Deterministic 20% hash-rate sample per (source, split) stratum: kept vs total counts.",
    s"""WITH b AS (
       |  SELECT doc_id, source, $bucketSql AS bucket
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, source, bucket,
       |    CASE WHEN bucket < 80 THEN 'train'
       |         WHEN bucket < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    CASE WHEN ('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 < 20
       |         THEN 1 ELSE 0 END AS kept
       |  FROM b)
       |SELECT source, split, CAST(SUM(kept) AS BIGINT) AS n_kept,
       |       COUNT(*) AS n_total
       |FROM s GROUP BY source, split ORDER BY source, split""".stripMargin) { (spark, dir) =>
    // the sampling hash is salted ("sample:") so it is independent of the
    // split-assignment hash — reusing p2's bucket would correlate the
    // sample with the split boundaries
    val kept = when(pmod(graft.functions.DetHash.md5Long28(
        concat(lit("sample:"), col("doc_id").cast("string"))), lit(100)) < 20,
      1L).otherwise(0L)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), bucketCol.as("bucket"))
      .select(col("source"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"),
        kept.as("kept"))
      .groupBy(col("source"), col("split"))
      .agg(sum(col("kept")).as("n_kept"), count(lit(1)).as("n_total"))
      .orderBy("source", "split")
  }

  /** Deterministic mixture resampling — reweight sources toward target
    * mixture proportions, UP or down: each doc is emitted
    * `floor(w) + (hash-fraction < frac(w))` times, so a source with
    * w = 2.0 duplicates every doc and w = 0.5 keeps a deterministic
    * half. This is the mixture-weights step of training-data assembly
    * (p7 only drops; upsampling needs row multiplication). Map-only —
    * the repeat count is a pure function of (source, doc_id) and the
    * explode multiplies rows on the scan with no shuffle; the weights
    * here derive from the source's numeric suffix so both engines
    * compute them from data alone.
    */
  val p8MixtureResample: Q = Q.sql(
    "p8_mixture_resample",
    "Deterministic mixture reweighting: floor(w) copies + hash-fractional extra per doc.",
    """WITH w AS (
      |  SELECT doc_id, source,
      |    0.5 + (CAST(regexp_extract(source, '[0-9]+') AS INT) % 4) * 0.5 AS wgt
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, wgt,
      |    CAST(FLOOR(wgt) AS BIGINT)
      |      + CASE WHEN ('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 1000
      |                  < CAST((wgt - FLOOR(wgt)) * 1000 AS BIGINT)
      |             THEN 1 ELSE 0 END AS copies
      |  FROM w)
      |SELECT doc_id, source, CAST(wgt AS DOUBLE) AS weight, u.copy_id
      |FROM c, UNNEST(range(c.copies)) AS u(copy_id)
      |ORDER BY doc_id, copy_id""".stripMargin) { (spark, dir) =>
    val wgt = lit(0.5) +
      (regexp_extract(col("source"), "[0-9]+", 0).cast("int") % 4) * 0.5
    val frac = pmod(graft.functions.DetHash.md5Long28(
      concat(lit("mix:"), col("doc_id").cast("string"))), lit(1000))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), wgt.as("wgt"))
      .withColumn("copies",
        floor(col("wgt")) +
          when(frac < ((col("wgt") - floor(col("wgt"))) * 1000).cast("long"), 1L)
            .otherwise(0L))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("source"), col("wgt").cast("double").as("weight"),
        explode(sequence(lit(0L), col("copies") - 1)).as("copy_id"))
      .orderBy("doc_id", "copy_id")
  }

  private val FUNNEL_MIN_TOKENS = 30

  /** Pipeline observability: the per-stage rejection funnel every
    * production curation run reports — how many documents each gate
    * (language → quality → length → exact dedup) admitted and rejected.
    * Each doc gets cumulative pass/fail flags and one aggregate sums
    * them all; the dedup stage's survivor count is a lone distinct-count
    * of content keys among stage-3 passers, which Spark plans as its own
    * narrow two-phase scan (no Expand). A literal `stack` shapes the
    * 4-row report. Scans don't scale with the stage count — 4 gates cost
    * 2 narrow passes (pinned by PlanSpec), not 4 filtered counts.
    */
  val p9RejectFunnel: Q = Q.sql(
    "p9_reject_funnel",
    "Per-stage curation rejection funnel (lang, quality, length, exact-dedup) in one scan.",
    s"""WITH w AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
       |scored AS (
       |  SELECT doc_id,
       |    md5(lower(trim(text))) AS content_key,
       |    ${TextAnalysis.predLangSql("w", "text")} = 'en' AS p_lang,
       |    ${TextAnalysis.qualitySql("w")} >= $QUALITY_MIN AS p_qual,
       |    len(w) >= $FUNNEL_MIN_TOKENS AS p_len
       |  FROM w),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
       |         CAST(SUM(CASE WHEN p_lang THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |         CAST(SUM(CASE WHEN p_lang AND p_qual THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |         CAST(SUM(CASE WHEN p_lang AND p_qual AND p_len THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |         CAST(COUNT(DISTINCT CASE WHEN p_lang AND p_qual AND p_len
       |                                   THEN content_key END) AS BIGINT) AS n4
       |  FROM scored)
       |SELECT stage, n_in, n_out, n_in - n_out AS n_rejected
       |FROM (
       |  SELECT '1_language' AS stage, n0 AS n_in, n1 AS n_out FROM agg
       |  UNION ALL SELECT '2_quality', n1, n2 FROM agg
       |  UNION ALL SELECT '3_length', n2, n3 FROM agg
       |  UNION ALL SELECT '4_exact_dedup', n3, n4 FROM agg)
       |ORDER BY stage""".stripMargin) { (spark, dir) =>
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), TextAnalysis.words.as("w"))
      .select(
        md5(lower(trim(col("text")))).as("content_key"),
        (TextAnalysis.predLangCol(col("w"), col("text")) === "en").as("p_lang"),
        (TextAnalysis.qualityCol(col("w")) >= QUALITY_MIN).as("p_qual"),
        (size(col("w")) >= FUNNEL_MIN_TOKENS).as("p_len"))
    val agg = scored.agg(
      count(lit(1)).as("n0"),
      sum(when(col("p_lang"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("p_lang") && col("p_qual"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("p_lang") && col("p_qual") && col("p_len"), 1L).otherwise(0L)).as("n3"),
      countDistinct(when(col("p_lang") && col("p_qual") && col("p_len"),
        col("content_key"))).as("n4"))
    agg.select(expr(
      """stack(4,
        |  '1_language',    n0, n1,
        |  '2_quality',     n1, n2,
        |  '3_length',      n2, n3,
        |  '4_exact_dedup', n3, n4
        |) AS (stage, n_in, n_out)""".stripMargin))
      .select(col("stage"), col("n_in"), col("n_out"),
        (col("n_in") - col("n_out")).as("n_rejected"))
      .orderBy("stage")
  }

  /** The dataset card — the corpus-level summary a released training
    * set ships with: scale (docs, tokens, chars), composition (language
    * shares, source count), redundancy (exact-dup rate), and mean
    * quality. One row per metric, every value a DOUBLE (exact integers
    * stay exact below 2^53; ratios are one division of integer sums).
    *
    * One corpus scan feeds a single wide aggregate (counts + integer
    * sums + two lone distinct-counts) and a tiny per-lang aggregate for
    * the composition rows; the report is a constant-size union of the
    * two. The mean quality uses the s4 quantized-integer-sum trick
    * (`floor(q·1e7)` summed as BIGINT) so the double reduction is
    * order-independent — a raw SUM(double) would drift between
    * partitioned and single-threaded evaluation.
    */
  val p10DatasetCard: Q = Q.sql(
    "p10_dataset_card",
    "Corpus dataset card: scale, language composition, dup rate, mean quality — one row per metric.",
    s"""WITH w AS (
       |  SELECT doc_id, lang, source, n_chars,
       |         string_split(text, ' ') AS w,
       |         md5(lower(trim(text))) AS content_key
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang, source, n_chars, content_key,
       |         len(w) AS n_tokens,
       |         ${TextAnalysis.qualitySql("w")} AS quality
       |  FROM w),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |         CAST(COUNT(DISTINCT content_key) AS BIGINT) AS n_uniq,
       |         CAST(SUM(CAST(FLOOR(quality * 10000000.0) AS BIGINT)) AS BIGINT) AS q_fp
       |  FROM scored),
       |langs AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY lang)
       |SELECT metric, ROUND(value, 6) AS value FROM (
       |  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM agg
       |  UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM agg
       |  UNION ALL SELECT 'n_chars', CAST(n_chars AS DOUBLE) FROM agg
       |  UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM agg
       |  UNION ALL SELECT 'exact_dup_rate',
       |    1.0 - CAST(n_uniq AS DOUBLE) / n_docs FROM agg
       |  UNION ALL SELECT 'mean_quality',
       |    CAST(q_fp AS DOUBLE) / 10000000.0 / n_docs FROM agg
       |  UNION ALL SELECT 'mean_chars', CAST(n_chars AS DOUBLE) / n_docs FROM agg
       |  UNION ALL SELECT 'pct_lang_' || lang,
       |    CAST(n AS DOUBLE) / (SELECT n_docs FROM agg) FROM langs)
       |ORDER BY metric""".stripMargin) { (spark, dir) =>
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        TextAnalysis.words.as("w"),
        md5(lower(trim(col("text")))).as("content_key"))
      .select(col("lang"), col("source"), col("n_chars"), col("content_key"),
        size(col("w")).as("n_tokens"),
        TextAnalysis.qualityCol(col("w")).as("quality"))
    val agg = scored.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      sum(floor(col("quality") * 10000000.0).cast("bigint")).as("q_fp"))
    // each lone distinct-count as its own scan (dp1's rationale: mixing
    // distinct and plain aggregates forces an Expand row explosion)
    val srcs = scored.agg(countDistinct(col("source")).as("n_sources"))
    val uniq = scored.agg(countDistinct(col("content_key")).as("n_uniq"))
    val scalars = agg.crossJoin(broadcast(srcs)).crossJoin(broadcast(uniq)).select(expr(
      """stack(7,
        |  'n_docs',         CAST(n_docs AS DOUBLE),
        |  'n_tokens',       CAST(n_tokens AS DOUBLE),
        |  'n_chars',        CAST(n_chars AS DOUBLE),
        |  'n_sources',      CAST(n_sources AS DOUBLE),
        |  'exact_dup_rate', 1.0D - CAST(n_uniq AS DOUBLE) / n_docs,
        |  'mean_quality',   CAST(q_fp AS DOUBLE) / 10000000.0D / n_docs,
        |  'mean_chars',     CAST(n_chars AS DOUBLE) / n_docs
        |) AS (metric, value)""".stripMargin))
    val nDocs = agg.select(col("n_docs"))
    val langRows = scored.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(nDocs))
      .select(concat(lit("pct_lang_"), col("lang")).as("metric"),
        (col("n").cast("double") / col("n_docs")).as("value"))
    scalars.union(langRows)
      .select(col("metric"), round(col("value"), 6).as("value"))
      .orderBy("metric")
  }

  /** Curriculum schedule: the whole corpus in one deterministic global
    * training order (shortest docs first — the easy→hard curriculum
    * axis), with each doc's global sequence number and a third-split
    * phase label derived FROM the sequence (`seq·3 div n`), so phase
    * boundaries are exact row-count thirds, not value quantiles.
    *
    * Scale shape: the global order is materialized WITHOUT a global
    * sort-to-one-partition window — the c6 two-phase pattern:
    * range-partition on the order key, number rows per partition, then
    * add cumulative partition offsets (an O(#partitions) window). The
    * doc_id tiebreak makes the order total, so both engines agree on
    * every position.
    */
  val p11Curriculum: Q = Q.sql(
    "p11_curriculum",
    "Deterministic curriculum order (shortest-first) with two-phase global sequence and easy/medium/hard phases.",
    """WITH w AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
      |s AS (
      |  SELECT doc_id, n_tokens,
      |         ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1 AS seq
      |  FROM w)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, seq,
      |       CASE (seq * 3) // (SELECT COUNT(*) FROM w)
      |            WHEN 0 THEN 'easy' WHEN 1 THEN 'medium'
      |            ELSE 'hard' END AS phase
      |FROM s ORDER BY seq""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextAnalysis.words).cast("bigint").as("n_tokens"))
    // Phase 1: range-partition by the order key, number locally
    val local = scored
      .repartitionByRange(col("n_tokens"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .withColumn("local_rn",
        row_number().over(Window.partitionBy("pid").orderBy("n_tokens", "doc_id")))
      // pinned against double materialization of the sampled range
      // exchange (see Caliper.c6AttemptSeq)
      .localCheckpoint()
    // Phase 2: cumulative per-partition counts → global offsets
    val offsets = local.groupBy("pid")
      .agg(max("local_rn").as("cnt"))
      .withColumn("offset",
        coalesce(sum("cnt").over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("pid", "offset")
    val n = scored.agg(count(lit(1)).as("n_total"))
    local.join(broadcast(offsets), "pid")
      .withColumn("seq", col("offset") + col("local_rn") - 1)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_tokens"), col("seq"),
        when(expr("(seq * 3) div n_total") === 0, "easy")
          .when(expr("(seq * 3) div n_total") === 1, "medium")
          .otherwise("hard").as("phase"))
      .orderBy("seq")
  }

  private[ops] val BPE_TOP = 40

  /** The merge-mining CTE chain (words → adjacent char pairs → counts →
    * deterministic rank), shared by p12's oracle and t17's
    * ([[TextAnalysis.t17BpeApply]]) so the two cannot drift.
    */
  private[ops] val bpeRankedCte: String =
    """bpe_words AS (
      |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
      |  FROM documents),
      |bpe_pairs AS (
      |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
      |  FROM bpe_words, UNNEST(range(1, length(w))) AS t(i)
      |  WHERE length(w) >= 2),
      |bpe_counted AS (
      |  SELECT pair, COUNT(*) AS n FROM bpe_pairs GROUP BY pair),
      |bpe_ranked AS (
      |  SELECT pair, n,
      |         ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk
      |  FROM bpe_counted)""".stripMargin

  /** One iteration of BPE vocabulary learning, distributed: mine the
    * corpus for its most frequent ADJACENT symbol pairs (here: character
    * bigrams within lowercase-alpha words) — the merge candidates a BPE
    * trainer would fuse next. The full trainer is this exact aggregate in
    * a loop (merge top pair, re-mine); one iteration is the
    * SQL-expressible contract, and the loop shape is g1-style driver
    * control over the same frame.
    *
    * Distributed shape: words explode map-side off the document scan,
    * char pairs explode map-side off words (`sequence` + `substring`, all
    * codegen'd builtins — no UDF), and ONE shuffle aggregates pair
    * counts, whose key space is bounded by the alphabet (≤26² cells) —
    * partial map-side combine collapses virtually everything before the
    * exchange. The top-K window over ≤676 aggregated rows is trivially
    * single-partition-safe. Ranks are deterministic (count desc, pair
    * asc); every output is integer-exact.
    */
  /** p12's result frame (rnk, pair, n — the top-[[BPE_TOP]] merge table),
    * reused by [[TextAnalysis.t17BpeApply]] as its broadcast merge side.
    */
  private[ops] def bpeMergeFrame(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("pair"))
    pairs.groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= BPE_TOP)
  }

  val p12BpeMerges: Q = Q.sql(
    "p12_bpe_merges",
    s"BPE merge-candidate mining: top-$BPE_TOP adjacent char pairs in lowercase words, one trainer iteration.",
    s"""WITH $bpeRankedCte
       |SELECT rnk, pair, n FROM bpe_ranked WHERE rnk <= $BPE_TOP
       |ORDER BY rnk""".stripMargin) { (spark, dir) =>
    bpeMergeFrame(spark, dir)
      .select(col("rnk"), col("pair"), col("n"))
      .orderBy("rnk")
  }

  private val MIX_MAX_REPEAT = 4L

  /** Epoch repeat-factor planning — the token-budget mixing step a
    * pretraining run executes ABOVE row-level sampling (p8 resamples
    * rows WITHIN a batch; this plans how many EPOCHS of each source to
    * take, the "small high-quality sources repeat up to 4×" recipe):
    * per source, natural token mass, its ppm share, the uniform target
    * (total // n_sources), the integer repeat factor
    * clamp(target // natural, 1, [[MIX_MAX_REPEAT]]), and the effective
    * post-repeat mass + ppm share. Every number is an all-positive
    * integer floor division (Spark `DIV` == DuckDB `//`), so the plan is
    * bit-identical in any engine and — because shares are RELATIVE —
    * means the same thing at any corpus scale.
    *
    * Scale shape: one corpus scan with map-side token-count partials
    * into a #sources-row frame; the two global totals ride 1-row
    * broadcast crossJoins. At 100 TB this is the cheapest query in the
    * family — the plan artifact (a dozen rows) then drives the reader.
    */
  val p13EpochMix: Q = Q.sql(
    "p13_epoch_mix",
    s"Epoch repeat-factor plan per source: natural/target token mass, clamped integer repeat (<= $MIX_MAX_REPEAT), effective ppm.",
    s"""WITH nat AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS natural_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT SUM(natural_tokens) AS t, COUNT(*) AS ns FROM nat),
       |plan AS (
       |  SELECT source, natural_tokens,
       |         CAST((1000000 * natural_tokens) // t AS BIGINT) AS natural_ppm,
       |         CAST(t // ns AS BIGINT) AS target_tokens,
       |         CAST(LEAST($MIX_MAX_REPEAT, GREATEST(1, (t // ns) // natural_tokens)) AS BIGINT) AS repeat_factor,
       |         CAST(natural_tokens * LEAST($MIX_MAX_REPEAT, GREATEST(1, (t // ns) // natural_tokens)) AS BIGINT) AS effective_tokens
       |  FROM nat, tot),
       |eft AS (SELECT SUM(effective_tokens) AS et FROM plan)
       |SELECT p.source, p.natural_tokens, p.natural_ppm, p.target_tokens,
       |       p.repeat_factor, p.effective_tokens,
       |       CAST((1000000 * p.effective_tokens) // e.et AS BIGINT) AS effective_ppm
       |FROM plan p, eft e ORDER BY p.source""".stripMargin) { (spark, dir) =>
    val nat = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("natural_tokens"))
    val tot = nat.agg(sum(col("natural_tokens")).as("t"),
      count(lit(1)).as("ns"))
    val plan = nat.crossJoin(broadcast(tot))
      .select(col("source"), col("natural_tokens"),
        expr("CAST((1000000 * natural_tokens) DIV t AS BIGINT)").as("natural_ppm"),
        expr("CAST(t DIV ns AS BIGINT)").as("target_tokens"),
        expr(s"CAST(least($MIX_MAX_REPEAT, greatest(1, (t DIV ns) DIV natural_tokens)) AS BIGINT)")
          .as("repeat_factor"))
      .withColumn("effective_tokens",
        (col("natural_tokens") * col("repeat_factor")).as("effective_tokens"))
      .localCheckpoint() // the effective total re-reads the plan frame
    val eft = plan.agg(sum(col("effective_tokens")).as("et"))
    plan.crossJoin(broadcast(eft))
      .select(col("source"), col("natural_tokens"), col("natural_ppm"),
        col("target_tokens"), col("repeat_factor"), col("effective_tokens"),
        expr("CAST((1000000 * effective_tokens) DIV et AS BIGINT)").as("effective_ppm"))
      .orderBy("source")
  }

  /** Leakage-safe splitting — p2's deterministic split made DUP-CLUSTER
    * AWARE: near-duplicate documents (d6's connected components over
    * jaccard ≥ 0.8) must never straddle train/val/test, or the eval set
    * silently contains paraphrases of training data (the
    * contamination-by-near-dup failure Lee et al. 2021 measure). The
    * split key is the cluster REPRESENTATIVE (cluster_id for clustered
    * docs, own id otherwise) pushed through p2's exact md5-mod-100
    * 80/10/10 rule, so every member of a cluster inherits one split by
    * construction — and the output PROVES it: `cross_split_groups`
    * recomputes, from the assignment itself, how many groups span >1
    * split (a rep-derivation bug would surface as a nonzero witness and
    * a hash mismatch, not silence).
    *
    * Scale shape: the cluster table is the (tiny) dedup artifact joined
    * LEFT onto the corpus on doc_id — the d7 shape; the rollup is one
    * map-side-combined aggregate per split plus a groups-by-rep
    * aggregate for the witness. At 100 TB this replaces p2 as the split
    * step of record wherever a dedup pass ran.
    */
  val p14LeakSafeSplit: Q = Q.sql(
    "p14_leak_safe_split",
    "Cluster-aware 80/10/10 split on the dup-cluster representative; per-split mass + zero cross-split-group witness.",
    s"""WITH RECURSIVE ${Dedup.clusterCteSql},
       |rep AS (
       |  SELECT d.doc_id, d.n_chars, COALESCE(l.cluster_id, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc),
       |asg AS (
       |  SELECT doc_id, n_chars, rep,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT rep.*,
       |          ('0x' || substring(md5(CAST(rep AS VARCHAR)), 1, 7))::BIGINT % 100 AS b
       |        FROM rep)),
       |leak AS (
       |  SELECT CAST(COUNT(*) FILTER (ns > 1) AS BIGINT) AS leaky
       |  FROM (SELECT rep, COUNT(DISTINCT split) AS ns FROM asg GROUP BY rep))
       |SELECT a.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(a.n_chars) AS BIGINT) AS sum_chars,
       |       CAST(COUNT(DISTINCT a.rep) AS BIGINT) AS n_groups,
       |       l.leaky AS cross_split_groups
       |FROM asg a CROSS JOIN leak l
       |GROUP BY a.split, l.leaky ORDER BY a.split""".stripMargin) { (spark, dir) =>
    val labels = Dedup.clusterTable(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val asg = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("cluster_id"), col("doc_id")).as("rep"))
      .withColumn("b",
        pmod(graft.functions.DetHash.md5Long28(col("rep").cast("string")), lit(100)))
      .select(col("doc_id"), col("n_chars"), col("rep"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
      .localCheckpoint() // the rollup and the leak witness share it
    val leak = asg.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("ns"))
      .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("leaky"))
    asg.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("rep")).as("n_groups"))
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_docs"), col("sum_chars"),
        col("n_groups"), col("leaky").as("cross_split_groups"))
      .orderBy("split")
  }

  private val P15_EPOCHS = 3
  private val P15_WORKERS = 8

  /** End-to-end curation DAG — the single composed plan a training-data
    * team actually runs, chaining the family's stages over ONE dataflow:
    * gopher quality gate (t20's five rules, shared predicates) → dedup
    * apply (d7's rule over the session-persisted cluster table) →
    * cluster-aware 80/10/10 split (p14's representative-bucket rule) →
    * decontamination (p4's ≥5-shared-3-shingle rule, train vs test,
    * over the session-persisted shingle frame) → sequence packing (p6's
    * shard/cumulative rule over the surviving train docs) → loader
    * schedule (m15's md5-tape epoch shuffle + round-robin workers over
    * the pack manifest). Emits the per-epoch pack read schedule with the
    * stage-count witnesses (gated / retained / decontaminated / final
    * train) as constant columns — the lineage audit a run manifest logs.
    *
    * Scale shape: every session-shared frame (cluster table, shingle
    * frame) is materialized ONCE and probed — no stage recomputes
    * another's work; the only data-scale shuffles are the gate's one
    * content scan, the decon shingle equi-join (test side is ~10% of
    * retained), and the pack window's shard shuffle. The schedule
    * windows sort the pack MANIFEST (corpus_tokens/budget rows), never
    * the corpus — m15's argument, inherited.
    */
  val p15CurationDag: Q = Q.sql(
    "p15_curation_dag",
    s"End-to-end curation DAG: gopher gate -> dedup apply -> leak-safe split -> decontamination -> $PACK_BUDGET-token packing -> $P15_EPOCHS-epoch/$P15_WORKERS-worker loader schedule, with stage-count witnesses.",
    s"""WITH RECURSIVE ${Dedup.clusterCteSql},
       |gs AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(w, t -> len(t))) AS BIGINT) AS sum_len,
       |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(w, t -> t IN ${TextAnalysis.inList(TextAnalysis.enStops)})) AS BIGINT) AS n_stop,
       |    CAST(list_max(list_transform(list_distinct(w),
       |      t -> len(list_filter(w, x -> x = t)))) AS BIGINT) AS max_tf
       |  FROM w),
       |gate AS MATERIALIZED (
       |  SELECT doc_id, n_tokens FROM gs
       |  WHERE n_tokens BETWEEN 30 AND 1000
       |    AND 7 * n_tokens <= 2 * sum_len AND 2 * sum_len <= 9 * n_tokens
       |    AND 2 * n_distinct >= n_tokens
       |    AND n_stop >= 2
       |    AND 8 * max_tf <= n_tokens),
       |asg AS MATERIALIZED (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (
       |    SELECT k.*,
       |      ('0x' || substring(md5(CAST(rep AS VARCHAR)), 1, 7))::BIGINT % 100 AS b
       |    FROM (
       |      SELECT g.doc_id, g.n_tokens, COALESCE(l.cluster_id, g.doc_id) AS rep
       |      FROM gate g LEFT JOIN lab l ON g.doc_id = l.doc
       |      WHERE l.doc IS NULL OR l.doc = l.cluster_id) k)),
       |con AS MATERIALIZED (
       |  SELECT DISTINCT train_doc AS doc_id FROM (
       |    SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc
       |    FROM (SELECT e1.doc_id, e1.s FROM ex e1
       |          JOIN asg a1 ON e1.doc_id = a1.doc_id AND a1.split = 'train') tr
       |    JOIN (SELECT e2.doc_id, e2.s FROM ex e2
       |          JOIN asg a2 ON e2.doc_id = a2.doc_id AND a2.split = 'test') te
       |      ON tr.s = te.s
       |    GROUP BY 1, 2 HAVING COUNT(*) >= 5)),
       |fin AS MATERIALIZED (
       |  SELECT a.doc_id, a.n_tokens FROM asg a
       |  LEFT JOIN con c ON a.doc_id = c.doc_id
       |  WHERE a.split = 'train' AND c.doc_id IS NULL),
       |wit AS (
       |  SELECT (SELECT COUNT(*) FROM gate) AS n_gated,
       |         (SELECT COUNT(*) FROM asg) AS n_retained,
       |         (SELECT COUNT(*) FROM con) AS n_decon_removed,
       |         (SELECT COUNT(*) FROM fin) AS n_train),
       |pc AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM (SELECT doc_id, n_tokens,
       |          ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % $PACK_SHARDS AS shard
       |        FROM fin)),
       |packs AS (
       |  SELECT shard, CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / $PACK_BUDGET) AS BIGINT) AS pack_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
       |  FROM pc GROUP BY 1, 2),
       |sched AS (
       |  SELECT e.e AS epoch, shard, pack_id, n_docs, pack_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY e.e ORDER BY
       |      ('0x' || substring(md5(CAST(e.e AS VARCHAR) || ':' ||
       |         CAST(shard AS VARCHAR) || ':' || CAST(pack_id AS VARCHAR)), 1, 15))::BIGINT,
       |      shard, pack_id) AS rnk
       |  FROM packs CROSS JOIN (SELECT UNNEST(range($P15_EPOCHS)) AS e) e)
       |SELECT epoch, shard, pack_id, n_docs, pack_tokens,
       |  CAST(rnk AS BIGINT) AS rnk,
       |  CAST((rnk - 1) % $P15_WORKERS AS BIGINT) AS worker,
       |  CAST(SUM(pack_tokens) OVER (PARTITION BY epoch, (rnk - 1) % $P15_WORKERS
       |    ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS worker_cum_tokens,
       |  CAST(wit.n_gated AS BIGINT) AS n_gated,
       |  CAST(wit.n_retained AS BIGINT) AS n_retained,
       |  CAST(wit.n_decon_removed AS BIGINT) AS n_decon_removed,
       |  CAST(wit.n_train AS BIGINT) AS n_train
       |FROM sched CROSS JOIN wit
       |ORDER BY epoch, rnk""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftExpressions.register(spark)
    // stage 1 — gopher gate: one content scan, pinned (feeds the dedup
    // chain and the n_gated witness)
    val gate = TextAnalysis.gopherStats(spark, dir)
      .filter(TextAnalysis.gopherRules.reduce(_ && _))
      .select(col("doc_id"), col("n_tokens"))
      .localCheckpoint()
    // stage 2+3 — dedup apply (d7 rule, session-persisted cluster table)
    // and the p14 representative split; pinned (four consumers: decon
    // train/test sides, the final train filter, the n_retained witness)
    val clusters = Dedup.clusterTable(spark, dir)
      .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
    val asg = gate.join(clusters, Seq("doc_id"), "left")
      .filter(col("is_canonical").isNull || col("is_canonical"))
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("cluster_id"), col("doc_id")).as("rep"))
      .withColumn("b",
        pmod(graft.functions.DetHash.md5Long28(col("rep").cast("string")), lit(100)))
      .select(col("doc_id"), col("n_tokens"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
      .localCheckpoint()
    // stage 4 — decontamination: p4's rule over the session-persisted
    // shingle frame, restricted to the retained train/test sides
    val ex = Dedup.shingledDocs(spark, dir)
      .select(col("doc_id"), explode(col("s")).as("s"))
    val trEx = ex.join(asg.filter(col("split") === "train").select("doc_id"), "doc_id")
      .select(col("doc_id").as("train_doc"), col("s"))
    val teEx = ex.join(asg.filter(col("split") === "test").select("doc_id"), "doc_id")
      .select(col("doc_id").as("test_doc"), col("s"))
    val con = trEx.join(teEx, "s")
      .groupBy(col("train_doc"), col("test_doc"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 5)
      .select(col("train_doc")).distinct()
      .localCheckpoint() // anti-join + witness count share it
    val fin = asg.filter(col("split") === "train")
      .join(con, col("doc_id") === col("train_doc"), "left_anti")
      .select(col("doc_id"), col("n_tokens"))
      .localCheckpoint() // packing + witness count share it
    // witness counts: four 1-row aggregates off the pinned stage frames
    val wit = gate.agg(count(lit(1)).as("n_gated"))
      .crossJoin(broadcast(asg.agg(count(lit(1)).as("n_retained"))))
      .crossJoin(broadcast(con.agg(count(lit(1)).as("n_decon_removed"))))
      .crossJoin(broadcast(fin.agg(count(lit(1)).as("n_train"))))
    // stage 5 — p6's packing rule over the surviving train docs
    val wcum = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packs = fin
      .withColumn("shard",
        pmod(graft.functions.DetHash.md5Long28(col("doc_id").cast("string")),
          lit(PACK_SHARDS)))
      .withColumn("cum", sum(col("n_tokens")).over(wcum))
      .select(col("shard"),
        floor((col("cum") - col("n_tokens")).cast("double") / PACK_BUDGET)
          .as("pack_id"),
        col("n_tokens"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
    // stage 6 — m15's loader schedule over the pack manifest
    val sched = packs
      .crossJoin(broadcast(spark.range(P15_EPOCHS).select(col("id").as("epoch"))))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("epoch")).orderBy(
          graft.functions.DetHash.md5Long60(
            concat_ws(":", col("epoch"), col("shard"), col("pack_id"))),
          col("shard"), col("pack_id"))).cast("long"))
      .withColumn("worker", pmod(col("rnk") - 1, lit(P15_WORKERS.toLong)))
    sched
      .withColumn("worker_cum_tokens", sum(col("pack_tokens")).over(
        Window.partitionBy(col("epoch"), col("worker")).orderBy(col("rnk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(wit))
      .select(col("epoch"), col("shard"), col("pack_id"), col("n_docs"),
        col("pack_tokens"), col("rnk"), col("worker"), col("worker_cum_tokens"),
        col("n_gated"), col("n_retained"), col("n_decon_removed"), col("n_train"))
      .orderBy("epoch", "rnk")
  }

  val all: Seq[Q] = Seq(p1Curation, p2HashSplit, p3IncrementalDedup,
    p4Decontamination, p5DomainQuota, p6SequencePack, p7StratifiedSample,
    p8MixtureResample, p9RejectFunnel, p10DatasetCard, p11Curriculum,
    p12BpeMerges, p13EpochMix, p14LeakSafeSplit, p15CurationDag)
}
