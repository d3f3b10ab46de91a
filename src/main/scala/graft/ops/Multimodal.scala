package graft.ops

import graft.{Q, Tables}
import graft.functions.DetHash
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs batched per partition (`mapPartitions` on a
  * typed Dataset — the Scala analog of arrow-batched pandas UDFs), so a
  * real codec drops in without touching the plan shape.
  *
  * No image/audio codecs exist in this container, so `decodeStub` is a
  * clearly-marked deterministic fake; everything around it — schema,
  * binary column handling, partition-batched UDF signature, metadata
  * derivation — is real and tested.
  *
  * `m1_multimodal_meta` is the oracle-checked slice: pure-arithmetic
  * metadata derivation over the binary payload (octet lengths + md5
  * fingerprint), expressible in any engine.
  */
object Multimodal {

  /** Typed media row: payload + metadata struct. */
  final case class MediaMeta(mediaType: String, nBytes: Long, width: Int,
      height: Int, frames: Int)
  final case class MediaAsset(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, mediaType: String, nBytes: Long,
      meanByte: Double, featureDim: Int)

  /** documents → opaque binary assets with typed metadata (the ingest
    * edge: in production `content` would come off object storage).
    */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] =
    assetsFrom(Tables.documents(spark, dir))

  /** Asset construction over an arbitrary (possibly pre-filtered)
    * documents frame. Filters that can be expressed on the source
    * columns belong BEFORE this map: the typed encode copies each
    * payload, and nothing pushes below an object-serialization boundary.
    */
  def assetsFrom(docs: org.apache.spark.sql.DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = text.getBytes("UTF-8")
        val mt = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaAsset(id, bytes,
          MediaMeta(mt, bytes.length.toLong,
            width = 64 + (id % 577).toInt,
            height = 64 + (id % 331).toInt,
            frames = (nChars % 24).toInt + 1))
      }
  }

  /** Partition-batched decode / feature-extract.
    *
    * STUB: a real implementation would decode `content` with an image /
    * audio codec and emit embeddings; this deterministic fake (mean byte
    * value + fixed feature dim) keeps the dataflow — batch iteration,
    * typed output, per-partition setup cost amortization — faithful.
    */
  def decodeStub(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition setup (codec init in a real impl) happens here, once
      batch.map { a =>
        val mean =
          if (a.content.isEmpty) 0.0
          else a.content.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / a.content.length
        MediaFeatures(a.doc_id, a.meta.mediaType, a.meta.nBytes, mean, featureDim = 64)
      }
    }
  }

  /** Resize: recompute target dimensions preserving aspect ratio
    * (metadata transform; a real impl would also transform `content`).
    * STUB: payload passes through untouched.
    */
  def resizeStub(assets: Dataset[MediaAsset], maxSide: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val scale = maxSide.toDouble / math.max(a.meta.width, a.meta.height)
      if (scale >= 1.0) a
      else a.copy(meta = a.meta.copy(
        width = math.max(1, (a.meta.width * scale).toInt),
        height = math.max(1, (a.meta.height * scale).toInt)))
    }
  }

  /** Frame sampling for video assets: pick every k-th frame index
    * (deterministic). Non-video assets yield no frames. The output is
    * (doc_id, frame_idx) — the explode shape a real decoder would feed
    * downstream feature extraction.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int): DataFrame =
    assets.toDF()
      .filter(col("meta.mediaType") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("meta.frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyK === 0)

  /** Oracle-checked metadata slice: binary payload length, md5 content
    * fingerprint, and deterministic shape metadata — all engine-portable
    * arithmetic (per-row map stage; nothing shuffles).
    */
  val m1Meta: Q = Q.sql(
    "m1_multimodal_meta",
    "Binary-payload metadata: octet length, md5 fingerprint, derived shape.",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  octet_length(encode(text)) AS n_bytes,
      |  ('0x' || substring(md5(text), 1, 7))::BIGINT % 256 AS content_fp,
      |  64 + doc_id % 577 AS width,
      |  64 + doc_id % 331 AS height,
      |  n_chars % 24 + 1 AS frames
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        (DetHash.md5Long28(col("text")) % 256).as("content_fp"),
        (lit(64) + col("doc_id") % 577).as("width"),
        (lit(64) + col("doc_id") % 331).as("height"),
        (col("n_chars") % 24 + 1).as("frames"))
      .orderBy("doc_id")
  }

  /** Byte-level payload statistics — the honest (codec-free) half of
    * media feature extraction: a byte histogram per asset yields the
    * distinct-byte count, the modal byte frequency, and the index of
    * coincidence (Σ c·(c−1) / n·(n−1) — high for structured/text
    * payloads, ~1/256 for compressed/encrypted ones), the standard
    * cheap screen for "is this blob already compressed". All integer
    * counting plus one exact-rational division per stat, so every engine
    * agrees bit-for-bit; two shuffles, both keyed on doc_id.
    */
  val m2PayloadStats: Q = Q.sql(
    "m2_payload_stats",
    "Byte-histogram payload stats: distinct bytes, modal ratio, index of coincidence.",
    """WITH b AS (
      |  SELECT doc_id, UNNEST(regexp_extract_all(hex(encode(text)), '[0-9A-F]{2}')) AS byte
      |  FROM documents WHERE length(text) > 0),
      |c AS (SELECT doc_id, byte, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
      |s AS (SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS distinct_bytes,
      |             MAX(cnt) AS maxc, SUM(cnt * (cnt - 1)) AS coll
      |      FROM c GROUP BY 1)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes, distinct_bytes,
      |  ROUND(CAST(maxc AS DOUBLE) / n, 6) AS max_byte_ratio,
      |  CASE WHEN n > 1 THEN ROUND(CAST(coll AS DOUBLE) / (n * (n - 1)), 6)
      |       ELSE CAST(0.0 AS DOUBLE) END AS ioc
      |FROM s ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.functions.GraftExpressions.register(spark)
    Tables.documents(spark, dir)
      // empty/null docs are excluded on BOTH sides: the oracle's
      // hex/UNNEST formulation drops them implicitly (no bytes, no rows)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        graft.functions.GraftExpressions.byteHist(col("text").cast("binary")).as("h"))
      .select(col("doc_id"), col("h.n").as("n_bytes"),
        col("h.distinct").as("distinct_bytes"),
        round(col("h.maxc").cast("double") / col("h.n"), 6).as("max_byte_ratio"),
        when(col("h.n") > 1,
          round(col("h.coll").cast("double") / (col("h.n") * (col("h.n") - 1)), 6))
          .otherwise(lit(0.0)).as("ioc"))
      .orderBy("doc_id")
  }

  /** Per-media-type rollup of DECODED features through the typed path:
    * `assets → mapPartitions decode (stub) → groupByKey(mediaType) →
    * custom typed Aggregator` — the object-serialized Dataset surface
    * under the oracle gate (m1–m3 gate the expression path; this gates
    * `KeyValueGroupedDataset.agg` with mergeable partial state). The
    * oracle re-derives each asset's mean byte value from the text bytes
    * via the m2 histogram formulation, so the decode stub's arithmetic
    * is pinned end-to-end. Mean-of-means uses the s4 fixed-point
    * quantization — exact integer partials, one final division.
    */
  val m4TypedRollup: Q = Q.sql(
    "m4_typed_feature_rollup",
    "Typed-Aggregator rollup of decoded features per media type (asset count, bytes, mean byte).",
    """WITH b AS (
      |  SELECT doc_id, UNNEST(regexp_extract_all(hex(encode(text)), '[0-9A-F]{2}')) AS byte
      |  FROM documents),
      |per AS (SELECT doc_id, SUM(('0x' || byte)::BIGINT) AS bsum, COUNT(*) AS n
      |        FROM b GROUP BY 1),
      |feat AS (
      |  SELECT d.doc_id,
      |    CASE WHEN d.doc_id % 3 = 0 THEN 'image'
      |         WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    octet_length(encode(d.text)) AS n_bytes,
      |    CASE WHEN p.n IS NULL OR p.n = 0 THEN 0.0
      |         ELSE CAST(p.bsum AS DOUBLE) / p.n END AS mean_byte
      |  FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id)
      |SELECT media_type, COUNT(*) AS n_assets,
      |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
      |  CAST(SUM(CAST(FLOOR(mean_byte * 10000000.0) AS BIGINT)) AS DOUBLE)
      |    / 10000000.0 / COUNT(*) AS mean_mean_byte
      |FROM feat GROUP BY 1 ORDER BY media_type""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    decodeStub(assets(spark, dir))
      .groupByKey(_.mediaType)
      .agg(graft.functions.FeatureRollup().toColumn.name("r"))
      .select(col("key").as("media_type"),
        col("r._1").as("n_assets"), col("r._2").as("sum_bytes"),
        col("r._3").as("mean_mean_byte"))
      .orderBy("media_type")
  }

  /** Frame sampling under the gate: video assets explode to every 4th
    * frame index — the fan-out a real decoder feeds downstream feature
    * extraction (the decode itself is the honest stub in
    * [[sampleFrames]]/[[decodeStub]]; the dataflow — explode shape,
    * deterministic metadata — is what this query pins). The video
    * predicate is applied to the SOURCE frame, before the typed asset
    * map copies any payload bytes — nothing pushes below an
    * object-serialization boundary on its own.
    */
  val m3FrameSample: Q = Q.sql(
    "m3_frame_sample",
    "Every-4th-frame sampling of video assets (1-to-frames explode).",
    """SELECT doc_id, u.f AS frame_idx
      |FROM (SELECT doc_id, UNNEST(range(0, n_chars % 24 + 1)) AS f
      |      FROM documents WHERE doc_id % 3 = 2) u
      |WHERE u.f % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    sampleFrames(assetsFrom(
        Tables.documents(spark, dir).filter(col("doc_id") % 3 === 2)), everyK = 4)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }

  private val SHARD_BYTES = 4096
  private val SHARDS = 8

  /** WebDataset-style shard manifest — the multimodal batch-construction
    * step: assets are deterministically shuffled (md5 order — training
    * wants decorrelated neighbors), split across [[SHARDS]] hash shards,
    * and packed into [[SHARD_BYTES]]-byte archive members with byte
    * offsets. Byte-budget twin of `p6_sequence_pack`'s token budget: one
    * shuffle on the shard key + a per-shard cumulative-sum window; shard
    * count is the free parallelism knob at 100 TB (shards are
    * independent by construction), and the emitted (pack_id, offset)
    * pairs ARE the tar-member layout a writer needs.
    */
  val m5ShardPack: Q = Q.sql(
    "m5_shard_pack",
    s"Shard manifest: md5-shuffled assets packed into $SHARD_BYTES-byte members across $SHARDS shards.",
    s"""WITH a AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % $SHARDS AS shard,
       |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, shard, n_bytes,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS seq,
       |    SUM(n_bytes) OVER (PARTITION BY shard ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM a)
       |SELECT doc_id, shard, CAST(seq AS BIGINT) AS seq,
       |  CAST(n_bytes AS BIGINT) AS n_bytes,
       |  CAST((cum - n_bytes) // $SHARD_BYTES AS BIGINT) AS pack_id,
       |  CAST((cum - n_bytes) % $SHARD_BYTES AS BIGINT) AS pack_offset
       |FROM c ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val a = Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        pmod(DetHash.md5Long28(col("doc_id").cast("string")), lit(SHARDS)).as("shard"),
        DetHash.md5Long60(col("doc_id").cast("string")).as("h"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    a.withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n_bytes"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("shard"), col("seq"), col("n_bytes"),
        expr(s"cast((cum - n_bytes) div $SHARD_BYTES as bigint)").as("pack_id"),
        pmod(col("cum") - col("n_bytes"), lit(SHARD_BYTES.toLong)).as("pack_offset"))
      .orderBy("doc_id")
  }

  private val SIG_PLANES = 16
  private val SIG_BANDS = 2
  private val SIG_HAMMING_MAX = 1

  /** Payload-signature near-dup: a CENTERED SimHash over each asset's
    * BYTE histogram — the codec-free analog of a perceptual hash.
    * Projection weights are md5-derived integers computed IN-QUERY from
    * the (plane, byte) label, so both engines build bit-identical
    * codebooks with no literal tables.
    *
    * Centering is what makes the signature informative: same-language
    * text has a nearly CONSTANT byte distribution, so raw sign bits
    * agree corpus-wide (measured: 60% of all pairs landed within
    * hamming 1 of each other). Each plane's bit is therefore the sign
    * of the doc's projection relative to the corpus-average direction:
    * bit_p = [T·dot_p − n_doc·G_p > 0] with T = total corpus bytes and
    * G_p = Σ_docs dot_p — all-integer (DECIMAL(38,0) products, exact in
    * both engines), splitting each plane ~50/50 across the corpus so
    * only genuinely similar payloads collide.
    *
    * Scale shape: histogram → signature is a map-side fan-out through a
    * broadcast 16×256 weight table + one (doc, plane) aggregate; the
    * 17-value global frame (16 plane sums + total bytes) broadcasts
    * back; candidate pairs meet on a BAND equi-join ([[SIG_BANDS]]
    * 8-bit bands — pigeonhole-lossless for hamming ≤
    * [[SIG_HAMMING_MAX]]), then exact hamming verifies. The d4 SimHash
    * shape applied to binary payloads instead of token streams.
    */
  val m6PayloadSig: Q = Q.sql(
    "m6_payload_signature",
    s"Centered byte-histogram SimHash ($SIG_PLANES planes): near-dup payload pairs at hamming <= $SIG_HAMMING_MAX via banded join.",
    s"""WITH b AS (
       |  SELECT doc_id, UNNEST(regexp_extract_all(hex(encode(text)), '[0-9A-F]{2}')) AS byte
       |  FROM documents WHERE length(text) > 0),
       |c AS (SELECT doc_id, byte, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
       |pw AS (
       |  SELECT p.p, bb.byte,
       |         ('0x' || substring(md5('pw-' || p.p || '-' || bb.byte), 1, 7))::BIGINT % 1000 - 500 AS w
       |  FROM (SELECT UNNEST(range($SIG_PLANES)) AS p) p
       |  CROSS JOIN (SELECT DISTINCT byte FROM c) bb),
       |dots AS (
       |  SELECT c.doc_id, pw.p, SUM(c.cnt * pw.w) AS dot, SUM(c.cnt) AS n_doc
       |  FROM c JOIN pw ON c.byte = pw.byte GROUP BY 1, 2),
       |g AS (SELECT p, SUM(dot) AS gp, SUM(n_doc) AS tot FROM dots GROUP BY p),
       |sig AS (
       |  SELECT d.doc_id,
       |         CAST(SUM(CASE WHEN CAST(d.dot AS HUGEINT) * g.tot
       |                            - CAST(d.n_doc AS HUGEINT) * g.gp > 0
       |                       THEN 1 << d.p ELSE 0 END) AS BIGINT) AS sig
       |  FROM dots d
       |  JOIN g ON d.p = g.p
       |  GROUP BY d.doc_id)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       a.sig AS sig_a, b.sig AS sig_b,
       |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b
       |  ON a.doc_id < b.doc_id
       | AND (a.sig % 256 = b.sig % 256 OR a.sig // 256 = b.sig // 256)
       |WHERE bit_count(xor(a.sig, b.sig)) <= $SIG_HAMMING_MAX
       |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    // bytes of the payload as 2-hex-char tokens (uppercase both engines);
    // Spark's split keeps a trailing empty token — drop it
    val bytes = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(split(hex(col("text").cast("binary")), "(?<=\\G..)")).as("byte"))
      .filter(col("byte") =!= "")
    val c = bytes.groupBy(col("doc_id"), col("byte")).agg(count(lit(1)).as("cnt"))
    // md5-derived (plane, byte) weight table: 16×256, broadcast
    val planes = spark.range(SIG_PLANES).select(col("id").cast("int").as("p"))
    val allBytes = spark.range(256)
      .select(format_string("%02X", col("id")).as("wbyte"))
    val pw = planes.crossJoin(allBytes)
      .select(col("p"), col("wbyte"),
        (DetHash.md5Long28(concat(lit("pw-"), col("p").cast("string"),
          lit("-"), col("wbyte"))) % 1000 - 500).as("w"))
    // n_doc rides the same (doc, plane) aggregate for free: each byte
    // contributes once per group, so SUM(cnt) = doc length on every plane
    val dots = c.join(broadcast(pw), col("byte") === col("wbyte"))
      .groupBy(col("doc_id"), col("p"))
      .agg(sum(col("cnt") * col("w")).as("dot"), sum(col("cnt")).as("n_doc"))
      // 2 consumers (plane globals + the sign pass) — checkpoint so the
      // histogram join runs once
      .localCheckpoint()
    // corpus-center frame: 16 rows (plane sum + total bytes), broadcast
    val g = dots.groupBy(col("p"))
      .agg(sum(col("dot")).as("gp"), sum(col("n_doc")).as("tot"))
    val centered = expr(
      "cast(dot as decimal(38,0)) * tot - cast(n_doc as decimal(38,0)) * gp")
    val sig = dots
      .join(broadcast(g.withColumnRenamed("p", "gp_p")), col("p") === col("gp_p"))
      .withColumn("bit", when(centered > 0, expr("shiftleft(1L, p)")).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("bit")).as("sig"))
      .localCheckpoint() // 3 consumers below (2 band sides + the verify join)
    // banded candidates: equal low byte OR equal high byte → two
    // equi-joins unioned, exactly the d4 shape (never an OR theta-join)
    val cand = (0 until SIG_BANDS).map { band =>
      val bandCol = if (band == 0) col("sig") % 256 else expr("sig div 256")
      val l = sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
        bandCol.as("band"))
      val r = sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        bandCol.as("band2"))
      l.join(r, col("band") === col("band2") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
    }.reduce(_ union _).distinct()
    cand
      .withColumn("hamming",
        bit_count(expr("sig_a ^ sig_b")).cast("bigint"))
      .filter(col("hamming") <= SIG_HAMMING_MAX)
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Q] = Seq(m1Meta, m2PayloadStats, m3FrameSample, m4TypedRollup,
    m5ShardPack, m6PayloadSig)
}
