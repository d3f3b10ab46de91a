package graft.ops

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executes every registered query at sf0.001 (smoke: runs + schema
  * sanity) plus targeted hand-checked assertions per operator family.
  * Full value-level correctness is the DuckDB-oracle gate
  * (tools/check_oracle.py at sf0.01); these specs protect the invariants
  * the oracle can't see (plan shapes, internal consistency).
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("registry names are unique and every query has distinct columns") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} executes at sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      // duplicate column names would make the driver's sorted-column
      // oracle compare ambiguous
      assert(df.columns.distinct.length === df.columns.length,
        s"duplicate columns: ${df.columns.mkString(",")}")
      assert(df.count() >= 0)
    }
  }

  test("q1_agg: 6 (returnflag, linestatus) groups, counts sum to table size") {
    val rows = Relational.q1Agg.run(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total === graft.Tables.lineitem(spark, sf).count())
  }

  test("q5_topk returns exactly 10 descending revenues") {
    val revs = Relational.q5TopK.run(spark, sf).collect().map(_.getAs[Double]("revenue"))
    assert(revs.length === 10)
    assert(revs.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q9: semi + anti partition the customer table") {
    val rows = Relational.q9SemiAnti.run(spark, sf)
    assert(rows.count() === graft.Tables.customer(spark, sf).count())
  }

  test("c2: every attempt collects exactly its events (Σ sizes = event count)") {
    val g = Caliper.c2GroupedAttempts.run(spark, sf).collect()
    val total = g.map(_.getAs[Long]("n_events")).sum
    assert(total === graft.Tables.events(spark, sf).count())
  }

  test("c3: fan-out multiplies rows by exactly 3") {
    assert(Caliper.c3Fanout.run(spark, sf).count() ===
      3 * graft.Tables.orders(spark, sf).count())
  }

  test("d4: reported pairs all satisfy the hamming bound") {
    val pairs = Dedup.d4SimHash.run(spark, sf).collect()
    assert(pairs.forall(_.getAs[Int]("hamming") <= 2))
  }

  test("d2 prefix filtering is lossless: equals the naive full inverted index") {
    val pref = Dedup.jaccardPairsPrefix(spark, sf, 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))).toSet
    val naive = Dedup.jaccardPairsNaive(spark, sf, 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))).toSet
    assert(pref === naive)
  }

  test("d2/d3 agree: LSH-verified dups ⊇ exact-Jaccard pairs at 0.8") {
    val exact = Dedup.d2NgramJaccard.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = Dedup.d3MinHashLsh.run(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.8)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(exact.subsetOf(lsh))
  }

  test("d8 asymmetric prefix filter is lossless: equals the naive containment join") {
    val pref = Dedup.d8Containment.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("overlap_coef"))).toSet
    val naive = Dedup.containmentPairsNaive(spark, sf, 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("overlap_coef"))).toSet
    assert(pref === naive)
  }

  test("d8 ⊇ d2: overlap coefficient dominates jaccard at the same threshold") {
    val jac = Dedup.d2NgramJaccard.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val cont = Dedup.d8Containment.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(jac.subsetOf(cont))
  }

  test("q38: two-phase sweep equals a driver-side sweep over the w2 sessions") {
    val sessions = EventWindows.w2Session.run(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[java.sql.Timestamp]("session_end").getTime))
    val bounds = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .sortBy { case (t, d) => (t, d) }
    var running = 0L
    val perHour = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    bounds.foreach { case (t, d) =>
      running += d
      val hour = math.floorDiv(t, 3600000L) * 3600000L
      val (mx, n) = perHour.getOrElse(hour, (Long.MinValue, 0L))
      perHour(hour) = (math.max(mx, running), n + 1)
    }
    assert(running === 0L) // every opened session closes
    val got = Relational.q38PeakConcurrency.run(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
        (r.getAs[Long]("peak_concurrent"), r.getAs[Long]("n_boundaries"))))
      .toMap
    assert(got === perHour.toMap)
  }

  test("dp4: exact-arithmetic corr matches Spark's built-in corr to 1e-6") {
    val li = graft.Tables.lineitem(spark, sf)
    val builtin = li.agg(
      corr(col("l_quantity"), col("l_extendedprice")),
      corr(col("l_quantity"), col("l_discount")),
      corr(col("l_extendedprice"), col("l_discount"))).first()
    val got = Relational.dp4Correlation.run(spark, sf).collect()
      .map(r => (r.getAs[String]("col_x"), r.getAs[String]("col_y")) ->
        r.getAs[Double]("corr")).toMap
    assert(math.abs(got(("l_quantity", "l_extendedprice")) - builtin.getDouble(0)) < 1e-6)
    assert(math.abs(got(("l_quantity", "l_discount")) - builtin.getDouble(1)) < 1e-6)
    assert(math.abs(got(("l_extendedprice", "l_discount")) - builtin.getDouble(2)) < 1e-6)
  }

  test("s1: each probe gets exactly top-10, ranks 1..10, cosine non-increasing") {
    val rows = Similarity.s1AnnBruteForce.run(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size === 10)
    byProbe.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 10))
      val cos = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("w2: session counts sum to the event count") {
    val s = EventWindows.w2Session.run(spark, sf).collect()
    assert(s.map(_.getAs[Long]("n_events")).sum ===
      graft.Tables.events(spark, sf).count())
  }

  test("multimodal resize: images really rescaled and still decodable") {
    val resized = Multimodal.resize(Multimodal.assets(spark, sf), maxSide = 6).collect()
    val images = resized.filter(_.meta.mediaType == "image")
    assert(images.nonEmpty)
    images.foreach { a =>
      assert(a.meta.width <= 6 && a.meta.height <= 6)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.content))
      assert(img.getWidth === a.meta.width && img.getHeight === a.meta.height)
      assert(a.content.length.toLong === a.meta.nBytes)
    }
    // non-image payloads pass through untouched
    assert(resized.filter(_.meta.mediaType == "audio").forall(_.meta.height == 1))
  }

  test("multimodal frame sampling: every 4th frame, decoded mean in range") {
    val assets = Multimodal.assets(spark, sf)
    val frames = Multimodal.sampleFrames(assets, everyK = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Long]("frame_idx") % 4 === 0))
    val videoIds = assets.filter(_.meta.mediaType == "video").collect().map(_.doc_id).toSet
    assert(frames.map(_.getAs[Long]("doc_id")).toSet.subsetOf(videoIds))
    assert(frames.forall { r =>
      val m = r.getAs[Double]("frame_mean"); m >= 0.0 && m < 256.0
    })
  }

  test("multimodal decode: real codec path preserves ids, means in range") {
    val feats = Multimodal.decode(Multimodal.assets(spark, sf)).collect()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(feats.length === docs)
    assert(feats.forall(f => f.meanByte >= 0 && f.meanByte < 256))
    // featureDim reflects the decoded channel count per type
    assert(feats.filter(_.mediaType == "image").forall(_.featureDim == 3))
    assert(feats.filter(_.mediaType == "audio").forall(_.featureDim == 1))
  }

  test("d5: blocked theta-join equals the naive all-pairs join") {
    val n = Dedup.normedVectors(spark, sf)
    val cos = Dedup.cosineCol(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"))
    val naive = n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), cos.as("c"))
      .filter(col("c") >= 0.4)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 6).as("cosine"))
    val blocked = Dedup.d5EmbeddingCosine.run(spark, sf)
    assert(blocked.exceptAll(naive).isEmpty && naive.exceptAll(blocked).isEmpty,
      "grid join diverges from the all-pairs join")
  }

  test("d6: clusters cover every dup pair, cluster_id is the member minimum") {
    val clusters = Dedup.d6DedupClusters.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.d2NgramJaccard.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid is not its member minimum")
    }
  }

  test("p2: split is deterministic and ratios are hash-uniform-ish") {
    val s1 = Curation.p2HashSplit.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2))
    val s2 = Curation.p2HashSplit.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2))
    assert(s1.toSeq === s2.toSeq, "split not reproducible")
    val frac = s1.count(_._2 == "train").toDouble / s1.length
    assert(frac > 0.65 && frac < 0.92, s"train fraction $frac implausible for 80%")
  }

  test("q29: spine is dense (users x hours) and observed rows carry their own value") {
    val rows = Relational.q29GapFill.run(spark, sf)
    val users = rows.select("user_id").distinct().count()
    val hours = rows.select("hour").distinct().count()
    assert(rows.count() === users * hours, "gap-filled spine is not dense")
    val observedMismatch = rows
      .filter(col("observed") && col("v_filled").isNull).count()
    assert(observedMismatch === 0, "an observed bucket lost its value")
  }

  test("p3: admitted batch docs collide with no corpus content key") {
    val admitted = Curation.p3IncrementalDedup.run(spark, sf)
      .select("content_key")
    val corpus = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 250)
      .select(md5(lower(trim(col("text")))).as("content_key")).distinct()
    assert(admitted.join(corpus, "content_key").count() === 0,
      "an admitted doc duplicates the corpus")
  }

  test("p3: dedup logic verified on synthetic duplicates (the sf corpora have none)") {
    // the bundled testdata has zero duplicate normalized texts at the
    // verified scales, so the oracle row alone cannot catch a regression
    // in the anti-join or the keep-min — drive the query over a crafted
    // corpus where every branch fires
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_p3").toString
    try {
      Seq(
        (1L, "alpha text body"),       // corpus
        (2L, "beta text body"),        // corpus
        (300L, "ALPHA text body "),    // batch, corpus dup after normalize → rejected
        (301L, "gamma text body"),     // batch, novel — survivor of 301/302
        (302L, "Gamma Text Body".toLowerCase), // batch dup of 301 → folded in
        (303L, "delta text body"))     // batch, novel singleton
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = Curation.p3IncrementalDedup.run(spark, dir)
        .select("doc_id", "batch_copies").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(301L -> 2L, 303L -> 1L),
        s"incremental dedup admitted the wrong set: $out")
    } finally graft.TestSpark.deleteRecursively(dir)
  }

  test("s5: per-vector neighbour ranks are 1..k, cosine non-increasing") {
    val rows = Similarity.s5KnnJoin.run(spark, sf)
      .select("vec_id", "rnk", "cosine").collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (vid, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length).toSeq,
        s"vector $vid has gapped ranks")
      val cosines = sorted.map(_.getDouble(2)).toSeq
      assert(cosines === cosines.sorted.reverse, s"vector $vid cosine not monotone")
    }
  }

  test("q28: detail rows aggregate to their grouping-set totals") {
    val rows = Relational.q28GroupingSets.run(spark, sf).collect()
    val detailN = rows.filter(_.getLong(4) == 0L).map(_.getLong(2)).sum
    val perPriorityN = rows.filter(_.getLong(4) == 2L).map(_.getLong(2)).sum
    val grandN = rows.filter(_.getLong(4) == 3L).map(_.getLong(2)).sum
    assert(detailN === grandN, "detail counts do not sum to the grand total")
    assert(perPriorityN === grandN, "per-priority counts do not sum to the grand total")
  }

  test("p5: every domain keeps at most its quota, ranks contiguous from 1") {
    val rows = Curation.p5DomainQuota.run(spark, sf)
      .select("source", "quota_rank").collect()
      .groupBy(_.getString(0))
    rows.foreach { case (src, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks.length <= 10, s"domain $src over quota: ${ranks.length}")
      assert(ranks === (1L to ranks.length).toSeq, s"domain $src ranks gapped")
    }
  }

  test("p6: pack_id equals floor(tokens-before/budget) within each shard") {
    val rows = Curation.p6SequencePack.run(spark, sf)
      .select("shard", "doc_id", "n_tokens", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, doc, n, pack) =>
        assert(pack === cum / 512, s"shard $shard doc $doc: pack $pack != ${cum / 512}")
        cum += n
      }
    }
  }

  test("t9: repetition ratios are consistent rationals in (0, 1]") {
    Textish.t9Rows(spark, sf).foreach { case (doc, n, nd, dr, twr) =>
      assert(nd <= n, s"doc $doc distinct > total")
      assert(math.abs(dr - nd.toDouble / n) < 1e-6, s"doc $doc distinct_ratio off")
      // outputs are ROUND(·, 6); allow half an ulp of that rounding
      assert(twr >= 1.0 / nd - 5e-7 && twr <= 1.0, s"doc $doc top_word_ratio $twr out of range")
    }
  }

  test("t10: hapax and rarity bounds hold against the corpus") {
    val rows = TextAnalysis.t10Commonness.run(spark, sf)
      .select("doc_id", "n_tokens", "min_cf", "n_hapax", "mean_freq").collect()
    rows.foreach { r =>
      val (doc, n, minCf, hapax, mf) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(minCf >= 1, s"doc $doc min_cf < 1")
      assert(hapax <= n, s"doc $doc more hapax than tokens")
      // every token occurs at least min_cf times, so the mean frequency
      // is at least min_cf / total — and at most 1
      assert(mf > 0.0 && mf <= 1.0, s"doc $doc mean_freq $mf out of range")
    }
  }

  test("s6: reconstruction error bounded by half a quantization step") {
    val errs = Similarity.s6Quantize.run(spark, sf)
      .join(graft.Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          ((array_max(col("embedding").cast("array<double>")) -
            array_min(col("embedding").cast("array<double>"))) / 510.0).as("half_step")),
        "vec_id")
      .select("vec_id", "max_abs_err", "half_step").collect()
    errs.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-7,
        s"vec ${r.getLong(0)}: max err ${r.getDouble(1)} exceeds half step ${r.getDouble(2)}")
    }
  }

  test("q31: salted join result equals the plain unsalted join") {
    import graft.Tables
    val plain = Tables.events(spark, sf)
      .select(when(col("event_id") % 4 < 3, lit(0L))
          .otherwise(col("event_id") % 25).as("nkey"), col("value"))
      .join(Tables.nation(spark, sf)
        .select(col("n_nationkey").cast("long").as("nkey"), col("n_name")), "nkey")
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Relational.q31SaltedJoin.run(spark, sf)
      .select("nation", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain, "salting changed the join result")
  }

  test("q32: exactly one row per user and it carries the max ts") {
    val rows = Relational.q32LatestPerKey.run(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 1).count()
    assert(rows === 0, "a user has multiple 'latest' rows")
    val bad = Relational.q32LatestPerKey.run(spark, sf).as("l")
      .join(graft.Tables.events(spark, sf).as("e"),
        col("l.user_id") === col("e.user_id") && col("e.ts") > col("l.ts"))
      .count()
    assert(bad === 0, "an event is newer than its user's 'latest' row")
  }

  test("p7: kept within totals and aggregate rate near 20%") {
    val rows = Curation.p7StratifiedSample.run(spark, sf)
      .select("n_kept", "n_total").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (k, t) => assert(k <= t, "kept exceeds stratum total") }
    val (kept, total) = rows.foldLeft((0L, 0L)) { case ((a, b), (k, t)) => (a + k, b + t) }
    val rate = kept.toDouble / total
    assert(rate > 0.08 && rate < 0.35, s"overall sample rate $rate implausible for 20%")
  }

  test("t11: pairs are ordered, cosine in [0.5, 1], and no self-pairs") {
    val rows = TextAnalysis.t11TfidfCosine.run(spark, sf)
      .select("doc_a", "doc_b", "cosine").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not ordered doc_a < doc_b")
      val c = r.getDouble(2)
      assert(c >= 0.5 - 1e-9 && c <= 1.0 + 1e-9, s"cosine $c out of range")
    }
  }

  test("q33: rank reaches each group's size only with ties absent; tiles in 1..4") {
    val rows = Relational.q33RankFamily.run(spark, sf)
      .select("event_type", "rnk", "cdist", "tile").collect()
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.map(_.getLong(3)).forall(t => t >= 1 && t <= 4), s"$et tile out of 1..4")
      // cume_dist of the maximum value is exactly 1.0 in every engine
      assert(rs.map(_.getDouble(2)).max === 1.0, s"$et cume_dist never reaches 1")
    }
  }

  test("e3: JSONL roundtrip aggregates equal the parquet-derived ones") {
    import graft.functions.DetHash
    val fromParquet = graft.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(DetHash.md5Long28(col("text"))).as("text_checksum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fromJson = EtlQueries.e3JsonlRoundtrip.run(spark, sf)
      .select("source", "n_docs", "text_checksum")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromJson === fromParquet, "JSONL roundtrip lost or mangled documents")
  }

  test("m4: typed rollup counts cover every document exactly once") {
    val rows = Multimodal.m4TypedRollup.run(spark, sf)
      .select("n_assets", "mean_mean_byte").collect()
    val total = rows.map(_.getLong(0)).sum
    assert(total === graft.Tables.documents(spark, sf).count(),
      "rollup lost or duplicated assets")
    // decoded channel/sample values follow the near-uniform payload
    // formulas (mod-256 arithmetic), so every per-type mean sits close
    // to 127.5
    rows.foreach(r => assert(r.getDouble(1) > 100.0 && r.getDouble(1) < 156.0,
      s"implausible mean channel value ${r.getDouble(1)}"))
  }

  test("w8: kept set equals an independent in-memory greedy debounce") {
    val kept = EventWindows.w8Debounce.run(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var last = Long.MinValue
      es.sortBy(e => (e._3, e._2)).toSeq.flatMap { case (u, id, us) =>
        if (last == Long.MinValue || us >= last + 300000000L) { last = us; Some((u, id)) }
        else None
      }
    }.toSet
    assert(kept === expected, "debounce diverged from the reference greedy scan")
    assert(kept.size < events.length, "debounce dropped nothing — vacuous data")
  }

  test("d7: kept docs + absorbed dups account for the whole corpus") {
    val rows = Dedup.d7DedupApply.run(spark, sf)
      .select("n_removed").collect().map(_.getLong(0))
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length + rows.sum === total,
      s"${rows.length} kept + ${rows.sum} removed != $total docs")
  }

  test("p8: copy counts bracket the weight and totals track it") {
    val rows = Curation.p8MixtureResample.run(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("copies"),
        first(col("weight")).as("w"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    rows.foreach { case (copies, w) =>
      assert(copies === math.floor(w).toLong || copies === math.floor(w).toLong + 1,
        s"copies $copies outside floor/ceil of weight $w")
    }
    // docs with fractional weight 0 must appear exactly floor(w) times;
    // the emitted total should track the expected weight mass loosely
    val emitted = rows.map(_._1).sum.toDouble
    val expected = Curation.p8MixtureResample.run(spark, sf)
      .select("doc_id", "weight").distinct()
      .agg(sum(col("weight"))).collect()(0).getDouble(0)
    assert(math.abs(emitted - expected) / expected < 0.35,
      s"emitted $emitted far from weight mass $expected")
  }

  test("g1: every node keeps >= teleport rank and ids round-trip entity keys") {
    val rows = Graph.g1PageRank.run(spark, sf)
      .select("node_id", "entity", "entity_key", "deg", "rank_fp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (node, entity, key, deg, rank) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // teleport term is the floor of every iteration's update
      assert(rank >= 150000L, s"node $node rank $rank below teleport floor")
      assert(deg >= 1L)
      if (entity == "customer") assert(node === 2 * key)
      else { assert(entity === "supplier"); assert(node === 2 * key + 1) }
    }
    // fixed-point iteration is deterministic: a rerun is bit-identical
    val again = Graph.g1PageRank.run(spark, sf)
      .select("node_id", "rank_fp").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq === rows.map(r => (r.getLong(0), r.getLong(4))).toSeq)
  }

  test("q35: one current row per customer; intervals chain without overlap") {
    val rows = Relational.q35Scd2.run(spark, sf)
      .select("o_custkey", "valid_from", "valid_to", "is_current").collect()
    val byCust = rows.groupBy(_.getLong(0))
    byCust.foreach { case (cust, rs) =>
      assert(rs.count(_.getBoolean(3)) === 1, s"customer $cust current-row count != 1")
      // rows arrive ordered (valid_from, orderkey); each valid_to must
      // equal the next row's valid_from (contiguous history chain)
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(2) === b.get(1),
            s"customer $cust: interval break ${a.get(2)} vs ${b.get(1)}")
        case _ => ()
      }
      assert(rs.last.getBoolean(3), s"customer $cust: current row not last")
    }
  }

  test("dp1: profile metrics are internally consistent with the table") {
    val li = graft.Tables.lineitem(spark, sf)
    val n = li.count()
    val rows = Relational.dp1Profile.run(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("l_extendedprice", "l_quantity", "l_returnflag", "l_shipdate"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_nulls") === 0L)
      val d = r.getAs[Long]("n_distinct")
      assert(d >= 1L && d <= n)
      assert(r.getAs[String]("min_str") <= r.getAs[String]("max_str") ||
        r.getString(0) == "l_extendedprice") // lexicographic vs numeric order
    }
    val rf = rows.find(_.getString(0) == "l_returnflag").get
    assert(rf.getAs[Long]("n_distinct") ===
      li.select(countDistinct(col("l_returnflag"))).collect()(0).getLong(0))
  }

  test("s7: augmented-cosine witness orders exactly like the raw dot product") {
    val rows = Similarity.s7Mips.run(spark, sf)
      .select("probe_id", "rank", "dot", "aug_cosine").collect()
    rows.groupBy(_.getLong(0)).foreach { case (probe, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      // within a probe, both scores must be non-increasing along ranks —
      // the monotone-map property the MIPS→cosine reduction rests on
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(2) >= b.getDouble(2), s"probe $probe: dot not sorted")
          assert(a.getDouble(3) >= b.getDouble(3),
            s"probe $probe: aug_cosine order diverges from dot order")
        case _ => ()
      }
    }
  }

  test("q36: merged state+delta equals a direct aggregate") {
    val merged = Relational.q36IncrementalAgg.run(spark, sf)
      .select("event_type", "n", "sum_value", "min_value", "max_value").collect()
    val direct = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"),
        min(col("value")).cast("double").as("min_value"),
        max(col("value")).cast("double").as("max_value"))
      .orderBy("event_type")
      .collect()
    assert(merged.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
  }

  test("g4: triangle counts respect the degree bound and clustering is in [0,1]") {
    val rows = Graph.g4TriangleCount.run(spark, sf)
      .select("supp_key", "deg", "triangles", "clustering").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getLong(1); val tri = r.getLong(2); val c = r.getDouble(3)
      // a node's triangles are pairs of its neighbours: tri <= C(deg, 2)
      assert(tri <= deg * (deg - 1) / 2, s"node ${r.getLong(0)}: $tri > C($deg,2)")
      assert(c >= 0.0 && c <= 1.0, s"clustering $c out of range")
    }
  }

  test("dp5: every emitted outlier is beyond 3 sigma, and only those") {
    val rows = Relational.dp5Outliers.run(spark, sf).select("z").collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0)) > 3.0,
      s"z=${r.getDouble(0)} inside the 3-sigma band"))
  }

  test("d9: kept iff no earlier in-cell near-dup; every vector is accounted for") {
    val rows = Dedup.d9SemanticDedup.run(spark, sf)
      .select("vec_id", "n_earlier_dups", "kept").collect()
    assert(rows.length ===
      graft.Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert((r.getLong(1) == 0L) === r.getBoolean(2),
        s"vec ${r.getLong(0)}: kept flag inconsistent with dup count")
    }
  }

  test("s10: packed codes stay in the 8x4-bit range, errors non-negative") {
    val rows = Similarity.s10PqEncode.run(spark, sf)
      .select("pq_code", "recon_err").collect()
    val bound = math.pow(16, 8).toLong
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < bound)
      assert(r.getDouble(1) >= 0.0)
    }
  }

  test("p11: the curriculum sequence is a permutation with monotone difficulty") {
    val rows = Curation.p11Curriculum.run(spark, sf)
      .select("seq", "n_tokens").collect()
    val seqs = rows.map(_.getLong(0))
    assert(seqs.distinct.length === rows.length)
    assert(seqs.min === 0L && seqs.max === rows.length - 1L)
    val byseq = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    byseq.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "difficulty not monotone along seq")
      case _ => ()
    }
  }

  test("w13: matched rows equal w7's inner join; total covers every purchase") {
    val outer = StreamingQueries.w13StreamOuterJoin.run(spark, sf)
      .select("purchase_id", "matched", "gap_us").collect()
    val inner = StreamingQueries.w7StreamJoin.run(spark, sf)
      .select("purchase_id", "gap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val matched = outer.filter(_.getBoolean(1))
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(matched === inner, "outer join's matched rows diverge from the inner join")
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(outer.map(_.getLong(0)).distinct.length === purchases,
      "some purchase emitted no row at all")
  }

  test("t15: bucket k spans ranks [2^k, 2^(k+1)) and term counts close the vocab") {
    val rows = TextAnalysis.t15Zipf.run(spark, sf)
      .select("bucket", "n_terms").collect()
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .select(countDistinct(col("t"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum === vocab)
    rows.foreach { r =>
      // bucket k can hold at most 2^k ranks
      assert(r.getLong(1) <= (1L << r.getLong(0)),
        s"bucket ${r.getLong(0)} overfull: ${r.getLong(1)}")
    }
  }

  test("m6: reported pairs satisfy the hamming bound and bands really pigeonhole") {
    val rows = Multimodal.m6PayloadSig.run(spark, sf)
      .select("sig_a", "sig_b", "hamming").collect()
    rows.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(java.lang.Long.bitCount(a ^ b) === h)
      assert(h <= 1)
      // hamming <= 1 over 16 bits → the differing bit sits in ONE band,
      // so the other 8-bit band must match exactly (the join's guarantee)
      assert(a % 256 == b % 256 || a / 256 == b / 256)
    }
  }

  test("g5: every survivor has core degree >= k, and survivors are a fixpoint") {
    val rows = Graph.g5KCore.run(spark, sf)
      .select("supp_key", "core_deg").collect()
    // the peel converged (verified for the gate data), so the emitted
    // induced degrees must all satisfy the core bound
    rows.foreach(r => assert(r.getLong(1) >= 3,
      s"node ${r.getLong(0)} survived with degree ${r.getLong(1)} < 3"))
  }

  test("w14: full outer = w13's left outer + click_only rows; sides partition") {
    val full = StreamingQueries.w14StreamFullOuter.run(spark, sf)
      .select("purchase_id", "click_ts", "side").collect()
    val sides = full.map(_.getString(2)).groupBy(identity).view.mapValues(_.length).toMap
    assert(sides.keySet.subsetOf(Set("matched", "purchase_only", "click_only")))
    val left = StreamingQueries.w13StreamOuterJoin.run(spark, sf).count()
    assert(full.count(_.getString(2) != "click_only") === left,
      "full outer's purchase-side rows diverge from the left outer join")
    // every click is accounted for exactly once as matched or click_only
    val clicks = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(full.count(_.getString(2) != "purchase_only") === clicks,
      "full outer's click-side rows don't cover the clicks exactly")
  }

  test("w15: timeout-evicted sessions equal the batch sessionizer's") {
    val streamed = StreamingQueries.w15StreamTimeoutSessions.run(spark, sf)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3))).toSet
    val batch = StreamingQueries.w6CustomSessionizer.run(spark, sf)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3))).toSet
    assert(streamed === batch,
      "event-time-timeout sessions diverge from the batch state machine")
  }

  test("q40: offset-0 retention is total (signup week is itself active)") {
    val rows = Relational.q40Retention.run(spark, sf)
      .select("week_offset", "n_active", "cohort_size", "retention").collect()
    rows.filter(_.getLong(0) == 0L).foreach { r =>
      assert(r.getLong(1) === r.getLong(2), "cohort user inactive in own signup week")
      assert(r.getDouble(3) === 1.0)
    }
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(2)))
  }

  test("dp7: grid closes — per-type o sums to r, grand total to n") {
    val rows = Relational.dp7ChiSquare.run(spark, sf)
      .select("event_type", "o", "r", "n").collect()
    val n = rows.head.getLong(3)
    assert(rows.map(_.getLong(1)).sum === n, "observed cells don't sum to N")
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(1)).sum === cells.head.getLong(2),
        "row marginal diverges from its cells")
    }
  }

  test("e9: clustered-copy aggregate equals the authoritative table's") {
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("user_id").between(100, 199))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = agg(graft.Tables.events(spark, sf))
    val rows = EtlQueries.e9SortedSkipping.run(spark, sf)
      .select("event_type", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === direct, "roundtrip lost or duplicated rows")
  }

  test("p12: pairs are lowercase char bigrams with descending counts") {
    val rows = Curation.p12BpeMerges.run(spark, sf)
      .select("rnk", "pair", "n").collect().sortBy(_.getLong(0))
    rows.foreach(r => assert(r.getString(1).matches("[a-z]{2}"),
      s"bad pair '${r.getString(1)}'"))
    rows.map(_.getLong(2)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "counts not descending by rank")
      case _ => ()
    }
  }

  test("q41: every purchase appears once; organic iff click columns null") {
    val rows = Relational.q41Attribution.run(spark, sf)
      .select("purchase_id", "channel", "click_id", "micros_since_click").collect()
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong === purchases, "attribution dropped/duplicated purchases")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      if (r.getString(1) == "organic") {
        assert(r.isNullAt(2) && r.isNullAt(3), "organic row carries click data")
      } else {
        assert(!r.isNullAt(2) && r.getLong(3) >= 0L &&
          r.getLong(3) <= 7L * 86400L * 1000000L,
          "attributed click outside the 7-day lookback")
      }
    }
  }

  test("q42: transitions sum to events minus one per user; p rows sum to ~1") {
    val rows = Relational.q42Transitions.run(spark, sf)
      .select("prev_type", "n", "row_total", "p").collect()
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === expected,
      "cell counts don't cover every consecutive pair exactly once")
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(1)).sum === cells.head.getLong(2))
      val pSum = cells.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"row probabilities sum to $pSum")
    }
  }

  test("dp8: digits are 1-9 and counts close to the total") {
    val rows = Relational.dp8Benford.run(spark, sf)
      .select("digit", "n", "total", "observed", "expected").collect()
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
    assert(rows.map(_.getLong(1)).sum === rows.head.getLong(2))
    rows.foreach(r => assert(r.getDouble(4) > 0 && r.getDouble(4) < 0.302))
  }

  test("t16: ratios in [0,1]; a boilerplate shingle is in >=5 docs") {
    val rows = TextAnalysis.t16Boilerplate.run(spark, sf)
      .select("doc_id", "n_shingles", "n_boiler", "boiler_ratio").collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "more boilerplate than shingles")
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // docs with shingles = docs with >= 3 whitespace words
    val expected = graft.Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(rows.length.toLong === expected)
  }

  test("s13: fused score recomputes from the emitted ranks; lists bounded") {
    val rows = Similarity.s13HybridRrf.run(spark, sf)
      .select("probe_id", "rnk", "vec_rank", "lex_rank", "rrf_score").collect()
    assert(rows.nonEmpty)
    val perProbe = rows.groupBy(_.getLong(0))
    perProbe.values.foreach(rs => assert(rs.length <= 10, "over 10 fused rows"))
    rows.foreach { r =>
      val vr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val lr = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(vr.isDefined || lr.isDefined, "candidate retrieved by neither tower")
      (vr.toSeq ++ lr.toSeq).foreach(k => assert(k >= 1 && k <= 20, s"rank $k out of list bound"))
      val expected = vr.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
        lr.map(k => 1.0 / (60 + k)).getOrElse(0.0)
      assert(math.abs(r.getDouble(4) - expected) < 1e-6,
        s"rrf ${r.getDouble(4)} != recomputed $expected")
    }
  }

  test("dp10: stats recompute from a direct per-key count of o_custkey") {
    val row = Relational.dp10SkewAudit.run(spark, sf)
      .filter(col("col_name") === "o_custkey").head
    val counts = graft.Tables.orders(spark, sf)
      .groupBy("o_custkey").count().collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxCnt = counts.map(_._2).max
    assert(row.getAs[Long]("n_rows") === counts.map(_._2).sum)
    assert(row.getAs[Long]("n_keys") === counts.length.toLong)
    assert(row.getAs[Long]("max_cnt") === maxCnt)
    assert(row.getAs[Long]("top_key") ===
      counts.filter(_._2 == maxCnt).map(_._1).min, "heavy-hitter witness wrong")
    val sorted = counts.map(_._2).sorted
    def pct(q: Double) = sorted(math.ceil(q * sorted.length).toInt - 1)
    assert(row.getAs[Long]("p50_cnt") === pct(0.5))
    assert(row.getAs[Long]("p99_cnt") === pct(0.99))
    assert(row.getAs[Long]("p50_cnt") <= row.getAs[Long]("p99_cnt"))
  }

  test("e11: one file per z-bin; rows conserved; hit flag matches envelopes") {
    val rows = EtlQueries.e11Zorder.run(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("n_files") === 1L, "bin split across files"))
    assert(rows.map(_.getAs[Long]("n_rows")).sum ===
      graft.Tables.lineitem(spark, sf).count(), "rewrite lost/duplicated rows")
    rows.foreach { r =>
      val hit = r.getAs[Long]("min_part") <= 199 && r.getAs[Long]("max_part") >= 100 &&
        r.getAs[Long]("min_supp") <= 19 && r.getAs[Long]("max_supp") >= 10
      assert(r.getAs[Long]("probe_hit") === (if (hit) 1L else 0L),
        "pruning flag disagrees with the emitted envelope")
    }
  }

  test("g6: every seed keeps >= teleport mass; non-seeds only reached via edges") {
    val rows = Graph.g6PersonalizedPageRank.run(spark, sf)
      .select("node_id", "is_seed", "rank_fp").collect()
    assert(rows.nonEmpty)
    val seedsOut = rows.filter(_.getLong(1) == 1L)
    assert(seedsOut.nonEmpty, "no seed survived the r>0 filter")
    seedsOut.foreach(r => assert(r.getLong(2) >= 150000L,
      s"seed ${r.getLong(0)} below teleport mass"))
    // non-seed mass can only arrive through an edge: node must be a
    // customer or supplier present in the co-purchase graph
    val suppliers = rows.filter(r => r.getLong(0) % 2 == 1)
    assert(suppliers.nonEmpty, "mass never crossed to the supplier side")
  }

  test("g7: labels are graph nodes; community sizes recompute from membership") {
    val rows = Graph.g7LabelPropagation.run(spark, sf)
      .select("supp_key", "community", "comm_size").collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getLong(0)).toSet
    rows.foreach(r => assert(nodes.contains(r.getLong(1)),
      s"community label ${r.getLong(1)} is not a node"))
    val sizes = rows.groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.length.toLong }
    rows.foreach(r => assert(r.getLong(2) === sizes(r.getLong(1)),
      "comm_size disagrees with membership count"))
    assert(rows.map(_.getLong(0)).distinct.length === rows.length,
      "node assigned to more than one community")
  }

  test("e12: action buckets reconcile with the merged per-status rollup") {
    val rows = EtlQueries.e12MergeUpsert.run(spark, sf)
      .select("status", "n_rows", "sum_price", "min_key", "max_key").collect()
    val byStatus = rows.map(r => r.getString(0) -> r).toMap
    val orders = graft.Tables.orders(spark, sf)
      .withColumn("b", pmod(graft.functions.DetHash.md5Long28(
        col("o_orderkey").cast("string")), lit(20)))
    val nDel = orders.filter(col("b") === 0).count()
    val nUpd = orders.filter(col("b").isin(1, 2)).count()
    val nIns = orders.filter(col("b") === 3).count()
    val total = orders.count()
    assert(byStatus("X").getLong(1) === nUpd, "updates did not all land in status X")
    assert(byStatus("N").getLong(1) === nIns, "inserts did not all land in status N")
    assert(byStatus("N").getLong(4) < 0, "insert keys not strictly negative")
    assert(rows.map(_.getLong(1)).sum === total - nDel + nIns,
      "merged row count != base - deletes + inserts")
    // untouched statuses carry only original (non-negative) keys
    rows.filter(r => r.getString(0) != "N")
      .foreach(r => assert(r.getLong(3) >= 0, s"negative key leaked into ${r.getString(0)}"))
  }

  test("m9: frame energies recompute from the closed-form PCM model") {
    val rows = Multimodal.m9AudioEnergy.run(spark, sf)
      .select("doc_id", "n_frames", "total_energy", "max_frame_energy", "n_loud")
      .collect()
    assert(rows.nonEmpty)
    val nCharsById = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(id % 3 === 1, "non-audio doc in the result")
      def sample(i: Int): Long = (id * 31 + i * 17L) % 256
      val nChars = nCharsById(id)
      val n = 64 + (nChars % 64).toInt
      val energies = (0 until n / 16).map { w =>
        (0 until 16).map { i => val s = sample(w * 16 + i) - 128; s * s }.sum
      }
      assert(r.getLong(1) === energies.length.toLong)
      assert(r.getLong(2) === energies.sum)
      assert(r.getLong(3) === energies.max)
      assert(r.getLong(4) === energies.count(_ > 90000L).toLong)
    }
  }

  test("t19: score is the sum of bucket weights over hashed bigrams; verdict thresholds at 0") {
    val rows = TextAnalysis.t19ClassifierScore.run(spark, sf)
      .select("doc_id", "n_features", "score", "verdict").collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size, "one verdict per document")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h28(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    rows.take(50).foreach { r =>
      val ws = docs(r.getLong(0)).toLowerCase.split(" ", -1)
      val feats = ws.iterator.sliding(2).withPartial(false)
        .map(p => (h28(p.head + "_" + p(1)) % 4096) % 2001 - 1000).toSeq
      assert(r.getLong(1) === feats.length.toLong, "n_features mismatch")
      assert(r.getLong(2) === feats.sum, "score mismatch")
      assert(r.getString(3) === (if (feats.sum >= 0) "keep" else "drop"))
    }
  }

  test("dp11: k_eff/kth_hash recompute from the hash stream; estimate is sane") {
    val rows = Relational.dp11KmvSketch.run(spark, sf)
      .select("tbl", "col_name", "exact_distinct", "k_eff", "kth_hash", "est_distinct")
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (tbl, key) = (r.getString(0), r.getString(1))
      val hashes = graft.Tables.table(spark, sf, tbl)
        .filter(col(key).isNotNull)
        .select(graft.functions.DetHash.md5Long60(col(key).cast("string")).as("h"))
        .distinct().collect().map(_.getLong(0)).sorted
      assert(r.getLong(2) === hashes.length.toLong, s"$tbl.$key exact_distinct")
      val kEff = math.min(256, hashes.length)
      assert(r.getLong(3) === kEff.toLong, s"$tbl.$key k_eff")
      assert(r.getLong(4) === hashes(kEff - 1), s"$tbl.$key kth_hash is the k_eff-th smallest")
      val est = r.getDouble(5)
      if (kEff < 256) assert(est === hashes.length.toDouble, s"$tbl.$key exact passthrough")
      else {
        assert(est === 255.0 * 1152921504606846976.0 / hashes(255).toDouble)
        // KMV stderr at k=256 is ~1/sqrt(254) ≈ 6.3%; 5σ bound
        assert(math.abs(est - hashes.length) / hashes.length < 0.32,
          s"$tbl.$key estimate off by >32%: $est vs ${hashes.length}")
      }
    }
  }

  test("s14: full Lloyd recompute in driver memory matches bit-for-bit") {
    val rows = Similarity.s14KmeansTrain.run(spark, sf)
      .select("cell", "pos", "centroid", "n_members", "inertia_q").collect()
    assert(rows.length === 8 * 64, "8 cells x 64 dims")
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    // the same fixed-order arithmetic, sequentially: fold-order distance,
    // min-dist/min-cell assignment, floor(x*1e7) integer mean
    def dist(v: Array[Double], c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
      acc
    }
    def assign(cent: Array[Array[Double]]) = vecs.map { case (_, v) =>
      var best = 0; var bd = dist(v, cent(0))
      for (k <- 1 until 8) { val d = dist(v, cent(k)); if (d < bd) { bd = d; best = k } }
      (best, v, bd)
    }
    var cent = vecs.take(8).map(_._2.clone)
    for (_ <- 1 to 3) {
      val a = assign(cent)
      cent = (0 until 8).toArray.map { k =>
        val members = a.collect { case (c, v, _) if c == k => v }
        if (members.isEmpty) cent(k)
        else Array.tabulate(64) { p =>
          members.map(v => math.floor(v(p) * 1.0e7).toLong).sum.toDouble / 1.0e7 / members.length
        }
      }
    }
    val fin = assign(cent)
    val nBy = fin.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val iqBy = fin.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(x => math.floor(x._3 * 1.0e6).toLong).sum
    }
    rows.foreach { r =>
      val (k, p) = (r.getLong(0).toInt, r.getLong(1).toInt)
      assert(r.getDouble(2) === cent(k)(p), s"centroid($k,$p)")
      assert(r.getLong(3) === nBy.getOrElse(k, 0L), s"n_members($k)")
      assert(r.getLong(4) === iqBy.getOrElse(k, 0L), s"inertia_q($k)")
    }
    assert(nBy.values.sum === vecs.length.toLong, "every vector assigned once")
  }

  test("s16: trained-cell index + in-cell exact top-k recompute in driver memory") {
    val rows = Similarity.s16TrainedIvf.run(spark, sf)
      .select("probe_id", "cell", "cell_size", "rank", "neighbor_id", "cosine").collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def dist(v: Array[Double], c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
      acc
    }
    def assign(cent: Array[Array[Double]]) = vecs.map { case (id, v) =>
      var best = 0; var bd = dist(v, cent(0))
      for (k <- 1 until 8) { val d = dist(v, cent(k)); if (d < bd) { bd = d; best = k } }
      (id, best, v)
    }
    // identical Lloyd replay to the s14 test — s16 must consume the SAME
    // trained codebook (the composition is the point)
    var cent = vecs.take(8).map(_._2.clone)
    for (_ <- 1 to 3) {
      val a = assign(cent)
      cent = (0 until 8).toArray.map { k =>
        val members = a.collect { case (_, c, v) if c == k => v }
        if (members.isEmpty) cent(k)
        else Array.tabulate(64) { p =>
          members.map(v => math.floor(v(p) * 1.0e7).toLong).sum.toDouble / 1.0e7 / members.length
        }
      }
    }
    val idx = assign(cent)
    val cellOf = idx.map(x => x._1 -> x._2).toMap
    val sizes = idx.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    def cos(u: Array[Double], v: Array[Double]): Double = {
      var d = 0.0; var nu = 0.0; var nv = 0.0; var i = 0
      while (i < u.length) { d += u(i) * v(i); nu += u(i) * u(i); nv += v(i) * v(i); i += 1 }
      d / (math.sqrt(nu) * math.sqrt(nv))
    }
    val byId = vecs.toMap
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val pc = cellOf(p)
      val want = idx.filter(x => x._2 == pc && x._1 != p)
        .map(x => (-cos(byId(p), byId(x._1)), x._1))
        .sorted.take(5)
      val got = rs.sortBy(_.getLong(3))
      got.foreach { r =>
        assert(r.getLong(1) === pc.toLong, s"probe $p indexed to wrong cell")
        assert(r.getLong(2) === sizes(pc), s"cell_size($pc)")
      }
      assert(got.map(_.getLong(4)).toSeq === want.map(_._2).toSeq,
        s"in-cell top-5 mismatch for probe $p")
      got.zip(want).foreach { case (r, (negc, _)) =>
        assert(math.abs(r.getDouble(5) - (-negc)) < 1e-6, s"cosine witness for probe $p")
      }
    }
    assert(rows.map(_.getLong(0)).distinct.length === 10, "10 probes")
  }

  test("s15: signatures, hamming ranking and witness recompute in driver memory") {
    val rows = Similarity.s15BinaryQuant.run(spark, sf)
      .select("probe_id", "rank", "neighbor_id", "hamming").collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sig(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 64 if v(i) > 0)
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      (lo, hi)
    }
    val sigs = vecs.map { case (id, v) => id -> sig(v) }
    def ham(a: (Long, Long), b: (Long, Long)): Long =
      java.lang.Long.bitCount(a._1 ^ b._1).toLong +
        java.lang.Long.bitCount(a._2 ^ b._2)
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val want = sigs.toSeq.filter(_._1 != p)
        .map { case (id, s) => (ham(sigs(p), s), id) }.sorted.take(5)
      val got = rs.sortBy(_.getLong(1)).map(r => (r.getLong(3), r.getLong(2)))
      assert(got.toSeq === want, s"hamming top-5 mismatch for probe $p")
    }
    assert(rows.length === 50)
  }

  test("dp13: moments recompute from exact integer sums in driver memory") {
    val rows = Relational.dp13Moments.run(spark, sf).collect()
    val vals = graft.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100, 0).cast("bigint"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    assert(rows.length === vals.size)
    rows.foreach { r =>
      val qs = vals(r.getString(0))
      val n = qs.length.toLong
      val s1 = qs.map(BigInt(_)).sum
      val muq = (s1 / n).toLong // positive values: floor = truncate
      val d = qs.map(_ - muq)
      val d2 = d.map(x => BigInt(x) * x).sum
      val d3 = d.map(x => BigInt(x) * x * x).sum
      val d4 = d.map(x => BigInt(x) * x * x * x).sum
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Double]("mean_value") === r6(s1.toDouble / n / 100.0))
      assert(r.getAs[Double]("std_value") === r6(math.sqrt(d2.toDouble / n) / 100.0))
      assert(r.getAs[Double]("skewness") ===
        r6(d3.toDouble * math.sqrt(n.toDouble) / (d2.toDouble * math.sqrt(d2.toDouble))))
      assert(r.getAs[Double]("kurtosis_x") ===
        r6(d4.toDouble * n / (d2.toDouble * d2.toDouble) - 3.0))
    }
  }

  test("dp14: sample and quantiles recompute from the raw rows in driver memory") {
    val rows = Relational.dp14QuantileSketch.run(spark, sf).collect()
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id").cast("string"),
        round(col("value") * 100, 0).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def typ1(sorted: IndexedSeq[Long], k: Long, p: Double): Double =
      sorted(math.ceil(p * k).toLong.toInt - 1).toDouble / 100.0
    val byType = raw.groupBy(_._1)
    assert(rows.length === byType.size)
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      val n = xs.length.toLong
      val sample = xs.map(x => (h60(x._2), x._3)).sortBy(identity)
        .take(256).map(_._2).sorted.toIndexedSeq
      val kEff = sample.length.toLong
      val full = xs.map(_._3).sorted.toIndexedSeq
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("k_eff") === kEff)
      for ((nm, p) <- Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))) {
        assert(r.getAs[Double](s"est_$nm") === typ1(sample, kEff, p), s"est_$nm")
        assert(r.getAs[Double](s"exact_$nm") === typ1(full, n, p), s"exact_$nm")
      }
      // the sketch contract: the k=256 sample's p50/p90 land within the
      // distribution (sanity against a degenerate sampler)
      assert(r.getAs[Double]("est_p50") >= full.head / 100.0 &&
        r.getAs[Double]("est_p50") <= full.last / 100.0)
    }
  }

  test("w19: each qualifying purchase emits exactly once; set equals batch EXISTS") {
    val rows = StreamingQueries.w19StreamSemiJoin.run(spark, sf)
      .select("purchase_id").collect().map(_.getLong(0))
    assert(rows.distinct.length === rows.length, "a purchase double-emitted")
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val want = ev.filter(_._3 == "purchase").collect {
      case (id, u, _, t) if clicks.exists(c =>
        c._2 == u && c._4 >= t - 600 && c._4 < t) => id
    }.sorted
    assert(rows.sorted.toSeq === want.toSeq, "semi-join set != batch EXISTS")
  }

  test("g8: every transition replays the md5 rule over the ranked adjacency") {
    val rows = Graph.g8RandomWalk.run(spark, sf)
      .select("start", "step", "node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mut = Graph.mutualEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (mut ++ mut.map(_.swap)).groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).sorted }
    val md = java.security.MessageDigest.getInstance("MD5")
    def h28(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val byStart = rows.groupBy(_._1)
    assert(byStart.size === adj.size, "one walk per graph node")
    byStart.foreach { case (start, steps) =>
      val path = steps.sortBy(_._2).map(_._3)
      assert(path.length === 5, s"walk from $start not length 5")
      assert(path.head === start, "step 0 must be the start node")
      for (t <- 1 until path.length) {
        val nbrs = adj(path(t - 1))
        val pick = (h28(s"${path(t - 1)}#$t#$start") % nbrs.length).toInt
        assert(path(t) === nbrs(pick),
          s"walk $start step $t took ${path(t)}, rule says ${nbrs(pick)}")
      }
    }
  }

  test("dp15: per-cell PMI terms and the MI total recompute from raw counts") {
    val rows = Relational.dp15MutualInfo.run(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts"))).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val byCell = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val byRow = ev.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val byCol = ev.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    val n = ev.length.toLong
    def lq(k: Long): Long = math.floor(math.log(k.toDouble) * 1.0e6).toLong
    val wantMi = byCell.map { case ((et, hr), o) =>
      o * (lq(o) + lq(n) - lq(byRow(et)) - lq(byCol(hr)))
    }.sum
    assert(rows.length === byCell.size, "one row per observed cell")
    rows.foreach { r =>
      val key = (r.getString(0), r.getInt(1))
      val o = byCell(key)
      assert(r.getAs[Long]("o") === o)
      assert(r.getAs[Long]("pmi_q") ===
        o * (lq(o) + lq(n) - lq(byRow(key._1)) - lq(byCol(key._2))), s"pmi $key")
      assert(r.getAs[Long]("mi_q") === wantMi)
    }
    assert(wantMi > 0, "independence fixture degenerate: MI <= 0")
  }

  test("q44: root, depth and ancestor path recompute by sequential parent walk") {
    val rows = Relational.q44HierarchyFlatten.run(spark, sf)
      .select("node", "root", "depth", "path", "root_size").collect()
    val keys = graft.Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0)).toSet
    assert(rows.length === keys.size, "one row per node")
    def walk(k: Long): (Long, Long, String) = {
      var cur = k; var d = 0L; val p = Seq.newBuilder[Long]
      while (cur >= 1) { cur = (cur - 1) / 4; d += 1; p += cur }
      (cur, d, p.result().mkString("/"))
    }
    val want = keys.toSeq.map(k => k -> walk(k)).toMap
    val rootSizes = want.values.groupBy(_._1).map { case (r, xs) => r -> xs.size.toLong }
    rows.foreach { r =>
      val (root, d, path) = want(r.getLong(0))
      assert(r.getLong(1) === root, s"root(${r.getLong(0)})")
      assert(r.getLong(2) === d, s"depth(${r.getLong(0)})")
      assert(r.getString(3) === path, s"path(${r.getLong(0)})")
      assert(r.getLong(4) === rootSizes(root), "root_size")
    }
    assert(rows.map(_.getLong(2)).max >= 3, "fixture reaches depth >= 3")
  }

  test("dp18: smoothed PSI bins and totals recompute from raw events") {
    val rows = Relational.dp18PsiDrift.run(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"),
        unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (ev.map(_._3).min, ev.map(_._3).max)
    val (qlo, qhi) = (ev.map(_._2).min, ev.map(_._2).max)
    val mid = (lo + hi) / 2
    def bin(q: Long): Long = (q - qlo) * 10 / (qhi - qlo + 1)
    def lq(x: Double): Long = math.floor(math.log(x) * 1.0e6).toLong
    val byType = ev.groupBy(_._1)
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.length === 10, s"$et: full 10-bin spine")
      val mine = byType(et)
      val a0 = mine.filter(_._3 <= mid).groupBy(e => bin(e._2)).view.mapValues(_.length.toLong).toMap
      val b0 = mine.filter(_._3 > mid).groupBy(e => bin(e._2)).view.mapValues(_.length.toLong).toMap
      val a = (0L until 10L).map(k => k -> (a0.getOrElse(k, 0L) + 1)).toMap
      val b = (0L until 10L).map(k => k -> (b0.getOrElse(k, 0L) + 1)).toMap
      val na = a.values.sum; val nb = b.values.sum
      def tq(k: Long): BigInt =
        (BigInt(a(k)) * nb - BigInt(b(k)) * na) *
          BigInt(lq(a(k).toDouble * nb) - lq(b(k).toDouble * na))
      val psiQ = (0L until 10L).map(tq).sum
      assert(psiQ >= 0, "floor∘ln monotonicity keeps PSI terms non-negative")
      rs.foreach { r =>
        val k = r.getLong(1)
        assert(r.getLong(2) === a0.getOrElse(k, 0L), s"$et bin $k n_ref")
        assert(r.getLong(3) === b0.getOrElse(k, 0L), s"$et bin $k n_cur")
        val denom = na.toDouble * nb.toDouble * 1.0e6
        assert(math.abs(r.getDouble(4) - tq(k).toDouble / denom) < 1e-9, s"$et bin $k psi_bin")
        assert(math.abs(r.getDouble(5) - psiQ.toDouble / denom) < 1e-9, s"$et psi_total")
      }
    }
  }

  test("m11: patch sums and token ids recompute from the generator formulas") {
    val rows = Multimodal.m11PatchGrid.run(spark, sf).collect()
    val ids = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 3 == 0)
    def want(id: Long) = {
      val (w, h) = (8 + (id % 16).toInt, 8 + (id % 8).toInt)
      for (pr <- 0 until h / 4; pc <- 0 until w / 4) yield {
        var (sr, sg, sb) = (0L, 0L, 0L)
        for (dy <- 0 until 4; dx <- 0 until 4) {
          val x = 4 * pc + dx; val y = 4 * pr + dy
          sr += (id + 7L * x + 13L * y) % 256
          sg += (3L * id + 5L * x + 11L * y) % 256
          sb += (id + x.toLong * y) % 256
        }
        (id, pr.toLong, pc.toLong, pr.toLong * (w / 4) + pc, sr, sg, sb)
      }
    }
    val exp = ids.flatMap(want).sortBy(t => (t._1, t._2, t._3))
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === exp.toSeq, "patch grid differs from the generator model")
    assert(exp.nonEmpty && exp.exists(_._4 > 5), "fixture exercises multi-row grids")
  }

  test("s17: greedy MMR replay in driver memory matches picks and scores") {
    val rows = Similarity.s17MmrDiversify.run(spark, sf)
      .select("probe_id", "pick", "neighbor_id", "relevance", "mmr_score").collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(u: Array[Double], v: Array[Double]): Double = {
      var d = 0.0; var nu = 0.0; var nv = 0.0; var i = 0
      while (i < u.length) { d += u(i) * v(i); nu += u(i) * u(i); nv += v(i) * v(i); i += 1 }
      d / (math.sqrt(nu) * math.sqrt(nv))
    }
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val pool = vecs.keys.filter(_ != p).toSeq
        .map(id => (id, cos(vecs(p), vecs(id))))
        .sortBy { case (id, rel) => (-rel, id) }.take(20)
      var sel = Vector.empty[(Long, Double, Double)] // (id, rel, score)
      for (k <- 1 to 5) {
        val cands = pool.filterNot(c => sel.exists(_._1 == c._1))
        val scored = cands.map { case (id, rel) =>
          val score = if (sel.isEmpty) 0.7 * rel
            else 0.7 * rel - 0.3 * sel.map(s => cos(vecs(id), vecs(s._1))).max
          (id, rel, score)
        }
        sel = sel :+ scored.minBy { case (id, _, sc) => (-sc, id) }
      }
      val got = rs.sortBy(_.getLong(1))
      assert(got.map(_.getLong(2)).toSeq === sel.map(_._1), s"MMR picks for probe $p")
      got.zip(sel).foreach { case (r, (_, rel, sc)) =>
        assert(math.abs(r.getDouble(3) - rel) < 1e-6, s"relevance, probe $p")
        assert(math.abs(r.getDouble(4) - sc) < 1e-6, s"mmr_score, probe $p")
      }
      // diversity actually bites: the MMR order must differ from pure
      // relevance order for at least one probe (checked globally below)
    }
    val reordered = rows.groupBy(_.getLong(0)).exists { case (p, rs) =>
      val mmr = rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      val byRel = rs.sortBy(r => (-r.getDouble(3), r.getLong(2))).map(_.getLong(2)).toSeq
      mmr != byRel
    }
    assert(reordered, "fixture degenerate: MMR never reordered any probe's top-5")
  }

  test("d11: per-doc counts recompute from the in-memory paragraph model") {
    val rows = Dedup.d11ParagraphDedup.run(spark, sf)
      .select("doc_id", "n_para", "n_dup_para", "dup_ratio").collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size, "one row per document")
    // full independent recompute of the paragraph model (tiny at sf0.001)
    val paras = docs.toSeq.flatMap { case (id, text) =>
      text.split(" ", -1).grouped(8).map(g => id -> g.mkString(" "))
    }
    val nDocsByPara = paras.distinct.groupBy(_._2).map { case (p, xs) => p -> xs.size }
    assert(nDocsByPara.values.exists(_ > 1), "fixture has no cross-document paragraph")
    rows.foreach { r =>
      val mine = paras.collect { case (id, p) if id == r.getLong(0) => p }
      assert(r.getLong(1) === mine.length.toLong, "n_para = ceil(words/8)")
      assert(r.getLong(2) === mine.count(p => nDocsByPara(p) > 1).toLong,
        s"n_dup_para recompute for doc ${r.getLong(0)}")
      assert(r.getDouble(3) === r.getLong(2).toDouble / r.getLong(1))
    }
  }

  test("e16: dynamic overwrite replaces exactly the batch partitions") {
    val rows = EtlQueries.e16DynamicOverwrite.run(spark, sf)
      .select("lang", "n_docs", "sum_chars", "checksum", "n_files").collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5mod(id: Long, nc: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$nc".getBytes("UTF-8"))
        .take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
      h % 1000000007L
    }
    val byLang = docs.groupBy(_._2)
    assert(rows.length === byLang.size, "one row per lang partition survives")
    rows.foreach { r =>
      val lang = r.getString(0)
      val revised = lang == "de" || lang == "fr"
      val mine = byLang(lang).map { case (id, _, nc) =>
        (id, if (revised) nc + 1000000L else nc)
      }
      assert(r.getLong(1) === mine.length.toLong, s"$lang count")
      assert(r.getLong(2) === mine.map(_._2).sum, s"$lang sum_chars")
      assert(r.getLong(3) === mine.map { case (id, nc) => md5mod(id, nc) }.sum,
        s"$lang checksum")
      assert(r.getLong(4) === 1L, s"$lang single-file partition")
    }
  }

  test("e15: vacuum audit reconciles; no live row lost, no superseded file kept") {
    val rows = EtlQueries.e15Vacuum.run(spark, sf)
      .select("bin", "n_docs", "n_files", "files_before", "files_deleted",
        "files_live").collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs,
      "vacuum changed the live row count")
    rows.foreach { r =>
      val (bin, nf) = (r.getLong(0), r.getLong(2))
      if (bin % 2 == 0) assert(nf === 1L, s"rewritten bin $bin not single-file")
      else assert(nf >= 1L && nf <= 4L, s"bin $bin file count $nf")
      assert(r.getLong(3) - r.getLong(4) === r.getLong(5),
        "before - deleted != live")
    }
    assert(rows.head.getLong(4) > 0, "vacuum deleted nothing — stage degenerate")
  }

  test("m10: cut verdict is the integer threshold; diffs match the generator model") {
    val rows = Multimodal.m10SceneCut.run(spark, sf)
      .select("doc_id", "frame_idx", "diff_sum", "is_cut").collect()
    assert(rows.nonEmpty)
    val side = 8
    def r6(id: Long, f: Long, x: Long, y: Long) = (id + f + 7 * x + 13 * y) % 256
    def g6(id: Long, f: Long, x: Long, y: Long) = (3 * id + 2 * f + 5 * x + 11 * y) % 256
    def b6(id: Long, f: Long, x: Long, y: Long) = (id + f + x * y) % 256
    rows.foreach { r =>
      val (id, f, ds, cut) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val want = (for (x <- 0L until side; y <- 0L until side) yield
        math.abs(r6(id, f, x, y) - r6(id, f - 1, x, y)) +
        math.abs(g6(id, f, x, y) - g6(id, f - 1, x, y)) +
        math.abs(b6(id, f, x, y) - b6(id, f - 1, x, y))).sum
      assert(ds === want, s"decoded diff != model for ($id,$f)")
      assert(cut === (if (2 * ds > 5L * 3 * side * side) 1L else 0L))
    }
    assert(rows.exists(_.getLong(3) == 1L) && rows.exists(_.getLong(3) == 0L),
      "threshold degenerate: all frames on one side")
  }

  test("e13: snapshot rollups reconcile across the version chain") {
    val rows = EtlQueries.e13TimeTravel.run(spark, sf)
      .select("snap", "status", "n_rows", "min_key", "max_key").collect()
    val bySnap = rows.groupBy(_.getInt(0))
    assert(bySnap.keySet === Set(0, 1, 2))
    val orders = graft.Tables.orders(spark, sf)
      .withColumn("b", pmod(graft.functions.DetHash.md5Long28(
        col("o_orderkey").cast("string")), lit(20)))
    val n = (0 until 20).map(b => b -> orders.filter(col("b") === b).count()).toMap
    val total = n.values.sum
    def snapTotal(s: Int) = bySnap(s).map(_.getLong(2)).sum
    // v0 = the base table; each version then removes its deletes and
    // adds its inserts (updates move rows across statuses, not counts)
    assert(snapTotal(0) === total)
    assert(snapTotal(1) === total - n(0) + n(3))
    assert(snapTotal(2) === snapTotal(1) - n(4) + n(7))
    val status = rows.map(r => (r.getInt(0), r.getString(1)) -> r).toMap
    assert(status((1, "X")).getLong(2) === n(1) + n(2), "v1 updates land in X")
    assert(status((2, "X")).getLong(2) === n(1) + n(2), "v1 updates survive at v2")
    assert(status((2, "Y")).getLong(2) === n(5) + n(6), "v2 updates land in Y")
    assert(!bySnap(1).exists(_.getString(1) == "Y"), "v2 ops leaked into snapshot 1")
    // inserted rows live in strictly negative key space, originals don't
    Seq((1, "N"), (2, "N"), (2, "M")).foreach { case (s, st) =>
      assert(status((s, st)).getLong(4) < 0, s"insert keys non-negative in $s/$st")
    }
    rows.filter(r => r.getString(1) != "N" && r.getString(1) != "M")
      .foreach(r => assert(r.getLong(3) >= 0,
        s"negative key leaked into ${r.getInt(0)}/${r.getString(1)}"))
  }

  test("e14: cascade reconciles — tombstones, their orders, those orders' lines") {
    val rows = EtlQueries.e14ForgetCascade.run(spark, sf)
      .select("tbl", "n_before", "n_deleted", "n_after", "survivor_checksum")
      .collect().map(r => r.getString(0) -> r).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h28(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    val custkeys = graft.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val tomb = custkeys.filter(k => h28(k.toString) % 97 == 0).toSet
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val dord = orders.collect { case (ok, ck) if tomb(ck) => ok }.toSet
    val lkeys = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
    assert(rows("customer").getLong(2) === tomb.size.toLong)
    assert(rows("orders").getLong(2) === dord.size.toLong)
    assert(rows("lineitem").getLong(2) === lkeys.count(dord).toLong)
    Seq("customer", "orders", "lineitem").foreach { t =>
      val r = rows(t)
      assert(r.getLong(1) - r.getLong(2) === r.getLong(3), s"$t counts don't reconcile")
    }
    val survSum = orders.collect { case (ok, ck) if !tomb(ck) => h28(ok.toString) }.sum
    assert(rows("orders").getLong(4) === survSum, "orders survivor checksum recompute")
  }

  test("dp12: bit set, fill and false positives recompute from first principles") {
    val r = Relational.dp12BloomProfile.run(spark, sf)
      .select("n_keys", "m_bits", "n_bits_set", "fill_ratio", "fp_count").first()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val keys = graft.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val m = 16L * keys.length
    def bits(k: Long): Seq[Long] = (0 to 3).map(i => h60(s"bf$i:$k") % m)
    val set = keys.flatMap(bits).toSet
    assert(r.getLong(0) === keys.length.toLong)
    assert(r.getLong(1) === m)
    assert(r.getLong(2) === set.size.toLong)
    assert(r.getDouble(3) === set.size.toDouble / m)
    val fp = (1L to 1000L).count(p => bits(-p).forall(set))
    assert(r.getLong(4) === fp.toLong, "false-positive probe recompute")
    // the design bound: m=16n keeps measured fpp within an order of
    // magnitude of (1-e^(-1/4))^4 at any scale
    assert(fp <= 30, s"fpp ${fp / 1000.0} far above the 0.24% design point")
  }

  test("dp16: registers, denominator and HLL estimate recompute from raw keys") {
    val rows = Relational.dp16HllSketch.run(spark, sf).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cols = Seq("orders" -> "o_custkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_partkey", "lineitem" -> "l_suppkey",
      "nation" -> "n_nationkey")
    assert(rows.length === cols.size)
    var lcFired = 0
    cols.foreach { case (tbl, key) =>
      val keys = graft.Tables.table(spark, sf, tbl)
        .filter(col(key).isNotNull).select(col(key).cast("string"))
        .collect().map(_.getString(0))
      val regs = Array.fill(256)(0L)
      keys.foreach { k =>
        val h = h60(k); val j = (h % 256).toInt; val w = h / 256
        val rho =
          if (w == 0) 53L
          else 52L - (63 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(j)) regs(j) = rho
      }
      val s = regs.map(r => 1L << (53 - r)).sum
      val v = regs.count(_ == 0L).toLong
      val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0 / s.toDouble
      def lq(x: Double) = math.floor(math.log(x) * 1.0e6).toLong
      val est =
        if (raw <= 640.0 && v > 0) { lcFired += 1
          256.0 * (lq(256.0) - lq(v.toDouble)).toDouble / 1.0e6 }
        else raw
      val exact = keys.distinct.length.toLong
      val r = rows.find(r => r.getString(0) == tbl && r.getString(1) == key).get
      assert(r.getAs[Long]("exact_distinct") === exact, s"$tbl.$key exact")
      assert(r.getAs[Long]("v_zero") === v, s"$tbl.$key v_zero")
      assert(r.getAs[Long]("s_denom") === s, s"$tbl.$key s_denom")
      assert(r.getAs[Double]("raw_est") === r4(raw), s"$tbl.$key raw_est")
      assert(r.getAs[Double]("est_distinct") === r4(est), s"$tbl.$key est")
      assert(r.getAs[Double]("rel_err") === r4((est - exact) / exact), s"$tbl.$key err")
      // the estimator contract: within 3 standard errors (1.04/sqrt(256))
      assert(math.abs(est - exact) <= 3 * 1.04 / 16.0 * exact + 1,
        s"$tbl.$key estimate $est vs exact $exact outside the HLL bound")
    }
    assert(lcFired >= 1, "fixture never exercised the linear-counting branch")
  }

  test("dp17: width, counters and CMS estimates recompute from raw keys") {
    val rows = Relational.dp17CountMin.run(spark, sf).collect()
    val keys = graft.Tables.table(spark, sf, "lineitem")
      .select(col("l_partkey")).collect().map(_.getLong(0))
    val n = keys.length.toLong
    var w = 1L
    while (w < (n + 7) / 8) w *= 2
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    keys.foreach { k =>
      for (i <- 0 until 4) {
        val b = h60(s"cm$i:$k") % w
        cells((i, b)) = cells.getOrElse((i, b), 0L) + 1
      }
    }
    val exact = keys.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val top10 = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(10).map(_._1).toSet
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("part_key")).toSet === top10, "probe set != exact top-10")
    rows.foreach { r =>
      val k = r.getAs[Long]("part_key")
      val cnt = exact(k)
      val est = (0 until 4).map(i => cells((i, h60(s"cm$i:$k") % w))).min
      assert(r.getAs[Long]("exact_cnt") === cnt, s"key $k exact")
      assert(r.getAs[Long]("est_cnt") === est, s"key $k est")
      assert(r.getAs[Long]("overest") === est - cnt, s"key $k overest")
      assert(est >= cnt, s"key $k: CMS undercounted — impossible by construction")
      assert(r.getAs[Long]("w_buckets") === w)
    }
  }

  test("entry flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("t20: all five rule verdicts recompute from the raw text") {
    val rows = TextAnalysis.t20GopherRules.run(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === docs.size)
    val stops = Set("the", "a", "and", "of", "to", "in", "is")
    rows.foreach { r =>
      val w = docs(r.getLong(0)).split(" ", -1)
      val n = w.length.toLong
      val sumLen = w.map(_.length.toLong).sum
      val nDistinct = w.distinct.length.toLong
      val nStop = w.count(stops).toLong
      val maxTf = w.groupBy(identity).values.map(_.length).max.toLong
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("sum_len") === sumLen)
      assert(r.getAs[Long]("max_tf") === maxTf)
      val rLen = n >= 30 && n <= 1000
      val rMean = 7 * n <= 2 * sumLen && 2 * sumLen <= 9 * n
      val rDis = 2 * nDistinct >= n
      val rStop = nStop >= 2
      val rDom = 8 * maxTf <= n
      assert(r.getAs[Long]("r_len") === (if (rLen) 1L else 0L))
      assert(r.getAs[Long]("r_mean_len") === (if (rMean) 1L else 0L))
      assert(r.getAs[Long]("r_distinct") === (if (rDis) 1L else 0L))
      assert(r.getAs[Long]("r_stop") === (if (rStop) 1L else 0L))
      assert(r.getAs[Long]("r_dominance") === (if (rDom) 1L else 0L))
      assert(r.getAs[Long]("passes") ===
        (if (rLen && rMean && rDis && rStop && rDom) 1L else 0L))
    }
  }

  test("dp19: supports, confidence and lift recompute from raw baskets") {
    val rows = Relational.dp19AssocRules.run(spark, sf).collect()
    val brand = graft.Tables.part(spark, sf).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .groupBy(_.getLong(0))
      .map { case (ok, ls) => ok -> ls.map(r => brand(r.getLong(1))).toSet }
    val n = baskets.size.toLong
    val itemCnt = baskets.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val pairCnt = baskets.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2))
      .groupBy(identity).map { case (k, v) => (k.head, k(1)) -> v.size.toLong }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("item_a"), r.getAs[String]("item_b"))
      val nab = pairCnt((a, b))
      assert(r.getAs[Long]("n_ab") === nab)
      assert(r.getAs[Long]("n_a") === itemCnt(a))
      assert(r.getAs[Long]("n_b") === itemCnt(b))
      assert(100 * nab >= n, "support threshold violated")
      val lift = (BigInt(1000000) * nab * n) / (BigInt(itemCnt(a)) * itemCnt(b))
      assert(r.getAs[Long]("lift_ppm") === lift.toLong)
      assert(r.getAs[Long]("conf_ab_ppm") === (BigInt(1000000) * nab / itemCnt(a)).toLong)
      assert(r.getAs[Long]("conf_ba_ppm") === (BigInt(1000000) * nab / itemCnt(b)).toLong)
    }
  }

  test("g9: modularity pieces recompute from the shared graph and labels") {
    val rows = Graph.g9Modularity.run(spark, sf).collect()
    val edges = Graph.mutualEdges(spark, sf).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val lab = Graph.lpaLabels(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    val m = edges.length.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val byComm = lab.groupBy(_._2)
    assert(rows.length === byComm.size, "one row per community")
    val intra = edges.filter(e => lab(e._1) == lab(e._2))
      .groupBy(e => lab(e._1)).map { case (k, v) => k -> v.size.toLong }
    rows.foreach { r =>
      val c = r.getAs[Long]("community")
      val members = byComm(c).keys.toSeq
      val degSum = members.map(deg).sum
      val ic = intra.getOrElse(c, 0L)
      assert(r.getAs[Long]("n_nodes") === members.size.toLong)
      assert(r.getAs[Long]("deg_sum") === degSum)
      assert(r.getAs[Long]("intra_edges") === ic)
      assert(r.getAs[Long]("m_edges") === m)
      assert(r.getAs[Long]("contrib_num") === 4 * m * ic - degSum * degSum)
      assert(r.getAs[Long]("denom") === 4 * m * m)
    }
    // the audit identity: sum of contributions over 4m^2 is Newman Q;
    // every piece is exact, so the total is too
    val q = rows.map(_.getAs[Long]("contrib_num")).sum
    assert(q <= 4 * m * m, "Q must be <= 1")
  }

  test("s18: the second probe only widens the candidate set; hits match exact replay") {
    val rows = Similarity.s18MultiProbe.run(spark, sf).collect()
    // exact top-5 replay per probe (fixed-order fold, same as the engine)
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = vecs.map { case (k, v) => k -> math.sqrt(dotp(v, v)) }
    for (p <- 0L until 10L) {
      val exact = vecs.keys.filter(_ != p).toSeq
        .map(c => c -> dotp(vecs(p), vecs(c)) / (nrm(p) * nrm(c)))
        .sortBy { case (id, cos) => (-cos, id) }.take(5).map(_._1).toSet
      val got = rows.filter(_.getAs[Long]("probe_id") == p)
      assert(got.length === 5, s"probe $p should emit 5 rows")
      got.foreach { r =>
        assert(r.getAs[Long]("in_exact") ===
          (if (exact(r.getAs[Long]("neighbor_id"))) 1L else 0L))
      }
      // ranks are 1..5 and cosines non-increasing
      assert(got.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    }
  }

  test("d12: shared windows, hot cap and containment recompute from raw text") {
    val rows = Dedup.d12SubstringDedup.run(spark, sf).collect()
    val wins = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1)
        r.getLong(0) -> (if (w.length >= 8)
          (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).toSet
        else Set.empty[String])
      }.toMap
    val freq = wins.values.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val ok = freq.filter { case (_, n) => n >= 2 && n <= 16 }.keySet
    val expected = (for {
      (a, wa) <- wins.toSeq
      (b, wb) <- wins.toSeq
      if a < b
      s = (wa & wb & ok).size
      if s > 0
    } yield (a, b) -> s.toLong).toMap
    assert(rows.length === expected.size, "pair set drifted")
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") === expected((a, b)))
      assert(r.getAs[Long]("n_win_a") === wins(a).size.toLong)
      assert(r.getAs[Long]("n_win_b") === wins(b).size.toLong)
      assert(r.getAs[Long]("contain_ppm") ===
        1000000L * expected((a, b)) / math.min(wins(a).size, wins(b).size))
    }
  }

  test("t21: syllable, sentence and FK arithmetic recompute per document") {
    val rows = TextAnalysis.t21Readability.run(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    assert(rows.length === docs.size)
    val vowels = "[aeiou]+".r
    rows.foreach { r =>
      val w = docs(r.getAs[Long]("doc_id"))
      val n = w.length.toLong
      val sent = (n + 15) / 16
      val syl = w.map(t => math.max(1, vowels.findAllIn(t).size).toLong).sum
      val cplx = w.count(t => vowels.findAllIn(t).size >= 3).toLong
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("n_sent") === sent)
      assert(r.getAs[Long]("n_syll") === syl)
      assert(r.getAs[Long]("n_complex") === cplx)
      assert(r.getAs[Long]("asl_ppm") === 1000000L * n / sent)
      assert(r.getAs[Long]("spw_ppm") === 1000000L * syl / n)
      assert(r.getAs[Long]("complex_ppm") === 1000000L * cplx / n)
      assert(r.getAs[Long]("fk_micro") ===
        390000L * n / sent + 11800000L * syl / n - 15590000L)
    }
  }

  test("g10: wedge scores replay against the driver adjacency (sf0.01 — graph too sparse at smoke scale)") {
    val big = "/root/testdata/sf0.01"
    val rows = Graph.g10LinkPrediction.run(spark, big).collect()
    val mut = Graph.mutualEdges(spark, big).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val edges = mut.toSet
    val adj = (mut ++ mut.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val cand = (for {
      (m, ns) <- adj.toSeq
      u <- ns; v <- ns
      if u < v && !edges((u, v))
    } yield (u, v)).distinct
    val scored = cand.map { case (u, v) =>
      val cn = (adj(u) & adj(v)).size.toLong
      (u, v, cn, adj(u).size.toLong, adj(v).size.toLong,
        1000000L * cn / (adj(u).size + adj(v).size - cn))
    }.filter(_._3 >= 2)
      .sortBy { case (u, v, _, _, _, j) => (-j, u, v) }
      .take(100)
    assert(rows.length === scored.length)
    rows.zip(scored).foreach { case (r, (u, v, cn, du, dv, j)) =>
      assert(r.getAs[Long]("supp_u") === u)
      assert(r.getAs[Long]("supp_v") === v)
      assert(r.getAs[Long]("common_neighbors") === cn)
      assert(r.getAs[Long]("deg_u") === du)
      assert(r.getAs[Long]("deg_v") === dv)
      assert(r.getAs[Long]("jaccard_ppm") === j)
    }
  }

  test("s19: integer-dot ranking replays from driver-side SQ8 codes") {
    val rows = Similarity.s19Sq8Search.run(spark, sf).collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dims = vecs.values.head.length
    val lo = (0 until dims).map(d => vecs.values.map(_(d)).min).toArray
    val hi = (0 until dims).map(d => vecs.values.map(_(d)).max).toArray
    def code(v: Array[Double]): Array[Long] =
      (0 until dims).map { d =>
        if (hi(d) == lo(d)) 0L
        else math.min(255.0,
          math.floor((v(d) - lo(d)) / (hi(d) - lo(d)) * 255.0 + 0.5)).toLong
      }.toArray
    val codes = vecs.map { case (k, v) => k -> code(v) }
    def dotq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = vecs.map { case (k, v) => k -> math.sqrt(dotd(v, v)) }
    for (p <- 0L until 10L) {
      val want = codes.keys.filter(_ != p).toSeq
        .map(c => c -> dotq(codes(p), codes(c)))
        .sortBy { case (id, s) => (-s, id) }.take(5)
      val exact = vecs.keys.filter(_ != p).toSeq
        .map(c => c -> (dotd(vecs(p), vecs(c)) / (nrm(p) * nrm(c))))
        .sortBy { case (id, cos) => (-cos, id) }.take(5).map(_._1).toSet
      val got = rows.filter(_.getAs[Long]("probe_id") == p).sortBy(_.getAs[Long]("rank"))
      assert(got.map(_.getAs[Long]("neighbor_id")).toSeq === want.map(_._1))
      assert(got.map(_.getAs[Long]("dotq")).toSeq === want.map(_._2))
      got.foreach(r => assert(r.getAs[Long]("in_exact") ===
        (if (exact(r.getAs[Long]("neighbor_id"))) 1L else 0L)))
    }
  }

  test("e17: the feed is exactly the v1->v2 snapshot diff, four change types") {
    val rows = EtlQueries.e17ChangeFeed.run(spark, sf).collect()
    val orders = graft.Tables.orders(spark, sf)
      .withColumn("b", pmod(graft.functions.DetHash.md5Long28(
        col("o_orderkey").cast("string")), lit(20)))
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "b").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
        r.getLong(3).toInt))
    // state@1: v1 deleted b=0, moved b in {1,2} to (X, +10), inserted b=3
    // negatives; state@2 applies the v2 batch on top (b=4 del, b in {5,6}
    // -> (Y, +5), b=7 negatives inserted)
    def state(v: Int): Map[Long, (String, BigDecimal)] = {
      val base = orders.collect {
        case (k, st, pr, b) if !(v >= 1 && b == 0) && !(v >= 2 && b == 4) =>
          k -> (if (v >= 1 && (b == 1 || b == 2)) ("X", pr + 10)
          else if (v >= 2 && (b == 5 || b == 6)) ("Y", pr + 5)
          else (st, pr))
      }.toMap
      val ins1 = orders.collect { case (k, _, pr, 3) => (-(k + 1)) -> ("N", pr) }.toMap
      val ins2 = orders.collect { case (k, _, pr, 7) if v >= 2 => (-(k + 1)) -> ("M", pr) }.toMap
      base ++ (if (v >= 1) ins1 else Map.empty) ++ ins2
    }
    val (s1, s2) = (state(1), state(2))
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Double)]
    (s1.keySet ++ s2.keySet).foreach { k =>
      (s1.get(k), s2.get(k)) match {
        case (None, Some((st, pr))) =>
          expected += ((k, "insert", st, pr.toDouble))
        case (Some((st, pr)), None) =>
          expected += ((k, "delete", st, pr.toDouble))
        case (Some((st1, pr1)), Some((st2, pr2))) if st1 != st2 || pr1 != pr2 =>
          expected += ((k, "update_preimage", st1, pr1.toDouble))
          expected += ((k, "update_postimage", st2, pr2.toDouble))
        case _ =>
      }
    }
    val got = rows.map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"),
      r.getAs[String]("status"), r.getAs[Double]("price"))).toSet
    assert(rows.length === expected.size, "feed row count drifted")
    assert(got === expected.toSet, "feed content != snapshot diff")
    // b=4 keys existed untouched at v1 -> deletes; b in {5,6} -> updates
    val byType = rows.groupBy(_.getAs[String]("change_type")).view.mapValues(_.length).toMap
    val nB = orders.groupBy(_._4).view.mapValues(_.size).toMap
    assert(byType("delete") === nB(4))
    assert(byType("insert") === nB(7))
    assert(byType("update_preimage") === nB(5) + nB(6))
    assert(byType("update_postimage") === nB(5) + nB(6))
  }

  test("p14: no dup cluster straddles splits; masses replay from d6 + the hash rule") {
    val rows = Curation.p14LeakSafeSplit.run(spark, sf).collect()
    val clusters = Dedup.d6DedupClusters.run(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h28(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    def splitOf(rep: Long): String = {
      val b = h28(rep.toString) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val asg = docs.map { case (id, nc) =>
      val rep = clusters.getOrElse(id, id); (id, nc, rep, splitOf(rep))
    }
    // the invariant itself: every cluster lands in exactly one split
    asg.groupBy(_._3).foreach { case (rep, xs) =>
      assert(xs.map(_._4).distinct.length === 1, s"cluster $rep straddles splits")
    }
    val bySplit = asg.groupBy(_._4)
    assert(rows.length === bySplit.size)
    rows.foreach { r =>
      val xs = bySplit(r.getAs[String]("split"))
      assert(r.getAs[Long]("n_docs") === xs.length.toLong)
      assert(r.getAs[Long]("sum_chars") === xs.map(_._2).sum)
      assert(r.getAs[Long]("n_groups") === xs.map(_._3).distinct.length.toLong)
      assert(r.getAs[Long]("cross_split_groups") === 0L)
    }
  }

  test("m13: trim spans replay from the closed-form sample model") {
    val rows = Multimodal.m13SilenceTrim.run(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 3 == 1)
    assert(rows.length === docs.count(d => (64 + d._2 % 64) / 16 > 0))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, nc) =>
      val n = (64 + nc % 64).toInt
      val es = (0 until n / 16).map { w =>
        (0 until 16).map { i =>
          val s = (id * 31 + (w * 16 + i) * 17) % 256 - 128
          s * s
        }.sum
      }
      val r = byId(id)
      val lead = es.indexWhere(_ > 90000L) match { case -1 => es.length; case i => i }
      val trail = es.reverse.indexWhere(_ > 90000L) match { case -1 => es.length; case i => i }
      assert(r.getAs[Long]("n_frames") === es.length.toLong)
      assert(r.getAs[Long]("lead_quiet") === lead.toLong)
      assert(r.getAs[Long]("trail_quiet") === trail.toLong)
      if (lead >= es.length) {
        assert(r.getAs[Long]("kept_frames") === 0L)
        assert(r.getAs[Long]("kept_energy") === 0L)
      } else {
        assert(r.getAs[Long]("kept_frames") === (es.length - lead - trail).toLong)
        assert(r.getAs[Long]("kept_energy") ===
          es.slice(lead, es.length - trail).map(_.toLong).sum)
      }
    }
  }

  test("s20: per-subspace Lloyd training replays bit-exactly in the driver") {
    val rows = Similarity.s20PqTrain.run(spark, sf).collect()
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val M = 8; val S = 8; val K = 16; val R = 2
    def subv(v: Array[Double], s: Int) = v.slice(s * S, s * S + S)
    // cent(sub)(cell) = centroid array
    var cent = Array.tabulate(M, K)((s, k) => subv(vecs(k.toLong), s))
    def assignAll(c: Array[Array[Array[Double]]]) =
      vecs.toSeq.flatMap { case (id, v) =>
        (0 until M).map { s =>
          val sv = subv(v, s)
          val scored = (0 until K).map { k =>
            var d = 0.0; var i = 0
            while (i < S) { val t = sv(i) - c(s)(k)(i); d += t * t; i += 1 }
            (d, k)
          }
          val (d, k) = scored.minBy(identity)
          (id, s, sv, k, d)
        }
      }
    for (_ <- 1 to R) {
      val g = assignAll(cent)
      val next = Array.tabulate(M, K)((s, k) => cent(s)(k).clone())
      g.groupBy(a => (a._2, a._4)).foreach { case ((s, k), xs) =>
        for (p <- 0 until S) {
          val sq = xs.map(x => math.floor(x._3(p) * 1.0e7).toLong).sum
          next(s)(k)(p) = sq.toDouble / 1.0e7 / xs.size
        }
      }
      cent = next
    }
    val stats = assignAll(cent).groupBy(a => (a._2, a._4)).map { case (key, xs) =>
      key -> (xs.size.toLong, xs.map(x => math.floor(x._5 * 1.0e6).toLong).sum)
    }
    assert(rows.length === M * K * S)
    rows.foreach { r =>
      val (s, k, p) = (r.getAs[Long]("sub").toInt, r.getAs[Long]("cell").toInt,
        r.getAs[Number]("pos").intValue)
      assert(r.getAs[Double]("centroid") === cent(s)(k)(p),
        s"centroid drifted at sub=$s cell=$k pos=$p")
      val (n, iq) = stats.getOrElse((s, k), (0L, 0L))
      assert(r.getAs[Long]("n_members") === n)
      assert(r.getAs[Long]("inertia_q") === iq)
    }
  }

  test("w21: join-then-agg stream equals the driver pair rollup behind the min watermark") {
    val rows = StreamingQueries.w21JoinThenAgg.run(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("user_id"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val clicks = ev.filter(_._3 == "click")
    val tenMin = 600L * 1000000L
    val pairs = for {
      (pus, pu, _, pv) <- ev.filter(_._3 == "purchase")
      (cus, cu, _, _) <- clicks
      if cu == pu && cus >= pus - tenMin && cus < pus
    } yield (pus, BigDecimal(pv).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val maxP = ev.filter(_._3 == "purchase").map(_._1).max
    val maxC = clicks.map(_._1).max
    val wm = math.min(maxP / 1000L * 1000L, maxC / 1000L * 1000L) - tenMin
    val hourUs = 3600L * 1000000L
    val expected = pairs.groupBy(p => p._1 / hourUs * hourUs)
      .filter { case (hs, _) => hs + hourUs <= wm }
      .map { case (hs, ps) =>
        hs -> (ps.size.toLong, ps.map(_._2).sum.toDouble) }
    assert(rows.length === expected.size, "emitted hour set drifted")
    rows.foreach { r =>
      val hs = r.getAs[java.sql.Timestamp]("window_start").getTime * 1000L
      val (n, sv) = expected(hs)
      assert(r.getAs[Long]("n_pairs") === n)
      assert(r.getAs[Double]("sum_value") === sv)
    }
  }

  test("m12: scene rollups replay from m10's cut verdicts") {
    val diffs = Multimodal.m10SceneCut.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("diff_sum"), r.getAs[Long]("is_cut")))
    val rows = Multimodal.m12SceneStats.run(spark, sf).collect()
    val expected = diffs.groupBy(_._1).flatMap { case (doc, fs) =>
      var scene = 0L
      val tagged = fs.sortBy(_._2).map { case (_, idx, diff, cut) =>
        scene += cut; (scene, idx, diff)
      }
      tagged.groupBy(_._1).map { case (sc, xs) =>
        (doc, sc) -> (xs.length.toLong + (if (sc == 0) 1L else 0L),
          xs.map(_._3).sum,
          if (sc == 0) 0L else xs.map(_._2).min,
          xs.map(_._2).max)
      }
    }
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (nf, sd, ff, lf) = expected(
        (r.getAs[Long]("doc_id"), r.getAs[Long]("scene_id")))
      assert(r.getAs[Long]("n_frames") === nf)
      assert(r.getAs[Long]("sum_diff") === sd)
      assert(r.getAs[Long]("first_frame") === ff)
      assert(r.getAs[Long]("last_frame") === lf)
    }
  }

  test("p13: repeat plan replays from raw per-source token counts") {
    val rows = Curation.p13EpochMix.run(spark, sf).collect()
    val nat = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.map(_.getString(1).split(" ", -1).length.toLong).sum }
    val t = nat.values.sum
    val ns = nat.size.toLong
    assert(rows.length === nat.size)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val n = nat(s)
      val rep = math.min(4L, math.max(1L, (t / ns) / n))
      assert(r.getAs[Long]("natural_tokens") === n)
      assert(r.getAs[Long]("natural_ppm") === 1000000L * n / t)
      assert(r.getAs[Long]("target_tokens") === t / ns)
      assert(r.getAs[Long]("repeat_factor") === rep)
      assert(r.getAs[Long]("effective_tokens") === n * rep)
    }
    val et = rows.map(_.getAs[Long]("effective_tokens")).sum
    rows.foreach(r => assert(r.getAs[Long]("effective_ppm") ===
      1000000L * r.getAs[Long]("effective_tokens") / et))
  }

  test("w20: chained rollup equals the driver two-level rollup behind the watermark") {
    val rows = StreamingQueries.w20ChainedAgg.run(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wmUs = (ev.map(_._1).max / 1000L) * 1000L - 600L * 1000000L
    val q = 15L * 60 * 1000000L
    val buckets = ev.groupBy { case (us, et) => (us / q * q, et) }
      .map { case (k, v) => k -> v.size.toLong }
    val hours = buckets.toSeq
      .groupBy { case ((bs, et), _) => (bs / (4 * q) * (4 * q), et) }
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._2).sum) }
      .filter { case ((hs, _), _) => hs + 4 * q <= wmUs }
    assert(rows.length === hours.size, "emitted hour set drifted")
    rows.foreach { r =>
      val hs = r.getAs[java.sql.Timestamp]("window_start").getTime * 1000L
      val (nb, ne) = hours((hs, r.getAs[String]("event_type")))
      assert(r.getAs[Long]("n_buckets") === nb)
      assert(r.getAs[Long]("n_events") === ne)
    }
  }

  test("d13: incremental verdicts equal the full d3 pair set restricted to batch×corpus") {
    // d13 probes the SAME band index d3 self-joins, so its dup verdicts
    // must be exactly d3's verified >= 0.7 pairs with one endpoint in the
    // batch residue class and the other outside it
    val isBatch = (id: Long) => id % 20 == 7
    val fullDups = Dedup.d3MinHashLsh.run(spark, sf).collect()
      .filter(_.getAs[Int]("is_dup") == 1)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val minDupOf = fullDups
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .collect { case (nd, cd) if isBatch(nd) && !isBatch(cd) => nd -> cd }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val rows = Dedup.d13IncrementalMinHash.run(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === rows.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(isBatch(id), s"non-batch doc $id in the incremental output")
      val nd = r.getAs[Long]("n_dups")
      assert(r.getAs[Long]("n_candidates") >= nd)
      assert(r.getAs[Int]("admit") === (if (nd == 0) 1 else 0))
      minDupOf.get(id) match {
        case Some(minDup) =>
          assert(nd > 0, s"doc $id should be a dup per d3")
          assert(r.getAs[Long]("dup_of") === minDup)
        case None =>
          assert(nd === 0L, s"doc $id dup not present in d3's pair set")
          assert(r.isNullAt(r.fieldIndex("dup_of")))
      }
    }
  }

  test("d14: retire re-probe touches only affected probes and old verdicts equal d13") {
    // the deletion pass re-verdicts EXACTLY the batch docs with >= 1
    // retired candidate: old columns must equal d13's verdict for the
    // same doc, the retired candidates must actually leave (strictly
    // fewer new candidates), dups can only fall, and admits only flip
    // 0 -> 1 (resurrection)
    // sf0.01: the affected set (batch probes citing a retired candidate)
    // is empty at smoke scale — the corpus is too sparse for band hits
    val dir = "/root/testdata/sf0.01"
    val d13 = Dedup.d13IncrementalMinHash.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_dups"),
          if (r.isNullAt(r.fieldIndex("dup_of"))) None
          else Some(r.getAs[Long]("dup_of")))).toMap
    val rows = Dedup.d14RetireReprobe.run(spark, dir).collect()
    assert(rows.nonEmpty, "no affected probes at sf0.01 — retire class too thin")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (c13, d13n, d13dup) = d13(id)
      assert(r.getAs[Long]("old_n_candidates") === c13)
      assert(r.getAs[Long]("old_n_dups") === d13n)
      assert((if (r.isNullAt(r.fieldIndex("old_dup_of"))) None
              else Some(r.getAs[Long]("old_dup_of"))) === d13dup)
      assert(r.getAs[Long]("new_n_candidates") < r.getAs[Long]("old_n_candidates"),
        s"doc $id lost no candidate — not actually affected")
      assert(r.getAs[Long]("new_n_dups") <= r.getAs[Long]("old_n_dups"))
      val oldAdmit = r.getAs[Int]("old_admit")
      val newAdmit = r.getAs[Int]("new_admit")
      assert(oldAdmit === (if (d13n == 0) 1 else 0))
      assert(!(oldAdmit == 1 && newAdmit == 0),
        s"doc $id: deletion cannot create a new duplicate")
      assert(r.getAs[Int]("resurrected") ===
        (if (oldAdmit == 0 && newAdmit == 1) 1 else 0))
    }
  }

  test("w22: the streaming apply equals batch d13 row-for-row") {
    // the Structured Streaming contract at the dedup level: two REAL
    // micro-batches through the LSH probe + verify must reproduce the
    // batch verdicts exactly (both also share one oracle SQL)
    val batch = Dedup.d13IncrementalMinHash.run(spark, sf).collect().toSeq
    val stream = StreamingQueries.w22StreamIncrementalDedup.run(spark, sf)
      .collect().toSeq
    assert(stream === batch)
    assert(StreamingQueries.w22StreamIncrementalDedup.oracle ===
      Dedup.d13IncrementalMinHash.oracle)
  }

  test("w24: the streaming edge apply equals batch g11 row-for-row") {
    // the w22 stream==batch contract for the GRAPH family: two real
    // micro-batches of arriving edges through the standing-adjacency
    // probes must reproduce g11's verdicts exactly (one shared oracle)
    val batch = Graph.g11IncrementalEdges.run(spark, sf).collect().toSeq
    val stream = StreamingQueries.w24StreamIncrementalEdges.run(spark, sf)
      .collect().toSeq
    assert(stream === batch)
    assert(StreamingQueries.w24StreamIncrementalEdges.oracle ===
      Graph.g11IncrementalEdges.oracle)
  }

  test("e18: the manifest rows are internally consistent with their stage semantics") {
    val rows = EtlQueries.e18MaintenanceDag.run(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("stage_id")).toSeq === (1L to 6L))
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("compact", "merge", "dedup_apply", "ann_apply", "edge_apply",
        "payload_apply"))
    rows.foreach { r =>
      val (n, acted, kept) = (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_acted"), r.getAs[Long]("n_kept"))
      assert(n > 0, s"${r.getAs[String]("stage")}: empty stage")
      r.getAs[String]("stage") match {
        case "dedup_apply" | "ann_apply" | "payload_apply" =>
          // quarantined + admitted partition the batch
          assert(acted + kept === n)
        case "edge_apply" => assert(kept === n && acted <= n)
        case "merge" => assert(acted <= kept)
        case _ => ()
      }
    }
  }

  test("w25: the streaming payload apply equals batch m16 row-for-row") {
    // ... and for the PAYLOAD family: the per-row SimHash sign fold +
    // two band probes must reproduce m16's verdicts exactly
    val batch = Multimodal.m16IncrementalPayloads.run(spark, sf).collect().toSeq
    val stream = StreamingQueries.w25StreamIncrementalPayloads.run(spark, sf)
      .collect().toSeq
    assert(stream === batch)
    assert(StreamingQueries.w25StreamIncrementalPayloads.oracle ===
      Multimodal.m16IncrementalPayloads.oracle)
  }

  test("m15: the epoch schedule is a dense per-epoch permutation of m5's packs, worker-strided") {
    val rows = Multimodal.m15LoaderOrder.run(spark, sf).collect()
    val packs = Multimodal.m5ShardPack.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"))).toSet
    val byEpoch = rows.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet === Set(0L, 1L, 2L))
    byEpoch.foreach { case (_, es) =>
      // dense rank 1..P, each pack exactly once, strided worker deal
      assert(es.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to packs.size).toSeq)
      assert(es.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"))).toSet === packs)
      es.foreach { r =>
        val rnk = r.getAs[Long]("rnk")
        assert(r.getAs[Long]("worker") === (rnk - 1) % 8)
        assert(r.getAs[Long]("worker_seq") === (rnk - 1) / 8)
      }
      // running worker bytes really are the running sum in rank order
      es.groupBy(_.getAs[Long]("worker")).foreach { case (_, ws) =>
        var cum = 0L
        ws.sortBy(_.getAs[Long]("rnk")).foreach { r =>
          cum += r.getAs[Long]("pack_bytes")
          assert(r.getAs[Long]("worker_cum_bytes") === cum)
        }
      }
    }
    // the md5 tape actually reshuffles between epochs
    def order(e: Long) = byEpoch(e).sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"))).toSeq
    assert(order(0L) !== order(1L), "epoch shuffle is a no-op")
  }

  test("s21: every batch vector gets one verdict consistent with its refined shortlist") {
    val rows = Similarity.s21IncrementalAnnApply.run(spark, sf).collect()
    val allIds = graft.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val batchIds = allIds.filter(_ % 20 == 7).sorted.toSeq
    // exactly the batch residue class, once each, in order
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq === batchIds)
    rows.foreach { r =>
      val nCand = r.getAs[Long]("n_cand")
      val nDups = r.getAs[Long]("n_dups")
      // dups are counted inside the <=5-row refined shortlist
      assert(nDups <= math.min(5L, nCand))
      assert(r.getAs[Long]("admit") === (if (nDups == 0) 1L else 0L))
      if (nCand == 0) {
        assert(r.isNullAt(r.fieldIndex("nn_id")), "nn without candidates")
        assert(r.isNullAt(r.fieldIndex("nn_cosine")))
      } else {
        val nn = r.getAs[Long]("nn_id")
        assert(nn % 20 != 7, s"nearest neighbor $nn is a batch vector")
        val c = r.getAs[Double]("nn_cosine")
        assert(c >= -1.0000005 && c <= 1.0000005)
      }
    }
    // the 5% batch must actually find neighbors somewhere (index probed)
    assert(rows.exists(_.getAs[Long]("n_cand") > 0))
  }

  test("p15: DAG witnesses equal the standalone stage operators; schedule is a dense pack permutation") {
    val rows = Curation.p15CurationDag.run(spark, sf).collect()
    assert(rows.nonEmpty)
    // stage-count witnesses are constant columns; check them against the
    // standalone operators they compose
    val nGated = rows.head.getAs[Long]("n_gated")
    val nRetained = rows.head.getAs[Long]("n_retained")
    val nTrain = rows.head.getAs[Long]("n_train")
    val nDecon = rows.head.getAs[Long]("n_decon_removed")
    val t20Pass = TextAnalysis.t20GopherRules.run(spark, sf).collect()
      .filter(_.getAs[Long]("passes") == 1L).map(_.getAs[Long]("doc_id")).toSet
    assert(nGated === t20Pass.size.toLong)
    val d7Kept = Dedup.d7DedupApply.run(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(nRetained === (t20Pass intersect d7Kept).size.toLong)
    assert(nTrain + nDecon <= nRetained)
    // per-epoch: dense rank over one shared pack set; token conservation
    val byEpoch = rows.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet === Set(0L, 1L, 2L))
    val packSet = byEpoch(0L)
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"))).toSet
    byEpoch.foreach { case (_, es) =>
      assert(es.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to packSet.size).toSeq)
      assert(es.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_id"))).toSet === packSet)
      assert(es.map(_.getAs[Long]("n_docs")).sum === nTrain)
      es.foreach(r => assert(r.getAs[Long]("worker") === (r.getAs[Long]("rnk") - 1) % 8))
    }
  }

  test("g11: per-edge verdicts are internally consistent and degree-capped") {
    val rows = Graph.g11IncrementalEdges.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y) = (r.getAs[Long]("supp_x"), r.getAs[Long]("supp_y"))
      assert(x < y, "mutual edges are oriented x < y")
      assert((x + y) % 10 === 3, s"non-batch edge ($x,$y) in the apply output")
      val cn = r.getAs[Long]("triangles_closed")
      val (dx, dy) = (r.getAs[Long]("deg_x"), r.getAs[Long]("deg_y"))
      // standing degrees are capped by the mutual-top-K construction
      assert(dx <= 8 && dy <= 8)
      // a closed triangle needs a standing neighbor at BOTH endpoints
      assert(cn <= math.min(dx, dy))
      val expectedJ = if (dx + dy - cn == 0) 0L else (1000000L * cn) / (dx + dy - cn)
      assert(r.getAs[Long]("jaccard_ppm") === expectedJ)
      assert(r.getAs[Long]("predicted") === (if (cn >= 2) 1L else 0L))
    }
  }

  test("m16: every new payload gets one verdict; dups cite standing docs at hamming <= 1") {
    val rows = Multimodal.m16IncrementalPayloads.run(spark, sf).collect()
    val expected = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) > 0)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 20 == 7).sorted.toSeq
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === expected)
    rows.foreach { r =>
      val sig = r.getAs[Long]("sig")
      assert(sig >= 0 && sig < (1L << 16), "16-plane signature out of range")
      val nd = r.getAs[Long]("n_dups")
      assert(nd <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("admit") === (if (nd == 0) 1L else 0L))
      if (nd > 0) {
        val dup = r.getAs[Long]("dup_of")
        assert(dup % 20 != 7, s"dup_of $dup cites a batch doc, not the standing corpus")
      } else assert(r.isNullAt(r.fieldIndex("dup_of")))
    }
  }

  test("w23: the streaming ANN apply equals batch s21 row-for-row") {
    // w22's stream==batch contract, lifted from documents to vectors:
    // two REAL micro-batches through the codebook-fold assignment +
    // index probe + refine must reproduce the batch verdicts exactly
    val batch = Similarity.s21IncrementalAnnApply.run(spark, sf).collect().toSeq
    val stream = StreamingQueries.w23StreamIncrementalAnn.run(spark, sf)
      .collect().toSeq
    assert(stream === batch)
    assert(StreamingQueries.w23StreamIncrementalAnn.oracle ===
      Similarity.s21IncrementalAnnApply.oracle)
  }

  test("m14: page-keyed top-k replays from the closed-form pixel model and quantized embeddings") {
    val rows = Multimodal.m14CrossModalPairs.run(spark, sf).collect()
    def bins(id: Long): Array[Long] = {
      val w = 8 + (id % 16).toInt; val h = 8 + (id % 8).toInt
      val b = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        b((x * 3 + y * 5) % 64) += (id + 7L * x + 13L * y) % 256
        b((x * 3 + y * 5 + 1) % 64) += (3L * id + 5L * x + 11L * y) % 256
        b((x * 3 + y * 5 + 2) % 64) += (id + x.toLong * y) % 256
      }
      b
    }
    val emb = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(x => math.floor(x * 1000.0).toLong).toArray)
      .filter { case (id, _) => id % 3 != 0 }
    val imgs = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 3 == 0)
    val expected = imgs.flatMap { img =>
      val iv = bins(img)
      emb.filter { case (t, _) => t / 50 == img / 50 }
        .map { case (t, qv) =>
          (img, t, img / 50, iv.zip(qv).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (_, t, _, d) => (-d, t) }
        .take(3).zipWithIndex
        .map { case ((i, t, p, d), k) => (i, t, p, d, (k + 1).toLong) }
    }.sortBy(r => (r._1, r._5))
    val got = rows.map(r => (r.getAs[Long]("img_id"), r.getAs[Long]("txt_id"),
      r.getAs[Long]("page"), r.getAs[Long]("dot"), r.getAs[Long]("rnk")))
    assert(got.toSeq === expected.toSeq)
  }
}

/** tiny accessor kept out of the test bodies for reuse */
private object Textish {
  def t9Rows(spark: org.apache.spark.sql.SparkSession, sf: String)
      : Array[(Long, Long, Long, Double, Double)] =
    TextAnalysis.t9Repetition.run(spark, sf)
      .select("doc_id", "n_words", "n_distinct", "distinct_ratio", "top_word_ratio")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
}
