package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** One bench session — the exact config Verify uses (see the inline
    * rationale on each knob). Rebuilt PER FAMILY CHUNK (round 11): the
    * session-inflation class (m4 r8, dp19 r9, w23/s14 r10 — a query slow
    * in the full run but fast solo, from storage-pool pressure of LIVE
    * session-cached artifacts accumulated by earlier families) is killed
    * structurally by giving each query family a fresh session, so every
    * in-record number IS the solo-session number and no solo replay
    * adjudication is needed. Restart cost sits OUTSIDE the per-query
    * timers (the metric is the sum of query seconds, not process wall
    * clock). The few cross-family artifact consumers (p14/p15 read the
    * d-family cluster table) now rebuild those artifacts inside their
    * own chunk — which is exactly what a solo run of that family pays,
    * so in-session and solo numbers agree by construction.
    */
  private def buildSession(sfDir: String, cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // see HarnessConf: dev-only RocksDB + soak zstd-shuffle switches
    val spark = HarnessConf.extraConf.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      // default: one shuffle partition per core. At soak scales (sf100:
      // billion-row shuffles) override so partitions fit in memory — the
      // design rule is partitions sized to the target SF, and AQE
      // coalescing folds the excess away on small queries.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep AQE (coalescing, skew splits) but disable RUNTIME demotion
      // of shuffle joins to broadcast: demotion cancels the in-flight map
      // stage, cancelled tasks are not reliably interruptible, and the
      // abandoned work degrades every later query (measured 5-10×,
      // intermittent). Every small-dim join in the registry already
      // broadcasts EXPLICITLY at plan time, so demotion had nothing left
      // to win here.
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // shuffle files + sort spills on tmpfs: the bench box is a shared
      // VM whose disk stalls under co-tenant writeback throttling
      // (observed: write/shuffle-heavy queries intermittently 5-10×
      // while CPU calibration stays clean); RAM-backed local dirs take
      // host disk out of the measurement. A real cluster points this at
      // executor-local NVMe.
      .config("spark.local.dir", {
        val shm = ops.StreamingQueries.fastTmpDir("graft_local_bench")
        // soak runs set SPARK_GRAFT_SCRATCH_DISK to a disk path: Spark
        // round-robins blocks across the two roots, halving the RAM
        // pressure of tmpfs-only scratch (the sf100 OOM class) the way
        // executor-local NVMe would on a real cluster
        sys.env.get("SPARK_GRAFT_SCRATCH_DISK") match {
          case Some(d) =>
            shm + "," + ops.StreamingQueries.scratchDirAt(d, "graft_local_bench")
          case None => shm
        }
      })
      // single-use localCheckpoint pins (d12 windows, t14
      // bigrams…) become garbage the moment their query's count() ends,
      // but ContextCleaner only reaps them after a DRIVER GC — and the
      // default periodic GC (30 min) never fires inside one chunk. A 45s
      // periodic GC keeps dead pins reaped at negligible cost (measured
      // at sf10: m4 164.7s → 61.8s before chunking existed).
      .config("spark.cleaner.periodicGC.interval", "45s")
      ) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // when AQE cancels a superseded stage (runtime join replan), actually
    // interrupt its tasks — otherwise an abandoned aggregate keeps burning
    // cores as a zombie and every later query's time is noise.
    // Thread-locality note: this local property covers jobs submitted from
    // THIS thread only. The streaming (w*) queries' micro-batch jobs run on
    // StreamExecution threads, which are covered independently —
    // StreamExecution.runStream sets its own job group with
    // interruptOnCancel=true (verified in spark-sql 4.1.2 bytecode:
    // iconst_1 before the SparkContext.setJobGroup(String,String,Z) call in
    // o.a.s.sql.execution.streaming.runtime.StreamExecution).
    spark.sparkContext.setLocalProperty("spark.job.interruptOnCancel", "true")
    // warm up the executor pool + parquet reader so the chunk's first
    // measured query doesn't absorb session-start cost (codegen caches
    // are JVM-global, so later sessions warm in well under a second)
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    var spark = buildSession(sfDir, cpus)
    // metric is wall-clock over .count() per the driver's BASELINE.md
    // definition; note count() lets Catalyst prune final projections of
    // map-shaped queries — full-result execution is exercised by Verify,
    // which writes every query's complete output
    // fixed-work machine-speed sanity probes, reported alongside the
    // query times: cross-round comparisons are only meaningful scaled by
    // these (the bench box is a shared VM — host contention between
    // rounds shows up here as a uniform shift, distinct from a real
    // engine regression)
    val calT0 = System.nanoTime()
    spark.range(3000000000L).selectExpr("sum(id % 1000)").collect()
    val calPar = (System.nanoTime() - calT0) / 1e9
    val calS0 = System.nanoTime()
    var calAcc = 0L; var calI = 0L
    while (calI < 300000000L) { calAcc += calI * 31; calI += 1 }
    val calSingle =
      if (calAcc != 0L) (System.nanoTime() - calS0) / 1e9 else -1.0
    // dev-only subset (comma-separated names); the driver never sets it,
    // so its runs always measure the full registry
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // dev-only per-query trace on stderr (never set by the driver)
    val trace = sys.env.get("SPARK_GRAFT_BENCH_TRACE").contains("1")
    // dev-only escape hatch: one shared session, the pre-round-11 shape
    val oneSession = sys.env.get("SPARK_GRAFT_BENCH_ONE_SESSION").contains("1")
    // per-query storage-pool sample, taken right AFTER the query's
    // count() returns: cached bytes actually resident (getRDDStorageInfo
    // filters to blocks with storage) plus the count of LIVE pinned RDDs
    // (registered localCheckpoints/persists not yet reaped by
    // ContextCleaner). With per-family sessions this now reads the
    // FAMILY's own pool only — pressure in the record is pressure the
    // family itself created.
    def storageSample(): (Double, Int) = {
      val mem = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e6
      val pins = spark.sparkContext.getPersistentRDDs.size
      (mem, pins)
    }
    // family = the query-name prefix before the first digit (c, d, dp, e,
    // g, m, p, q, s, t, w); the sorted name order groups each family
    // contiguously, so chunking preserves the historical execution order
    def family(name: String): String = name.takeWhile(!_.isDigit)
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val chunkFamilies = scala.collection.mutable.ListBuffer.empty[String]
    val triples = sorted.zipWithIndex.map { case ((name, fn), i) =>
      val f = family(name)
      if (chunkFamilies.lastOption.contains(f)) ()
      else {
        // chunk boundary: a fresh session per family (see buildSession)
        if (i > 0 && !oneSession) { spark.stop(); spark = buildSession(sfDir, cpus) }
        chunkFamilies += f
      }
      if (trace) System.err.println(s"[bench] ${System.currentTimeMillis()} start $name")
      val t0 = System.nanoTime()
      // record failures explicitly: a thrown count() used to leave an
      // indistinguishable wall-clock number in the record (at sf100 a
      // driver-maxResultSize abort looked like a normal 42s query) —
      // failed queries now land in the record's "errors" list
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 if (trace) System.err.println(
                   s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
                 false }
      val sec = (System.nanoTime() - t0) / 1e9
      val (poolMb, pins) = storageSample()
      (name, sec, (poolMb, pins), ok)
    }
    val results = triples.map { case (n, s, _, _) => n -> s }.toMap
    val storage = triples.map { case (n, _, sp, _) => n -> sp }.toMap
    val failed = triples.collect { case (n, _, _, false) => n }.sorted
    // re-run the parallel probe AFTER the query loop: contention that
    // arrives mid-run is invisible to the start-of-run sample, so the
    // pair brackets the run (matching values = clean run; a higher end
    // value = totals are contention-inflated)
    val calT1 = System.nanoTime()
    spark.range(3000000000L).selectExpr("sum(id % 1000)").collect()
    val calParEnd = (System.nanoTime() - calT1) / 1e9
    val (full, compact) = renderRecords(results, failed, storage,
      chunkFamilies.toSeq, calSingle, calPar, calParEnd, sfDir)
    // the full map to a bare file at an absolute path (sbt's cwd is the
    // repo root; resolve explicitly so a different launcher cwd still
    // lands it somewhere findable)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      java.nio.file.Paths.get(sys.props("user.dir"), "bench_out.json").toString)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), full + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
    // stdout LAST, after spark.stop(), so no late WARN line splits it;
    // the driver keeps only the final ~2000 chars of output, so the full
    // 210-query map gets truncated mid-line — print the full line first
    // for humans, then a compact line (full-run totals, top-20 query
    // breakdown) as the very last output so at least one complete
    // parseable JSON line sits inside the tail window.
    println(full)
    println(compact)
  }

  /** Render the (full, compact) record lines. Pure — unit-tested by
    * BenchRecordSpec. BOTH lines carry totals computed from the FULL
    * results map; the compact line differs only in its per-query
    * breakdown (top-20 by time) and in omitting storage snapshots.
    * Round-12 regression (VERDICT r12 item 1): the renderer used to sum
    * the map it was GIVEN, so the compact line — the only complete JSON
    * line inside the driver's 2000-char tail window — reported the
    * top-20 sum (107.2s) as the 210-query total (really 265.5s).
    *
    * Headline totals count SUCCESSFUL queries only — a failed query's
    * elapsed time (often a multi-minute abort) would skew comparisons
    * between runs with different error sets; its wall time stays visible
    * per-query and in failed_sec, and n_failed makes the denominator
    * asymmetry explicit (ADVICE r12).
    *
    * Host-noise normalization: the bench box is a shared VM, and the
    * recorded back-to-back evidence (176.7s vs 124.6s identical runs,
    * start calibrations 0.975 vs 0.541 — SURVEY §7.8) means a single
    * contended run can false-fail a 2× wall-clock gate. The calibration
    * probes measure fixed work, so host contention is a multiplier on
    * them too: value_normalized = value × (CAL_REF / cal_measured),
    * where cal_measured is the mean of the start/end parallel brackets
    * (contention arriving mid-run is visible in the end bracket) and
    * CAL_REF is the clean-host parallel calibration recorded in round 5.
    * The raw value stays authoritative; the normalized one is what
    * cross-round comparisons should read (README "Benchmark" section).
    */
  private[graft] def renderRecords(
      results: Map[String, Double],
      failed: Seq[String],
      storage: Map[String, (Double, Int)],
      chunkFamilies: Seq[String],
      calSingle: Double,
      calPar: Double,
      calParEnd: Double,
      sfDir: String): (String, String) = {
    def fmt(v: Double): String = f"$v%.3f"
    val calRef = 0.320
    val calMeasured = (calPar + calParEnd) / 2.0
    val failedSet = failed.toSet
    val totalSec = results.collect { case (k, v) if !failedSet(k) => v }.sum
    val failedSec = results.collect { case (k, v) if failedSet(k) => v }.sum
    val normSec =
      if (calMeasured > 0) totalSec * (calRef / calMeasured) else totalSec
    def jsonLine(m: Map[String, Double], withStorage: Boolean): String = {
      val qs = m.toSeq.sortBy(-_._2)
        .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // post-query storage snapshots, same (time-descending) key order
      val st =
        if (!withStorage) ""
        else m.toSeq.sortBy(-_._2).map { case (k, _) =>
          val (mb, pins) = storage.getOrElse(k, (0.0, 0))
          s"\"" + k + s"""":{"pool_mb":${fmt(mb)},"pins":$pins}"""
        }.mkString(""","storage":{""", ",", "}")
      // chunk record: each listed family ran in its own fresh session,
      // in this order (so every number is a solo-session number)
      val ch = chunkFamilies.map("\"" + _ + "\"").mkString("[", ",", "]")
      val er = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${fmt(totalSec)},"unit":"sec","n_queries":${results.size},""" +
        s""""n_failed":${failed.size},""" +
        s""""errors":$er,"failed_sec":${fmt(failedSec)},""" +
        s""""value_normalized":${fmt(normSec)},"cal_ref":${fmt(calRef)},""" +
        s""""cal_single_sec":${fmt(calSingle)},"cal_parallel_sec":${fmt(calPar)},""" +
        s""""cal_parallel_end_sec":${fmt(calParEnd)},""" +
        s""""session_chunks":$ch,""" +
        s""""queries":$qs$st,"sf":"$sfDir"}"""
    }
    (jsonLine(results, withStorage = true),
      jsonLine(results.toSeq.sortBy(-_._2).take(20).toMap,
        withStorage = false))
  }
}
