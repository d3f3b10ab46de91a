package graft.ops

import graft.{Q, Tables}
import graft.streaming.EventsStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Structured Streaming pipelines under the DuckDB oracle gate: each
  * query REALLY runs the streaming engine — `readStream` over the events
  * parquet, the `graft.streaming.EventsStream` transform, a
  * `Trigger.AvailableNow` run into a sink — and the drained sink is
  * compared against the batch-SQL oracle. This is the hard evidence
  * that the streaming operators compute the same answer as their batch
  * twins (the Structured Streaming contract), not just that their specs
  * pass.
  *
  * Sink discipline (round 13): NO memory sink anywhere. Append-mode
  * streams sink straight to a parquet FILE sink — tasks write
  * executor-side, only commit metadata reaches the driver, so result
  * size never rides `spark.driver.maxResultSize` (at sf100 the old
  * memory sink aborted w14 at 1.05 GB and w15 at 1.8 GB of serialized
  * task results). Complete-mode aggregates drain through `foreachBatch`
  * with an executor-side parquet overwrite per batch — the last batch
  * leaves the complete answer (the memory sink collected the Complete
  * result to the driver every batch; w4's per-user session result has
  * corpus-scale group cardinality and kernel-OOM-killed the sf100 JVM
  * at 68 GB RSS). Both are the production 100 TB shapes.
  */
object StreamingQueries {

  /** Drive a streaming frame through the engine with AvailableNow and
    * return the drained sink as a DataFrame.
    *
    * The state store materializes one file per shuffle partition per
    * operator per micro-batch; at the oracle/bench scale that fixed IO
    * dwarfs the data, so the stream runs with a bounded partition count
    * (state sharding is per-key within a partition — results are
    * identical; a 100 TB deployment raises it back via the same conf).
    */
  /** Scratch dirs (checkpoints, staged inputs, drained sinks) go to
    * tmpfs when the platform has one: the state store fsyncs one delta
    * file per partition per operator per micro-batch, and on a disk-backed
    * temp dir that fixed IO dominates the whole gate at bench scale. A
    * production deployment points `checkpointLocation` at durable shared
    * storage instead — this is gate/bench scratch, not the durability
    * path.
    */
  private val scratchRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()

  // deleteOnExit cannot remove non-empty dirs and the state store writes
  // nested offsets/commits/state subtrees after dir creation — a recursive
  // shutdown hook is the only way the tmpfs scratch actually gets freed.
  private lazy val scratchCleanup: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchRoots.forEach { root =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(root)
      }))
    ()
  }

  // tmpfs scratch competes with the JVM heap for physical RAM: guard on
  // free space so a large staged copy degrades to disk tmp instead of
  // failing with ENOSPC/OOM-kill mid-query. 4 GiB headroom covers the
  // largest staged side-copy at the gate/bench scale with margin.
  private val shmMinFreeBytes = 4L * 1024 * 1024 * 1024

  // log the chosen scratch root class once per JVM — fastTmpDir's silent
  // fallback to disk tmp changes what the bench measures across machines,
  // so the run output must record which one this run actually used.
  private val loggedRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def fastTmpDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val shmOk = java.nio.file.Files.isDirectory(shm) &&
      java.nio.file.Files.isWritable(shm) &&
      shm.toFile.getUsableSpace >= shmMinFreeBytes
    val p =
      if (shmOk) java.nio.file.Files.createTempDirectory(shm, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    val rootClass = if (shmOk) "tmpfs:/dev/shm" else "disk:" + sys.props("java.io.tmpdir")
    if (loggedRoots.add(rootClass))
      System.err.println(s"[graft] scratch root: $rootClass " +
        s"(usable ${p.getParent.toFile.getUsableSpace / (1024 * 1024)} MiB)")
    scratchCleanup
    scratchRoots.add(p.toFile)
    p.toString
  }

  /** Scratch dir under an EXPLICIT root (registered for shutdown
    * cleanup like [[fastTmpDir]]): used to add a disk root next to the
    * tmpfs root in `spark.local.dir` — Spark round-robins shuffle/spill
    * blocks across the listed dirs, so a RAM-backed-only scratch (which
    * competes with the heap for physical RAM and OOM-killed the sf100
    * soak at ~70 GB of spill) splits its pressure with the disk, the
    * way executor-local NVMe would on a real cluster.
    */
  private[graft] def scratchDirAt(rootPath: String, prefix: String): String = {
    val root = java.nio.file.Paths.get(rootPath)
    java.nio.file.Files.createDirectories(root)
    val p = java.nio.file.Files.createTempDirectory(root, prefix)
    scratchCleanup
    scratchRoots.add(p.toFile)
    p.toString
  }

  /** Checkpoint dirs of the last crash-recovery gate runs (w16/w18) —
    * exposed so the recovery pin in PlanSpec can assert the restarted
    * phase RESUMED the committed offsets log (contiguous batch ids from
    * 0, one commit per started batch) instead of starting a fresh log or
    * replaying. A replay/fresh-log failure also breaks the oracle hash,
    * but the pin localizes the diagnosis to the checkpoint mechanics.
    */
  @volatile private[graft] var w16LastCkpt: String = _
  @volatile private[graft] var w18LastCkpt: String = _

  private def runStream(spark: SparkSession, name: String, df: DataFrame,
      mode: OutputMode): DataFrame = {
    spark.catalog.dropTempView(name)
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val target = sys.env.getOrElse("GRAFT_STREAM_PARTITIONS", "4").toInt
    if (saved.toInt > target) spark.conf.set(key, target.toString)
    val out = fastTmpDir(s"graft_sink_$name")
    val append = mode == OutputMode.Append()
    try {
      // Append-mode streams sink STRAIGHT to parquet: the file sink's
      // tasks write their partitions executor-side and send only commit
      // metadata to the driver, so the result size never touches
      // spark.driver.maxResultSize. The memory sink, by contrast, ships
      // every task's ROWS to the driver inside the micro-batch itself —
      // at sf100 w14's joined output (1.05 GB serialized) and w15's
      // session frame (1.8 GB) aborted the stage on maxResultSize
      // (round-12 soak). This is also exactly what a production 100 TB
      // deployment does: writeStream.format("parquet") with the same
      // transforms and plan shape (shuffle on group keys, state-store
      // sharding by key, watermark eviction).
      // Complete-mode aggregates keep the memory sink — the file sink
      // only supports Append, and a Complete result is bounded by the
      // group-key cardinality, not the corpus.
      val writer0 = df.writeStream
        .outputMode(mode)
        .option("checkpointLocation", fastTmpDir(s"graft_ckpt_$name"))
        .trigger(Trigger.AvailableNow())
      // The overwrite-per-batch drain below is CORRECT ONLY for
      // Complete mode (each batch re-emits the full result). An
      // Update-mode stream would keep only the last batch's changed
      // rows — fail loudly rather than return a silently-partial
      // result if a future caller passes Update.
      require(append || mode == OutputMode.Complete(),
        s"runStream($name): unsupported output mode $mode — only " +
          "Append (file sink) and Complete (overwrite drain) are wired")
      val q =
        if (append) writer0.format("parquet").option("path", out).start()
        else writer0.foreachBatch { (b: DataFrame, _: Long) =>
          // Complete mode re-emits the FULL updated result each batch:
          // overwrite the snapshot, executor-side — the last batch leaves
          // the complete answer as parquet. The memory sink used here
          // before round 13 collected the result to the driver inside
          // the micro-batch; at sf100 w4's per-user session result
          // (corpus-scale group cardinality) kernel-OOM-killed the JVM
          // at 68 GB RSS. foreachBatch + parquet keeps rows executor-side
          // whatever the group cardinality.
          b.write.mode("overwrite").parquet(out); ()
        }.start()
      q.awaitTermination()
    } finally spark.conf.set(key, saved)
    // explicit schema on the read-back: an append-mode stream that
    // legitimately emits zero rows leaves a metadata log with zero
    // committed files (and a zero-batch Complete run writes nothing),
    // where schema inference would fail
    spark.read.schema(df.schema).parquet(out)
  }

  /** The test tables are single parquet FILES; the file streaming source
    * requires a DIRECTORY (at scale an events table is one anyway). Stage
    * the table as TWO ts-range-partitioned files once per (JVM, dataset):
    * with `maxFilesPerTrigger=1` in [[graft.streaming.EventsStream.read]],
    * AvailableNow then runs two REAL micro-batches in event-time order,
    * so aggregation/session/dedup state genuinely carries across batch
    * boundaries and the watermark advances between batches — a much
    * stronger batch-equivalence claim than one batch of everything.
    * In-order arrival means no row is ever behind the 10-minute
    * watermark, so nothing is late-dropped and the drained sink still
    * equals the batch oracle exactly. Batch ORDER must be forced via
    * STRICTLY INCREASING modification times (part-0000k, which holds
    * ascending ts range k, gets t0+k·60s): the file source breaks
    * equal-modtime ties by local-FS readdir order, which follows
    * creation order, i.e. task completion order — nondeterministic
    * (observed once in a w15 run: the newer half scheduled first, its
    * watermark ran ahead, and the older half's rows arrived late). Two
    * batches, not more: each extra micro-batch re-pays the state-store
    * file IO per partition per operator — one boundary crossing proves
    * the property at half the gate cost of three.
    */
  private val stagedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def eventsPath(spark: SparkSession, dir: String): String =
    stagedDirs.getOrElseUpdate(dir, {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val out = fastTmpDir("graft_stream_events")
      // staged-file contract: ts is a raw LONG of epoch NANOS, whatever
      // the driver's parquet physical type (NANOS reads as a ns long via
      // nanosAsLong; MICROS reads as a timestamp → µs·1000). Everything
      // downstream (EventsStream.read's `ts div 1000`, the w17 late-row
      // builder's ns arithmetic) keys off this one normalization.
      val src = spark.read.parquet(s"${dir.stripSuffix("/")}/events.parquet")
      val canon = src.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => src
        case _ => src.withColumn("ts",
          unix_micros(col("ts").cast(
            org.apache.spark.sql.types.TimestampType)) * 1000L)
      }
      // Deterministic, session-bisecting split point — NOT
      // repartitionByRange's SAMPLED boundary. The sampled split moves
      // with scale and run: at sf10 (10M events) it landed inside a
      // quiet gap where no session spanned the file boundary, voiding
      // w18's state-recovery invariant (the fourth scale-decade bug
      // class: sampled-exchange nondeterminism breaking a staging
      // contract); the exact MEDIAN has the mirror problem at sf0.01,
      // where the median falls in a lull. So the boundary is chosen to
      // bisect a real session by construction: the midpoint of the
      // in-session consecutive event pair (gap < 30 min, strictly
      // increasing) closest to the exact median — total order on
      // (|mid − median|, mid), exact integer arithmetic, so every run
      // at every scale stages identical halves AND some user's session
      // is provably open across the boundary. Falls back to the median
      // when no such pair exists (ultra-sparse smoke data; w18's span
      // check logs-and-continues there).
      val medianTs = canon
        .agg(expr("percentile(ts, 0.5)")).head.getDouble(0).toLong
      val gapNs = 30L * 60 * 1000000000L
      val pairW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val boundary = canon
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("ts"), 1).over(pairW))
        .filter(col("nxt") > col("ts") && col("nxt") - col("ts") < gapNs)
        .select(expr("(ts + nxt) div 2").as("mid")) // integer div: no double rounding at 1e18 ns
        .orderBy(abs(col("mid") - medianTs), col("mid"))
        .limit(1).collect().headOption.map(_.getLong(0))
        .getOrElse(medianTs)
      Seq(("part-0", col("ts") <= boundary), ("part-1", col("ts") > boundary))
        .foreach { case (name, cond) =>
          val tmp = fastTmpDir(s"graft_stream_half_$name")
          canon.filter(cond).repartition(1).write.mode("overwrite").parquet(tmp)
          val f = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
            .filter(x => x.getName.startsWith("part-") && x.getName.endsWith(".parquet"))
          require(f.length == 1, s"staging half $name: expected 1 file")
          java.nio.file.Files.move(f(0).toPath,
            java.nio.file.Paths.get(out, s"$name.parquet"))
        }
      val root = new java.io.File(out)
      root.deleteOnExit()
      val files = Option(root.listFiles()).getOrElse(Array.empty)
      files.foreach(_.deleteOnExit())
      // deterministic micro-batch order (see scaladoc above)
      val t0 = System.currentTimeMillis()
      files.filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) => f.setLastModified(t0 + i * 60000L) }
      out
    })

  /** Tumbling 1h windowed aggregation on the streaming engine, Complete
    * mode (watermark present but non-evicting) — every window emits, so
    * the result equals the batch `date_trunc` aggregate regardless of how
    * AvailableNow splits the input into micro-batches.
    */
  val w3StreamTumbling: Q = Q.sql(
    "w3_stream_tumbling",
    "Streaming tumbling 1h window x event_type (readStream -> memory sink) vs batch SQL.",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
    val stream = EventsStream.tumblingCounts(
      EventsStream.read(spark, eventsPath(spark, dir)))
    runStream(spark, "w3_stream_tumbling", stream, OutputMode.Complete())
      .orderBy("window_start", "event_type")
  }

  /** Native session windows (30-minute gap) on the streaming engine,
    * Complete mode (the session-window streaming aggregation rejects
    * Update; Complete emits every merged session, so the drained sink
    * equals the batch gaps-and-islands oracle).
    */
  val w4StreamSession: Q = Q.sql(
    "w4_stream_session",
    "Streaming session_window(ts, 30 min) per user (readStream -> memory sink) vs gaps-and-islands SQL.",
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       COUNT(*) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    val stream = EventsStream.sessionCounts(
      EventsStream.read(spark, eventsPath(spark, dir)))
    runStream(spark, "w4_stream_session", stream, OutputMode.Complete())
      .orderBy("user_id", "session_start")
  }

  /** Streaming exact dedup with bounded state: the input is the stream
    * unioned with itself (every event arrives twice), and
    * `dropDuplicatesWithinWatermark` must emit each event exactly once.
    * The oracle is simply the events table — if any duplicate leaked or
    * any row was dropped, the row count and hash both break.
    */
  val w5StreamDedup: Q = Q.sql(
    "w5_stream_dedup",
    "Streaming dropDuplicatesWithinWatermark over a self-unioned (fully duplicated) event stream.",
    """SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
      |FROM events ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val once = EventsStream.read(spark, eventsPath(spark, dir))
    val twice = once.union(EventsStream.read(spark, eventsPath(spark, dir)))
    val stream = EventsStream.dedupedEvents(twice)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
    runStream(spark, "w5_stream_dedup", stream, OutputMode.Append())
      .orderBy("event_id")
  }

  /** The custom sessionizer (the `flatMapGroupsWithState` logic run to
    * completion in batch via `finalizeSessions`) against the same
    * gaps-and-islands oracle as the native session_window — hard evidence
    * the hand-rolled state machine computes identical sessions.
    */
  val w6CustomSessionizer: Q = Q.sql(
    "w6_custom_sessionizer",
    "Custom per-user session state machine (flatMapGroups) vs gaps-and-islands SQL.",
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventsStream.Event]
    EventsStream.finalizeSessions(ev).toDF()
      .orderBy("user_id", "session_start")
  }

  /** Stream-stream inner join: click events joined to the purchases they
    * precede by <10 minutes, per user — the streaming twin of the q22
    * banded range join. Both sides carry watermarks and the join
    * condition bounds event-time distance, so each side's state store
    * holds only a ~10-minute sliding horizon of rows (the unbounded-state
    * hazard of stream-stream joins is exactly what the time-range bound
    * exists to prevent). Inner-join matches emit as they are found
    * (Append); the watermark governs state eviction only, so the drained
    * sink equals the batch join.
    */
  val w7StreamJoin: Q = Q.sql(
    "w7_stream_join",
    "Stream-stream inner join: clicks within 10 min before each purchase, per user.",
    """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       c.ts AS click_ts,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
      |ORDER BY purchase_id, click_ts""".stripMargin) { (spark, dir) =>
    val purchases = EventsStream.read(spark, eventsPath(spark, dir))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = EventsStream.read(spark, eventsPath(spark, dir))
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val joined = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts").as("purchase_ts"), col("c_ts").as("click_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    runStream(spark, "w7_stream_join", joined, OutputMode.Append())
      .orderBy("purchase_id", "click_ts")
  }

  /** Hopping windows on the streaming engine — the streaming twin of the
    * batch w9: 1-hour span sliding every 15 minutes, Complete mode so
    * every window emits and the drained sink equals the batch epoch-grid
    * oracle exactly. The interesting streaming property vs w3: each input
    * row feeds FOUR window states, so the state store holds ~4× the
    * window keys while the watermark retires a slide boundary every 15
    * minutes — the fan-out happens map-side before the single shuffle,
    * never as a self-join.
    */
  val w12StreamHopping: Q = Q.sql(
    "w12_stream_hopping",
    "Streaming hopping 1h/15min window x event_type (readStream -> memory sink) vs epoch-grid SQL.",
    """WITH expanded AS (
      |  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
      |           - k.k * 900000000) AS window_start,
      |         event_type, value
      |  FROM events CROSS JOIN (SELECT UNNEST(range(4)) AS k) k)
      |SELECT window_start,
      |       window_start + INTERVAL 1 HOUR AS window_end,
      |       event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM expanded
      |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
    val stream = EventsStream.hoppingCounts(
      EventsStream.read(spark, eventsPath(spark, dir)))
    runStream(spark, "w12_stream_hopping", stream, OutputMode.Complete())
      .orderBy("window_start", "event_type")
  }

  /** Stream-static join under the gate: the event stream enriched
    * against the static customer dim (broadcast per micro-batch — the
    * stateless join kind; only the downstream windowed aggregate holds
    * state), Complete mode so the drained sink equals the batch join +
    * aggregate exactly. This is the enrichment shape every streaming
    * pipeline starts with — dim lookup before stateful logic.
    */
  val w10StreamStatic: Q = Q.sql(
    "w10_stream_static_join",
    "Stream-static broadcast enrichment (events x customer dim) + tumbling 1h window per nation.",
    """SELECT date_trunc('hour', e.ts) AS window_start, c.c_nationkey AS nation,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2 ORDER BY window_start, nation""".stripMargin) { (spark, dir) =>
    val stream = EventsStream.enrichedNationCounts(
      EventsStream.read(spark, eventsPath(spark, dir)),
      Tables.customer(spark, dir))
    runStream(spark, "w10_stream_static_join", stream, OutputMode.Complete())
      .orderBy("window_start", "nation")
  }

  /** foreachBatch upsert sink — the pattern behind every "stream into a
    * keyed table" deployment: each micro-batch MERGEs into the running
    * per-user latest-event state. Without a transactional table format
    * the merge is expressed as versioned snapshots — batch k reads
    * snapshot k-1, unions its own batch-local winners, keeps the
    * per-key winner by the SAME (ts, event_id) order on both levels, and
    * writes snapshot k; the final snapshot must equal the batch
    * latest-per-key over all events (the oracle). That equality is the
    * whole point: upsert-merge is associative under a total per-key
    * order, so incremental maintenance matches the full recompute no
    * matter how the stream is batched.
    *
    * 100 TB shape: state is one row per key (users ≪ events); each
    * micro-batch pre-collapses map-side to its per-key winners before
    * touching state, so merge IO is O(|keys|), not O(|batch|). The
    * snapshot rewrite is what Delta/Iceberg replace with a MERGE commit
    * — same dataflow, transactional bookkeeping instead of directory
    * versions.
    */
  val w11StreamUpsert: Q = Q.sql(
    "w11_stream_upsert",
    "foreachBatch upsert: per-user latest event merged across micro-batches via versioned snapshots.",
    """WITH ranked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         CAST(value AS DOUBLE) AS value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |       event_type AS last_type, value AS last_value
      |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val root = fastTmpDir("graft_upsert_w11")
    val latestW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    def latestPerKey(df: DataFrame): DataFrame = df
      .withColumn("rn", row_number().over(latestW))
      .filter(col("rn") === 1).drop("rn")
    @volatile var current: Option[String] = None
    val src = EventsStream.read(spark, eventsPath(spark, dir))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // collapse the batch to its per-key winners BEFORE touching
        // state — merge IO is then O(|keys in batch|)
        val winners = latestPerKey(batch)
        val merged = current match {
          case None => winners
          case Some(prev) => latestPerKey(s.read.parquet(prev).union(winners))
        }
        val out = s"$root/v$batchId"
        merged.write.mode("overwrite").parquet(out)
        current = Some(out)
        ()
      }
      .option("checkpointLocation", fastTmpDir("graft_ckpt_w11"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(current.getOrElse(
      sys.error("w11: no micro-batch ran")))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("event_type").as("last_type"),
        col("value").cast("double").as("last_value"))
      .orderBy("user_id")
  }

  /** Staged events + a trailing SENTINEL file (one click + one purchase
    * row at max(ts)+1h under user_id −1, modification time bumped so the
    * file source schedules it as the LAST micro-batch). The sentinel
    * exists to advance the event-time watermark past every real row
    * after the data batches: an OUTER stream-stream join only emits its
    * null-padded rows when the watermark proves no match can still
    * arrive, so without the sentinel every unmatched row in the final
    * watermark horizon would be silently withheld at termination and the
    * batch oracle could never match. Both event types are present
    * because each side's watermark is tracked independently and the
    * global watermark is their MIN — one sentinel per filtered branch.
    */
  private val sentinelDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def eventsPathWithSentinel(spark: SparkSession, dir: String): String =
    sentinelDirs.getOrElseUpdate(dir, {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val out = fastTmpDir("graft_stream_events_sent")
      // reuse the range-sorted staging the rest of the w-family already
      // paid for (copying two files beats re-sorting the table)
      val staged = new java.io.File(eventsPath(spark, dir))
      Option(staged.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(out, f.getName))
        }
      // max ts off the STAGED copy — canonical raw ns longs whatever the
      // driver's parquet physical type (see eventsPath)
      val ev = spark.read.parquet(staged.getPath)
      val maxTs = ev.agg(max("ts")).head.getLong(0)
      import spark.implicits._
      // TWO sentinel files → two trailing micro-batches: the first
      // advances the watermark past every real row; the second EXISTS so
      // a batch actually RUNS with that advanced watermark — AvailableNow
      // stops after the last file and does not schedule a no-data batch,
      // so with a single sentinel the final eviction pass would never
      // execute (observed: the last unmatched purchase stayed in state).
      //
      // Sentinel rows must NEVER be filtered by a SINGLE-side predicate
      // in the consuming query: any filter the optimizer can attribute
      // to one input (user_id < 0, event_id < 0…) gets pushed down to
      // that scan — and via join-constraint inference reaches the OTHER
      // side's scan too — killing the sentinel BEFORE the watermark
      // node, which silently un-advances the watermark (observed). And
      // no timestamp placement can keep BOTH sides' sentinels
      // evict-proof: once the watermark advances, the engine runs a
      // trailing no-data batch whose watermark is min(side maxima) − δ,
      // which always overtakes the k=1 sentinel of the min side
      // (observed: sentinel rows emitted from outer-join state). The
      // consumers therefore drop sentinel OUTPUT with a post-join
      // filter on coalesce(left_user, right_user) >= 0 — a predicate
      // referencing both sides, which Catalyst can neither push into a
      // scan nor use to eliminate the outer join. Sentinels carry
      // user_id −1 so that coalesce identifies them on whichever side
      // survives null-extension.
      val t = System.currentTimeMillis()
      // deterministic batch order (see eventsPath): data files staggered
      // by ts-range index FIRST, sentinels after — strictly increasing
      // mod times, because equal-modtime ties fall back to readdir
      // (creation) order, which is nondeterministic
      val root = new java.io.File(out)
      val dataFiles = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      dataFiles.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(t + i * 60000L)
      }
      Seq(1, 2).foreach { k =>
        val sentTs = maxTs + k * 7200L * 1000000000L // +k·2h, ns
        val sent = Seq(
          (-(2L * k - 1), sentTs, -1L, "click", 0.0, "{}"),
          (-(2L * k), sentTs, -1L, "purchase", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        val tmp = fastTmpDir(s"graft_stream_sent_tmp$k")
        sent.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error("w13: sentinel part file missing"))
        val target = new java.io.File(out, s"zz-sentinel-$k.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(t + (dataFiles.length + k) * 60000L)
      }
      out
    })

  /** Stream-stream LEFT OUTER join: every purchase, with its preceding
    * clicks (<10 min) where they exist and a null-padded row where none
    * do — the attribution shape where "no touchpoint" is itself the
    * signal. The semantics under test beyond w7's inner join: the state
    * store must EMIT (not drop) an unmatched left row, and may do so
    * only once its watermark proves no matching click can still arrive —
    * see [[eventsPathWithSentinel]] for how the gate makes that provable
    * at end-of-stream. Nulls are coalesced to sentinels (epoch ts /
    * gap −1) because the gate's comparator sorts on the columns.
    */
  val w13StreamOuterJoin: Q = Q.sql(
    "w13_stream_outer_join",
    "Stream-stream LEFT OUTER join: purchases with preceding clicks (<10 min) or a null-padded row.",
    """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       COALESCE(c.ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts,
      |       COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us,
      |       c.ts IS NOT NULL AS matched
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
      |ORDER BY purchase_id, click_ts""".stripMargin) { (spark, dir) =>
    runStream(spark, "w13_stream_outer_join", w13Joined(spark, dir), OutputMode.Append())
      .orderBy("purchase_id", "click_ts")
  }

  /** w13's joined frame pre-sink — factored out so PlanSpec can assert
    * the sentinel-drop Filter's placement (above the stream-stream join,
    * never pushed/collapsed) without driving the stream.
    */
  private[graft] def w13Joined(spark: SparkSession, dir: String): DataFrame = {
    val staged = eventsPathWithSentinel(spark, dir)
    val purchases = EventsStream.read(spark, staged)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = EventsStream.read(spark, staged)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"),
        "left_outer")
      // sentinel drop — see eventsPathWithSentinel: must be a BOTH-sides
      // predicate (coalesce), never p_user alone, or it pushes to the scan
      .filter(coalesce(col("p_user"), col("c_user")) >= 0)
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts").as("purchase_ts"),
        coalesce(col("c_ts"), timestamp_micros(lit(0L))).as("click_ts"),
        coalesce(unix_micros(col("p_ts")) - unix_micros(col("c_ts")), lit(-1L))
          .as("gap_us"),
        col("c_ts").isNotNull.as("matched"))
  }

  /** Stream-stream FULL OUTER join: every purchase with its preceding
    * clicks AND every click that preceded no purchase — both "no
    * touchpoint" and "abandoned touchpoint" emitted as first-class rows.
    * Beyond w13, the state store must also emit (not drop) unmatched
    * RIGHT rows on watermark passage; the shared sentinel staging keeps
    * both sides' sentinels above any reachable watermark (see
    * [[eventsPathWithSentinel]]), so neither pollutes the output. Nulls
    * are coalesced to sentinels (epoch ts / −1 ids) for the gate's
    * sort-based comparator.
    */
  val w14StreamFullOuter: Q = Q.sql(
    "w14_stream_full_outer",
    "Stream-stream FULL OUTER join: purchase-click pairs (<10 min) plus both sides' unmatched rows.",
    """SELECT COALESCE(p.event_id, -1) AS purchase_id,
      |       COALESCE(p.user_id, c.user_id) AS user_id,
      |       COALESCE(p.ts, TIMESTAMP '1970-01-01 00:00:00') AS purchase_ts,
      |       COALESCE(c.event_id, -1) AS click_id,
      |       COALESCE(c.ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts,
      |       CASE WHEN p.event_id IS NULL THEN 'click_only'
      |            WHEN c.event_id IS NULL THEN 'purchase_only'
      |            ELSE 'matched' END AS side
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
      |ORDER BY purchase_id, click_id""".stripMargin) { (spark, dir) =>
    runStream(spark, "w14_stream_full_outer", w14Joined(spark, dir), OutputMode.Append())
      .orderBy("purchase_id", "click_id")
  }

  /** w14's joined frame pre-sink — see [[w13Joined]]. */
  private[graft] def w14Joined(spark: SparkSession, dir: String): DataFrame = {
    val staged = eventsPathWithSentinel(spark, dir)
    val purchases = EventsStream.read(spark, staged)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = EventsStream.read(spark, staged)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"),
        "full_outer")
      // sentinel drop — see eventsPathWithSentinel: coalesce keeps the
      // predicate un-pushable and the join un-eliminable
      .filter(coalesce(col("p_user"), col("c_user")) >= 0)
      .select(coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"),
        coalesce(col("p_ts"), timestamp_micros(lit(0L))).as("purchase_ts"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("c_ts"), timestamp_micros(lit(0L))).as("click_ts"),
        when(col("p_ts").isNull, "click_only")
          .when(col("c_ts").isNull, "purchase_only")
          .otherwise("matched").as("side"))
  }

  /** The custom sessionizer run as a REAL stream with event-time-timeout
    * state eviction — the production shape of w6 (which runs the same
    * state machine in batch). What this gate proves beyond w4/w6: open
    * sessions are closed by the WATERMARK (the engine calls the function
    * with `hasTimedOut=true` once the watermark passes last+gap and the
    * state evicts), not by a later event or a batch-mode drain — the
    * property that bounds state to ACTIVE users on an unbounded stream.
    * The sentinel staging advances the final watermark past every real
    * session's close (see [[eventsPathWithSentinel]]); the sentinel
    * user's own rows are dropped POST-state on `user_id >= 0`, which is
    * safe from pushdown because `flatMapGroupsWithState` has no column
    * lineage for Catalyst to push a predicate through (verified: the
    * plan keeps the Filter above the FlatMapGroupsWithState node).
    */
  val w15StreamTimeoutSessions: Q = Q.sql(
    "w15_stream_timeout_sessions",
    "flatMapGroupsWithState sessionizer with EventTimeTimeout eviction (real stream) vs gaps-and-islands SQL.",
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       COUNT(*) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    runStream(spark, "w15_stream_timeout_sessions", w15Sessions(spark, dir),
      OutputMode.Append())
      .orderBy("user_id", "session_start")
  }

  /** w15's session frame pre-sink — factored out so PlanSpec can assert
    * the sentinel-user Filter stays above the FlatMapGroupsWithState
    * node (no lineage for Catalyst to push through).
    */
  private[graft] def w15Sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged = eventsPathWithSentinel(spark, dir)
    val ev = EventsStream.read(spark, staged).as[EventsStream.Event]
    EventsStream.timeoutSessions(ev).toDF()
      .filter(col("user_id") >= 0)
  }

  /** Checkpoint CRASH-RECOVERY gate — the exactly-once property 100 TB
    * streaming actually depends on, which every other w-query (one
    * AvailableNow run to completion) leaves unproven. The stream
    * processes HALF the input, terminates, and a NEW query restarts from
    * the SAME checkpoint after the second half has arrived:
    *
    *  - source offsets must recover: the restarted file source may not
    *    re-read the first half — the update-mode counts would double and
    *    the hash gate fails;
    *  - aggregation STATE must recover: the 1h window spanning the
    *    file-split boundary has rows in both halves, so a lost state
    *    store would restart its count at zero and under-count — hash
    *    gate fails.
    *
    * The sink is a foreachBatch keyed upsert (w11's external-snapshot
    * shape): update mode re-emits a window whenever a batch changes it,
    * the upsert keeps the latest row per (window, event_type), and the
    * final snapshot must equal the batch aggregate over ALL events. No
    * sentinel machinery is needed — update mode emits without waiting
    * for watermark eviction, so end-of-stream withholding (the w13/w14
    * problem) cannot occur here.
    */
  val w16StreamRestart: Q = Q.sql(
    "w16_stream_restart",
    "Crash-recovery: tumbling-agg stream stopped after half the files, restarted from the SAME checkpoint; merged upsert snapshot vs batch oracle.",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stagedParts = new java.io.File(eventsPath(spark, dir))
      .listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    require(stagedParts.length == 2, "w16 expects the 2-file ts-range staging")
    val src = fastTmpDir("graft_w16_src")
    val ckpt = fastTmpDir("graft_ckpt_w16")
    w16LastCkpt = ckpt
    val snapRoot = fastTmpDir("graft_w16_snap")
    @volatile var current: Option[String] = None
    def runPhase(): Unit = {
      val q = EventsStream.tumblingCounts(EventsStream.read(spark, src))
        .writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val s = batch.sparkSession
          val b = batch.select(col("window_start"), col("event_type"),
            col("n"), col("sum_value"))
          val merged = current match {
            case None => b
            case Some(prev) =>
              s.read.parquet(prev)
                .join(b.select("window_start", "event_type"),
                  Seq("window_start", "event_type"), "left_anti")
                .union(b)
          }
          val out = s"$snapRoot/v$batchId"
          merged.write.mode("overwrite").parquet(out)
          current = Some(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val target = sys.env.getOrElse("GRAFT_STREAM_PARTITIONS", "4").toInt
    if (saved.toInt > target) spark.conf.set(key, target.toString)
    try {
      // half 1 arrives; the engine processes it and terminates
      val t0 = System.currentTimeMillis()
      Files.copy(stagedParts(0).toPath, Paths.get(src, stagedParts(0).getName),
        StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(src, stagedParts(0).getName).setLastModified(t0)
      runPhase()
      // half 2 arrives while the engine is DOWN; a new query restarts
      // from the same checkpoint and must resume, not reprocess
      Files.copy(stagedParts(1).toPath, Paths.get(src, stagedParts(1).getName),
        StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(src, stagedParts(1).getName).setLastModified(t0 + 60000L)
      runPhase()
    } finally spark.conf.set(key, saved)
    spark.read.parquet(current.getOrElse(sys.error("w16: no micro-batch ran")))
      .orderBy("window_start", "event_type")
  }

  private val lateDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The in-order staging plus ONE trailing file of genuinely LATE rows:
    * copies of the earliest hour's events under fresh ids (+1e10), same
    * early timestamps, arriving as the LAST micro-batch — by which time
    * the watermark (max real ts − 10 min) is hours past them. Staging
    * asserts the margin, so a data-shape change fails loudly instead of
    * silently weakening the gate.
    */
  private def eventsPathWithLate(spark: SparkSession, dir: String): String =
    lateDirs.getOrElseUpdate(dir, {
      val out = fastTmpDir("graft_stream_events_late")
      val staged = new java.io.File(eventsPath(spark, dir))
      val dataFiles = Option(staged.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      val t0 = System.currentTimeMillis()
      dataFiles.zipWithIndex.foreach { case (f, i) =>
        val target = new java.io.File(out, f.getName)
        java.nio.file.Files.copy(f.toPath, target.toPath)
        target.setLastModified(t0 + i * 60000L)
      }
      // ts in the staged files is raw LONG nanos (nanosAsLong read)
      val ev = spark.read.parquet(staged.getPath)
      val b = ev.agg(min("ts").as("lo"), max("ts").as("hi")).head
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val hour = 3600L * 1000000000L
      // drop-margin: the late rows sit ≥ 2h behind the final watermark
      require(lo + hour < hi - hour * 2 - 600L * 1000000000L,
        "w17 staging: events span too short to guarantee late-drop")
      val late = ev.filter(col("ts") < lo + hour)
        .withColumn("event_id", col("event_id") + 10000000000L)
      require(late.count() > 0, "w17 staging: no late rows")
      val tmp = fastTmpDir("graft_stream_late_tmp")
      late.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error("w17: late part file missing"))
      val target = new java.io.File(out, "zz-late.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(t0 + dataFiles.length * 60000L)
      out
    })

  /** Watermark LATE-DATA DROP gate — the one watermark behavior the
    * in-order staging never exercises: rows arriving BEHIND the
    * watermark must be discarded, not aggregated. The staged stream is
    * the real events (two in-order files) plus a trailing file of late
    * rows — duplicates of the earliest hour under fresh event_ids — that
    * arrives when the watermark is hours past them. The oracle is the
    * plain batch aggregate over the REAL events only (the late rows
    * exist nowhere but the stream input), so the hash matches iff the
    * engine dropped every late row: a leak changes the earliest windows'
    * counts; an over-eager drop changes some real window.
    *
    * Update mode + the w16 foreachBatch keyed upsert (update re-emits
    * changed windows; the upsert keeps the latest row per key), so no
    * sentinel machinery and no dependence on end-of-stream eviction.
    */
  val w17StreamLateDrop: Q = Q.sql(
    "w17_stream_late_drop",
    "Watermark late-data drop: late duplicates behind the watermark are discarded; stream equals the real-events batch aggregate.",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
    val src = eventsPathWithLate(spark, dir)
    val ckpt = fastTmpDir("graft_ckpt_w17")
    val snapRoot = fastTmpDir("graft_w17_snap")
    @volatile var current: Option[String] = None
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val target = sys.env.getOrElse("GRAFT_STREAM_PARTITIONS", "4").toInt
    if (saved.toInt > target) spark.conf.set(key, target.toString)
    try {
      val q = EventsStream.tumblingCounts(EventsStream.read(spark, src))
        .writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val s = batch.sparkSession
          val b = batch.select(col("window_start"), col("event_type"),
            col("n"), col("sum_value"))
          val merged = current match {
            case None => b
            case Some(prev) =>
              s.read.parquet(prev)
                .join(b.select("window_start", "event_type"),
                  Seq("window_start", "event_type"), "left_anti")
                .union(b)
          }
          val out = s"$snapRoot/v$batchId"
          merged.write.mode("overwrite").parquet(out)
          current = Some(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, saved)
    spark.read.parquet(current.getOrElse(sys.error("w17: no micro-batch ran")))
      .orderBy("window_start", "event_type")
  }

  /** CUSTOM-state crash recovery — w16 proves the windowed AGGREGATION
    * state store recovers; this proves the `flatMapGroupsWithState`
    * user-defined state path does (a different store layout: one
    * serialized SessionState per user plus armed event-time timeouts).
    * The w15 timeout sessionizer runs over HALF the input and
    * terminates with every active session OPEN in state; a NEW query
    * restarts from the same checkpoint over the second half plus the
    * watermark sentinels:
    *
    *  - lost state splits every boundary-spanning session in two
    *    (staging asserts such sessions exist) — the gaps-and-islands
    *    oracle hash fails;
    *  - lost offsets replay the first half: sessions double-emit into
    *    the append sink — row count and hash fail;
    *  - lost timeout registrations leave run-1 sessions stuck in state
    *    forever — rows go missing.
    *
    * Sink is an append-only parquet dir (sessions emit exactly once, on
    * close); AvailableNow commits every batch before terminating, so no
    * batch replays across the clean restart (a mid-batch crash would
    * need a batchId-keyed idempotent write — w11/w16's upsert shape).
    */
  val w18StreamStateRestart: Q = Q.sql(
    "w18_stream_state_restart",
    "Custom-state crash-recovery: timeout sessionizer stopped with sessions open in state, restarted from the same checkpoint; append sink vs gaps-and-islands oracle.",
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       COUNT(*) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    // the sentinel staging holds [part-0, part-1, zz-sentinel-1, zz-sentinel-2]
    val staged = new java.io.File(eventsPathWithSentinel(spark, dir))
    val allFiles = Option(staged.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val dataParts = allFiles.filter(_.getName.startsWith("part-"))
    val sentinels = allFiles.filter(_.getName.startsWith("zz-sentinel"))
    require(dataParts.length == 2 && sentinels.length == 2,
      "w18 expects the 2-data + 2-sentinel staging")
    // non-vacuity: some session must SPAN the file boundary (open at the
    // stop, extended after the restart), or the state-recovery claim is
    // hollow
    run18SpanCheck(spark, dataParts)
    val src = fastTmpDir("graft_w18_src")
    val ckpt = fastTmpDir("graft_ckpt_w18")
    w18LastCkpt = ckpt
    val sink = fastTmpDir("graft_w18_sink")
    val t0 = System.currentTimeMillis()
    def stage(f: java.io.File, slot: Int): Unit = {
      val target = new java.io.File(src, f.getName)
      Files.copy(f.toPath, Paths.get(src, f.getName), StandardCopyOption.REPLACE_EXISTING)
      target.setLastModified(t0 + slot * 60000L)
      ()
    }
    def runPhase(): Unit = {
      val ev = EventsStream.read(spark, src).as[EventsStream.Event]
      val sessions = EventsStream.timeoutSessions(ev).toDF()
        .filter(col("user_id") >= 0)
      val q = sessions.writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(sink)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val target = sys.env.getOrElse("GRAFT_STREAM_PARTITIONS", "4").toInt
    if (saved.toInt > target) spark.conf.set(key, target.toString)
    try {
      // half 1: every active session is OPEN in the state store when
      // this run terminates
      stage(dataParts(0), 0)
      runPhase()
      // half 2 + sentinels arrive while the engine is DOWN; the restart
      // must resume the open sessions from the checkpointed state
      stage(dataParts(1), 1)
      sentinels.zipWithIndex.foreach { case (f, i) => stage(f, 2 + i) }
      runPhase()
    } finally spark.conf.set(key, saved)
    spark.read.parquet(sink)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** Staging assertion for w18: at least one user's events straddle the
    * two data files within the session gap. Fatal at gate scale; at the
    * suite's sf0.001 smoke scale (≤ a few thousand events) the median
    * split can land on a quiet gap — the recovery mechanics still run,
    * only the state-carry proof is vacuous there, so log and continue.
    */
  private def run18SpanCheck(spark: SparkSession,
      dataParts: Array[java.io.File]): Unit = {
    val gapNs = 30L * 60 * 1000000000L
    val ev0 = spark.read.parquet(dataParts(0).getPath)
    val last0 = ev0.groupBy("user_id").agg(max("ts").as("t0"))
    val first1 = spark.read.parquet(dataParts(1).getPath)
      .groupBy("user_id").agg(min("ts").as("t1"))
    val spanning = last0.join(first1, "user_id")
      .filter(col("t1") - col("t0") < gapNs && col("t1") >= col("t0"))
      .count()
    if (spanning == 0) {
      require(ev0.count() < 5000,
        "w18 staging: no session spans the file boundary at gate scale")
      System.err.println("[w18] smoke scale: no boundary-spanning session " +
        "(state-carry proof vacuous here; the gate scales assert it)")
    }
    ()
  }

  /** Stream-stream LEFT SEMI join — the "did a preceding click exist"
    * gate emitted as ONE row per purchase, completing the streaming join
    * family (inner w7, left outer w13, full outer w14). Semi is the
    * attribution-filter shape a funnel pipeline runs when it needs the
    * qualifying purchases but NOT the click payload — at 100 TB the
    * output is |purchases| rows instead of w7's |purchase×click| pairs,
    * and no click column ever crosses the join.
    *
    * Streaming semantics under test: a matched left row must emit
    * exactly ONCE no matter how many clicks match across micro-batches
    * (the engine emits on FIRST match and marks the state row); an
    * unmatched purchase must never emit. Both sides carry w7's
    * watermarks and the range condition bounds the click state — the
    * same state-retention contract, different emission rule. The oracle
    * is the batch EXISTS — any double-emit breaks the row-count compare
    * before the hash even runs.
    */
  val w19StreamSemiJoin: Q = Q.sql(
    "w19_stream_semi_join",
    "Stream-stream LEFT SEMI join: purchases with at least one click in the prior 10 min, emitted once each.",
    """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       CAST(p.value AS DOUBLE) AS purchase_value
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |  AND EXISTS (
      |    SELECT 1 FROM events c
      |    WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |      AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts)
      |ORDER BY purchase_id""".stripMargin) { (spark, dir) =>
    runStream(spark, "w19_stream_semi_join", w19Joined(spark, dir),
        OutputMode.Append())
      .orderBy("purchase_id")
  }

  /** w19's joined frame pre-sink — exposed for the PlanSpec pin. */
  private[graft] def w19Joined(spark: SparkSession, dir: String): DataFrame = {
    val purchases = EventsStream.read(spark, eventsPath(spark, dir))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").cast("double").as("purchase_value"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = EventsStream.read(spark, eventsPath(spark, dir))
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"),
        "left_semi")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts").as("purchase_ts"), col("purchase_value"))
  }

  /** CHAINED stateful aggregations — the multiple-stateful-operator
    * capability (Spark 3.4+) a production metrics rollup relies on:
    * 15-minute tumbling counts per event_type re-aggregated into 1-hour
    * rollups inside ONE streaming query (one checkpoint, two state
    * stores), Append sink. No pre-3.4 workaround (two queries + an
    * intermediate sink) matches this consistency: the rollup here is
    * transactionally downstream of the bucket agg within each
    * micro-batch.
    *
    * Append emission means only hours whose END the FINAL watermark
    * passed reach the sink; the oracle mirrors exactly that rule —
    * watermark = ms-truncated max event time (Spark tracks event-time
    * stats in milliseconds) minus 10 minutes, hours kept iff
    * hour_end ≤ watermark. The tail hour is therefore withheld BY
    * DESIGN on both sides; a dropped inner bucket, a double-emitted
    * finalized row, or an eviction off-by-one all break the compare.
    *
    * Scale shape: state is two window-keyed stores, both
    * watermark-bounded (≤ 4 buckets + 1 hour per event_type live at any
    * moment); the inner agg's shuffle carries 15-min partials
    * (map-side-combined), the outer's carries 4-row-per-hour rollups —
    * at 100 TB the chain is the same two-exchange plan as the batch
    * twin, plus state-store IO.
    */
  val w20ChainedAgg: Q = Q.sql(
    "w20_stream_chained_agg",
    "Chained stateful aggs (15-min buckets -> 1-hour rollup) in one streaming query; final-watermark emission mirrored.",
    """WITH wm AS (
      |  SELECT make_timestamp((epoch_us(MAX(ts)) // 1000) * 1000)
      |         - INTERVAL 10 MINUTE AS w
      |  FROM events),
      |b AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS bs, event_type,
      |         COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |h AS (
      |  SELECT date_trunc('hour', bs) AS window_start, event_type,
      |         CAST(COUNT(*) AS BIGINT) AS n_buckets,
      |         CAST(SUM(n) AS BIGINT) AS n_events
      |  FROM b GROUP BY 1, 2)
      |SELECT h.window_start, h.event_type, h.n_buckets, h.n_events
      |FROM h, wm WHERE h.window_start + INTERVAL 1 HOUR <= wm.w
      |ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
    runStream(spark, "w20_stream_chained_agg", w20Chained(spark, dir),
        OutputMode.Append())
      .orderBy("window_start", "event_type")
  }

  /** w20's chained frame pre-sink — exposed for the PlanSpec pin. */
  private[graft] def w20Chained(spark: SparkSession, dir: String): DataFrame =
    EventsStream.chainedWindowCounts(
      EventsStream.read(spark, eventsPath(spark, dir)))

  /** Stream-stream JOIN chained into a windowed AGGREGATION — the second
    * multiple-stateful-operator composition (w20 chains agg→agg; this is
    * join→agg, the attribution-rollup shape: purchases joined to their
    * prior-10-minute clicks, rolled into 1-hour conversion-pair totals)
    * inside ONE streaming query: join state + agg state, one checkpoint,
    * one global watermark. The global watermark is the MIN over both
    * sides' event-time stats (each ms-truncated max − 10 min); Append
    * emits hours whose end the FINAL global watermark passed — mirrored
    * exactly in the oracle via LEAST over the per-side maxima. Nothing is
    * late under the in-order staging, so every joined pair lands before
    * its hour finalizes and the stream equals the batch rollup behind
    * the watermark.
    *
    * Scale shape: the join state is watermark-bounded on both sides (the
    * range condition bounds clicks kept to 10 minutes), the rollup state
    * to open hours; the join's shuffle is on user_id, the agg's on the
    * hour window — the same two-exchange plan as the batch twin plus
    * state-store IO.
    */
  val w21JoinThenAgg: Q = Q.sql(
    "w21_stream_join_agg",
    "Stream-stream join chained into a 1-hour windowed rollup in one streaming query; min-watermark emission mirrored.",
    """WITH wm AS (
      |  SELECT LEAST(
      |    (SELECT make_timestamp((epoch_us(MAX(ts)) // 1000) * 1000)
      |     FROM events WHERE event_type = 'purchase'),
      |    (SELECT make_timestamp((epoch_us(MAX(ts)) // 1000) * 1000)
      |     FROM events WHERE event_type = 'click')
      |  ) - INTERVAL 10 MINUTE AS w),
      |pairs AS (
      |  SELECT p.ts AS pts, CAST(p.value AS DECIMAL(14,2)) AS pv
      |  FROM events p JOIN events c
      |    ON c.user_id = p.user_id
      |   AND p.event_type = 'purchase' AND c.event_type = 'click'
      |   AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts),
      |h AS (
      |  SELECT date_trunc('hour', pts) AS window_start,
      |         CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |         CAST(SUM(pv) AS DOUBLE) AS sum_value
      |  FROM pairs GROUP BY 1)
      |SELECT h.window_start, h.n_pairs, h.sum_value
      |FROM h, wm WHERE h.window_start + INTERVAL 1 HOUR <= wm.w
      |ORDER BY window_start""".stripMargin) { (spark, dir) =>
    runStream(spark, "w21_stream_join_agg", w21Chained(spark, dir),
        OutputMode.Append())
      .orderBy("window_start")
  }

  /** w21's chained frame pre-sink — exposed for the PlanSpec pin. */
  private[graft] def w21Chained(spark: SparkSession, dir: String): DataFrame = {
    val purchases = EventsStream.read(spark, eventsPath(spark, dir))
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").cast("decimal(14,2)").as("pv"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = EventsStream.read(spark, eventsPath(spark, dir))
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"))
      .groupBy(window(col("p_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("pv")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("n_pairs"),
        col("sum_value"))
  }

  /** Staged "new documents" stream — the d13 batch residue class
    * (`doc_id % 20 = 7`) split into TWO doc_id-halved parquet files with
    * forced ascending modtimes, so `maxFilesPerTrigger=1` +
    * AvailableNow runs two REAL micro-batches (same determinism contract
    * as [[eventsPath]]; the split point is the exact integer median —
    * no session spans doc boundaries here, so the sampled-exchange
    * hazard doesn't apply and the median is safe).
    */
  private val docsStagedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage a batch frame as TWO key-halved parquet files with forced
    * ascending modtimes, so `maxFilesPerTrigger=1` + AvailableNow runs
    * two REAL deterministic micro-batches — the staging contract all
    * four incremental-apply streams (w22/w23/w24/w25) share. The split
    * point is the exact integer median of the key; each ROW lives in
    * exactly one staged file, which is what makes the foreachBatch
    * rollups batch-locally sound.
    */
  private def stageTwoHalves(prefix: String, batch: DataFrame, key: String): String = {
    val out = fastTmpDir(prefix)
    val med = batch
      .agg(expr(s"CAST(percentile($key, 0.5) AS BIGINT)")).head.getLong(0)
    Seq(("part-0", col(key) <= med), ("part-1", col(key) > med))
      .foreach { case (name, cond) =>
        val tmp = fastTmpDir(s"${prefix}_half_$name")
        batch.filter(cond).repartition(1).write.mode("overwrite").parquet(tmp)
        val f = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
          .filter(x => x.getName.startsWith("part-") && x.getName.endsWith(".parquet"))
        require(f.length == 1, s"$prefix staging half $name: expected 1 file")
        java.nio.file.Files.move(f(0).toPath,
          java.nio.file.Paths.get(out, s"$name.parquet"))
      }
    val files = Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
    val t0 = System.currentTimeMillis()
    files.filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 60000L) }
    out
  }

  private def docsPath(spark: SparkSession, dir: String): String =
    docsStagedDirs.getOrElseUpdate(dir,
      stageTwoHalves("graft_stream_docs",
        Tables.documents(spark, dir)
          .filter(col("doc_id") % Dedup.D13_MOD === Dedup.D13_RES),
        "doc_id"))

  /** Streaming incremental LSH dedup — d13's nightly apply run as a
    * STREAM: new documents arrive as files, the streaming plan computes
    * their shingles → MinHash signature → band hashes ([[Dedup.bandCols]],
    * all stateless), LEFT-joins the session-persisted corpus band index
    * (stream-static join; left outer so zero-candidate docs keep a row),
    * LEFT-joins the corpus shingle frame and exact-Jaccard-verifies each
    * candidate in-stream. The only non-streaming step is the per-doc
    * rollup (docs carry no event time, so a chained stateful aggregate
    * has no watermark to ride): `foreachBatch` dedups the ≤[[Dedup]]-band
    * pair multiplicity and rolls admit verdicts batch-locally — sound
    * because each doc lives in exactly one staged file, so all its band
    * rows arrive in one micro-batch and its verdict is computed exactly
    * once. The ORACLE IS d13's, verbatim: the streaming apply must equal
    * the batch apply row-for-row — the Structured Streaming contract at
    * the dedup level, on top of the cross-engine one.
    *
    * 100 TB shape: index probe and verify are stateless stream-static
    * equi-joins against persisted frames (at deployment: the published
    * LSH index refreshed per epoch); per-micro-batch work is linear in
    * the batch. The foreachBatch rollup is O(batch candidates), and a
    * deployment with event-timestamped docs would replace it with a
    * watermarked aggregate (the w20/w21 shapes).
    */
  val w22StreamIncrementalDedup: Q = Q.sql(
    "w22_stream_incremental_dedup",
    "Streaming incremental LSH apply: new-doc stream probes the persisted band index in-plan; verdicts equal batch d13 row-for-row.",
    Dedup.d13IncrementalMinHash.oracle.get) { (spark, dir) =>
    val stream = w22Stream(spark, dir)
    val root = fastTmpDir("graft_w22_verdicts")
    val written = scala.collection.mutable.ListBuffer.empty[String]
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // batch-local rollup: dedup the per-pair band multiplicity, then
        // one aggregate per new doc — mirrors Dedup.d13's roll exactly
        val pairs = b.filter(col("corpus_doc").isNotNull)
          .select(col("new_doc"), col("corpus_doc"), col("j")).distinct()
        val roll = pairs.groupBy(col("new_doc")).agg(
          count(lit(1)).as("n_candidates"),
          count(when(col("j") >= 0.7, lit(1))).as("n_dups"),
          min(when(col("j") >= 0.7, col("corpus_doc"))).as("dup_of"))
        val out = s"$root/b$batchId"
        b.select(col("new_doc").as("doc_id")).distinct()
          .join(roll, col("doc_id") === col("new_doc"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_dups"), lit(0L)).as("n_dups"),
            col("dup_of"),
            when(coalesce(col("n_dups"), lit(0L)) === 0, lit(1))
              .otherwise(lit(0)).as("admit"))
          .write.mode("overwrite").parquet(out)
        written.synchronized { written += out; () }
        ()
      }
      .option("checkpointLocation", fastTmpDir("graft_ckpt_w22"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(written.nonEmpty, "w22: no micro-batch ran")
    // foreachBatch is at-least-once: a replayed batchId appends its path
    // twice while the write itself is idempotent (mode overwrite) —
    // distinct keeps the final read idempotent end-to-end
    spark.read.parquet(written.toSeq.distinct: _*).orderBy("doc_id")
  }

  /** w22's streaming frame, unexecuted — PlanSpec pins its shape (two
    * stateless left joins against the persisted static frames, no
    * stateful operator before the foreachBatch boundary).
    */
  private[graft] def w22Stream(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftExpressions
    import graft.functions.GraftExpressions.{intersectCount, minhash, shingles}
    GraftExpressions.register(spark)
    val staged = docsPath(spark, dir)
    // static sides, built on the OUTER session before the stream starts:
    // the corpus band index (shared with d3/d13) and the corpus shingles
    val idx = Dedup.bandIndex(spark, dir)
      .filter(col("doc_id") % Dedup.D13_MOD =!= Dedup.D13_RES)
      .select(col("doc_id").as("corpus_doc"), col("band"), col("bh"))
    val corpusSh = Dedup.shingledDocs(spark, dir)
      .filter(col("doc_id") % Dedup.D13_MOD =!= Dedup.D13_RES)
      .select(col("doc_id").as("cs_id"), col("s").as("cs"))
    val sch = spark.read.parquet(staged).schema
    val nCommon = intersectCount(col("s"), col("cs"))
    val j = nCommon.cast("double") /
      (size(col("s")) + size(col("cs")) - nCommon)
    spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .select(col("doc_id").as("new_doc"), shingles(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
      .select(col("new_doc"), col("s"),
        minhash(col("s"), Dedup.minhashK).as("sig"))
      .select(col("new_doc"), col("s"), Dedup.bandCols(col("sig")).as("x"))
      .select(col("new_doc"), col("s"),
        col("x.band").as("band"), col("x.bh").as("bh"))
      .join(idx, Seq("band", "bh"), "left_outer")
      .join(corpusSh, col("corpus_doc") === col("cs_id"), "left_outer")
      .select(col("new_doc"), col("corpus_doc"),
        when(col("corpus_doc").isNotNull, j).as("j"))
  }

  /** Staged "new vectors" stream — s21's batch residue class
    * (`vec_id % 20 = 7`) split into TWO vec_id-halved parquet files with
    * forced ascending modtimes (the [[docsPath]] determinism contract,
    * lifted to embeddings).
    */
  private val vecsStagedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def vecsPath(spark: SparkSession, dir: String): String =
    vecsStagedDirs.getOrElseUpdate(dir,
      stageTwoHalves("graft_stream_vecs",
        Tables.embeddings(spark, dir)
          .filter(col("vec_id") % Similarity.S21_MOD === Similarity.S21_RES),
        "vec_id"))

  /** Streaming incremental ANN apply — s21's nightly vector apply run as
    * a STREAM: new embeddings arrive as files; the STREAMING PLAN carries
    * the trained-cell assignment (the published codebook joined on a
    * constant key and folded per-row — [[Similarity.cellOfExpr]]
    * reproduces the min-L2/tie-low rule without a window), the s2 plane
    * bucket, the SQ8 encode against the standing corpus stats, the
    * stream-static LEFT join against the session-persisted
    * [[Similarity.annIndex]], and the integer-dot candidate score — all
    * stateless. The batch-local steps in `foreachBatch` mirror batch
    * s21 stage-for-stage: the `rnk <= S21_K` shortlist FIRST (on the
    * codegen'd integer dot already computed in-stream), THEN the
    * exact-cosine refine against the persisted normed corpus on the
    * ≤K-per-probe shortlist, then the top-k rollup (vectors carry no
    * event time to watermark on; sound because each vector lives in
    * exactly one staged file). The ORACLE IS s21's, verbatim: the
    * streaming apply equals the batch apply row-for-row — w22's
    * stream==batch contract, lifted from documents to vectors.
    *
    * 100 TB shape: codebook/stats are one-row pinned artifacts; the
    * index probe is a stateless stream-static equi-join on
    * (cell, bucket) against the persisted index; per-micro-batch work is
    * linear in the batch. Crucially the per-candidate cost is 8-byte
    * SQ8 codes + one long dot — the 512-byte double vectors and the
    * cosine fold only ever touch the ≤K-per-probe shortlist (the
    * round-13 plan refined EVERY banded candidate with the exact cosine
    * in-stream, 265× adrift of batch s21 at sf100; this plan is the
    * batch twin's shortlist-then-refine order). A deployment with
    * ingest-timestamped vectors would replace the foreachBatch rollup
    * with a watermarked aggregate.
    */
  val w23StreamIncrementalAnn: Q = Q.sql(
    "w23_stream_incremental_ann",
    "Streaming incremental ANN apply: new-vector stream probes the persisted IVF+SQ8 index in-plan; verdicts equal batch s21 row-for-row.",
    Similarity.s21IncrementalAnnApply.oracle.get) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val stream = w23Stream(spark, dir)
    val root = fastTmpDir("graft_w23_verdicts")
    val written = scala.collection.mutable.ListBuffer.empty[String]
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // batch-local shortlist → refine → rollup, mirroring batch s21
        // stage-for-stage (Similarity.scala s21IncrementalAnnApply):
        // prune to the top-K by the codegen'd integer dot FIRST, and
        // only THEN join the persisted normed corpus and compute the
        // exact cosine on the ≤K-per-probe shortlist — the 64-double
        // vectors never cross the candidate fan
        val cand = b.filter(col("neighbor_id").isNotNull)
        val wr = Window.partitionBy(col("vec_id"))
          .orderBy(col("dotq").desc, col("neighbor_id"))
        val wc = Window.partitionBy(col("vec_id"))
        val rk = cand
          .withColumn("rnk", row_number().over(wr))
          .withColumn("n_cand", count(lit(1)).over(wc))
          .filter(col("rnk") <= Similarity.S21_K)
        val nrm = Dedup.normedVectors(spark, dir)
          .select(col("vec_id"), col("v"), col("nrm"))
        val ref = rk
          .join(nrm.select(col("vec_id").as("p_vid"), col("v").as("pv"),
            col("nrm").as("pnrm")), col("vec_id") === col("p_vid"))
          .join(nrm.select(col("vec_id").as("neighbor_id"),
            col("v").as("nv"), col("nrm").as("nnrm")), "neighbor_id")
          .select(col("vec_id"), col("neighbor_id"), col("n_cand"),
            Dedup.cosineCol(col("pv"), col("nv"), col("pnrm"), col("nnrm"))
              .as("cos"))
        val wb = Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        val roll = ref.withColumn("brk", row_number().over(wb))
          .groupBy(col("vec_id")).agg(
            max(col("n_cand")).as("n_cand"),
            max(when(col("brk") === 1, col("neighbor_id"))).as("nn_id"),
            max(when(col("brk") === 1, col("cos"))).as("nn_cos"),
            count(when(col("cos") >= Similarity.S21_DUP, lit(1))).as("n_dups"))
        val out = s"$root/b$batchId"
        b.select(col("vec_id"), col("cell"), col("bucket")).distinct()
          .join(roll, Seq("vec_id"), "left_outer")
          .select(col("vec_id"), col("cell"), col("bucket"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            col("nn_id"), round(col("nn_cos"), 6).as("nn_cosine"),
            coalesce(col("n_dups"), lit(0L)).as("n_dups"),
            when(coalesce(col("n_dups"), lit(0L)) === 0, lit(1L))
              .otherwise(lit(0L)).as("admit"))
          .write.mode("overwrite").parquet(out)
        written.synchronized { written += out; () }
        ()
      }
      .option("checkpointLocation", fastTmpDir("graft_ckpt_w23"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(written.nonEmpty, "w23: no micro-batch ran")
    spark.read.parquet(written.toSeq.distinct: _*).orderBy("vec_id")
  }

  /** w23's streaming frame, unexecuted — PlanSpec pins its shape (three
    * stateless joins: two one-row artifact joins + the index probe; no
    * stateful operator and NO wide-vector refine before foreachBatch —
    * each candidate row carries only ids + the 8-byte-code integer dot).
    */
  private[graft] def w23Stream(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftExpressions
    GraftExpressions.register(spark)
    val staged = vecsPath(spark, dir)
    // static sides, built and pinned on the OUTER session: the published
    // codebook + quantizer stats (one-row artifacts) and the persisted
    // ANN index (the normed corpus is joined only in foreachBatch, after
    // the top-K shortlist — never against the full candidate fan)
    val cb = Similarity.codebookRow(spark, dir).withColumn("k", lit(1))
    val stats = Similarity.sq8CorpusStats(spark, dir).withColumn("k", lit(1))
    val idx = Similarity.annIndex(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("bucket"), col("q").as("nq"))
    // derived ONCE at plan build from the same corpus count the index
    // build and the oracle use — the stream's bucket ids must match the
    // standing index's exactly
    val np = Similarity.annPlanes(Dedup.normedVectors(spark, dir).count())
    val sch = spark.read.parquet(staged).schema
    spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("k", lit(1))
      .join(cb, "k")
      .withColumn("cell", Similarity.cellOfExpr(col("v"), col("cents")))
      .drop("cents")
      .join(stats, "k")
      .withColumn("bucket", Similarity.planeBucketCol(col("v"), np).cast("long"))
      .withColumn("q", Similarity.sq8ClampedCodeCol)
      .drop("v", "lo", "hi", "k")
      .join(idx, Seq("cell", "bucket"), "left_outer")
      .select(col("vec_id"), col("cell"), col("bucket"), col("neighbor_id"),
        when(col("neighbor_id").isNotNull,
          GraftExpressions.dotl(col("q"), col("nq"))).as("dotq"))
  }

  /** Staged "new edges" stream — g11's arriving-edge residue class split
    * into two x-halved parquet files ([[stageTwoHalves]]). The batch
    * frame is [[Graph.g11BatchEdges]] itself, so stream and batch apply
    * to the identical edge set by construction.
    */
  private val edgesStagedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def edgesPath(spark: SparkSession, dir: String): String =
    edgesStagedDirs.getOrElseUpdate(dir,
      stageTwoHalves("graft_stream_edges", Graph.g11BatchEdges(spark, dir), "x"))

  /** Streaming incremental edge apply — g11's nightly graph maintenance
    * run as a STREAM, completing the streaming-incremental symmetry for
    * all four content families (docs w22, vectors w23, edges here,
    * payloads w25): new mutual edges arrive as files and the STREAMING
    * PLAN carries both neighbor probes against the session-pinned
    * standing adjacency ([[Graph.standingAdj]] — two stream-static
    * left joins meeting on the shared endpoint) plus both endpoint
    * degree lookups ([[Graph.standingDeg]]) — all stateless. The only
    * batch-local step is the per-edge common-neighbor rollup in
    * `foreachBatch` (edges carry no event time; sound because each edge
    * lives in exactly one staged file). The ORACLE IS g11's, verbatim:
    * the streaming apply equals the batch apply row-for-row.
    *
    * 100 TB shape: the standing adjacency is degree-capped at top-K by
    * construction, so per-arriving-edge work is two ≤K-row probes — the
    * stream stays linear in the batch with bounded fan-out, and the
    * static sides are pinned artifacts a deployment republishes per
    * epoch. An ingest-timestamped deployment would replace the
    * foreachBatch rollup with a watermarked aggregate.
    */
  val w24StreamIncrementalEdges: Q = Q.sql(
    "w24_stream_incremental_edges",
    "Streaming incremental edge apply: new-edge stream probes the pinned standing adjacency in-plan; verdicts equal batch g11 row-for-row.",
    Graph.g11IncrementalEdges.oracle.get) { (spark, dir) =>
    val stream = w24Stream(spark, dir)
    val root = fastTmpDir("graft_w24_verdicts")
    val written = scala.collection.mutable.ListBuffer.empty[String]
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // batch-local rollup: one aggregate per arriving edge — count the
        // common-neighbor hits, carry the (constant-per-edge) degrees,
        // then g11's verdict expressions verbatim
        val roll = b.groupBy(col("x"), col("y")).agg(
          count(col("hit")).as("cn"),
          max(col("deg_x")).as("deg_x"),
          max(col("deg_y")).as("deg_y"))
        val cnC = coalesce(col("cn"), lit(0L))
        val dxC = coalesce(col("deg_x"), lit(0L))
        val dyC = coalesce(col("deg_y"), lit(0L))
        val out = s"$root/b$batchId"
        roll.select(col("x").as("supp_x"), col("y").as("supp_y"),
            cnC.as("triangles_closed"), dxC.as("deg_x"), dyC.as("deg_y"),
            when(dxC + dyC - cnC === 0, lit(0L))
              .otherwise(expr(
                "CAST((1000000 * coalesce(cn, 0L)) DIV (coalesce(deg_x, 0L) + coalesce(deg_y, 0L) - coalesce(cn, 0L)) AS BIGINT)"))
              .as("jaccard_ppm"),
            when(cnC >= Graph.LP_MIN_CN, lit(1L)).otherwise(lit(0L))
              .as("predicted"))
          .write.mode("overwrite").parquet(out)
        written.synchronized { written += out; () }
        ()
      }
      .option("checkpointLocation", fastTmpDir("graft_ckpt_w24"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(written.nonEmpty, "w24: no micro-batch ran")
    spark.read.parquet(written.toSeq.distinct: _*).orderBy("supp_x", "supp_y")
  }

  /** w24's streaming frame, unexecuted — PlanSpec pins its shape (four
    * stateless LEFT joins: the two neighbor probes + the two degree
    * lookups, all against pinned standing-graph frames).
    */
  private[graft] def w24Stream(spark: SparkSession, dir: String): DataFrame = {
    val staged = edgesPath(spark, dir)
    // static sides, pinned on the OUTER session (session-shared with
    // batch g11, so stream and batch read the SAME standing artifacts)
    val sedA = Graph.standingAdj(spark, dir)
      .select(col("src").as("x"), col("dst").as("na"))
    val sedB = Graph.standingAdj(spark, dir)
      .select(col("src").as("y"), col("dst").as("na"), lit(1L).as("hit"))
    val degX = Graph.standingDeg(spark, dir)
      .select(col("node").as("x"), col("d").as("deg_x"))
    val degY = Graph.standingDeg(spark, dir)
      .select(col("node").as("y"), col("d").as("deg_y"))
    val sch = spark.read.parquet(staged).schema
    spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .join(sedA, Seq("x"), "left_outer")       // neighbors of x
      .join(sedB, Seq("y", "na"), "left_outer") // hit iff also neighbor of y
      .join(degX, Seq("x"), "left_outer")
      .join(degY, Seq("y"), "left_outer")
      .select(col("x"), col("y"), col("na"), col("hit"),
        col("deg_x"), col("deg_y"))
  }

  /** Streaming incremental payload apply — m16's nightly asset ingest as
    * a STREAM: new payloads arrive as files (the SAME staged dir as w22
    * — m16's residue class on `documents` equals d13's) and the
    * STREAMING PLAN carries the whole sign-and-probe path stateless:
    * the byte histogram is one codegen'd expression, the SimHash sign
    * against the STANDING center is a per-row fold over the one-row
    * published artifact ([[Multimodal.signArtifactRow]] joined on a
    * constant key — the w23 codebook move, for payload bytes), and the
    * two disjoint 8-bit band probes are stream-static joins against the
    * session-persisted signature index. `foreachBatch` only rolls the
    * per-payload verdict (payloads carry no event time; each lives in
    * exactly one staged file). The ORACLE IS m16's, verbatim.
    *
    * 100 TB shape: center/weights are a one-row pinned artifact, the
    * index probes are stateless equi-joins with avg fan-in corpus/256
    * per band, per-micro-batch work is linear in the batch. With this,
    * all four content families have the batch+stream maintenance pair.
    */
  val w25StreamIncrementalPayloads: Q = Q.sql(
    "w25_stream_incremental_payloads",
    "Streaming incremental payload apply: new-payload stream signs against the standing SimHash center and probes the persisted band index in-plan; verdicts equal batch m16 row-for-row.",
    Multimodal.m16IncrementalPayloads.oracle.get) { (spark, dir) =>
    val stream = w25Stream(spark, dir)
    val root = fastTmpDir("graft_w25_verdicts")
    val written = scala.collection.mutable.ListBuffer.empty[String]
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // batch-local rollup — mirrors m16's roll exactly (bands are
        // disjoint by construction, so candidates need no distinct)
        val roll = b.filter(col("corpus_doc").isNotNull)
          .groupBy(col("doc_id").as("rd")).agg(
            count(lit(1)).as("n_candidates"),
            count(when(col("hamming") <= Multimodal.SIG_HAMMING_MAX, lit(1)))
              .as("n_dups"),
            min(when(col("hamming") <= Multimodal.SIG_HAMMING_MAX,
              col("corpus_doc"))).as("dup_of"))
        val out = s"$root/b$batchId"
        b.select(col("doc_id"), col("sig")).distinct()
          .join(roll, col("doc_id") === col("rd"), "left_outer")
          .select(col("doc_id"), col("sig"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_dups"), lit(0L)).as("n_dups"),
            col("dup_of"),
            when(coalesce(col("n_dups"), lit(0L)) === 0, lit(1L))
              .otherwise(lit(0L)).as("admit"))
          .write.mode("overwrite").parquet(out)
        written.synchronized { written += out; () }
        ()
      }
      .option("checkpointLocation", fastTmpDir("graft_ckpt_w25"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(written.nonEmpty, "w25: no micro-batch ran")
    spark.read.parquet(written.toSeq.distinct: _*).orderBy("doc_id")
  }

  /** w25's streaming frame, unexecuted — PlanSpec pins its shape (the
    * one-row artifact join + two band probes per union branch, exactly
    * one LEFT OUTER so zero-candidate payloads keep a row; no stateful
    * operator before foreachBatch).
    */
  private[graft] def w25Stream(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(spark)
    // w25 rides w22's staged dir: m16's residue class on documents IS
    // d13's. The require keeps that reuse honest if either ever moves.
    require(Multimodal.M16_MOD == Dedup.D13_MOD &&
      Multimodal.M16_RES == Dedup.D13_RES,
      "w25 stages via docsPath; m16/d13 residue classes must match")
    val staged = docsPath(spark, dir)
    val art = Multimodal.signArtifactRow(spark, dir).withColumn("k", lit(1))
    val idx = Multimodal.payloadSigIndex(spark, dir)
      .select(col("doc_id").as("corpus_doc"), col("sig").as("sig_b"))
    val sch = spark.read.parquet(staged).schema
    val s = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .filter(length(col("text")) > 0)
      .withColumn("k", lit(1))
      .join(art, "k")
      .withColumn("sig",
        Multimodal.sigOfExpr(col("text").cast("binary"), col("art")))
      .select(col("doc_id"), col("sig"))
    // m6/m16's two DISJOINT band probes: low byte (left outer — the
    // verdict spine) and high byte (inner, only where the low bands
    // differ, so a pair is emitted exactly once and no distinct is
    // needed — the m6 no-distinct argument, in-stream)
    val ham = bit_count(expr("sig ^ sig_b")).cast("bigint")
    val b0 = s.join(idx.withColumn("band2", col("sig_b") % 256),
        col("sig") % 256 === col("band2"), "left_outer")
      .select(col("doc_id"), col("sig"), col("corpus_doc"),
        when(col("corpus_doc").isNotNull, ham).as("hamming"))
    val b1 = s.join(idx.withColumn("band2", expr("sig_b div 256")),
        expr("sig div 256") === col("band2") &&
          (col("sig") % 256 =!= col("sig_b") % 256))
      .select(col("doc_id"), col("sig"), col("corpus_doc"),
        ham.as("hamming"))
    b0.union(b1)
  }

  val all: Seq[Q] = Seq(w3StreamTumbling, w4StreamSession, w5StreamDedup,
    w6CustomSessionizer, w7StreamJoin, w10StreamStatic, w11StreamUpsert,
    w12StreamHopping, w13StreamOuterJoin, w14StreamFullOuter,
    w15StreamTimeoutSessions, w16StreamRestart, w17StreamLateDrop,
    w18StreamStateRestart, w19StreamSemiJoin, w20ChainedAgg, w21JoinThenAgg,
    w22StreamIncrementalDedup, w23StreamIncrementalAnn,
    w24StreamIncrementalEdges, w25StreamIncrementalPayloads)
}
