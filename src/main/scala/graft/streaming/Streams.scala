package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2 Layer B "Streaming").
  *
  * The reference's only incremental behaviour is its batch loop
  * (Pype.py:38-78); these are the Spark-native streaming equivalents a
  * user of the engine gets on top: watermarked windowed aggregation,
  * file-source ingestion, and custom session state via
  * flatMapGroupsWithState. All transforms are identical for batch and
  * streaming DataFrames — the same `DataFrame => DataFrame` transformer
  * contract the engine uses everywhere (readStream swaps in for read).
  */
object Streams {

  /** Tumbling-window per-type counts with a watermark: the canonical
    * streaming aggregation. Works on a batch frame too (window() is the
    * same expression either way). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Tumbling-window heavy hitters over any string-able column — the
    * streaming twin of [[graft.ops.TextAnalysis.heavyHitters]]: one
    * bounded Misra–Gries summary (`map<string,bigint>`,
    * [[graft.functions.FrequentItemsAggregator]]) per window, so the
    * aggregation STATE is capacity-bounded per window regardless of
    * stream rate — profiling "most frequent tokens/domains this hour"
    * over an unbounded stream with constant memory, where an exact
    * per-item count would grow state with distinct items. The same
    * expression runs on a batch frame (window() is an ordinary
    * expression; the watermark is a no-op); on a stream the watermark
    * closes windows. Downstream consumes the audited MG contract only
    * (presence of guaranteed-heavy items + the two-sided band — see the
    * aggregator scaladoc; q128/q131/q132 replay it in the battery). */
  def windowedHeavyHitters(
      events: DataFrame,
      itemCol: String,
      capacity: Int,
      windowLen: String = "1 hour",
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowLen))
      .agg(graft.functions.FrequentItems
        .freqItems(col(itemCol).cast("string"), capacity).as("sk"))
      .select(col("window.start").as("window_start"), col("sk"))

  /** Tumbling-window distribution profile — the streaming twin of
    * [[graft.ops.Profiling.histSketch]], emitting (window_start, bin,
    * cnt) ROWS rather than an assembled map: streaming allows ONE
    * aggregation per query, so the map_from_entries second stage is
    * left to the (batch) consumer — `Profiling.histMerge` accepts the
    * re-assembled rows, and per-window state is ≤ nbins+2 counters
    * either way. Same fixed-edge bin contract as Profiling.binOf
    * (underflow -1, overflow nbins, NULLs uncounted), so stored stream
    * profiles roll up exactly against batch-built ones. */
  def windowedHistogram(
      events: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nbins: Int,
      windowLen: String = "1 hour",
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .filter(col(valueCol).isNotNull)
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowLen),
        graft.ops.Profiling.binOf(col(valueCol), lo, hi, nbins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("bin"), col("cnt"))

  /** Streaming DRIFT ALERT — the monitoring family's closing piece:
    * each event-time window's value distribution is profiled against a
    * STORED reference histogram (a row of the `profile:` table, or any
    * [[graft.ops.Profiling.histSketch]] map) and only windows whose PSI
    * exceeds `threshold` emit. Streaming allows one aggregation per
    * query, so the whole window profile + PSI lives in ONE custom
    * Aggregator whose buffer is the (nbins+2) counter array — state
    * stays constant per open window regardless of stream rate — and
    * whose finish replays [[graft.ops.Profiling.histPsi]]'s exact
    * fold (same bin order, same ε floor, same operation order), so the
    * emitted psi is BITWISE the batch kernel's (StreamsSpec pins the
    * parity). Emits (window_start, n, hist, psi); batch frames work
    * identically (the watermark is a no-op). */
  def windowedDriftAlert(
      events: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nbins: Int,
      reference: Map[Int, Long],
      threshold: Double,
      windowLen: String = "1 hour",
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame = {
    require(reference.nonEmpty,
      "drift needs a non-empty reference profile (an empty side has no " +
        "distribution to drift from — histPsi would be null on every window)")
    val agg = udaf(
      new WindowDriftAggregator(lo, hi, nbins, reference),
      org.apache.spark.sql.Encoders.scalaDouble)
    events
      .filter(col(valueCol).isNotNull)
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowLen))
      .agg(agg(col(valueCol).cast("double")).as("p"))
      .select(col("window.start").as("window_start"),
        col("p.n"), col("p.hist"), col("p.psi"))
      .filter(col("psi") > lit(threshold))
  }

  /** Tumbling-window QUANTILE profile — the streaming twin of the KLL
    * family ([[graft.functions.KllSketch]], q144), completing the
    * per-family streaming symmetry (MG → [[windowedHeavyHitters]],
    * fixed-bin → [[windowedHistogram]]/[[windowedDriftAlert]], KLL →
    * here): one mergeable KLL sketch per event-time window, so the
    * aggregation STATE is ~3k-item-bounded per open window regardless
    * of stream rate and NO value range needs declaring up front — the
    * fixed-bin twin profiles only inside its configured [lo, hi).
    * Emits per closed window: `n` (EXACT count — KLL counts updates
    * precisely), the sketch BYTES (stored stream profiles roll up
    * losslessly against batch-built ones via `kll_merge_agg`, the
    * mergeable-summaries contract), and a probe→value `quantiles` map.
    * The error contract is the family's: rank-space only (≈1.65% at
    * k=200, preserved under merge), value-space unbounded — consumers
    * audit ranks, never values (the q144/q145 pattern). Batch frames
    * run the identical expression (the watermark is a no-op). */
  def windowedQuantiles(
      events: DataFrame,
      valueCol: String,
      probes: Seq[Double],
      k: Int = graft.functions.KllSketch.DefaultK,
      windowLen: String = "1 hour",
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame = {
    require(probes.nonEmpty, "windowedQuantiles needs at least one probe rank")
    probes.foreach(q => require(q >= 0.0 && q <= 1.0,
      s"probe ranks must be in [0, 1], got $q"))
    import graft.functions.KllSketch
    events
      .filter(col(valueCol).isNotNull)
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowLen))
      .agg(KllSketch.kllSketch(col(valueCol).cast("double"), k).as("sk"))
      .select(
        col("window.start").as("window_start"),
        KllSketch.kllN(col("sk")).as("n"),
        col("sk"),
        map_from_arrays(
          array(probes.map(lit): _*),
          array(probes.map(q =>
            KllSketch.kllQuantile(col("sk"), lit(q))): _*)).as("quantiles"))
  }

  /** Streaming KS DRIFT ALERT — [[windowedDriftAlert]]'s twin for
    * metrics with NO declared value range: each event-time window's
    * value distribution is sketched (KLL, [[windowedQuantiles]]'s
    * state shape) and compared against a STORED reference sketch (a
    * `kll_profile:` table row, or any `kll_sketch_agg` bytes) by
    * Kolmogorov–Smirnov distance; only windows past the gate emit.
    * The gate is `threshold` as a direct KS bound when > 0 (the
    * `kll_profile_max_ks:` convention), or — when `threshold` is 0 —
    * the per-window significance test `kll_ks_threshold(sig)`, which
    * adapts to each window's n (small windows need more evidence;
    * the PSI twin has no such option because PSI has no sampling
    * theory attached). Emits (window_start, n, sk, ks); the sketch
    * bytes ride along so alerts can be drilled into (quantile reads)
    * and rolled up without re-scanning. Batch frames run identically
    * (the watermark is a no-op). */
  def windowedKsAlert(
      events: DataFrame,
      valueCol: String,
      reference: Array[Byte],
      threshold: Double,
      sig: Double = 0.01,
      k: Int = graft.functions.KllSketch.DefaultK,
      windowLen: String = "1 hour",
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame = {
    require(reference != null && reference.nonEmpty,
      "KS drift needs a non-empty reference sketch (an empty side has " +
        "no CDF to drift from — kll_ks would be null on every window)")
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be a KS distance in [0, 1] (0 = use the " +
        s"significance test at sig), got $threshold")
    import graft.functions.KllSketch
    val windowed = events
      .filter(col(valueCol).isNotNull)
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowLen))
      .agg(KllSketch.kllSketch(col(valueCol).cast("double"), k).as("sk"))
      .select(
        col("window.start").as("window_start"),
        KllSketch.kllN(col("sk")).as("n"),
        col("sk"),
        KllSketch.kllKs(col("sk"), lit(reference)).as("ks"))
    val gate =
      if (threshold > 0.0) col("ks") > lit(threshold)
      else col("ks") >
        KllSketch.kllKsThreshold(col("sk"), lit(reference), lit(sig))
    windowed.filter(gate)
  }

  /** Streaming EXEMPLAR samples — the drill-down twin of
    * [[windowedQuantiles]]/[[windowedKsAlert]] (family #6,
    * [[graft.functions.Exemplar]]): per event-time window, the k rows
    * whose `md5(cast(keyCol as string))` sorts smallest, as
    * `(window_start, n, exemplars)` with `exemplars` an ascending
    * `array<struct<h, payload>>` (payload = the row as JSON over
    * `payloadCols`, or all columns) and `n` the window's exact row
    * count — ALL rows, including null-key ones (which the sample
    * itself skips), so an all-null-key window emits (n, empty sample)
    * rather than disappearing from monitoring.
    * State is BOUNDED at ≤ k (hash, payload) pairs per open window
    * regardless of stream rate, and the sample is a pure function of
    * each window's key set — deterministic across retries, replays,
    * and batch/stream execution (batch frames run the identical
    * expression; the watermark is a no-op). Stored window samples
    * merge exactly: re-cutting the k smallest across stored windows
    * IS the corpus sample of those windows (q150's identity), so an
    * alerting window's rows can be eyeballed and corpus-level
    * examples assembled without touching the raw stream again. */
  def windowedExemplars(
      events: DataFrame,
      keyCol: String,
      k: Int,
      payloadCols: Seq[String] = Nil,
      windowLen: String = "1 hour",
      timeCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame = {
    require(k >= 1, s"windowedExemplars k must be >= 1, got $k")
    import graft.functions.Exemplar
    val cols =
      if (payloadCols.nonEmpty) payloadCols else events.columns.toSeq
    // no null-key pre-filter: the aggregate skips null hashes itself,
    // and `n` must count EVERY row in the window (a null-key pre-filter
    // would undercount, and a window whose keys are ALL null would
    // vanish from monitoring instead of emitting (n, empty sample) —
    // the corrupted-key signature worth seeing)
    events
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowLen))
      .agg(
        Exemplar.exemplarAgg(
          md5(col(keyCol).cast("string")),
          to_json(struct(cols.map(col): _*)), k).as("exemplars"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("n"), col("exemplars"))
  }

  /** File-stream reader over a directory of event parquet (schema fixed
    * up front — streaming sources can't infer). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionAgg(user_id: Long, n_events: Long, start: Timestamp, end: Timestamp)
  // public: the streaming state-store encoder constructs this from
  // GENERATED code (batch mode never serializes state, so a private
  // constructor only breaks the streaming path)
  final case class SessionState(n: Long, start: Long, last: Long)
  /** [[windowedDriftAlert]]'s per-window emission. */
  final case class DriftProfile(n: Long, hist: Map[Int, Long], psi: Option[Double])

  // state timestamps are kept in MICROseconds: Timestamp.getTime is
  // millis-precision and would silently truncate the micro component of
  // event times (TimestampType is micros)
  private def toMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(((us - math.floorDiv(us, 1000000L) * 1000000L) * 1000L).toInt)
    t
  }

  /** Session aggregation with a 30-minute inactivity gap, via
    * flatMapGroupsWithState — the custom-state escape hatch the engine
    * exposes for semantics windowed aggs can't express. Emits one row per
    * closed session; state is per-user and O(1).
    *
    * BATCH contract: each user's complete history arrives in one pass,
    * so the trailing session is closed at the end. Deployed on a stream
    * this would fragment sessions at every micro-batch boundary — use
    * [[sessionizeStreaming]] there, which keeps state across batches and
    * closes sessions by event-time timeout instead. */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // batch-mode contract: all of a user's events arrive sorted here
          val sorted = rows.toSeq.sortBy(e => toMicros(e.ts))
          val closed = Seq.newBuilder[SessionAgg]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = toMicros(e.ts)
            if (st == null) st = SessionState(1, t, t)
            else if (t - st.last > gapUs) {
              closed += SessionAgg(user, st.n, fromMicros(st.start), fromMicros(st.last))
              st = SessionState(1, t, t)
            } else st = SessionState(st.n + 1, st.start, t)
          }
          if (st != null) {
            // close the trailing session too (batch semantics; a streaming
            // deployment would keep it open via timeout instead)
            closed += SessionAgg(user, st.n, fromMicros(st.start), fromMicros(st.last))
            state.remove()
          }
          closed.result().iterator
      }
  }

  /** Streaming exact dedup on `keys` with BOUNDED state: per-key dedup
    * state lives only until the event-time watermark passes its arrival
    * window (`dropDuplicatesWithinWatermark`). A plain `dropDuplicates`
    * on an unbounded stream accumulates every key ever seen — at
    * pipeline scale that state grows without limit; the watermark bound
    * is what makes streaming ingest dedup (the streaming twin of
    * [[graft.ops.Dedup.exact]]) deployable. Late duplicates beyond the
    * delay can re-emit — the standard correctness/state tradeoff,
    * tuned via `watermarkDelay`. */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      timeCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Built-in session-window aggregation — the declarative sibling of
    * [[sessionize]]: the engine merges dynamic-gap windows itself, the
    * same expression runs on batch and streaming frames, and on a
    * stream the watermark closes windows (no custom state code at all).
    *
    * Boundary contract (pinned by StreamsSpec): touching windows
    * coalesce, so two events EXACTLY `gap` apart DO merge — the same
    * inclusive boundary as [[sessionize]]'s explicit-state form; the
    * battery oracle (q72) splits on strictly-greater gaps to match.
    * Window end = last event + gap. */
  def sessionWindowCounts(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", "2 hours") // no-op on a batch frame
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming merge: the reference's batch loop (extract → merge)
    * as a Structured Streaming sink. `foreachBatch` hands every
    * micro-batch to the SAME [[graft.sink.MergeSink.mergeIntoParquet]]
    * the batch pipeline uses, so a streaming deployment gets identical
    * merge semantics — batch dedupe, column exclusions, atomic
    * temp-swap commit. Re-delivery safe: upserting/updating the same
    * batch twice converges to the same target, so at-least-once
    * micro-batch replay (after a checkpoint recovery) is idempotent.
    * Caller starts the returned writer with its own
    * `checkpointLocation`.
    *
    * `numBuckets > 0` stores the target hash-bucketed on the key
    * ([[graft.sink.BucketedMergeSink]]): each micro-batch then reads
    * and rewrites ONLY the buckets it touches instead of the whole
    * target — the shape that holds when the target dwarfs the batch.
    * With the default 0 the target is flat parquet and every batch is a
    * full read-merge-write (fine for modest targets / coarse cadences).
    *
    * Backlog sizing: the first micro-batch after a fresh checkpoint is
    * the WHOLE backlog unless the source is throttled — set
    * `maxFilesPerTrigger` (file sources) or the source's rate limit so
    * batches stay merge-sized. The sink no longer force-broadcasts a
    * batch (it is gated on the size estimate, MergeSink.fitsBroadcast),
    * so an unthrottled backlog degrades to a sort-merge join rather
    * than a driver OOM — but throttling is still what keeps per-batch
    * latency flat. */
  def streamingMerge(
      stream: DataFrame,
      path: String,
      key: Seq[String],
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 0,
      // scd2 only: batchId -> the batch's version timestamp (parsed by
      // to_timestamp). MUST be a pure deterministic function so an
      // at-least-once micro-batch replay stamps the SAME version bound
      // it did the first time; with scd2's change detection that makes
      // the replay a no-op. Wall-clock here would fork history on
      // recovery. Typically batchId -> the batch's source watermark or
      // an external batch-metadata timestamp.
      scd2TsOf: Long => String = null,
      // OPT-IN (default off): compactEvery = N runs BucketedMergeSink
      // .compact inside foreachBatch on every Nth micro-batch — a
      // synchronous whole-target small-file pass, i.e. a deliberate
      // latency cliff on that one trigger in exchange for bounded
      // files-per-bucket. Leave 0 and compact out-of-band if the
      // stream's latency SLO can't absorb the periodic spike.
      compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // fail at construction, not inside the first micro-batch: key.head
    // on Nil, an unknown loadType, or a silently-partial composite
    // delete key would otherwise surface as an obscure streaming-query
    // death far from the call site
    require(key.nonEmpty, "streamingMerge needs at least one key column")
    require(Set("upsert", "update", "delete", "scd2")(loadType),
      s"unknown load type: $loadType (expected upsert/update/delete/scd2)")
    require(loadType != "scd2" || scd2TsOf != null,
      "scd2 streams need scd2TsOf: a deterministic batchId -> version " +
        "timestamp mapping (replay-stable, never wall-clock)")
    require(loadType != "delete" || key.size == 1,
      "delete streams key on exactly ONE identifier column " +
        s"(MergeSink.delete matches a single id), got ${key.mkString(", ")}")
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (numBuckets > 0) {
          graft.sink.BucketedMergeSink.merge(
            batch.sparkSession, batch, path, loadType, key,
            identifier = key.head, excluded = excluded, numBuckets = numBuckets,
            scd2Ts = if (loadType == "scd2") scd2TsOf(batchId) else "")
          // inline small-file maintenance: each merge leaves up to
          // write-parallelism files in every touched bucket, so a
          // long-running stream fragments its target; compacting every
          // N micro-batches bounds files-per-bucket at ~N×parallelism
          // without paying a compaction on the per-batch latency path
          // every trigger. Keyed on batchId (stable across replays):
          // at-least-once replay of a compacting batch just re-compacts,
          // which is idempotent. 0 disables.
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
            graft.sink.BucketedMergeSink.compact(batch.sparkSession, path): Unit
        } else
          graft.sink.MergeSink.mergeIntoParquet(
            batch.sparkSession, batch, path, loadType, key,
            identifier = key.head, excluded = excluded,
            scd2Ts = if (loadType == "scd2") scd2TsOf(batchId) else "")
    }
  }

  /** [[streamingMerge]] that ALSO materializes each micro-batch's CDC
    * change feed ([[graft.sink.MergeSink.changeFeed]] vocabulary:
    * insert / update_pre / update_post / delete) under
    * `feedPath/batch_id=<id>/` — the continuously-maintained input of
    * an incremental downstream consumer (a replicated table, a running
    * aggregate, an audit trail).
    *
    * Exactly-once feed under at-least-once foreachBatch, with no
    * transaction layer: the feed for a batch id is computed against the
    * PRE-merge target and written BEFORE the merge, and a batch id
    * whose feed partition is already COMMITTED (has `_SUCCESS` — bare
    * dir existence spans the parquet job's whole crash window) skips
    * the write. Crash between feed write and merge → replay skips the
    * (already correct) feed and re-merges; crash mid-feed-write →
    * replay finds no `_SUCCESS` and rewrites (the target is still
    * pre-merge, so the recomputed feed is identical); crash after merge
    * → replay sees the feed present and the merge idempotent. Consumers
    * read `feedPath` as ordinary partitioned parquet (`batch_id` is the
    * partition column).
    *
    * The outbox SHARES [[graft.sink.BucketedMergeSink.publishChangeFeed]]'s
    * layout, so the table-level consumer machinery —
    * [[graft.sink.BucketedMergeSink.subscribeFeed]], the
    * [[subscribeFeedStream]] daemon, `subscribe_feed:` stages,
    * [[graft.sink.BucketedMergeSink.compactOutbox]] — consumes a
    * streaming outbox unchanged: the FIRST micro-batch stages a marked
    * all-inserts base of the pre-attach target at `batch_id=1` (a
    * zero-row base when the stream creates the target — `_SUCCESS` +
    * `_base`, applied as a no-op), and epoch N's delta lands at
    * `batch_id=N+2`. Without the base, a stream attached to an EXISTING
    * target would emit a delta-from-nonempty first partition that a
    * fresh replica could silently mistake for history-from-empty.
    *
    * Scale: against a bucketed target the pre-merge read is
    * [[graft.sink.BucketedMergeSink.readForKeys]] — only the buckets
    * the batch's keys hash to are listed, so the feed costs the same
    * O(touched buckets) as the merge itself (falls back to a full read
    * only when the batch lacks the layout's key columns, e.g. a
    * delete by a non-layout identifier). scd2 streams don't need this
    * operator: the SCD2 target IS its own history. */
  def streamingMergeWithFeed(
      stream: DataFrame,
      path: String,
      feedPath: String,
      key: Seq[String],
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(key.nonEmpty, "streamingMergeWithFeed needs at least one key column")
    require(Set("upsert", "update", "delete")(loadType),
      s"unknown load type: $loadType (expected upsert/update/delete; " +
        "an scd2 target carries its own history — read it with scd2AsOf)")
    require(loadType != "delete" || key.size == 1,
      "delete streams key on exactly ONE identifier column")
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val sink = graft.sink.BucketedMergeSink
      // epoch N's delta is batch_id=N+2; batch_id=1 is the bootstrap base
      val dir = new org.apache.hadoop.fs.Path(feedPath, s"batch_id=${batchId + 2}")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def readTarget: Option[DataFrame] =
        if (sink.isBucketed(spark, path)) {
          val meta = sink.readMeta(spark, path)
          if (meta.key.forall(batch.columns.contains))
            Some(sink.readForKeys(spark, path, batch))
          else Some(sink.read(spark, path))
        } else if (fs.exists(new org.apache.hadoop.fs.Path(path)))
          Some(spark.read.parquet(path))
        else None
      // bootstrap: the first micro-batch into an EMPTY outbox bases the
      // feed at batch_id=1 — a marked all-inserts snapshot of the
      // pre-attach target (zero rows when the stream creates it), the
      // same contract publishChangeFeed's bootstrap gives a mid-life
      // feed. Gated on "no batch partitions at all", so a later
      // compactOutbox pruning batch 1 never re-triggers it; atomic via
      // the shared stage-and-rename.
      val feedStarted = fs.exists(new org.apache.hadoop.fs.Path(feedPath)) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(feedPath))
          .exists(_.getPath.getName.startsWith("batch_id="))
      if (!feedStarted) {
        // base needs the WHOLE pre-attach target, not the keyed slice
        val pre =
          if (sink.isBucketed(spark, path)) sink.read(spark, path)
          else if (fs.exists(new org.apache.hadoop.fs.Path(path)))
            spark.read.parquet(path)
          else batch.limit(0)
        sink.writeFeedBase(fs,
          new org.apache.hadoop.fs.Path(feedPath, "batch_id=1")) { staged =>
          pre.select((lit("insert").as("_op") +: pre.columns.toSeq.map(col)): _*)
            .write.mode("overwrite").parquet(staged)
        }: Unit
      }
      if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
        val feed: DataFrame = (readTarget, loadType) match {
          case (None, "upsert") => // bootstrap: the whole batch inserts
            graft.sink.MergeSink.dedupeBatch(batch, key)
              .select((lit("insert").as("_op") +: batch.columns.toSeq.map(col)): _*)
          case (None, _) =>
            // update/delete against nothing affect nothing — but the
            // partition must still exist (empty), or the outbox's batch
            // ids would gap and subscribeFeed would refuse the feed
            batch.limit(0)
              .select((lit("insert").as("_op") +: batch.columns.toSeq.map(col)): _*)
          case (Some(t), "delete") =>
            graft.sink.MergeSink.deleteFeed(t, batch, key.head)
          case (Some(t), lt) =>
            val f = graft.sink.MergeSink.changeFeed(t, batch, key, excluded)
            // update-only never inserts unmatched batch rows
            if (lt == "update") f.filter(col("_op") =!= "insert") else f
        }
        feed.write.mode("overwrite").parquet(dir.toString)
      }
      if (numBuckets > 0)
        graft.sink.BucketedMergeSink.merge(spark, batch, path, loadType, key,
          identifier = key.head, excluded = excluded, numBuckets = numBuckets)
      else
        graft.sink.MergeSink.mergeIntoParquet(spark, batch, path, loadType,
          key, identifier = key.head, excluded = excluded)
    }
  }

  /** Continuous replica maintenance: the streaming CONSUMER of a
    * [[graft.sink.BucketedMergeSink.publishChangeFeed]] outbox. Each
    * trigger runs one idempotent [[graft.sink.BucketedMergeSink
    * .subscribeFeed]] catch-up — the marker-tracked batch machinery IS
    * the exactly-once state, so this wrapper adds only scheduling:
    * a replayed or overlapping trigger re-lists and finds nothing
    * pending. Pair with `.trigger(ProcessingTime("30 seconds"))` for a
    * replication daemon, or `Trigger.AvailableNow` for a one-shot
    * catch-up that terminates (the spec's shape). The rate source's
    * rows are ignored — it exists to give the scheduler a heartbeat. */
  def subscribeFeedStream(
      spark: SparkSession,
      feedPath: String,
      replicaPath: String,
      key: Seq[String] = Seq("id"),
      numBuckets: Int = 64,
      retainVersions: Int = 0,
      consumerName: String = ""): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream.foreachBatch { (_: DataFrame, _: Long) =>
        graft.sink.BucketedMergeSink.subscribeFeed(
          spark, feedPath, replicaPath, key, numBuckets, retainVersions,
          consumerName = consumerName): Unit
      }

  /** [[streamingMerge]] against a BUCKETED target that also keeps a
    * near-dup MinHash postings index
    * ([[graft.sink.BucketedMergeSink.syncMinhashIndex]]) in lockstep per
    * micro-batch — continuous ingest whose corpus stays incrementally
    * near-dup-queryable ([[graft.ops.Dedup.incrementalMinhashPairs]])
    * without ever re-signing it.
    *
    * Exactly-once index application under at-least-once foreachBatch,
    * with no extra machinery: sync catch-up is keyed on the TARGET's
    * deterministic manifest versions, not on batchId — a replayed
    * micro-batch re-merges idempotently (content-identical new version),
    * its snapshot diff is empty, and versions the index already applied
    * are marker-skipped. A crash between merge and sync self-heals on
    * the next trigger's catch-up, exactly like the batch Runner's
    * `minhash_index:` stage key.
    *
    * `retainVersions` (>= 2, required by the diff replay) is persisted
    * into the layout when the first micro-batch creates it; scd2 streams
    * are refused for the same reason as the batch stage key (multiple
    * history rows per key have no single posting set). */
  def streamingMergeWithIndex(
      stream: DataFrame,
      path: String,
      indexPath: String,
      key: Seq[String],
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 64,
      retainVersions: Int = 2,
      textCol: String = "text",
      k: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      charGrams: Boolean = false): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    indexedMergeStream(stream, path, key, loadType, excluded, numBuckets,
      retainVersions, family = "minhash", (spark: SparkSession) =>
        graft.sink.BucketedMergeSink.syncMinhashIndex(
          spark, path, indexPath, textCol, k, bands, rowsPerBand, charGrams): Unit)

  /** [[streamingMergeWithIndex]]'s embedding twin: continuous ingest
    * whose cosine-LSH bucket index
    * ([[graft.sink.BucketedMergeSink.syncLshIndex]]) tracks the target
    * per micro-batch, so
    * [[graft.ops.Similarity.incrementalCosineDupPairs]] can vet each
    * arriving slice without re-signing the corpus. Same exactly-once /
    * self-heal contract as the MinHash variant (the sync core is
    * shared); (tables, bits, dim) are the index's identity and must
    * match the probe side's. */
  def streamingMergeWithLshIndex(
      stream: DataFrame,
      path: String,
      indexPath: String,
      key: Seq[String],
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 64,
      retainVersions: Int = 2,
      vecCol: String = "embedding",
      tables: Int = 8,
      bits: Int = 12,
      dim: Int = 64): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    indexedMergeStream(stream, path, key, loadType, excluded, numBuckets,
      retainVersions, family = "lsh", (spark: SparkSession) =>
        graft.sink.BucketedMergeSink.syncLshIndex(
          spark, path, indexPath, vecCol, tables, bits, dim): Unit)

  /** [[streamingMergeWithIndex]]'s SemDeDup twin: continuous ingest
    * whose semantic cell index
    * ([[graft.sink.BucketedMergeSink.syncSemanticIndex]]) tracks the
    * target per micro-batch, feeding
    * [[graft.ops.Similarity.incrementalSemanticDupPairs]]. Centroids
    * train ONCE when the first micro-batch bootstraps the index (on the
    * oldest retained snapshot — for a stream created empty, that first
    * batch) and freeze at `<indexPath>.centroids`; every later trigger
    * assigns its delta under the frozen model (coarse-quantizer
    * contract — re-cluster offline and rebuild when drift warrants).
    * Streams whose very first batches are unrepresentative of the
    * eventual corpus should bootstrap the index from a batch load
    * first, then attach the stream. */
  def streamingMergeWithSemanticIndex(
      stream: DataFrame,
      path: String,
      indexPath: String,
      key: Seq[String],
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 64,
      retainVersions: Int = 2,
      vecCol: String = "embedding",
      nlist: Int = 0,
      iters: Int = 3,
      trainPerCell: Int = 256,
      // 0 = AUTO — the query-side default, so streaming-built indexes
      // resolve the same probe width their readers do
      probeCells: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    indexedMergeStream(stream, path, key, loadType, excluded, numBuckets,
      retainVersions, family = "semantic", (spark: SparkSession) =>
        graft.sink.BucketedMergeSink.syncSemanticIndex(
          spark, path, indexPath, vecCol, nlist, iters, trainPerCell,
          probeCells): Unit)

  /** The indexed-ingest pattern applied to MONITORING instead of an
    * index: continuous ingest whose per-version corpus profile
    * ([[graft.ops.Profiling.syncProfile]] — `(n, hist, psi_prev)` rows,
    * the streaming twin of the Runner's `profile:` stage key) tracks
    * the target per micro-batch. Same idempotent `_SUCCESS`-marker
    * catch-up and same catch-up-BEFORE-merge ordering as the index
    * variants — here not because falling behind hard-refuses (an
    * unprofiled version that leaves retention is a monitoring gap, not
    * an error) but because catching pending versions up BEFORE this
    * batch's merge slides the retention window is what keeps that gap
    * empty. Unlike the index variants a composite key is fine —
    * the profile snapshots whole versions, it never joins on the key. */
  def streamingMergeWithProfile(
      stream: DataFrame,
      path: String,
      profilePath: String,
      key: Seq[String],
      column: String,
      lo: Double,
      hi: Double,
      nbins: Int = 64,
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 64,
      retainVersions: Int = 2): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(hi > lo, s"profile needs hi > lo, got [$lo, $hi)")
    require(nbins >= 1, s"nbins must be >= 1, got $nbins")
    profileMergeStream(stream, path, key, loadType, excluded, numBuckets,
      retainVersions, spark => graft.ops.Profiling.syncProfile(
        spark, path, profilePath, column, lo, hi, nbins): Unit)
  }

  /** The shared trigger core of the three profile-tracking ingest twins
    * ([[streamingMergeWithProfile]] / [[streamingMergeWithKllProfile]] /
    * [[streamingMergeWithExemplarProfile]]) — the profile analogue of
    * [[indexedMergeStream]]: per micro-batch, catch the profile up
    * BEFORE the merge (healing a previous trigger's crash between merge
    * and sync while the orphaned version is still retained), merge,
    * then sync this batch's version. At-least-once micro-batch replay
    * is absorbed by the sync's idempotent version markers. */
  private def profileMergeStream(
      stream: DataFrame,
      path: String,
      key: Seq[String],
      loadType: String,
      excluded: Seq[String],
      numBuckets: Int,
      retainVersions: Int,
      sync: SparkSession => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(Set("upsert", "update", "delete")(loadType),
      s"unknown load type: $loadType (expected upsert/update/delete; " +
        "profile rows snapshot CURRENT versions — scd2 history would " +
        "double-count closed rows)")
    require(numBuckets > 0,
      "a profiled merge stream needs a bucketed target (the profile " +
        "snapshots manifest versions) — pass numBuckets > 0")
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      if (graft.sink.BucketedMergeSink.isBucketed(spark, path)) sync(spark)
      graft.sink.BucketedMergeSink.merge(spark, batch, path, loadType, key,
        identifier = key.head, excluded = excluded, numBuckets = numBuckets,
        retainVersions = retainVersions)
      sync(spark)
    }
  }

  /** [[streamingMergeWithProfile]]'s KLL twin — continuous ingest whose
    * per-version QUANTILE profile (`kll_profile:`'s table shape:
    * n exact, sketch bytes, ks_prev) tracks the target per micro-batch
    * with the same catch-up-BEFORE-merge ordering, for metrics whose
    * value range nobody declared at stream-start (the fixed-bin twin
    * requires [lo, hi) up front). Crash between a trigger's merge and
    * its profile heals on the next trigger, before that trigger's own
    * merge can slide the retention window past the pending version. */
  def streamingMergeWithKllProfile(
      stream: DataFrame,
      path: String,
      profilePath: String,
      key: Seq[String],
      column: String,
      k: Int = graft.functions.KllSketch.DefaultK,
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 64,
      retainVersions: Int = 2): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")
    profileMergeStream(stream, path, key, loadType, excluded, numBuckets,
      retainVersions, spark => graft.ops.Profiling.syncKllProfile(
        spark, path, profilePath, column, k): Unit)
  }

  /** [[streamingMergeWithProfile]]/[[streamingMergeWithKllProfile]]'s
    * exemplar sibling — continuous ingest whose per-version DRILL-DOWN
    * sample ([[graft.ops.Profiling.syncExemplarProfile]]: k bottom-k-
    * by-md5(keyCol) example rows + exact n) tracks the bucketed target
    * per micro-batch, completing the family symmetry (every persisted
    * profile family has a streaming-merge twin). Same catch-up-BEFORE-
    * merge ordering as the indexed-ingest variants: a crash between a
    * previous batch's merge and its profile sync heals at the next
    * trigger, and at-least-once micro-batch replay is absorbed by the
    * sync's idempotent version markers. */
  def streamingMergeWithExemplarProfile(
      stream: DataFrame,
      path: String,
      profilePath: String,
      key: Seq[String],
      exemplarKey: String,
      k: Int = 20,
      loadType: String = "upsert",
      excluded: Seq[String] = Nil,
      numBuckets: Int = 64,
      retainVersions: Int = 2): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(k >= 1 && k <= 100000,
      s"exemplar k must be in [1, 100000], got $k")
    profileMergeStream(stream, path, key, loadType, excluded, numBuckets,
      retainVersions, spark => graft.ops.Profiling.syncExemplarProfile(
        spark, path, profilePath, exemplarKey, k): Unit)
  }

  /** The shared merge-plus-index trigger loop behind the three indexed
    * ingest variants — validation and the catch-up-BEFORE-merge
    * ordering live here once; `sync` is the family's idempotent
    * version-replay catch-up ([[graft.sink.BucketedMergeSink]]'s
    * syncMinhashIndex / syncLshIndex / syncSemanticIndex, closed over
    * the family's signer parameters). */
  private def indexedMergeStream(
      stream: DataFrame,
      path: String,
      key: Seq[String],
      loadType: String,
      excluded: Seq[String],
      numBuckets: Int,
      retainVersions: Int,
      family: String,
      sync: SparkSession => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(key.size == 1,
      s"an indexed merge stream needs a single-column key (postings pair " +
        s"on one id), got ${key.mkString(", ")}")
    require(Set("upsert", "update", "delete")(loadType),
      s"unknown load type: $loadType (expected upsert/update/delete; " +
        s"a $family index over scd2 history is undefined)")
    require(numBuckets > 0,
      "an indexed merge stream needs a bucketed target (the index sync " +
        "replays manifest snapshot diffs) — pass numBuckets > 0")
    require(retainVersions >= 2,
      s"the index sync diffs consecutive retained snapshots — " +
        s"retainVersions must be >= 2, got $retainVersions")
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      // catch up versions a previous trigger left unsynced BEFORE this
      // batch's merge: a crash between a trigger's merge and its sync
      // otherwise lets this merge slide the retention window past the
      // pending version, turning the self-healing catch-up into the
      // hard "Rebuild the index" refusal at the minimum retention — the
      // same ordering the Runner's batch stage keys use
      if (graft.sink.BucketedMergeSink.isBucketed(spark, path)) sync(spark)
      graft.sink.BucketedMergeSink.merge(spark, batch, path, loadType, key,
        identifier = key.head, excluded = excluded, numBuckets = numBuckets,
        retainVersions = retainVersions)
      sync(spark)
    }
  }

  /** Corpus-backed streaming exact dedup: the complement of
    * [[dedupStream]]. That one bounds state with the watermark and
    * FORGETS old keys (late duplicates re-emit); this one keeps the
    * dedup state in the target table itself — each micro-batch merges
    * on the normalized text with every payload column excluded from
    * update, so the FIRST-seen document per distinct text is preserved
    * forever and later duplicates (any lateness) are no-ops. Within a
    * single micro-batch "first seen" has no arrival order: ties on the
    * same text resolve to the smallest whole row (MergeSink.dedupeBatch,
    * effectively the smallest doc id) — deterministic, and the same
    * smallest-survivor rule [[graft.ops.Dedup.exact]] documents.
    *
    * Cost contract: the default target layout is hash-bucketed on
    * `norm_text` ([[graft.sink.BucketedMergeSink]], `numBuckets`
    * buckets), so a micro-batch reads and rewrites only the buckets its
    * texts hash to — O(touched-buckets), not O(corpus), per batch;
    * untouched bucket directories are never scanned. `numBuckets = 0`
    * falls back to a flat parquet target with a full read-merge-write
    * per batch (the reference's own per-batch merge shape, q30–q33) —
    * acceptable for moderate corpora or coarse cadences. The merge
    * semantics are identical in both layouts
    * (BucketedMergeSinkSpec pins it). Bucketed targets self-compact
    * every 32 micro-batches (passed explicitly to streamingMerge, whose
    * own default leaves compaction opt-in), bounding small-file growth
    * for the life of the stream at the cost of a periodic latency
    * spike on the compacting trigger. */
  def dedupCorpusStream(
      stream: DataFrame,
      path: String,
      textCol: String = "text",
      numBuckets: Int = 64): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(!stream.columns.contains("norm_text"),
      "dedupCorpusStream derives its merge key as a new norm_text column; " +
        "the input stream already has one — rename it (silently replacing " +
        "it would change dedup keys and drop the original values)")
    val withNorm = stream.withColumn("norm_text",
      graft.ops.Dedup.normalize(col(textCol)))
    streamingMerge(withNorm, path, key = Seq("norm_text"),
      loadType = "upsert",
      excluded = withNorm.columns.filterNot(_ == "norm_text").toSeq,
      numBuckets = numBuckets, compactEvery = 32)
  }

  /** Watermarked stream-stream interval join: each left row matches
    * right rows on `leftKey = rightKey` with `rightTime` in
    * `[leftTime - maxLag, leftTime]` (the enrich-events-with-recent-
    * context shape). Both sides carry watermarks and the join condition
    * bounds event-time distance, so Spark can evict buffered rows once
    * the other side's watermark passes `time + maxLag + delay` — WITHOUT
    * the time bound a stream-stream join buffers both streams forever,
    * which is the difference between deployable and OOM at pipeline
    * scale. Works identically on batch frames (the watermarks become
    * no-ops and it is a plain interval join). */
  def intervalJoinStreams(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      maxLag: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    require(leftKey != rightKey && leftTime != rightTime,
      "intervalJoinStreams: rename columns so key/time names differ across sides")
    left.withWatermark(leftTime, watermarkDelay)
      .join(right.withWatermark(rightTime, watermarkDelay),
        expr(s"$leftKey = $rightKey AND " +
          s"$rightTime >= $leftTime - INTERVAL $maxLag AND $rightTime <= $leftTime"))
  }

  /** TRUE streaming sessionization: per-user state persists across
    * micro-batches, sessions close only when the event-time watermark
    * passes `last event + gap` (GroupStateTimeout.EventTimeTimeout), so
    * a session spanning many micro-batches is emitted exactly once as
    * one row. The open tail is held in state until the watermark proves
    * no more events can join it — the semantics [[sessionize]]'s batch
    * contract cannot provide on a stream. */
  def sessionizeStreaming(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is final now
            val st = state.get
            state.remove()
            Iterator.single(
              SessionAgg(user, st.n, fromMicros(st.start), fromMicros(st.last)))
          } else {
            val sorted = rows.toSeq.sortBy(e => toMicros(e.ts))
            val closed = Seq.newBuilder[SessionAgg]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = toMicros(e.ts)
              if (st == null) st = SessionState(1, t, t)
              else if (t - st.last > gapUs) {
                closed += SessionAgg(user, st.n, fromMicros(st.start), fromMicros(st.last))
                st = SessionState(1, t, t)
              } else st = SessionState(st.n + 1, st.start, t)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(
                math.floorDiv(st.last, 1000L) + gapMinutes * 60000L)
            }
            closed.result().iterator
          }
      }
  }
}

/** The one-aggregation window profiler behind
  * [[Streams.windowedDriftAlert]]: buffer = (nbins+2) counters
  * (underflow/overflow carried like [[graft.ops.Profiling.binOf]]),
  * finish = the histogram map plus a PSI replaying
  * [[graft.ops.Profiling.histPsi]]'s exact fold — same sorted-bin
  * order (the window map's keys are ascending by construction; pass a
  * sorted-key reference for bitwise parity), same ε floor, same
  * per-bin operation order, natural log. */
private[graft] class WindowDriftAggregator(
    lo: Double,
    hi: Double,
    nbins: Int,
    reference: Map[Int, Long])
    extends org.apache.spark.sql.expressions
      .Aggregator[Double, Array[Long], Streams.DriftProfile] {
  require(nbins >= 1 && hi > lo, "need nbins >= 1 and hi > lo")
  require(reference.nonEmpty, "reference profile must be non-empty")

  private val width = (hi - lo) / nbins

  override def zero: Array[Long] = new Array[Long](nbins + 2)

  override def reduce(b: Array[Long], v: Double): Array[Long] = {
    // identical arithmetic to Profiling.binOf so stream and batch
    // profiles of the same rows are map-for-map equal
    val bin =
      if (v < lo) -1
      else if (v >= hi) nbins
      else math.floor((v - lo) / width).toInt
    b(bin + 1) += 1L
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Streams.DriftProfile = {
    val hist = scala.collection.immutable.ListMap(
      r.indices.filter(r(_) > 0L).map(i => (i - 1) -> r(i)): _*)
    val n = r.sum
    val psi = {
      val (ta, tb) = (n.toDouble, reference.values.sum.toDouble)
      if (ta == 0.0 || tb == 0.0) None
      else {
        val bins = hist.keys.toSeq ++
          reference.keys.toSeq.sorted.filterNot(hist.contains)
        var acc = 0.0
        bins.foreach { bin =>
          val pa = math.max(hist.getOrElse(bin, 0L).toDouble / ta, 1e-6)
          val pb = math.max(reference.getOrElse(bin, 0L).toDouble / tb, 1e-6)
          // StrictMath, not math.log: Spark's Log expression evaluates
          // via StrictMath, and the JDK intrinsic differs by up to 1
          // ulp — enough to break the bitwise batch-kernel parity
          acc += (pa - pb) * java.lang.StrictMath.log(pa / pb)
        }
        Some(acc)
      }
    }
    Streams.DriftProfile(n, hist, psi)
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Streams.DriftProfile] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Streams.DriftProfile]()
}
