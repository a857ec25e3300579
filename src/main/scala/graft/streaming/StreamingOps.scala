package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is batch-only and the
  * north rule is batch spark-submit (SURVEY.md §2.6), so nothing in
  * the correctness gate depends on streaming — this module exists to
  * show the same dataflow runs incrementally: the event-time windowed
  * aggregate (the streaming analog of the `window_agg` query) and the
  * extraction map over a stream of turns.
  */
object StreamingOps {

  /** watermarked tumbling-window event aggregate over a parquet
    * directory stream — identical result columns to `window_agg`.
    */
  def eventWindowCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
      // event-time must be TIMESTAMP (with zone); parquet may carry NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("total_micros"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("total_micros"))
  }

  /** the extraction map as a stream: stateless, so it runs in append
    * mode with no state store — turns arrive, markdown leaves.
    */
  def extractStream(spark: SparkSession, transcriptsDir: String): DataFrame = {
    val schema = spark.read.parquet(transcriptsDir).schema
    graft.extract.ExtractPipeline.overTranscripts(
      spark.readStream.schema(schema).parquet(transcriptsDir))
  }

  /** Event-time session windows over a parquet directory stream — the
    * streaming twin of `events.EventOps.sessionize/sessionStats`, via
    * the BUILT-IN `session_window` (compose existing ops before
    * hand-rolling state: Spark merges overlapping per-event windows in
    * the state store, watermark-bounded, exactly the custom
    * flatMapGroupsWithState one would otherwise write). Output: one
    * row per closed (user, session) with event count and the exact
    * integer-micro value sum.
    *
    * Boundary note: `session_window` starts a new session when the gap
    * is ≥ the threshold, EventOps.sessionize when it is strictly >.
    * They differ only for a gap EXACTLY equal to the threshold —
    * microsecond event-time makes that measure-zero in practice, and
    * the batch-equality spec runs on the real fixture.
    */
  def sessionStream(spark: SparkSession, dir: String,
      gapSeconds: Long = 1800L): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    // same NTZ/time-zone safety gate as the batch twin — the streaming
    // path must throw where batch throws, not silently miscount
    graft.events.EventOps.requireSafeTz(schema("ts").dataType, spark, "ts")
    // the watermark (late-data tolerance) must be at least the gap:
    // with a shorter watermark a session could finalize while an
    // in-gap event is still admissible, splitting what batch
    // sessionization keeps whole. Batch equality holds for event-time
    // disorder up to this delay.
    val delay = math.max(gapSeconds, 3600L)
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$delay seconds")
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // DOUBLE like the batch twin (sessionStats) — one schema for
        // both paths, and the driver's pandas bridge renders nullable
        // BIGINT as float64 anyway
        sum(round(col("value") * 1000000).cast("long")).cast("double")
          .as("value_micros"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("value_micros"))
  }

  /** Streaming decontamination — the stream-static join pattern: docs
    * arrive as a stream, the benchmark n-gram hash set is a STATIC
    * (bounded) frame joined per micro-batch. Spark broadcasts the
    * static side into every batch, so the check stays the same
    * map-side hash probe as the batch twin (`Corpus.decontaminate`).
    * The per-doc hit count is an unwatermarked streaming aggregate
    * (doc_id keys never expire — contamination is corpus-lifetime
    * state), so the sink runs in complete/update mode; its state is
    * O(contaminated docs), each row two longs. Output: (doc_id,
    * n_hits) per contaminated streamed doc — batch-equality asserted
    * in StreamingSpec.
    */
  def decontaminateStream(spark: SparkSession, docsDir: String,
      bench: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 5): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    // the gram set comes from the SAME helper as the batch twin (the
    // default n once drifted between hand-rolled copies), and is
    // persisted: a static frame in a stream-static join is otherwise
    // re-computed every micro-batch
    val benchGrams =
      graft.text.Corpus.benchmarkGrams(bench, textCol, n).persist()
    // release the cached static side once streaming winds down —
    // without this every call leaked one cached dataset for the
    // session's lifetime (a long-running driver accumulates them).
    // Unpersist is performance-only (a later/running query just
    // recomputes the static side per micro-batch), so the trigger can
    // be conservative — but it must not fire BEFORE the caller's
    // .start(): an unrelated stream terminating in the gap would
    // discard the cache for this stream's whole lifetime. The listener
    // therefore ARMS on the first query start observed after
    // registration and releases when the last active query terminates.
    // (If the caller never starts the returned frame, the cache lives
    // until some other stream cycle fires the listener — callers
    // wanting deterministic release can unpersist via the catalog.)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      @volatile private var armed = false
      override def onQueryStarted(e: QueryStartedEvent): Unit = armed = true
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (armed && spark.streams.active.isEmpty) {
          benchGrams.unpersist()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    graft.util.Staged.explodeOnce(
      spark.readStream.schema(schema).parquet(docsDir),
      Seq(col(idCol).as("doc_id")),
      graft.text.TextExprs.shingleHashes(col(textCol), distinct = true, n), "g")
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** streaming exact dedup — first-seen row per content digest wins,
    * later duplicates are dropped across micro-batches. Custom keyed
    * state via `flatMapGroupsWithState` (the state store holds ONE
    * boolean per digest — not the row — so state size is O(distinct
    * digests), the same footprint the batch `dedup_exact` aggregate
    * shuffles). At 100 TB the state store backs onto RocksDB and the
    * digest key partitions the stream exactly like the batch groupBy.
    *
    * Batch-equality contract (StreamingSpec): the set of emitted
    * (digest, id) equals batch `Dedup.exact`'s keep rows when ids
    * arrive in id order (first-seen = min id per digest there).
    */
  def dedupStream(spark: SparkSession, docsDir: String,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[(String, Long)] = {
    import spark.implicits._
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream.schema(schema).parquet(docsDir)
      .select(sha2(col(textCol), 256).as("digest"), col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (digest: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // digest already emitted
          else {
            state.update(true)
            // first row of the first micro-batch that carries this
            // digest; within a batch, keep the smallest id so the
            // result is deterministic under any task interleaving
            Iterator.single((digest, rows.map(_._2).min))
          }
      }
  }
}
