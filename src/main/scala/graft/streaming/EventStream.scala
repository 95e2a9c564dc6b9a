package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.8).
  *
  * The reference's "streaming" is a daily cron materializing one date
  * partition (T1/T2); its Spark-native analog is a file stream with
  * `Trigger.AvailableNow` over the raw landing zone, plus genuinely
  * incremental operators the reference lacks: watermarked windowed
  * aggregation and stateful sessionization.
  */
object EventStream {

  /** Watermarked tumbling-window aggregation over an event stream
    * (`ts`, `event_type`, `value`). Late data beyond the watermark is
    * dropped; state is bounded by watermark horizon × window count.
    * Pass `watermark = None` to run the identical plan over a batch frame
    * (streaming-shaped batch backfill). The sum goes through an exact
    * decimal accumulator so results are order-independent.
    */
  def hourlyCounts(events: DataFrame,
      watermark: Option[String] = Some("2 hours")): DataFrame =
    watermark.fold(events)(w => events.withWatermark("ts", w))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,3)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** T1/T4 analog — incremental landing-zone ingestion: a file stream over
    * the raw directory. Run with [[runAvailableNow]] for catch-up-then-stop
    * daily batches: the checkpoint tracks which files were already
    * processed, so re-runs ingest only new arrivals (exactly-once file
    * tracking replaces the reference's run-key dedup).
    */
  def landingStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Drain everything currently available, then stop — the Spark-native
    * shape of the reference's daily cron materialization.
    */
  def runAvailableNow(stream: DataFrame, sinkPath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream.format("parquet")
      .option("path", sinkPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Continuous GRIB2 landing-zone ingestion: a `binaryFile` stream over
    * the raw directory where each arriving file decodes ON THE EXECUTOR
    * that reads it ([[graft.sources.Grib2]] decode is a pure function of
    * the payload — nothing funnels through the driver) and explodes into
    * the engine's grid-point rows. The streaming arm of S1/S2: run with
    * `Trigger.AvailableNow` for daily catch-up or continuously, and
    * compose with [[gridSink]] for checkpointed ingestion into the
    * curated store. At 100 TB this is the ingest shape — decode
    * parallelism == file-read parallelism, and the exploded rows flow
    * straight into the date-partitioned sorted writes.
    */
  def gribLandingStream(spark: SparkSession, dir: String,
      decodeBytes: Array[Byte] => Iterator[graft.sources.GribMessage]): DataFrame = {
    import spark.implicits._
    // the binaryFile source's fixed schema — streaming sources require it
    // spelled out even when the format defines it
    val binarySchema = StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
    spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.grib2")
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        // a corrupt/truncated file (observed mid-copy, bad delivery) must
        // not wedge the stream: the checkpoint replays the same file set,
        // so an executor throw here fails EVERY restart identically. Log
        // and skip the file; the raw bytes stay in the landing zone for
        // triage (cf. Jsonl's quarantine — here the file IS the quarantine).
        // MATERIALIZE inside the try: the adapters decode lazily, so an
        // unknown constituent / ragged grid would otherwise throw when
        // Spark consumes the iterator, OUTSIDE this guard
        try decodeBytes(bytes).flatMap(graft.sources.Grib.messagePoints)
          .toVector.iterator
        catch {
          case e: Exception =>
            System.err.println(s"[gribLandingStream] skipping corrupt $path: $e")
            Iterator.empty
        }
      }
      .toDF()
  }

  /** Streaming exact dedup: drop duplicate event ids with state bounded by
    * the watermark horizon (`dropDuplicatesWithinWatermark` — re-deliveries
    * arrive close to the original, so state for older ids can be evicted).
    * The streaming arm of the dedup family (batch forms live in
    * [[graft.dedup.Dedup]]).
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Streaming arm of [[graft.dedup.Dedup.incrementalScreen]]: each arriving
    * micro-batch of documents screens against the FIXED historical corpus
    * and appends its exact/near/new verdicts — the daily-crawl increment as
    * a checkpointed stream, so a replayed batch is never re-screened. The
    * history's index halves recompute per batch here; at scale the caller
    * caches the corpus frame (foreachBatch closes over stable frames), and
    * the persisted-index build amortizes exactly as in the batch path.
    */
  def screeningSink(docsStream: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, sinkPath: String, checkpoint: String,
      threshold: Double = 0.5): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // foreachBatch is at-least-once; overwriting a per-batchId
        // partition makes the replayed epoch idempotent (a blind append
        // would duplicate every verdict of the re-run batch)
        val (verdicts, persisted) = graft.dedup.Dedup.incrementalScreenHandles(
          corpus, batch.toDF(), idCol, textCol, threshold = threshold)
        try verdicts.write.mode("overwrite").parquet(s"$sinkPath/batch=$batchId")
        // the screen persists a corpus-sized shingle frame internally;
        // without an epoch-end unpersist every micro-batch re-persists it
        // and the blocks accumulate for the lifetime of the stream
        finally persisted.foreach(_.unpersist())
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming arm of [[graft.dedup.Dedup.screenAgainstIndex]] — the
    * AMORTIZED screening stream: every micro-batch screens against a
    * PREBUILT persisted index ([[graft.dedup.Dedup.loadIndex]]), so the
    * per-epoch cost is the batch's shingle pass plus the bounded bucket
    * join — no history text is ever read, tokenized or signed, epoch after
    * epoch. This is the production daily-crawl shape: [[screeningSink]]
    * recomputes the history's index state inline each epoch (fine for a
    * small fixed corpus), this sink reads the build-once artifact instead.
    * LSH parameters come from the index's persisted build params, so the
    * stream can never silently screen with a mismatched family.
    */
  def indexScreeningSink(docsStream: DataFrame,
      index: graft.dedup.Dedup.DedupIndex, idCol: String, textCol: String,
      sinkPath: String, checkpoint: String,
      threshold: Double = 0.5): StreamingQuery = {
    // no silent default: a guessed LSH family against a params-less index
    // degrades every verdict to exact/new without erroring — exactly the
    // failure mode persisted params exist to prevent
    val p = index.params.getOrElse(throw new IllegalArgumentException(
      "indexScreeningSink requires an index with persisted build params " +
        "(saveIndex writes them); rebuild the index or screen with the " +
        "explicit-parameter batch API instead"))
    docsStream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val (verdicts, persisted) = graft.dedup.Dedup.screenAgainstIndexHandles(
          index, batch.toDF(), idCol, textCol,
          p.shingleN, p.bands, p.rowsPerBand, threshold)
        try verdicts.write.mode("overwrite").parquet(s"$sinkPath/batch=$batchId")
        finally persisted.foreach(_.unpersist())
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream → curated store: each micro-batch goes through
    * [[graft.store.GridStore.append]] (boundary normalization + date
    * partitioning + sorted write), so streaming ingestion lands with exactly
    * the same dedup-on-read semantics as batch — ReplacingMergeTree behavior
    * preserved under continuous arrival. Checkpointing makes the sink
    * effectively idempotent end-to-end: a replayed batch re-appends, and the
    * keep-latest FINAL view absorbs the duplicates.
    */
  def gridSink(gridRows: DataFrame, store: graft.store.GridStore,
      checkpoint: String): StreamingQuery =
    gridRows.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => store.append(batch); () }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** st7 — STREAMING materialized-view maintenance: each micro-batch folds
    * into a stored rollup by partial-aggregate algebra (count-sum, sum-sum,
    * min-min, max-max — the k12 merge as a stream). The rollup is VERSIONED
    * BY BATCH ID: an epoch reads the latest version below its own id and
    * overwrites its own version, so an at-least-once replay re-reads the
    * same predecessor and rewrites the same output — idempotent by
    * construction, no run-key bookkeeping. At archive scale each epoch
    * touches the delta plus the key-count-sized rollup, never history; a
    * retention sweep prunes old versions (kept here — they are the audit
    * trail).
    */
  def rollupSink(events: DataFrame, rollupPath: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val delta = batch
          .select(col("event_type"), to_date(col("ts")).as("date"), col("value"))
          .groupBy("event_type", "date")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(30,3)")).as("sv"),
            min(col("value")).as("mn"), max(col("value")).as("mx"))
        val merged = latestRollupVersion(spark, rollupPath, below = batchId) match {
          case Some(v) =>
            spark.read.parquet(s"$rollupPath/v=$v").unionByName(delta)
              .groupBy("event_type", "date")
              .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
                min(col("mn")).as("mn"), max(col("mx")).as("mx"))
          case None => delta
        }
        merged.write.mode("overwrite").parquet(s"$rollupPath/v=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Highest rollup version strictly below `below` (Long.MaxValue = latest). */
  def latestRollupVersion(spark: SparkSession, rollupPath: String,
      below: Long = Long.MaxValue): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(rollupPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .filter(_ < below)
      .sorted.lastOption
  }

  /** Watermarked stream-stream interval join: enrich each left event with
    * right-stream events for the same key whose event time falls within
    * `[left.ts − before, left.ts + after]`. Both sides carry watermarks and
    * the join condition bounds event time in BOTH directions, so Spark can
    * evict join state — without the time bounds a stream-stream join
    * buffers forever. This is the training-pipeline enrichment shape
    * (impressions ⋈ conversions, queries ⋈ clicks) the reference's
    * batch-only surface lacks.
    *
    * Column contract: left has `(key, ts, …)`, right has `(key, r_ts, …)`
    * (pre-rename right's time column); output is the inner-join rows.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      before: String = "10 minutes", after: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.withWatermark("r_ts", watermark)
    l.join(r,
      l(key) === r(key) &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $before") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $after"))
      .drop(r(key))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  // sessionStart/lastTs are MICROSECONDS since epoch: the events table is
  // µs-precision, and a ms-floored gap comparison disagrees with the batch
  // sessionizer (e2) for gaps within 1 ms of the boundary (1_800_000_400 µs
  // floors to exactly 1_800_000 ms and would NOT break the session)
  final case class SessionState(sessionStart: Long, lastTs: Long, n: Int, sum: Double)
  final case class Session(user_id: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
      nEvents: Int, sumValue: Double)

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsToTs(us: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session closes
    * when a later event arrives past `gapSeconds`, or — with `idleTimeout`
    * on — when the user goes idle (processing-time timeout flushes the open
    * session). Gap arithmetic and event ordering are MICROSECOND-precision,
    * matching the batch sessionizer (e2) on µs-precision inputs. Leave `idleTimeout` off for batch runs and tests: pending
    * timeouts make the stream trigger continuously even with no data.
    * State per user is O(1) — this scales to any number of users because
    * state is partitioned by the grouping key.
    *
    * With `idleTimeout` off and `flushOpen` off, the trailing open session
    * of each user stays in state and is NEVER emitted — in a finite batch
    * run that state is simply discarded. Batch backfills must set
    * `flushOpen = true`: each group sees all of its rows in one invocation,
    * so emitting the open session at iterator exhaustion is exact. Do NOT
    * set it on an unbounded stream — the still-open session would be
    * emitted once per micro-batch.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      idleTimeout: Boolean = true, flushOpen: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          if (state.hasTimedOut) {
            state.getOption.foreach { s =>
              out += Session(userId, microsToTs(s.sessionStart), microsToTs(s.lastTs),
                s.n, s.sum)
            }
            state.remove()
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.lastTs <= gapSeconds * 1000000L =>
                  cur = Some(s.copy(lastTs = t, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  out += Session(userId, microsToTs(s.sessionStart),
                    microsToTs(s.lastTs), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            if (flushOpen) {
              cur.foreach { s =>
                out += Session(userId, microsToTs(s.sessionStart),
                  microsToTs(s.lastTs), s.n, s.sum)
              }
              state.remove()
            } else {
              cur.foreach(state.update)
              if (idleTimeout) state.setTimeoutDuration(gapSeconds * 1000)
            }
          }
          out.iterator
      }
  }
}
