package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** Structured Streaming under the DRIVER'S HASH GATE (SURVEY.md §2.8).
  *
  * Every function here runs a REAL `readStream → writeStream` pipeline with
  * `Trigger.AvailableNow` inside a contract query: the input table is
  * materialized into a fresh landing directory, the stream drains through a
  * checkpointed sink, and the SINK is read back as the query result — so the
  * DuckDB oracle hash-checks the streaming machinery itself (file-source
  * tracking, checkpointing, stateful operators, idempotent re-drain), not a
  * batch stand-in. The reference's incremental surface is a daily cron
  * (`defs/assets.py:105-119` — materialize one date partition, run-key
  * dedup); these are its Spark-native analogs plus the genuinely streaming
  * operators the reference lacks.
  *
  * Each invocation uses fresh temp dirs, so a bench rep pays the full
  * landing-write + drain cost every time (that IS the measured operation).
  */
object StreamContract {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Stateful streaming cost scales with state-store COUNT, not data: every
    * shuffle partition materializes one state store instance per stateful
    * operator per trigger (a stream-stream join keeps four). The batch
    * session default (cores) is right for the batch queries but pays ~32×
    * setup for these small drains, so the drains size their shuffle width
    * explicitly — the same knob a production job sets per stream relative
    * to its key cardinality, NOT a local-only hack. Runtime conf, restored
    * after the drain; correctness is partitioning-independent (results are
    * sorted and hash-compared).
    */
  private def withDrainParallelism[T](spark: SparkSession, n: Int = 8)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, old)
  }

  /** T1/T4 under the oracle — at-least-once landing, exactly-once result:
    * the landing zone holds every event TWICE (two identical file sets — a
    * re-delivered daily drop), the stream deduplicates on `event_id` with
    * unbounded state, and the drain runs TWO SEPARATE TIMES against the same
    * checkpoint — the second drain finds no new files and must emit nothing.
    * A failure of either mechanism (dedup state or checkpointed file
    * tracking) doubles the counts and hash-mismatches the oracle.
    */
  def dedupIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir, "events")
    val landing = tmp("st1_landing")
    val sink = tmp("st1_sink")
    val ckpt = tmp("st1_ckpt")
    events.write.mode("append").parquet(landing)
    events.write.mode("append").parquet(landing)
    def drain(): Unit = {
      val q = spark.readStream.schema(events.schema).parquet(landing)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    withDrainParallelism(spark) {
      drain()
      drain() // idempotent re-run: checkpoint says every file is already done
    }
    spark.read.parquet(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,3)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** st1's exactly-once result with BOUNDED state:
    * `dropDuplicatesWithinWatermark` holds a key's state only until the
    * event-time watermark passes its arrival time plus the delay, so the
    * state store is sized by the re-delivery horizon (here 1 hour), not the
    * stream's full history. That is the only dedup shape that survives a
    * year-long 100 TB/day stream — st1's unbounded `dropDuplicates` state
    * grows forever and is the demo of the mechanism, this is the production
    * variant. Both copies of every event land before the first trigger and
    * the first batch's watermark is 0 (watermarks advance between batches),
    * so no key can be evicted before its duplicate arrives — the result is
    * exactly one row per event_id, value-identical to exact dedup. The
    * second drain against the same checkpoint must emit nothing.
    */
  def dedupBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir, "events")
    val landing = tmp("st6_landing")
    val sink = tmp("st6_sink")
    val ckpt = tmp("st6_ckpt")
    events.write.mode("append").parquet(landing)
    events.write.mode("append").parquet(landing)
    def drain(): Unit = {
      val q = EventStream.dedupStream(
        spark.readStream.schema(events.schema).parquet(landing),
        Seq("event_id"), watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    withDrainParallelism(spark) {
      drain()
      drain() // idempotent re-run: no new files, nothing emitted
    }
    spark.read.parquet(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,3)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** st7 — streaming materialized-view maintenance: the k12 rollup merge
    * run as a checkpointed stream. Events land as THREE files (hash-split
    * so every micro-batch carries all rollup keys — each epoch's merge is
    * real, not a disjoint append), drain one file per trigger through
    * [[EventStream.rollupSink]]'s versioned foreachBatch merge, re-drain to
    * prove idempotency, and the LATEST ROLLUP VERSION is the query result —
    * which the oracle checks against the direct full recompute.
    */
  def streamRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value")
    val landing = tmp("st7_landing")
    val rollup = tmp("st7_rollup")
    val ckpt = tmp("st7_ckpt")
    (0 until 3).foreach { c =>
      events.filter(pmod(col("event_id"), lit(3)) === c)
        .coalesce(1).write.mode("append").parquet(landing)
    }
    def drain(): Unit = {
      val q = EventStream.rollupSink(
        spark.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", "1").parquet(landing),
        rollup, ckpt)
      q.awaitTermination()
    }
    withDrainParallelism(spark) {
      drain()
      drain() // no new files: no epochs, the rollup version set is unchanged
    }
    val v = EventStream.latestRollupVersion(spark, rollup)
      .getOrElse(sys.error("st7: no rollup version materialized"))
    spark.read.parquet(s"$rollup/v=$v")
      .select(col("event_type"), col("date"), col("n"),
        col("sv").cast("double").as("sum_value"),
        col("mn").as("min_v"), col("mx").as("max_v"))
      .orderBy("event_type", "date")
  }

  /** Stateful sessionization as a STREAM — `flatMapGroupsWithState` closed
    * sessions only: the landing zone is one file (one micro-batch), the
    * session state machine emits a session when a later event arrives past
    * the gap, and each user's trailing OPEN session stays in state and is
    * never emitted — exactly the streaming semantics (an unbounded stream
    * cannot know a session ended until the next event or a timeout). The
    * oracle reconstructs gap sessionization in SQL and drops each user's
    * last session. Microsecond precision throughout: session state tracks
    * epoch-µs (see [[EventStream.sessionize]]) — the same unit as the batch
    * e2 sessionizer — so the oracle mirrors with `epoch_us`.
    */
  def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val landing = tmp("st2_landing")
    val sink = tmp("st2_sink")
    val ckpt = tmp("st2_ckpt")
    // createTempDirectory pre-creates the dir, so the landing write overwrites
    events.coalesce(1).write.mode("overwrite").parquet(landing)
    val stream = spark.readStream.schema(events.schema).parquet(landing)
      .as[EventStream.Event]
    withDrainParallelism(spark) {
      val q = EventStream
        .sessionize(stream, gapSeconds = 1800, idleTimeout = false, flushOpen = false)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(sink)
      .select(col("user_id"),
        col("sessionStart").as("session_start"),
        col("sessionEnd").as("session_end"),
        col("nEvents").cast("long").as("n_events"),
        round(col("sumValue"), 6).as("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** Watermarked windowed aggregation as a STREAM, complete mode: the
    * hourly-counts plan of [[EventStream.hourlyCounts]] runs as a streaming
    * aggregation and `foreachBatch` overwrites the sink with the
    * complete-to-date result each trigger — the last trigger's overwrite is
    * the full aggregate, which must equal the batch GROUP BY. The decimal
    * accumulator makes the sum order-independent, so micro-batch boundaries
    * cannot show through.
    */
  def hourly(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir, "events")
    val landing = tmp("st3_landing")
    val sink = tmp("st3_sink")
    val ckpt = tmp("st3_ckpt")
    events.write.mode("overwrite").parquet(landing)
    val stream = spark.readStream.schema(events.schema).parquet(landing)
    withDrainParallelism(spark) {
      val q = EventStream.hourlyCounts(stream)
        .writeStream.outputMode("complete")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(sink); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(sink).orderBy("hour", "event_type")
  }

  /** Watermarked STREAM-STREAM inner join — the attribution query (every
    * purchase within 6 h of a view by the same user) as two independent
    * streams: views and purchases land in separate zones, each side carries
    * its own event-time watermark, and the time-range join condition bounds
    * the buffered state (a view older than the purchase watermark minus 6 h
    * can never match again and is evicted). This is the one stateful
    * streaming operator that cannot be faked with foreachBatch — Spark
    * buffers BOTH sides in the state store and emits matches as they form.
    * The oracle replays the identical interval join in SQL.
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir, "events")
    val viewsDir = tmp("st5_views")
    val purchDir = tmp("st5_purch")
    val sink = tmp("st5_sink")
    val ckpt = tmp("st5_ckpt")
    events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id"))
      .coalesce(1).write.mode("overwrite").parquet(viewsDir)
    events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user_id"), col("value").as("purchase_value"))
      .coalesce(1).write.mode("overwrite").parquet(purchDir)
    val views = spark.readStream
      .schema(spark.read.parquet(viewsDir).schema).parquet(viewsDir)
      .withWatermark("view_ts", "1 hour")
    val purchases = spark.readStream
      .schema(spark.read.parquet(purchDir).schema).parquet(purchDir)
      .withWatermark("purchase_ts", "7 hours")
    withDrainParallelism(spark) {
      val q = views.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") > col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 6 HOURS"))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(sink)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"),
        col("purchase_value"))
      .orderBy("user_id", "view_id", "purchase_id")
  }

  /** The daily-crawl screening STREAM against a persisted dedup index
    * ([[EventStream.indexScreeningSink]]) under the oracle: history (4/5 of
    * the corpus) is built and saved once, the remaining fifth arrives as a
    * streamed batch, and the per-epoch screen verdicts land in per-batch
    * sink partitions. Same split, parameters and verdict semantics as the
    * batch `d15_indexed_screen`, so the same first-principles oracle SQL
    * applies — what the hash now additionally pins is the foreachBatch
    * plumbing (params taken from the index artifact, epoch-scoped persist
    * handles, idempotent per-batch overwrite).
    */
  def screen(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val idxDir = tmp("st4_idx")
    val landing = tmp("st4_landing")
    val sink = tmp("st4_sink")
    val ckpt = tmp("st4_ckpt")
    val built = graft.dedup.Dedup.buildIndex(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", shingleN = 3, bands = 12, rowsPerBand = 4, maxBucket = 64)
    graft.dedup.Dedup.saveIndex(built, idxDir)
    built.docs.unpersist() // the build's shingle cache; the screen reads parquet
    docs.filter(col("doc_id") % 5 === 0).coalesce(1)
      .write.mode("overwrite").parquet(landing)
    val stream = spark.readStream.schema(docs.schema).parquet(landing)
    withDrainParallelism(spark) {
      val q = EventStream.indexScreeningSink(stream,
        graft.dedup.Dedup.loadIndex(spark, idxDir), "doc_id", "text",
        sink, ckpt, threshold = 0.4)
      q.awaitTermination()
    }
    // the sink is partitioned by batch id (one dir per epoch); the verdict
    // schema is batch-invariant, so drop the synthetic partition column
    spark.read.parquet(sink).drop("batch")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** ST8 — CONTINUOUS MEDIA INGEST: a landing zone of real PNG payloads is
    * consumed as a stream, DECODED ON THE EXECUTORS inside the streaming
    * query (javax.imageio in a typed mapPartitions — the shape a 100 TB
    * media landing zone needs: pixels never funnel through the driver),
    * banded, and screened against the PERSISTED blob-free history feature
    * table via a stateless stream-static equi-join + hamming filter, match
    * rows appended to a checkpointed parquet sink. The verdict frame
    * re-aggregates the sink to the m7 screen shape (per-item match count +
    * argmin), so the m7 ORACLE replays this streaming drain end to end.
    *
    * @param histBanded  banded, block-capped history features (static side)
    * @param payloadsDir parquet dir of MediaRow payloads to stream-ingest
    * @param batchIds    all batch media ids (for the no-match left join)
    */
  def mediaScreen(spark: SparkSession, histBanded: DataFrame,
      payloadsDir: String, batchIds: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val sink = tmp("st8_sink")
    val ckpt = tmp("st8_ckpt")
    val keys = Seq("kind", "w_band", "h_band", "luma_band")
    val hist = histBanded
      .select((keys.map(col) :+ col("mediaId").as("hist_id")) :+
        col("aHash").as("hist_hash"): _*)
    val payloadSchema = spark.read.parquet(payloadsDir).schema
    val stream = spark.readStream.schema(payloadSchema).parquet(payloadsDir)
      .as[Multimodal.MediaRow]
    // the streaming DECODE: real pixels → features, batch-in/batch-out on
    // whichever executor holds the payload split
    val banded = Multimodal.bandFeatures(
        Multimodal.extractFeatures(stream).toDF())
      .select((keys.map(col) :+ col("mediaId").as("batch_id")) :+
        col("aHash").as("batch_hash"): _*)
    val matches = banded.join(hist, keys) // stream-static, stateless
      .withColumn("hamming",
        bit_count(col("batch_hash").bitwiseXOR(col("hist_hash"))))
      .filter(col("hamming") <= 6)
      .select(col("batch_id"), col("hist_id"), col("hamming"))
    withDrainParallelism(spark) {
      val q = matches.writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // read the sink with the match schema STATED, not inferred: a screen
    // that produced zero match rows leaves a parquet dir with no data
    // files, where schema inference throws instead of yielding the
    // all-no-match verdict the left join below exists to report
    Multimodal.screenVerdict(
      spark.read.schema(matches.schema).parquet(sink), batchIds)
  }

  /** ST9 — MODEL-GATED CONTINUOUS INGEST: the add-one-smoothed bigram LM
    * (t21's model) is fitted ONCE on the static reference slice
    * (`doc_id % 10 == 0`), then a landing zone of incoming documents is
    * consumed as a stream and each micro-batch is scored against the
    * broadcast model inside `foreachBatch` — full batch-DataFrame semantics
    * (the per-document window + aggregate a bare streaming plan would
    * reject in append mode without a watermark), which is exactly the
    * production pattern for model scoring in Structured Streaming. Each
    * scored document carries its cross-entropy and the keep/reject verdict
    * (`xent ≤ threshold`); the checkpointed sink is read back as the
    * result, so the DuckDB oracle replays the entire drain: a
    * lost/duplicated micro-batch or a model drift hash-mismatches.
    *
    * Scale: the model frames are corpus-sublinear and re-broadcast per
    * micro-batch; no streaming state accumulates — the gate is stateless
    * across batches by construction (each document's verdict depends only
    * on itself and the static model).
    */
  def lmGate(spark: SparkSession, sfDir: String,
      threshold: Double = 5.1,
      artifactDir: String = "/tmp/graft_oracle/st9_lm"): DataFrame = {
    import graft.text.LanguageModel
    val docs = Tables(spark, sfDir, "documents")
    val landing = tmp("st9_landing")
    val sink = tmp("st9_sink")
    val ckpt = tmp("st9_ckpt")
    // score from the PERSISTED surprisal artifact (fitted+saved by the
    // caller once per source fingerprint — SparkEntry.lmSurprisalOnce);
    // the oracle joins the same files, so the xent (and therefore the
    // near-threshold kept verdict) cannot diverge on a log2 ulp (the
    // t21 artifact discipline)
    val art = LanguageModel.loadSurprisal(spark, artifactDir)
    docs.filter(col("doc_id") % 10 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(landing)
    val stream = spark.readStream.schema(docs.schema).parquet(landing)
    // the verdict schema, STATED up front for the empty-drain read-back
    // (the st8 lesson: inference over a zero-row sink throws) — computed
    // once on the driver thread, not captured mutably from inside the
    // stream-execution thread's closure
    val verdictSchema = LanguageModel
      .scoreArtifact(docs.limit(0), "doc_id", "text", art)
      .withColumn("kept", col("xent") <= threshold).schema
    withDrainParallelism(spark) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val scored = LanguageModel.scoreArtifact(batch, "doc_id", "text", art)
            .withColumn("kept", col("xent") <= threshold)
          // foreachBatch is AT-LEAST-ONCE (a crash between write and
          // checkpoint commit replays the batch) — keying the sink by
          // batchId and dynamically overwriting ONLY that partition makes
          // the replay rewrite its own output instead of duplicating it
          // (the st4 sink discipline)
          scored.withColumn("batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(sink)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // the batch-id partition column is synthetic — drop it on read-back
    spark.read.schema(verdictSchema.add("batch", "long")).parquet(sink)
      .drop("batch").orderBy("doc_id")
  }

  /** Streaming token-budget ADMISSION — the ingest-time form of sm3's
    * budget sampling: documents arrive in waves and each is admitted while
    * its source's SCANNED-token prefix (every earlier doc in arrival
    * order, admitted or not) still fits the budget. The prefix rule is
    * what makes the verdict replayable and monotone — once a source's
    * budget is consumed it stays consumed; a later tiny doc cannot sneak
    * in behind a rejection (and the oracle is ONE running-sum window).
    *
    * Cross-batch state is the per-source scanned totals — source-count
    * sized, never doc-sized — and it is DERIVED, not stored: each batch
    * re-aggregates the sink's earlier-batch partitions (`batch <
    * batchId`), so a replayed batch (foreachBatch is at-least-once) sees
    * exactly the same prior totals and rewrites exactly its own partition
    * (the st4/st9 dynamic-overwrite discipline makes the whole pipeline
    * idempotent, state included). At scale the re-aggregate is a partition-
    * pruned scan of verdict rows; a long-running job would roll the totals
    * into a compacted summary partition, same contract.
    *
    * Wave order is pinned by the FILE SOURCE's oldest-first mtime order:
    * each wave lands as one renamed file with an explicitly set, strictly
    * increasing modification time — arrival order is part of the contract,
    * so the test fixture makes it deterministic rather than trusting write
    * timing.
    */
  def budgetAdmission(spark: SparkSession, sfDir: String,
      budget: Long = 600L): DataFrame = {
    import graft.text.TextAnalysis
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
    val landing = tmp("st10_landing")
    val sink = tmp("st10_sink")
    val ckpt = tmp("st10_ckpt")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(landing).getFileSystem(hconf)
    (0 until 3).foreach { wave =>
      val stage = tmp(s"st10_stage$wave")
      docs.filter(pmod(col("doc_id"), lit(3)) === wave)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"st10: wave $wave produced no parquet part"))
      val dst = new org.apache.hadoop.fs.Path(landing, f"wave$wave%02d.parquet")
      if (!fs.rename(part, dst))
        sys.error(s"st10: failed to move wave $wave into the landing zone")
      // strictly increasing mtimes: the file source drains oldest-first,
      // so this IS the arrival order
      fs.setTimes(dst, 1000000L * (wave + 1), -1L)
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val verdictSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("admitted",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("batch",
        org.apache.spark.sql.types.LongType)))
    withDrainParallelism(spark) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val priorSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("source",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("prior_tokens",
              org.apache.spark.sql.types.LongType)))
          val prior =
            if (batchId == 0L) spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], priorSchema)
            else spark.read.schema(verdictSchema).parquet(sink)
              .filter(col("batch") < batchId)
              .groupBy("source")
              .agg(sum(col("n_tokens")).as("prior_tokens"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("doc_id")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          batch
            .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
            .join(prior, Seq("source"), "left")
            .withColumn("cum",
              coalesce(col("prior_tokens"), lit(0L)) + sum(col("n_tokens")).over(w))
            .withColumn("admitted", col("cum") <= budget)
            .select("doc_id", "source", "n_tokens", "admitted")
            .withColumn("batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(sink)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.schema(verdictSchema).parquet(sink)
      .drop("batch").orderBy("doc_id")
  }

  /** Streaming micro-batches committed to the snapshot table format
    * EXACTLY-ONCE: each `foreachBatch` invocation lands as one
    * `commitTagged(batch, "batch-<id>")` — the tag rides in the manifest
    * header, so an at-least-once REPLAY of an acknowledged batch resolves
    * to the existing version and writes nothing (the Delta/Iceberg
    * txn-version handshake; the st4/st9 dynamic-partition-overwrite
    * discipline expressed at the table-format layer instead of the sink
    * layout). The drain leaves a real versioned table behind: every
    * micro-batch is a time-travelable snapshot and downstream loaders
    * consume `readIncremental` from their checkpointed version.
    *
    * The query itself REPLAYS a tagged commit after the drain (the whole
    * corpus under the first batch's tag): if tag resolution ever broke,
    * the corpus would double and the oracle hash would catch it — the
    * idempotence claim is inside the gated result, not just the spec.
    */
  def snapshotSink(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.SnapshotStore
    val ev = Tables(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
    val landing = tmp("st11_landing")
    val storeDir = tmp("st11_store")
    val ckpt = tmp("st11_ckpt")
    // four range-disjoint landing files; maxFilesPerTrigger=1 makes each
    // its own micro-batch/commit
    ev.repartitionByRange(4, col("event_id"))
      .write.mode("overwrite").parquet(landing)
    val st = new SnapshotStore(spark, s"$storeDir/snap", "event_id")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    withDrainParallelism(spark) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          st.commitTagged(batch, s"batch-$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // forced replay of an acknowledged tag: must resolve, not re-commit
    st.commitTagged(ev, "batch-0")
    st.read().groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(30,3)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** st12: the WAP QUARANTINE SINK — every micro-batch STAGES with zero
    * reader visibility, a per-batch audit gates the publish, and a batch
    * that fails its audit stays staged (quarantined, forensically intact)
    * without one row ever having been visible. st9 (partition overwrite)
    * and st11 (commitTagged) solve at-least-once replay for appends that
    * are ALWAYS wanted; the quarantine sink adds the audit gate a
    * training-data ingest needs — a poisoned epoch must neither land nor
    * vanish. Replay-safe at every crash point: a published epoch's tag
    * no-ops (exactly-once), an un-judged staged epoch is discarded and
    * deterministically re-staged, a quarantined epoch is re-judged.
    */
  def wapQuarantineSink(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.SnapshotStore
    val ev = Tables(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
    // one epoch in four arrives poisoned (negated values) — the audit
    // must catch and quarantine exactly that one
    val poisoned = ev.withColumn("value",
      when(col("event_id") % 4 === 2, col("value") * -1.0)
        .otherwise(col("value")))
    val landing = tmp("st12_landing")
    val storeDir = tmp("st12_store")
    val ckpt = tmp("st12_ckpt")
    (0 until 4).foreach { i =>
      poisoned.filter(col("event_id") % 4 === i).coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(landing)
    }
    val st = new SnapshotStore(spark, s"$storeDir/snap", "event_id")
    // ONE audit-and-publish verdict shared by the original pass and the
    // replay re-judge — the replay-stability property st12 pins depends
    // on both passes running the IDENTICAL rule
    def judgeStaged(wid: String): Unit = {
      val bad = st.readWapBatch(wid)
        .filter(col("value") < 0).limit(1).count() > 0
      if (!bad) { st.publishWap(wid); () }
    }
    def processEpoch(batch: DataFrame, wid: String): Unit =
      if (!st.wapPublished(wid)) {
        // a staged leftover means a prior attempt crashed before its
        // audit verdict — epochs are deterministic, so rebuild
        if (st.wapStaged(wid)) st.discardWap(wid)
        st.stageWap(batch, wid)
        judgeStaged(wid)
      }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    withDrainParallelism(spark) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          processEpoch(batch, s"epoch-$batchId")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // forced at-least-once replay of every epoch: published ones must
    // no-op behind their tag, the quarantined one must re-judge to the
    // same verdict — the visible table cannot move
    val before = st.read().count()
    (0L until 4L).foreach { i =>
      val wid = s"epoch-$i"
      if (st.wapPublished(wid)) st.publishWap(wid)
      else if (st.wapStaged(wid)) judgeStaged(wid)
    }
    val replayStable = if (st.read().count() == before) 1L else 0L
    val quarantined = st.waps().filter(!col("published")).count()
    val leaked = st.read().filter(col("value") < 0).count()
    st.read().groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(30,3)")).cast("double").as("sum_value"))
      .withColumn("quarantined", lit(quarantined))
      .withColumn("poison_leaked", lit(leaked))
      .withColumn("replay_stable", lit(replayStable))
      .orderBy("event_type")
  }

  /** st13: the STREAMING TAKEDOWN SINK — a compliance key stream applied
    * to a snapshot table through merge-on-read deletes. Each micro-batch
    * is a set of takedown keys; `foreachBatch` collects them (takedown
    * batches are small by nature — ids, never rows) and issues one keyed
    * `deleteWhere`, which plans through zones + blooms and MASKS the
    * scattered hits behind delete vectors: a METADATA-ONLY commit per
    * epoch, zero data files written or dropped (pinned by the
    * metadata_only flag). Replay-safe WITHOUT tags: a replayed epoch's
    * keys are already masked, so its visible scan matches nothing and
    * deleteWhere no-ops — the query forces a replay of the first epoch
    * and pins the version/state freeze. The audit trail a takedown
    * pipeline is graded on rides in the result: the cumulative masked-row
    * census (dvStats) must equal the key-set size the oracle replays.
    */
  def takedownSink(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.SnapshotStore
    val ev = Tables(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
    val landing = tmp("st13_landing")
    val storeDir = tmp("st13_store")
    val ckpt = tmp("st13_ckpt")
    val st = new SnapshotStore(spark, s"$storeDir/snap", "event_id",
      bloomCols = Seq("event_id"))
    (0L to 2L).foreach(b =>
      st.commit(ev.filter(pmod(col("event_id"), lit(3L)) === b)
        .repartitionByRange(4, col("event_id"))))
    // three takedown epochs, each a scattered key stride (~0.1% of rows,
    // ~one hit per file — the shape delete vectors exist for)
    val strides = Seq(("a", col("event_id") % 997 === 0),
      ("b", col("event_id") % 991 === 1), ("c", col("event_id") % 983 === 2))
    strides.zipWithIndex.foreach { case ((_, cond), i) =>
      ev.filter(cond).select("event_id").coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(landing)
    }
    val dataFilesBefore = st.read().inputFiles
      .filterNot(_.contains("/_dv/")).toSet
    def applyTakedown(batch: DataFrame): Unit = {
      val keys = batch.select("event_id").collect().map(_.getLong(0)).toSeq
      if (keys.nonEmpty) { st.deleteWhere(col("event_id").isin(keys: _*)); () }
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(landing)
    withDrainParallelism(spark) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) => applyTakedown(batch) }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // forced at-least-once replay of the FIRST epoch: every key is
    // already masked, the visible scan matches nothing, the table and
    // version must freeze
    val vBefore = st.latestVersion.get
    applyTakedown(ev.filter(strides.head._2).select("event_id"))
    val replayStable = if (st.latestVersion.get == vBefore) 1L else 0L
    val metadataOnly = if (st.read().inputFiles
      .filterNot(_.contains("/_dv/")).toSet == dataFilesBefore) 1L else 0L
    val (_, maskedRows) = st.dvStats(st.latestVersion.get)
    st.read().groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(30,3)")).cast("double").as("sum_value"))
      .withColumn("masked_rows", lit(maskedRows))
      .withColumn("metadata_only", lit(metadataOnly))
      .withColumn("replay_stable", lit(replayStable))
      .orderBy("event_type")
  }
}
