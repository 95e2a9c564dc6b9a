package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history over a change feed.
  *
  * The reference keeps only latest-wins state (ReplacingMergeTree semantics,
  * `pipeline-python/src/pipeline_python/storage/clickhouse_grid_store.py:43-68`);
  * a training-data pipeline additionally needs the HISTORY — "what was this
  * entity's attribute when the document was sampled" — which is the classic
  * SCD-2 dimension: one row per (key, run of equal attribute values) with a
  * `[valid_from, valid_to)` interval and an open current row.
  *
  * Scale posture: `history` is two window passes over the change feed — one
  * shuffle on the key, no self-joins, no driver state. `merge` (the daily CDC
  * application) re-derives ONLY the keys present in the update batch: the
  * untouched dimension rows pass through an anti-join (at 100 TB the affected
  * key set of a daily batch is small — AQE broadcasts it), so incremental
  * cost is bounded by the batch, not the dimension.
  */
object Scd2 {

  /** Collapse a change feed (one row per observed change event) into SCD-2
    * history: consecutive equal attribute values merge into one validity run;
    * `valid_to` is the next run's start (open for the current run).
    *
    * @param tieBreak extra ordering columns for changes sharing a timestamp
    *                 (required for determinism when the feed can carry ties).
    */
  def history(changes: DataFrame, key: String, attr: String, ts: String,
              tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(ts).asc +: tieBreak.map(col(_).asc)).toSeq
    val w = Window.partitionBy(key).orderBy(ord: _*)
    // run starts must be detected NULL-SAFELY: `prev =!= attr` is SQL
    // three-valued — a change TO a null attribute evaluates NULL and the
    // row silently drops (the cleared-to-null period gets attributed to
    // the previous value), while consecutive null values would each open a
    // spurious run under a bare isNull check. row_number marks the true
    // first row; <=> compares the rest null-safely.
    val runs = changes
      .withColumn("graft_prev", lag(col(attr), 1).over(w))
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1 || !(col("graft_prev") <=> col(attr)))
      .select((col(key) +: col(attr) +: col(ts).as("valid_from")
        +: tieBreak.map(col)): _*)
    // the tie-break columns ride through to the second window: two DIFFERENT
    // attr values at the same (key, ts) are both run starts, and valid_to
    // assignment must see the same total order the run detection used
    val ord2 = (col("valid_from").asc +: tieBreak.map(col(_).asc)).toSeq
    val w2 = Window.partitionBy(key).orderBy(ord2: _*)
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tieBreak: _*)
  }

  /** Apply a batch of new changes to an existing SCD-2 dimension.
    *
    * Keys untouched by the batch pass through unchanged (anti-join); for
    * affected keys the existing intervals are replayed as a change feed
    * (their `valid_from`s ARE the run starts), unioned with the new changes,
    * and re-collapsed — so a batch whose first change equals the key's
    * current attribute correctly extends the open run instead of opening a
    * duplicate one, and the result is identical to deriving history from the
    * full feed from scratch.
    */
  def merge(dim: DataFrame, changes: DataFrame, key: String, attr: String,
            ts: String, tieBreak: Seq[String] = Nil): DataFrame = {
    // materialized once (it feeds BOTH the anti-join and the replay join —
    // without this the batch is scanned and de-duplicated twice), and
    // lineage-truncated so daily re-merges don't grow the plan
    val affectedKeys = changes.select(col(key)).distinct().localCheckpoint()
    val untouched = dim.join(affectedKeys, Seq(key), "left_anti")
    val replayed = dim.join(affectedKeys, Seq(key))
      .select(col(key), col(attr), col("valid_from").as(ts))
    val feedCols = replayed.columns.toSeq
    // Replayed rows carry no tie-break columns; null-pad so the union works.
    // Contract: a batch change whose ts COLLIDES with an existing run start
    // is ordered deterministically AFTER the replayed row (asc_nulls_first)
    // but the original feed's tie-break for that historical row is gone —
    // event-time CDC feeds must deliver batches in ts order for the
    // merge ≡ from-scratch equivalence to hold on tied timestamps.
    val padded = tieBreak.foldLeft(replayed)((f, c) => f.withColumn(c, lit(null)))
    val updates = changes.select((feedCols ++ tieBreak).distinct.map(col): _*)
    untouched.unionByName(
      history(padded.unionByName(updates), key, attr, ts, tieBreak))
  }
}
