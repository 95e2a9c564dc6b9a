package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A1 — keep-latest dedup semantics, the ReplacingMergeTree equivalent
  * (reference: `pipeline-python/migrations/clickhouse/init.sql:11-25`).
  *
  * ClickHouse keeps the max-`inserted_at` row per sorting key lazily at merge
  * time; correct reads use `FINAL`. Here the semantic is a window dedup that
  * every read path must go through (SURVEY.md §7.4 — centralized so
  * idempotency can't silently break).
  *
  * At scale: the window shuffles once on the dedup key. When the store is
  * date-partitioned and a read is partition-pruned to a few dates, the shuffle
  * covers only those partitions. `tiebreakCols` makes the result deterministic
  * when two rows carry the same version (CH keeps an arbitrary one; we pin it).
  */
object Replacing {

  def latest(
      df: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      tiebreakCols: Seq[String] = Nil
  ): DataFrame = {
    val ordering = (col(versionCol).desc +: tiebreakCols.map(col(_).desc))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Hash-aggregation formulation of the same semantic: `max_by` of the full
    * row keyed by (version, tiebreaks). Identical result to [[latest]], but
    * planned as a hash aggregate with map-side partial `max_by` — no
    * per-partition sort and a shuffle that carries ONE row per (key,
    * partition) instead of every version. Prefer this at scale; the window
    * form stays as the executable spec both must match.
    */
  def latestAgg(
      df: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      tiebreakCols: Seq[String] = Nil
  ): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    val ord = struct((versionCol +: tiebreakCols).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), ord).as("__r"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__r.$c")): _*)
  }
}
