package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row whose timestamp is
  * ≤ the left row's, per join key (the set-oriented generalization of the
  * reference's scalar snap-to-latest, SURVEY.md A2/F3).
  *
  * Spark has no native as-of join; the composition here is union + running
  * `last(ignoreNulls)` window:
  *   1. both sides are tagged and unioned on the key (right payload packed
  *      into one struct; left columns null on right rows and vice versa),
  *   2. a window sorted by (ts, side) carries the most recent right struct
  *      forward — right rows sort before left rows at equal ts, making the
  *      match inclusive,
  *   3. left rows project their carried struct.
  *
  * Cost: ONE shuffle on the key (the union sorts within partitions), no
  * range condition in a join (which would force broadcast-nested-loop), no
  * per-row subqueries. Works at any size ratio between the sides.
  *
  * The right side must be unique per (key, ts) for a deterministic result —
  * pre-aggregate it (e.g. `max_by`) if it is not.
  */
object AsofJoin {

  /** @param rightPayload right columns to attach (prefixed on output)
    * @return left rows + `<prefix><col>` for each payload column and
    *         `<prefix><rightTs>` — all null when no right row precedes
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      prefix: String = "r_"): DataFrame = {
    val rStructCols = (rightTs +: rightPayload).map(col)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) :+
        struct(rStructCols: _*).as("__r"): _*)
      // a right row with an unknown timestamp can never be "the latest at or
      // before t" — dropped here so the nulls-first sort cannot carry its
      // payload into left rows as a fabricated match
      .filter(col("__ts").isNotNull)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__side") === 1)
    val projected = left.columns.map(col).toSeq ++
      (rightTs +: rightPayload).map(c => col(s"__m.$c").as(s"$prefix$c"))
    out.select(projected: _*)
  }

  /** FORWARD as-of join — for each left row, the EARLIEST right row whose
    * timestamp is ≥ the left row's, per key (the "next quote after the
    * order" alignment; [[asof]] mirrored in time). Same single-shuffle
    * union-window shape, mirrored in the SORT rather than the frame: the
    * union is ordered by ts DESCENDING and the carried match is a running
    * `last(ignoreNulls)` over (unboundedPreceding → currentRow) — the
    * linear accumulating frame. A forward-looking frame
    * (currentRow → unboundedFollowing) would execute as
    * UnboundedFollowingWindowFunctionFrame, which re-scans to the partition
    * end for EVERY row — O(n²) on hot keys. In descending order, rows seen
    * so far are exactly those with ts ≥ the current row's, and the running
    * last is the smallest such — the earliest match. Right rows sort before
    * left at equal ts (__side asc) so an exact-ts right row still matches
    * (inclusive).
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      prefix: String = "r_"): DataFrame = {
    val rStructCols = (rightTs +: rightPayload).map(col)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) :+
        struct(rStructCols: _*).as("__r"): _*)
      // null-ts right rows would sort before EVERY row under nulls-first and
      // be carried as a forward match for null-ts left rows and for left rows
      // past the last real right ts — they can never be a legitimate match
      .filter(col("__ts").isNotNull)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // desc_nulls_first: Spark's DESC default is NULLS LAST, which would
    // sort a null-timestamp left row AFTER every right row and hand it the
    // globally earliest right payload — a fabricated match for an unknown
    // timestamp. Nulls-first puts such rows before any right row, so the
    // running last() correctly yields no match (the backward asof's ASC
    // nulls-first behavior, now symmetric)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__side") === 1)
    val projected = left.columns.map(col).toSeq ++
      (rightTs +: rightPayload).map(c => col(s"__m.$c").as(s"$prefix$c"))
    out.select(projected: _*)
  }
}
