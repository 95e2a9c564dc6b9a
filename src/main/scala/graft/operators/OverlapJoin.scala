package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join: pairs whose closed intervals intersect
  * (`lStart ≤ rEnd && rStart ≤ lEnd`), optionally per equi-key.
  *
  * Spark's planner can only execute a bare overlap predicate as a
  * nested-loop join (cartesian × filter) — quadratic. Binning restores an
  * equi-key: each interval explodes into the fixed-width bins it covers,
  * bins hash-join, candidate pairs dedup as narrow id pairs, and the exact
  * predicate verifies on the carried bounds. Cost is Σ span/binWidth
  * exploded rows per side plus the hash join — linear in total covered
  * time, never |L|×|R|. `binWidth` is the knob: wide bins explode fewer
  * rows but admit more false candidates; size it near the typical span.
  * The same shape as [[RangeJoin]] (point-in-interval), generalized to
  * interval-vs-interval.
  */
object OverlapJoin {

  /** Overlapping `(lId, rId)` pairs. `left` must carry `keys ++ (lId,
    * lStart, lEnd)`, `right` `keys ++ (rId, rStart, rEnd)`; start/end are
    * inclusive numeric bounds (epoch micros, positions, …) with
    * `start ≤ end`. Column names must not collide across sides (alias
    * before calling). Returns `keys ++ (lId, rId)`, each overlapping pair
    * exactly once.
    */
  def overlapPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
      lId: String, lStart: String, lEnd: String,
      rId: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(s) / binWidth).cast("long"),
          floor(col(e) / binWidth).cast("long"))))
    val lb = binned(left.select((keys :+ lId :+ lStart :+ lEnd).map(col): _*),
      lStart, lEnd)
    val rb = binned(right.select((keys :+ rId :+ rStart :+ rEnd).map(col): _*),
      rStart, rEnd)
    lb.join(rb, keys :+ "__bin")
      // adjacent bins see the same pair once each — dedup on ids before
      // the verify so the exact predicate runs once per candidate pair
      .select((keys :+ lId :+ lStart :+ lEnd :+ rId :+ rStart :+ rEnd).map(col): _*)
      .distinct()
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .select((keys :+ lId :+ rId).map(col): _*)
  }
}
