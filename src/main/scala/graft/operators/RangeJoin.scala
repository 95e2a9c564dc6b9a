package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match points to intervals containing them.
  *
  * A naive `ON p BETWEEN start AND end` is a pure range condition, which
  * Spark plans as broadcast-nested-loop (quadratic). Binning restores an
  * equi-key: intervals explode to every bin of width `binWidth` they
  * overlap, points map to their single bin, the join runs as a hash join on
  * the bin, and the exact BETWEEN predicate filters within the bin.
  *
  * Each matching (point, interval) pair is produced exactly once — a point
  * lives in one bin and an interval covers that bin at most once, so no
  * dedup pass is needed.
  *
  * `binWidth` trades interval duplication (≈ span/binWidth copies per
  * interval) against bin selectivity; set it near the median interval span.
  * Optional `keys` adds equi-columns to the join (e.g. per-entity ranges).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    p.join(iv, keys :+ "__bin")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
