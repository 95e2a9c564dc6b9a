package graft.serve

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GridFunctions

/** The serving read path (SURVEY.md §3.1): snap-to-latest-timestamp (A2) +
  * nearest-neighbor top-1 (J3) + lineage join (J1/J4).
  *
  * Two forms:
  *   - scalar [[getSample]] — one probe, mirrors
  *     `serving-go/internal/grid/finder.go:24-60`; Catalyst plans the
  *     `orderBy.limit(1)` as TakeOrderedAndProject (bounded heap, no full sort).
  *   - set-oriented [[getSamples]] — many probes × many variables in ONE plan,
  *     no per-probe collects (SURVEY.md §7.4 scale posture): snap via an
  *     as-of aggregation, NN via `min_by` with map-side partial aggregation.
  */
object PointQuery {

  /** A2 — snap a request time to the latest available grid timestamp ≤ it
    * (e.g. 14:30 → 14:00 for hourly data; `finder.go:38-41`). Scalar form.
    */
  def snapTimestamp(finalView: DataFrame, variable: String, ts: Timestamp,
      maxStaleness: Option[java.time.Duration] = None): Option[Timestamp] = {
    val lower = maxStaleness
      .map(h => col("timestamp") >= lit(Timestamp.from(ts.toInstant.minus(h))))
      .getOrElse(lit(true))
    finalView.filter(col("variable") === variable && col("timestamp") <= lit(ts) && lower)
      .agg(max("timestamp")).collect()(0) match {
        case r if r.isNullAt(0) => None
        case r                  => Some(r.getTimestamp(0))
      }
  }

  /** J3 — NN top-1 inside the snapped slice (`finder.go:32-49`). */
  def getSample(finalView: DataFrame, variable: String, ts: Timestamp,
      lat: Float, lon: Float): DataFrame = {
    val snapped = snapTimestamp(finalView, variable, ts)
    snapped match {
      case None => finalView.sparkSession.emptyDataFrame
      case Some(t) =>
        finalView
          .filter(col("variable") === variable && col("timestamp") === lit(t))
          .withColumn("__d", GridFunctions.sqDist(col("lat"), col("lon"), lit(lat), lit(lon)))
          .orderBy(col("__d"), col("lat"), col("lon")) // deterministic tiebreak
          .limit(1)
          .select(col("value"), col("unit"), col("lat"), col("lon"),
            col("timestamp"), col("catalogId"))
    }
  }

  /** Set-oriented serving query: `probes(probeId, variable, ts, lat, lon)` →
    * one result row per probe (value, actual coords, snapped ref timestamp,
    * catalogId). Probes are assumed small relative to the grid → broadcast.
    *
    * Plan shape: grid ⋈ broadcast(probes) on variable with the as-of
    * predicate pushed into the join condition, then a single `min_by`
    * aggregation keyed by probe that picks (latest snapped timestamp, nearest
    * point) in one pass — partial aggregation runs map-side, so the shuffle
    * carries one row per (probe, input partition), not the grid.
    */
  def getSamples(finalView: DataFrame, probes: DataFrame,
      maxStaleness: Option[java.time.Duration] = None): DataFrame = {
    val g = finalView.select("variable", "timestamp", "lat", "lon", "value", "unit", "catalogId")
    val p = probes.select(
      col("probeId"), col("variable").as("p_variable"), col("ts").as("p_ts"),
      col("lat").as("p_lat"), col("lon").as("p_lon"))
    // Snap horizon: without a lower bound the as-of predicate makes every
    // probe scan ALL history ≤ its timestamp — years of partitions at scale.
    // The bound rides in the join condition (correct per-probe even with
    // heterogeneous probe times); pair it with a statically-bounded
    // finalView (GridStore.finalView(lo, hi)) for partition pruning.
    val asOf = maxStaleness match {
      case Some(h) =>
        g("timestamp") <= col("p_ts") &&
          g("timestamp") >= col("p_ts") - expr(s"INTERVAL '${h.getSeconds}' SECOND")
      case None => g("timestamp") <= col("p_ts")
    }
    val joined = g.join(broadcast(p), g("variable") === col("p_variable") && asOf)
    // rank key: maximize timestamp (snap), then minimize distance (NN), then
    // pin coords — a single orderable struct so one max_by does snap+NN
    val dist = GridFunctions.sqDist(col("lat"), col("lon"), col("p_lat"), col("p_lon"))
    val ordered = joined.withColumn("__ord",
      struct(col("timestamp"), (dist * -1).as("negd"),
        (col("lat") * -1).as("negLat"), (col("lon") * -1).as("negLon"),
        (col("value") * -1).as("negValue"), col("catalogId")))
    ordered
      .groupBy("probeId")
      .agg(
        max_by(
          struct(col("value"), col("unit"), col("lat").as("actualLat"),
            col("lon").as("actualLon"), col("timestamp").as("refTimestamp"),
            col("catalogId"), col("variable")),
          col("__ord")).as("r"))
      .select(col("probeId"), col("r.variable").as("variable"), col("r.value"),
        col("r.unit"), col("r.actualLat"), col("r.actualLon"),
        col("r.refTimestamp"), col("r.catalogId"))
  }

  /** J1/J4 — lineage resolution: result ⋈ curated_data ⋈ raw_files on
    * catalogId; both catalogs are small dimensions → broadcast hash joins
    * (`lineage/finder.go:21-42`, `domain/environmental.go:75-97`). The
    * reference's two-system app-side stitch collapses into one plan.
    */
  def withLineage(samples: DataFrame, curated: DataFrame, rawFiles: DataFrame): DataFrame =
    samples
      .join(broadcast(curated.select(col("id").as("catalogId"), col("rawFileId"))),
        Seq("catalogId"), "left")
      .join(broadcast(rawFiles.select(col("id").as("rawFileId"), col("source"), col("dataset"))),
        Seq("rawFileId"), "left")
}
