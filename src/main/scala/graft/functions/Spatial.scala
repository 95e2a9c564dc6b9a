package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial helpers for the grid store and NN serving path. */
object Spatial {

  /** Great-circle distance (haversine, km). The reference deliberately ranks
    * by squared Euclidean degrees (`docs/layer-3-serving.md:98` — adequate
    * for dense regular grids); haversine is the correct metric when probes
    * span latitudes, offered as the drop-in alternative ranking key.
    * Pure Column arithmetic — stays in codegen.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = lit(6371.0088)
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    r * lit(2.0) * asin(sqrt(a))
  }

  /** 32-bit Morton (Z-order) code from two 16-bit cell indices — pure
    * Column bit-spreading, no UDF. Sorting a partition by the Z-value keeps
    * spatially-near points in the same Parquet row groups, so min/max stats
    * prune NN probes to a few row groups instead of a whole date slice.
    * Callers quantize coordinates to cells first (e.g. 0.01° →
    * `((lat + 90) * 100).cast("int")`).
    */
  def morton(cellX: Column, cellY: Column): Column =
    spreadBits(cellX).bitwiseOR(shiftleft(spreadBits(cellY), 1))

  /** Spread the low 16 bits of an int so a zero sits between every bit —
    * the classic magic-mask cascade, expressed over a LongType column.
    */
  private[graft] def spreadBits(c: Column): Column = {
    val steps = Seq(
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    steps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (acc, (shift, mask)) =>
        acc.bitwiseOR(shiftleft(acc, shift)).bitwiseAND(lit(mask))
    }
  }
}
