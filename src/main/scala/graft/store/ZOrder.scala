package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering — the multi-dimensional data-skipping
  * layout (Delta's OPTIMIZE ZORDER BY, Iceberg's sort-order z-curve).
  *
  * A single-column sort makes that column's zone maps tight and every
  * other column's useless: a file sorted by `a` spans the full range of
  * `b`, so a predicate on `b` prunes nothing. Interleaving the bits of
  * fixed-point ranks of SEVERAL columns into one scalar and range-
  * partitioning on it gives every participating column locality at once —
  * each output file covers a small hyper-rectangle of the key space, so
  * per-file (min, max) zones prune on ANY of the clustered dimensions.
  * At 100 TB this is the difference between "point/range queries on a
  * second column scan the whole table" and "they scan a few files": the
  * layout cost is one rewrite, amortized over every subsequent read.
  *
  * Everything here is pure `Column` arithmetic (codegen'd integer ops —
  * no UDF, no collect beyond one bounded min/max aggregate for the
  * normalization), and the shuffle is ONE `repartitionByRange` on the
  * z-value — the same shuffle any global sort pays.
  */
object ZOrder {

  /** Bits of fixed-point resolution per dimension. 16 bits ≈ 65k distinct
    * cells per axis — far finer than any realistic file count, so the
    * curve order, not the quantization, decides file boundaries.
    */
  val BitsPerDim = 16

  /** `c` scaled to a 16-bit fixed-point rank within [lo, hi]: 0 at lo,
    * 65535 at hi, clamped outside, null/NaN pinned to 0 (they cluster
    * together at the curve's origin rather than poisoning the interleave).
    */
  def scale16(c: Column, lo: Double, hi: Double): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    val max = (1 << BitsPerDim) - 1 // 65535
    val norm = (c.cast("double") - lit(lo)) / lit(span) * lit(max.toDouble)
    val safe = when(c.isNull || isnan(c.cast("double")), lit(0.0))
      .otherwise(least(greatest(norm, lit(0.0)), lit(max.toDouble)))
    round(safe).cast("long")
  }

  /** Bits of each dimension that fit a SIGNED long without touching the
    * sign bit: 4 × 16 would place dim 3's top bit at position 63, turning
    * the curve's upper half NEGATIVE and wrapping the sort order — the
    * partition straddling the wrap would join the curve's two ends into
    * one file spanning the whole space. 63/n keeps every term in the
    * non-negative domain (full 16 bits up to 3 dims, the top 15 at 4).
    */
  def usableBits(n: Int): Int = math.min(BitsPerDim, 63 / n)

  /** Morton-interleave `dims` pre-scaled 16-bit values into one long:
    * bit b of dimension i lands at position b * n + i, using each
    * dimension's TOP [[usableBits]] bits. Built as a balanced OR tree of
    * shift/mask terms, all whole-stage-codegen'd integer ops (no UDF).
    */
  def interleave(dims: Seq[Column]): Column = {
    val n = dims.size
    require(n >= 1 && n <= 4, s"z-order supports 1-4 dimensions, got $n")
    val usable = usableBits(n)
    val terms = for {
      (d, i) <- dims.zipWithIndex
      b <- 0 until usable
    } yield shiftleft(
      shiftright(d, b + (BitsPerDim - usable)).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value of `cols` over `df`: one bounded aggregate reads each
    * column's global [min, max] (the normalization basis), then the
    * returned Column is pure arithmetic over the row.
    */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val hi = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      scale16(col(c), lo, hi)
    }
    interleave(scaled)
  }

  /** `df` laid out along the z-curve of `cols` into `targetFiles`
    * range-disjoint, internally sorted files. The write that follows
    * produces one file per partition, each covering a contiguous z-range —
    * a small hyper-rectangle per file, tight zones on every clustered
    * column.
    */
  def cluster(df: DataFrame, cols: Seq[String], targetFiles: Int): DataFrame = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val zc = "__graft_z"
    df.withColumn(zc, zvalue(df, cols))
      .repartitionByRange(targetFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
