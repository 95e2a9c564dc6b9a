package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sharded export — the delivery end of a training-data
  * pipeline: a prepared corpus written as bounded-size, globally-ordered
  * shards that a downstream loader can stream independently.
  *
  * Scale shape: `repartitionByRange` gives a global order with ONE range
  * shuffle (sampled range bounds — no single-partition sort), and
  * `maxRecordsPerFile` bounds each file regardless of partition skew. The
  * order column is typically a deterministic shuffle key (e.g.
  * [[Sampling.hashBucket]] of the id) so the shard sequence is a stable
  * pseudo-random interleave — reproducible across runs and engines, which
  * RNG-shuffled exports are not.
  */
object Sharding {

  /** Write `df` ordered by `(orderCol, tiebreakCols…)` into `path` as
    * parquet shards of at most `rowsPerShard` rows. Returns the shard file
    * count.
    *
    * Pass the primary key in `tiebreakCols` whenever `orderCol` can carry
    * ties (e.g. [[shuffleKey]], whose 10⁴ bucket space collides at corpus
    * scale) — equal keys otherwise have no defined order and the export
    * stops being run-reproducible. Pass `nRows` when the caller already
    * knows the count to skip one full pass; the remaining two passes
    * (range-bound sampling + write) are inherent to range partitioning.
    */
  def writeShards(df: DataFrame, path: String, orderCol: String,
      rowsPerShard: Int, tiebreakCols: Seq[String] = Nil,
      nRows: Long = -1L): Int = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive: $rowsPerShard")
    val n = if (nRows >= 0L) nRows else df.count()
    // Long math then a bounds check — an Int overflow here would clamp a
    // trillion-row export to ONE range partition (single-executor sort)
    val partsL = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard)
    require(partsL <= 10000000L,
      s"$partsL shards of $rowsPerShard rows — raise rowsPerShard")
    val parts = partsL.toInt
    df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions((orderCol +: tiebreakCols).map(col): _*)
      .write
      .option("maxRecordsPerFile", rowsPerShard.toLong)
      .mode("overwrite")
      .parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Deterministic pseudo-random interleave key for export ordering:
    * documents from the same source/language end up spread across shards
    * instead of clumped (loaders that stream shards sequentially see a
    * mixed distribution from the first shard on).
    */
  def shuffleKey(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Sampling.hashBucket(id) * 1000000L + pmod(id.cast("long"), lit(1000000L))
}
