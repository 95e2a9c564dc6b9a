package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * The workhorse is HASH-based sampling: membership depends only on the row
  * key, so the sample is stable across runs, engines, partitionings, and
  * cluster sizes — and samples NEST (every row of the 1% sample is in the
  * 10% sample), which is what holdout/ablation workflows need. RNG-based
  * `sample()`/`sampleBy()` guarantee none of this across environments.
  */
object Sampling {

  val Buckets = 10000

  /** Deterministic bucket in [0, 10000) from the row key (md5-derived —
    * engine-portable; the DuckDB oracle computes the identical value).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % Buckets

  /** Keep rows whose key-bucket falls below `fraction` of the bucket space. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    df.filter(hashBucket(col(keyCol)) < (fraction * Buckets).toLong)
  }

  /** Per-stratum deterministic sampling: each stratum gets its own fraction
    * (e.g. downsample the dominant language, keep all of the rare one).
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }
}
