package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the first pass any training-data pipeline runs
  * over a new corpus: per-column row/null/distinct counts and min/max.
  *
  * One aggregation branch per column unioned together; each branch scans
  * only its column (columnar Parquet), and Catalyst executes the union's
  * branches as independent partial aggregations — no row-wise wide scan.
  * min/max surface as strings so heterogeneous column types stack into one
  * result frame.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1).otherwise(0)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_v"),
        max(col(c)).cast("string").as("max_v"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _)

  /** Portable distinct-count estimation via LINEAR COUNTING: hash each value
    * into one of `m` md5 buckets and estimate cardinality from the occupied
    * fraction, `est = −m · ln(1 − occupied/m)`. Unlike HLL sketches (whose
    * bit layout is engine-private), every intermediate here — the bucket
    * function, the occupied count, the estimate — is reproducible in plain
    * SQL, so the estimator itself is oracle-checkable.
    *
    * Scale: the exact `n_distinct` column is the verification baseline at
    * test scale — at 100 TB you DROP it (its aggregation state is
    * value-set-sized) and keep `n_buckets`/`est_distinct`, whose partial-
    * aggregation state is bounded by `m` per column regardless of data
    * volume. The estimate is rounded to 3dp after a 9dp-rounded `ln`
    * (absorbs cross-engine last-ULP divergence); saturated bucket spaces
    * (every bucket hit) report the `m·ln(m)` upper bound.
    */
  def cardinality(df: DataFrame, cols: Seq[String], m: Int = 1024): DataFrame = {
    require(m >= 2, s"bucket count must be >= 2: $m")
    cols.map { c =>
      val bucket =
        conv(substring(md5(col(c).cast("string")), 1, 8), 16, 10).cast("long") % m
      df.filter(col(c).isNotNull).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(c)).as("n_distinct"),
        countDistinct(bucket).as("n_buckets"))
        .select(lit(c).as("column"), col("n_rows"), col("n_distinct"),
          col("n_buckets"),
          when(col("n_buckets") < m,
            round(lit(-m.toDouble) *
              round(log(lit(1.0) - col("n_buckets").cast("double") / m), 9), 3))
            .otherwise(round(lit(m.toDouble) * round(log(lit(m.toDouble)), 9), 3))
            .as("est_distinct"))
    }.reduce(_ unionByName _)
  }
}
