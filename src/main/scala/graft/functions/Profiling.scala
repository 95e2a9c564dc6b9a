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
}
