package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column/DataFrame building blocks shared across operators. */
object ColOps {

  /** Let-binding for an expensive expression used inside higher-order
    * function lambdas: HOF lambdas re-evaluate every captured non-attribute
    * expression PER ELEMENT (no subexpression elimination inside lambdas),
    * which turns an O(rows) tokenize into O(rows × elements). Wrapping the
    * value in a single-element array and re-entering via `transform` binds it
    * to a lambda variable — evaluated once per row, cheap to reference.
    */
  def bindLet(e: Column, f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Ensure a compute-bound stage has at least `spark.default.parallelism`
    * partitions. Tiny local parquet inputs arrive as one split, which would
    * pin per-row-heavy operators (minhash, simhash, LSH signatures) to a
    * single core; on a real cluster the scan already has thousands of
    * splits and this is a no-op.
    */
  def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
