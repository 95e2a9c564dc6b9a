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

  /** Per-column Shannon entropy of the VALUE DISTRIBUTION — the profiling
    * signal that catches a column silently collapsing (one value suddenly
    * dominating a source/lang mix) when row counts and min/max still look
    * healthy. `H = −Σ p·ln p` over exact integer value counts, plus the
    * `H / ln(n_distinct)` normalization (0 when a column is constant).
    *
    * Scale: one hash-agg per column produces the (value, count) frame; the
    * entropy fold then runs over DISTINCT VALUES, not rows, so the window
    * totals touch at most cardinality-many narrow rows. Terms are
    * 9dp-rounded and summed in DECIMAL — order-independent, replayable.
    * Meaningful for the bounded-cardinality columns profiling cares about
    * (sources, languages, buckets); for data-sized cardinalities use
    * [[cardinality]]'s bounded-state estimate instead.
    */
  def entropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    cols.map { c =>
      df.groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("p", col("cnt").cast("double") /
          sum(col("cnt")).over(w).cast("double"))
        .agg(
          count(lit(1)).as("n_distinct"),
          sum(round(-col("p") * log(col("p")), 9).cast("decimal(30,9)"))
            .cast("double").as("raw"))
        .select(lit(c).as("col_name"), col("n_distinct"),
          round(col("raw"), 6).as("entropy"),
          round(when(col("n_distinct") > 1,
            col("raw") / log(col("n_distinct").cast("double")))
            .otherwise(0d), 6).as("norm_entropy"))
    }.reduce(_ unionByName _)
  }

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
  /** Histogram-based approximate quantiles with BOUNDED state: values bucket
    * to `floor(value / width)`, per-group bucket counts cumulate, and the
    * q-quantile reports the lower bound of the first bucket whose cumulative
    * count reaches q·n — tested with INTEGER arithmetic (`cum·den ≥ num·n`),
    * so the answer is bit-exact in any engine, no float thresholds.
    *
    * This is the scale path exact `percentile` cannot take: exact quantiles
    * need the full value multiset per group (sort-bound); the histogram
    * needs one row per occupied bucket — error bounded by `width`, state
    * bounded by value-range/width. Quantiles are (name, num, den) pairs,
    * e.g. ("p90", 9, 10).
    */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      width: Double, quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(width > 0 && quantiles.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).as("g"),
        floor(col(valueCol) / width).cast("long").as("bucket"))
      .groupBy("g", "bucket").agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum("c").over(
        Window.partitionBy("g").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val qCols = quantiles.map { case (name, num, den) =>
      min(when(col("cum") * den >= col("n") * num, col("bucket"))).as(name)
    }
    cum.groupBy(col("g").as(groupCol))
      .agg(max(col("n")).as("n"), qCols: _*)
  }

  /** Declarative data-quality gates (the Deequ-style pre-training
    * contract): a constraint set over one table evaluated in ONE
    * aggregation pass — every metric is a conditional aggregate over the
    * same scan, so adding a constraint costs an expression, not a job.
    * Output one row per constraint: `(constraint, metric, pass)`.
    *
    * Metrics are quotients of exact integer counts (no rounding — the raw
    * double is bit-identical in any engine computing the same integers);
    * thresholds should sit away from attainable fractions so `pass` never
    * rides a float boundary.
    *
    * Scale: one scan regardless of constraint count; `UniqueKey` adds a
    * distinct aggregation (an Expand over the same scan). Referential
    * integrity needs the parent table — see [[orphanCount]].
    */
  sealed trait Gate { def name: String }
  /** null fraction of `column` must be ≤ `max`. */
  final case class MaxNullFrac(name: String, column: String, max: Double) extends Gate
  /** fraction of ALL rows matching `regex` must be ≥ `min`; a NULL counts
    * as a non-match (so nulls need their own MaxNullFrac gate, they do not
    * shrink this one's denominator). Keep the regex in the Java∩RE2
    * dialect (see [[graft.text.Pii]]) and anchor with `\A`/`\z`, not
    * `^`/`$` — Java lets `$` match before a trailing newline, RE2 does
    * not, and a text-anchored pattern means both engines agree on every
    * value. */
  final case class MinMatchFrac(name: String, column: String, regex: String, min: Double) extends Gate
  /** fraction of rows with `column` in [lo, hi] must be ≥ `min`. */
  final case class InRangeFrac(name: String, column: String, lo: Double, hi: Double, min: Double) extends Gate
  /** `column` must be a unique key (distinct count == row count). */
  final case class UniqueKey(name: String, column: String) extends Gate

  def qualityGates(df: DataFrame, gates: Seq[Gate]): DataFrame = {
    require(gates.nonEmpty, "no gates given")
    val aggs = gates.zipWithIndex.flatMap { case (g, i) =>
      g match {
        case MaxNullFrac(_, c, _) =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"m$i"))
        case MinMatchFrac(_, c, re, _) =>
          Seq(sum(when(col(c).rlike(re), 1L).otherwise(0L)).as(s"m$i"))
        case InRangeFrac(_, c, lo, hi, _) =>
          Seq(sum(when(col(c).between(lo, hi), 1L).otherwise(0L)).as(s"m$i"))
        case UniqueKey(_, c) =>
          Seq(countDistinct(col(c)).as(s"m$i"))
      }
    }
    val one = df.agg(count(lit(1)).as("n"), aggs: _*)
    // pivot the single aggregate row to (constraint, metric, pass) rows with
    // ONE explode over literal structs — a per-gate select + union would give
    // every union branch its own copy of the aggregate plan, scanning the
    // table up to K times unless exchange reuse happened to dedupe it
    val gateRows = gates.zipWithIndex.map { case (g, i) =>
      val frac = col(s"m$i").cast("double") / col("n").cast("double")
      val (metric, pass) = g match {
        case MaxNullFrac(_, _, mx)      => (frac, frac <= mx)
        case MinMatchFrac(_, _, _, mn)  => (frac, frac >= mn)
        case InRangeFrac(_, _, _, _, mn)=> (frac, frac >= mn)
        case UniqueKey(_, _)            => (frac, col(s"m$i") === col("n"))
      }
      struct(lit(g.name).as("constraint"), metric.as("metric"), pass.as("pass"))
    }
    one.select(explode(array(gateRows: _*)).as("g"))
      .select(col("g.constraint"), col("g.metric"), col("g.pass"))
  }

  /** Referential-integrity gate: rows of `child` whose `childCol` has no
    * match in `parent.parentCol` (the reference's own invariant — every
    * grid `catalog_id` must exist in `curated_data`). One anti-join; the
    * parent side projects to its key column only, so the join carries
    * narrow frames and Catalyst broadcasts it when small.
    */
  def orphanCount(child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String, name: String): DataFrame =
    child.select(col(childCol))
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
      .agg(count(lit(1)).cast("double").as("metric"))
      .select(lit(name).as("constraint"), col("metric"),
        (col("metric") === 0.0).as("pass"))

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
