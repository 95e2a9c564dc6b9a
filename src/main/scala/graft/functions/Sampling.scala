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

  /** Token-budget domain mixing: downsample each stratum (source, domain,
    * language) to at most `budget` tokens of expected mass, keeping small
    * strata whole — the "cap the dominant crawl, keep the rare book corpus"
    * move of training-mix assembly.
    *
    * Per-stratum rates are DERIVED FROM THE DATA in one tiny aggregate
    * (stratum → token total, broadcast back), then membership is the same
    * deterministic md5 bucket as [[hashSample]] — so the mix is stable
    * across runs/engines/cluster sizes and nests under rate changes. The
    * rate→bucket conversion floors `min(1, budget/total) · Buckets` in
    * IEEE double, which every engine reproduces exactly.
    *
    * Scale: aggregate + broadcast join + scan-local filter; the only
    * shuffle is the stratum aggregate (stratum-count-sized, not data-sized).
    */
  def tokenBudgetSample(df: DataFrame, keyCol: String, strataCol: String,
      nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val totals = df.groupBy(col(strataCol)).agg(sum(col(nTokensCol)).as("stratum_tokens"))
    val thr = floor(least(lit(1.0),
      lit(budget.toDouble) / col("stratum_tokens").cast("double")) * Buckets).cast("long")
    // null-SAFE join key: a NULL stratum (unlabeled source/language) forms
    // its own budget group like any other — an equi-join would never match
    // NULL==NULL and silently drop every unlabeled document from the mix
    val t = broadcast(totals.withColumn("keep_buckets", thr)
      .withColumnRenamed(strataCol, "__stratum"))
    df.join(t, col(strataCol) <=> col("__stratum"))
      .drop("__stratum")
      .filter(hashBucket(col(keyCol)) < col("keep_buckets"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res): each
    * row draws a deterministic uniform `u` from its key's md5 bucket and
    * ranks by `ln(u)/w` (monotone with the classic `u^(1/w)` key — heavier
    * rows float to the top); the global top-`k` IS the weighted sample.
    *
    * Determinism discipline: `u = (bucket + 0.5) / 10000` is an exact IEEE
    * value from integer inputs, and the rank is ROUNDED to 9dp before the
    * top-k (absorbs last-ULP `ln` divergence between engines) with the key
    * as tiebreak — so the selected set reproduces in any engine.
    *
    * Scale: one scan computing the rank + `orderBy.limit(k)`, which Catalyst
    * plans as `TakeOrderedAndProject` (bounded per-partition heap, k-row
    * driver merge — no global sort). Weights must be strictly positive.
    *
    * The returned frame deliberately carries the `es_key` rank column — the
    * selection is auditable (and the sm4 oracle replays it); drop it before
    * appending to a table that lacks the column.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val u = (hashBucket(col(keyCol)).cast("double") + lit(0.5)) / Buckets
    // non-positive weights are excluded up front: w = 0 would null the rank
    // (and Spark orders nulls last under DESC where SQL engines put them
    // first — a silent cross-engine divergence), w < 0 would flip the order
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("es_key").desc, col(keyCol).asc)
      .limit(k)
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

  /** Deterministic MULTI-EPOCH shuffle assignment — the loader-side data
    * order a reproducible training run needs: for each epoch, every row
    * gets a shard and a position within that shard, derived ONLY from
    * `(epoch, key)` through the portable md5 idiom. Same data + same epoch
    * count ⇒ the same order on any engine, any cluster size, any partition
    * layout — and each epoch is an independent permutation (the hash seed
    * is the epoch), so no two epochs present the data in the same order.
    *
    * Scale: the shard is the loader's read unit, so `nShards` grows with
    * the corpus (a production export picks shards of ~256 MB; position-
    * within-shard state is bounded by the SHARDING POLICY, not the corpus).
    * One explode (×epochs), one hash projection, one window partitioned by
    * (epoch, shard) — no global sort, no single-partition stage. Pair with
    * [[graft.functions.Sharding.writeShards]] to materialize the files.
    */
  def epochShuffle(df: DataFrame, keyCol: String, epochs: Int,
      nShards: Int): DataFrame = {
    require(epochs >= 1 && epochs <= 1000, s"epochs out of [1,1000]: $epochs")
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    // 60-bit md5 prefix (15 hex chars — BIGINT-safe in every engine),
    // seeded by the epoch through the same 'epoch:key' string both sides
    // of the oracle build
    val h = conv(substring(md5(
      concat_ws(":", col("epoch"), col(keyCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy(col("h").asc, col(keyCol).asc)
    df.select(col(keyCol))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(keyCol), col("epoch"), col("shard"), col("pos"))
  }
}
