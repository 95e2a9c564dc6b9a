package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (scale posture: a hot key must not pin a
  * whole stage to one reducer).
  *
  * AQE's skew-join handles runtime skew for sort-merge joins; salting is the
  * static complement for the cases AQE does not cover — skewed AGGREGATIONS
  * and broadcast-ineligible joins with known-hot keys.
  */
object Salting {

  /** Deterministic per-row salt in [0, buckets): hash of the given columns.
    * Using row content (not rand()) keeps plans replayable — retries and
    * speculative tasks see identical salts.
    */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted aggregation: phase 1 partially aggregates on
    * (keys, salt), spreading a hot key over `buckets` reducers; phase 2
    * merges the partials per key. Expressed for the algebraic aggregates the
    * engine uses (count / sum / min / max); the result is identical to the
    * direct groupBy.
    *
    * Note Spark's own map-side partial aggregation already handles most
    * skew for these aggregates; explicit salting matters when the partial
    * state itself is large (e.g. collect_list / exact distinct per key).
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltSource: Seq[String],
      buckets: Int, aggs: Map[String, String]): DataFrame = {
    // aggs: valueCol -> one of count|sum|min|max
    def partial(c: String, fn: String): Column = fn match {
      case "count" => count(col(c))
      case "sum" => sum(col(c))
      case "min" => min(col(c))
      case "max" => max(col(c))
    }
    def merge(c: String, fn: String): Column = fn match {
      case "count" | "sum" => sum(col(s"__p_$c"))
      case "min" => min(col(s"__p_$c"))
      case "max" => max(col(s"__p_$c"))
    }
    val p1 = aggs.toSeq.map { case (c, fn) => partial(c, fn).as(s"__p_$c") }
    val p2 = aggs.toSeq.map { case (c, fn) => merge(c, fn).as(s"${fn}_$c") }
    df.withColumn("__salt", salt(buckets, saltSource.map(col): _*))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(p1.head, p1.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(p2.head, p2.tail: _*)
  }

  /** Salted equi-join for a skewed fact against a replicable right side:
    * the fact side gets a deterministic salt, the right side is exploded
    * × every salt value, and the join key becomes (key, salt) — a hot key's
    * rows land on `buckets` different reducers instead of one.
    */
  def saltedJoin(fact: DataFrame, right: DataFrame, key: String,
      buckets: Int, factSaltSource: Seq[String]): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      salt(buckets, factSaltSource.map(col): _*))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }
}
