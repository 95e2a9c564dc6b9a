package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDot, BloomContainsBytes, RollingHash, SimhashAgg}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works alongside
  * the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** (name, info, builder) triples — shared by the extension injection and
    * direct `FunctionRegistry` registration.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (children: Seq[Expression]) => ArrayDot(children(0), children(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimhashAgg(children.head).toAggregateExpression()),
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head, 31L, 1000000007L)),
    // (pre-hashed LONG key, BINARY sketch, numHashes literal) — the sharded
    // bloom screen's per-row probe, usable from SQL against a sketch table
    (FunctionIdentifier("graft_bloom_contains_bytes"),
      new ExpressionInfo(classOf[BloomContainsBytes].getName, "graft_bloom_contains_bytes"),
      (children: Seq[Expression]) => BloomContainsBytes(children(0), children(1),
        children(2).eval().asInstanceOf[Int]))
  )

  /** Register into an existing session (for sessions built without the
    * extensions config).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
