package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * `h ← (h·mult + codepoint) mod m` over a string's Unicode code points.
  *
  * The Column-only formulation (`aggregate` over `sequence(1, length)` with
  * `ascii(substr(i, 1))`) is the executable spec, but `substr(i, 1)` on a
  * UTF8String scans from the start each call — O(n²) per document — and the
  * HOF lambda is interpreted per character. This expression walks the
  * string once (O(n), no per-char boxing) and inlines into whole-stage
  * codegen via a static helper call.
  *
  * Equivalence domain: inputs whose characters are BMP code points — which
  * includes the engine's normalized-text domain `[a-z0-9 ]` — where
  * `codePointAt` matches `ascii`'s first-character value exactly
  * (TextSpec pins native == HOF on that domain).
  */
case class RollingHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_rolling_hash expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.roll(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.roll($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {

  /** One-pass code-point fold; shared by interpreted eval and codegen. */
  def roll(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column API: `rollingHash(col)` with the engine's fixed parameters. */
  def rollingHash(s: Column, mult: Long = 31L, mod: Long = 1000000007L): Column =
    Bridge.column(RollingHash(Bridge.expression(s), mult, mod))
}
