package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native one-buffer 64-bit SimHash vote fold over the PORTABLE (md5-hex
  * nibble) bit derivation — the cross-engine family `Dedup`'s portable
  * SimHash paths are oracle-checked with.
  *
  * Bit-identical to the Column formulation it replaces (64 interpreted
  * `aggregate` folds per document, each re-walking every token's md5 hex
  * string with substr/ascii/when chains — the d3 analog of d2's r4 GC
  * signature), pinned in DedupSpec: for token hash hex char `c = j/4`
  * (0-based) and nibble value `nib`, bit `j`'s vote is
  * `(nib >> (j%4)) & 1 == 1 ? +1 : -1`, and the output bit is 1 iff the
  * vote sum is strictly positive. This expression md5s each token once and
  * updates all 64 counters in a single pass; the first 16 hex chars are
  * exactly the digest's first 8 bytes (high nibble first).
  *
  * Equivalence domain: non-null token arrays with non-null elements (what
  * `array_distinct(tokens(text))` produces for the engine's non-null text
  * columns).
  */
case class PortableSimhash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_portable_simhash expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_portable_simhash"

  override protected def nullSafeEval(input: Any): Any =
    PortableSimhash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableSimhash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableSimhash {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass 64-counter vote fold; shared by interpreted eval and codegen. */
  def compute(arr: ArrayData): ArrayData = {
    val votes = new Array[Int](64)
    val md = digest.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) {
          val c = j >> 2 // hex char index; char c lives in byte c/2
          val nib =
            if ((c & 1) == 0) (d(c >> 1) >> 4) & 0xf
            else d(c >> 1) & 0xf
          if (((nib >> (j & 3)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    val bits = new Array[Int](64)
    var j = 0
    while (j < 64) { if (votes(j) > 0) bits(j) = 1; j += 1 }
    ArrayData.toArrayData(bits)
  }

  /** Column API: 64 portable SimHash bits (0/1) of a token-array column. */
  def portableSimhash(tokens: Column): Column =
    Bridge.column(PortableSimhash(Bridge.expression(tokens)))
}
