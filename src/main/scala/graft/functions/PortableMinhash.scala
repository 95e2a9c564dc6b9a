package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-buffer MinHash signature over the PORTABLE (md5 + affine)
  * hash family — the cross-engine-reproducible family `Dedup`'s portable
  * LSH paths are oracle-checked with.
  *
  * Bit-identical to the Column formulation it replaces
  * (`transform(seq(0..K-1), k => array_min(transform(hs, affine_k)))` over
  * let-bound base hashes `conv(substring(md5(x),1,15),16,10) % P`), pinned
  * in DedupSpec. The Column form is the executable spec but allocates one
  * fresh |shingles|-element array per hash index per document (K=48 → 48
  * interpreted-lambda array builds per doc — the r4 bench's GC-pressure
  * signature on d2); this expression folds all K minima in ONE pass over
  * the shingle array with a single K-long buffer and zero per-element
  * allocation beyond the md5 itself.
  *
  * Base-hash parity with the SQL oracle: the first 15 hex chars of
  * `md5(x)` are the top 60 bits of the digest's first 8 bytes, so
  * `conv(substring(md5(x),1,15),16,10)` == `(first8BytesBigEndian >>> 4)`.
  *
  * Empty / all-null shingle arrays yield all-null signature elements,
  * matching `array_min` over an empty array.
  */
case class PortableMinhash(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_portable_minhash expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_portable_minhash"

  override protected def nullSafeEval(input: Any): Any =
    PortableMinhash.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableMinhash.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableMinhash {

  /** The Mersenne prime 2³¹−1 (= `Dedup.PortableP`). */
  private final val P = 2147483647L

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass K-way min fold; shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val buf = new Array[Long](numHashes)
    java.util.Arrays.fill(buf, Long.MaxValue)
    var any = false
    val md = digest.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h64 = 0L
        var j = 0
        while (j < 8) { h64 = (h64 << 8) | (d(j) & 0xffL); j += 1 }
        val base = (h64 >>> 4) % P
        var k = 0
        while (k < numHashes) {
          val hk = (base * (k * 1000003L + 12345L) + k * 999331L) % P
          if (hk < buf(k)) buf(k) = hk
          k += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numHashes))
    else ArrayData.toArrayData(buf)
  }

  /** Column API: the `numHashes`-wide portable MinHash signature of an
    * array-of-shingle-strings column.
    */
  def portableMinhash(shingles: Column, numHashes: Int): Column =
    Bridge.column(PortableMinhash(Bridge.expression(shingles), numHashes))
}
