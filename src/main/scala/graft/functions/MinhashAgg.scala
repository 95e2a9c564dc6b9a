package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash aggregate: folds a group's shingle strings into the
  * `numHashes`-wide minimum-hash signature in one pass.
  *
  * The Column formulation needs `numHashes` separate `min(xxhash64(sh, k))`
  * aggregates — 48 declarative agg states and a large generated update
  * function (multi-second Janino compile per fresh plan). This
  * `TypedImperativeAggregate` keeps one `Array[Long]` buffer and computes
  * the k seeded hashes with the same `XxHash64Function` chain the
  * `xxhash64(sh, lit(k))` expression uses, so signatures are IDENTICAL to
  * the column form (asserted in DedupSpec). Merge is element-wise min —
  * partials stay map-side.
  */
case class MinhashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // mirrors xxhash64(sh, lit(k)): fold children left-to-right from the
      // default seed 42 — hash(sh) seeds the hash of the int literal k
      val h1 = XxHash64Function.hash(s, StringType, 42L)
      var k = 0
      while (k < numHashes) {
        val hk = XxHash64Function.hash(k, IntegerType, h1)
        if (hk < buf(k)) buf(k) = hk
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_minhash"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinhashAgg =
    copy(child = newChildren.head)
}

object MinhashAgg {
  /** Aggregate Column: array of `numHashes` min-hash values of the grouped
    * shingle-string column.
    */
  def minhash(shingle: Column, numHashes: Int): Column =
    Bridge.column(MinhashAgg(Bridge.expression(shingle), numHashes).toAggregateExpression())
}
