package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Bloom-filter join pruning — the build-once/probe-everywhere sketch that
  * lets a selective small-side predicate cut the big side BEFORE its shuffle.
  *
  * Shape mirrors Spark's own runtime-filter injection (a bloom built from
  * the filtered build side, probed on the stream side ahead of the join) but
  * as an explicit, composable operator: `BloomSketch.prunedJoin` builds the
  * bitset in ONE aggregation pass (map-side partial ORs), collects the
  * kilobyte-to-megabyte sketch to the driver exactly once (like IVF
  * centroids — sketch-sized, never data-sized), and embeds it as a literal
  * in a codegen'd probe predicate that sits directly on the scan, so the
  * pruned rows never reach the join's exchange. False positives only cost
  * the exact join that follows; false negatives cannot occur, so the final
  * result is EXACTLY the plain join's (the DuckDB oracle runs the plain
  * join).
  *
  * Scale envelope (documented, not silent): the sketch travels in the task
  * binary — size it ≤ ~16 MiB (≈10⁷ build keys at 10 bits/key). Beyond
  * that, fall back to a shuffle semi-join; Spark's own runtime bloom caps
  * at 8 MiB for the same reason.
  *
  * Both sides hash through `xxhash64(key)` (the codegen'd Catalyst kernel);
  * the sketch then derives `numHashes` probe positions by double hashing
  * (splitmix64 finalizer, odd step) into a power-of-two bit space — one
  * multiply-free mask per probe.
  */
object BloomSketch {

  /** splitmix64 finalizer: decorrelates the step hash from the base hash. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits for hash `h` in `words` (numBits = words.len*64,
    * power of two).
    */
  def set(words: Array[Long], numHashes: Int, h: Long): Unit = {
    val mask = words.length.toLong * 64L - 1L
    val step = mix(h) | 1L
    var i = 0
    var pos = h
    while (i < numHashes) {
      val bit = pos & mask
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
      pos += step
    }
  }

  /** Probe the k bits of a SERIALIZED sketch (the [[BloomAgg]] binary
    * output: big-endian longs) without materializing a long[] per row —
    * the per-row kernel for the sharded screen, where the bitset arrives
    * as a COLUMN (one sketch row per shard) instead of a driver literal.
    * Bit b lives in word b>>>6 at in-word position b&63; in the big-endian
    * 8-byte group that is byte 7-(k>>>3), bit k&7.
    */
  def containsBytes(bytes: Array[Byte], numHashes: Int, h: Long): Boolean = {
    val mask = bytes.length.toLong * 8L - 1L
    val step = mix(h) | 1L
    var i = 0
    var pos = h
    while (i < numHashes) {
      val bit = pos & mask
      val k = (bit & 63L).toInt
      val idx = ((bit >>> 6) << 3).toInt + (7 - (k >>> 3))
      if (((bytes(idx) >> (k & 7)) & 1) == 0) return false
      i += 1
      pos += step
    }
    true
  }

  /** Probe the k bits for hash `h`; shared by interpreted eval and codegen. */
  def contains(words: Array[Long], numHashes: Int, h: Long): Boolean = {
    val mask = words.length.toLong * 64L - 1L
    val step = mix(h) | 1L
    var i = 0
    var pos = h
    while (i < numHashes) {
      val bit = pos & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
      pos += step
    }
    true
  }

  /** Bits for `n` keys at `bitsPerKey`, rounded up to a power of two
    * (min 1024 so tiny builds still get a meaningful space). Capped at the
    * documented task-binary envelope: 2^27 bits = 16 MiB (≈10⁷ keys at
    * 10 bits/key) — beyond that the sketch no longer belongs in the task
    * binary and the caller should fall back to a shuffle semi-join.
    */
  def sizeBits(n: Long, bitsPerKey: Int = 10): Int = {
    require(n >= 0 && bitsPerKey > 0)
    val want = math.max(1024L, n * bitsPerKey)
    require(want <= (1L << 27),
      s"bloom over 2^27 bits ($want bits > 16 MiB task-shipped sketch) — " +
        "use a shuffle semi-join instead")
    java.lang.Long.highestOneBit(math.max(1024L, want * 2 - 1)).toInt
  }

  /** Aggregate Column: bitset (as BINARY little-words) of the grouped
    * 64-bit-hash column. Child must be LongType — compose as
    * `bloomAgg(xxhash64(key), …)` so hashing stays in Spark's codegen'd
    * kernel and the sketch only folds bits.
    */
  def bloomAgg(hashed: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(
      BloomAgg(Bridge.expression(hashed), numBits, numHashes).toAggregateExpression())

  /** Probe Column against a driver-held sketch. */
  def mightContain(key: Column, words: Array[Long], numHashes: Int): Column =
    Bridge.column(BloomContains(Bridge.expression(xxhash64(key)), words, numHashes))

  /** Probe Column against a sketch that is itself a BINARY COLUMN (one
    * serialized bitset per row — the sharded form, where each probe row has
    * been joined with its shard's sketch). `hashed` must already be the
    * LONG bloom hash so the caller controls decorrelation from the shard
    * key.
    */
  def mightContainBytes(hashed: Column, bitset: Column, numHashes: Int): Column =
    Bridge.column(BloomContainsBytes(
      Bridge.expression(hashed), Bridge.expression(bitset), numHashes))

  /** Build the sketch from `build`'s key column: one aggregation pass,
    * map-side partial ORs, a single sketch-sized row collected.
    */
  def build(df: DataFrame, key: Column, numBits: Int, numHashes: Int = 5): Array[Long] = {
    val bytes = df.select(bloomAgg(xxhash64(key), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** Equi-join with bloom pre-pruning of the probe side: exact plain-join
    * results, but `probe`'s non-matching rows are dropped AT THE SCAN, never
    * reaching the join exchange. `expectedBuildKeys` sizes the bit space
    * (count the build side when unknown; at sketch-build cost that is one
    * extra tiny aggregate).
    */
  def prunedJoin(probe: DataFrame, probeKey: String, buildSide: DataFrame,
      buildKey: String, expectedBuildKeys: Long = -1, numHashes: Int = 5): DataFrame = {
    // xxhash64 is type-sensitive (INT 5 and BIGINT 5 hash differently) while
    // the equi-join behind the sketch coerces types — a type mismatch here
    // would turn coercion into bloom FALSE NEGATIVES that silently drop
    // matching rows. Refuse up front; the caller casts one side explicitly.
    val pt = probe.schema(probeKey).dataType
    val bt = buildSide.schema(buildKey).dataType
    require(pt == bt,
      s"prunedJoin key types must match exactly ($probeKey: ${pt.simpleString} " +
        s"vs $buildKey: ${bt.simpleString}) — xxhash64 is type-sensitive, so a " +
        "coerced join would see bloom false negatives; cast one side first")
    val n = if (expectedBuildKeys > 0) expectedBuildKeys else buildSide.count()
    val words = build(buildSide, buildSide(buildKey), sizeBits(n), numHashes)
    // DataFrame-apply disambiguates same-named keys on the two sides.
    probe.filter(mightContain(probe(probeKey), words, numHashes))
      .join(buildSide, probe(probeKey) === buildSide(buildKey))
  }
}

/** One-buffer bloom build: folds a group's pre-hashed keys into a
  * power-of-two bitset. Merge is word-wise OR, so partials stay map-side
  * and the reduce moves only sketch-sized buffers.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg expects a pre-hashed LONG input (xxhash64(key)), " +
          s"got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomSketch.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Codegen'd membership probe against a DRIVER-HELD bitset (carried in the
  * node, shipped in the task binary via a codegen reference object — no
  * foldability/subquery machinery needed). Child must be the pre-hashed
  * LONG key, composed as `mightContain(key)` = probe(xxhash64(key)).
  */
case class BloomContains(child: Expression, words: Array[Long], numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a pre-hashed LONG input, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(input: Any): Any =
    BloomSketch.contains(words, numHashes, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomSketch.contains($ref, $numHashes, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd membership probe where the bitset is a per-row BINARY column
  * (a shard's serialized sketch joined onto the probe row) — the sharded
  * screen's kernel: no sketch in the task binary at all, each task holds
  * only the shard sketches its rows joined.
  */
case class BloomContainsBytes(left: Expression, right: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains_bytes expects (pre-hashed LONG, BINARY sketch), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains_bytes"

  override protected def nullSafeEval(h: Any, bytes: Any): Any =
    BloomSketch.containsBytes(
      bytes.asInstanceOf[Array[Byte]], numHashes, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, b) =>
      s"graft.functions.BloomSketch.containsBytes($b, $numHashes, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
