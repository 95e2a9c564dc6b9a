package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Packing

/** Sequence packing: concat-and-chunk placement map + per-chunk stats. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // token counts after normalize: 4 / 3 / 0 (drops) / 5 / 2 = 14 tokens
  private val docs = Seq(
    (10L, "alpha beta gamma delta"),
    (11L, "epsilon zeta, ETA!"),
    (12L, "?!... --- ***"), // normalizes to nothing — occupies zero tokens
    (13L, "one two three four five"),
    (14L, "six seven")
  ).toDF("doc_id", "text")

  test("packChunks: exact spans, boundary split, empty doc dropped") {
    val placed = Packing.packChunks(docs, "doc_id", "text", ctxLen = 6)
      .orderBy("chunk_id", "doc_id")
      .collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tok_begin"), r.getAs[Long]("n_tok_in_chunk")))
    // stream: d10 [0,4) d11 [4,7) d13 [7,12) d14 [12,14); chunks of 6:
    // c0=[0,6): d10×4, d11×2 | c1=[6,12): d11×1, d13×5 | c2=[12,14): d14×2
    assert(placed.toSeq === Seq(
      (0L, 10L, 0L, 4L),
      (0L, 11L, 4L, 2L),
      (1L, 11L, 6L, 1L),
      (1L, 13L, 7L, 5L),
      (2L, 14L, 12L, 2L)))
  }

  test("packChunks: a document longer than ctxLen spans several chunks") {
    val long = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val placed = Packing.packChunks(long, "doc_id", "text", ctxLen = 6)
      .orderBy("chunk_id").collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_tok_in_chunk")))
    assert(placed.toSeq === Seq((0L, 6L), (1L, 6L), (2L, 6L), (3L, 2L)))
  }

  test("two-level prefix sum == single global window, tiny shards forced") {
    val corpus = (0L until 97L).map(i =>
      (i * 3 + 1, (0 to (i % 7).toInt).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    // shardSize=5 forces ~20 shards so the base-offset join is exercised
    val got = Packing.packChunks(corpus, "doc_id", "text",
        ctxLen = 16, shardSize = 5)
      .orderBy("chunk_id", "doc_id").collect().toSeq
    // reference: the same math over ONE global running sum
    val norm = graft.text.TextAnalysis.normalize(col("text"))
    val g = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = corpus.select(col("doc_id"),
        size(split(norm, " ", -1)).cast("long").as("n_tok"))
      .withColumn("t_end", sum("n_tok").over(g))
      .withColumn("t_start", col("t_end") - col("n_tok"))
      .withColumn("chunk_id",
        explode(sequence(expr("t_start div 16"), expr("(t_end - 1) div 16"))))
      .select(col("chunk_id"), col("doc_id"),
        greatest(col("t_start"), col("chunk_id") * 16).as("tok_begin"),
        (least(col("t_end"), (col("chunk_id") + 1) * 16) -
          greatest(col("t_start"), col("chunk_id") * 16)).as("n_tok_in_chunk"))
      .orderBy("chunk_id", "doc_id").collect().toSeq
    assert(got === want)
  }

  test("chunkStats: fill, fragmentation, carry-in; only the tail is short") {
    val placed = Packing.packChunks(docs, "doc_id", "text", ctxLen = 6)
    val stats = Packing.chunkStats(placed).orderBy("chunk_id").collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_carry_in")))
    assert(stats.toSeq === Seq((0L, 2L, 6L, 0L), (1L, 2L, 6L, 1L), (2L, 1L, 2L, 0L)))
    val shortOnes = stats.filter(_._3 < 6L).map(_._1)
    assert(shortOnes.toSeq === Seq(2L)) // only the last chunk may be short
  }

  test("invariants on randomized corpora: token conservation, exact tiling") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 50 + rnd.nextInt(150)
      val corpus = (0 until n).map { i =>
        val len = rnd.nextInt(40) // 0 → empty docs must vanish
        (i.toLong * 7 + 3, (0 until len).map(_ => s"w${rnd.nextInt(30)}").mkString(" "))
      }.toDF("doc_id", "text")
      val ctx = 1 + rnd.nextInt(64)
      val placed = Packing.packChunks(corpus, "doc_id", "text",
          ctxLen = ctx, shardSize = 1 + rnd.nextInt(16))
        .collect()
        .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("tok_begin"), r.getAs[Long]("n_tok_in_chunk")))
      val tokCounts = corpus
        .select(col("doc_id"), size(split(
          graft.text.TextAnalysis.normalize(col("text")), " ", -1)).cast("long").as("nt"),
          graft.text.TextAnalysis.normalize(col("text")).as("norm"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (if (r.getAs[String]("norm").isEmpty) 0L else r.getAs[Long]("nt"))).toMap
      // per-doc conservation: a document's slices sum to its token count;
      // zero-token documents emit nothing
      val perDoc = placed.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
      tokCounts.foreach { case (id, nt) =>
        assert(perDoc.getOrElse(id, 0L) === nt, s"doc $id ctx=$ctx")
      }
      val total = tokCounts.values.sum
      if (total > 0) {
        // chunk ids are contiguous from zero; every chunk but the last
        // holds exactly ctxLen tokens, the last exactly the remainder
        val byChunk = placed.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
        val maxChunk = (total - 1) / ctx
        assert(byChunk.keySet === (0L to maxChunk).toSet)
        (0L until maxChunk).foreach(c => assert(byChunk(c) === ctx.toLong))
        assert(byChunk(maxChunk) === total - maxChunk * ctx)
        // slices tile each chunk exactly: sorted by begin, contiguous,
        // starting on the chunk boundary
        placed.groupBy(_._1).foreach { case (c, slices) =>
          val sorted = slices.sortBy(_._3)
          assert(sorted.head._3 === c * ctx, s"chunk $c must start on its boundary")
          sorted.sliding(2).foreach {
            case Array(p, q) => assert(p._3 + p._4 === q._3,
              s"chunk $c slices must be gap- and overlap-free")
            case _ => ()
          }
        }
      }
    }
  }

  test("packChunks rejects degenerate parameters") {
    intercept[IllegalArgumentException](
      Packing.packChunks(docs, "doc_id", "text", ctxLen = 0))
    intercept[IllegalArgumentException](
      Packing.packChunks(docs, "doc_id", "text", ctxLen = 8, shardSize = 0))
  }
}
