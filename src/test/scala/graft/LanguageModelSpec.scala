package graft

import graft.text.LanguageModel

/** Bigram-LM cross-entropy scoring (the CCNet-style corpus filter). */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // reference slice = doc_id % 10 == 0 → docs 10 and 20
  // vocab {the,cat,sat,on,mat,ate,fish} = 7, V = 8
  // c12: (the,cat)=2 (cat,sat)=1 (sat,on)=1 (on,the)=1 (the,mat)=1
  //      (cat,ate)=1 (ate,the)=1 (the,fish)=1
  // c1:  the=4 cat=2 sat=1 on=1 ate=1
  private val docs = Seq(
    (10L, "the cat sat on the mat"),
    (20L, "the cat ate the fish"),
    (11L, "the cat sat"),
    (12L, "quantum flux"), // fully out-of-vocab → both tokens map to <unk>
    (13L, "x") // one token: no bigrams, emits no row
  ).toDF("doc_id", "text")

  // sum_surprisal is the exact decimal sum cast ONCE to double — the same
  // nearest-double a correctly-rounded parse of the decimal string yields,
  // so literal comparison below is exact, not tolerance-based
  private def rows = LanguageModel.bigramXent(docs, "doc_id", "text")
    .orderBy("doc_id").collect()
    .map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("sum_surprisal"),
        r.getAs[Double]("xent"))))
    .toMap

  test("hand-computed surprisals: in-vocab doc") {
    // doc 11: (the,cat) → -log2(3/12) = 2.0000
    //         (cat,sat) → -log2(2/10) = 2.3219
    val (n, s, x) = rows(11L)
    assert(n === 2L)
    assert(s === 4.3219)
    assert(math.abs(x - 4.3219 / 2) < 1e-12)
  }

  test("out-of-vocab tokens map to <unk>: unseen bigram, unseen left") {
    // doc 12: (<unk>,<unk>) → -log2((0+1)/(0+8)) = 3.0000
    val (n, s, x) = rows(12L)
    assert(n === 1L)
    assert(s === 3.0)
    assert(x === 3.0)
  }

  test("reference docs score low under their own model") {
    // doc 10: 2.0000 + 2.3219 + 2.1699 + 2.1699 + 2.5850 = 11.2467
    // doc 20: 2.0000 + 2.3219 + 2.1699 + 2.5850 = 9.0768
    assert(rows(10L) === ((5L, 11.2467, 11.2467 / 5)))
    assert(rows(20L) === ((4L, 9.0768, 9.0768 / 4)))
    // the scoring contract the filter exists for: trusted text reads as
    // lower-entropy than gibberish
    assert(rows(10L)._3 < rows(12L)._3 && rows(20L)._3 < rows(12L)._3)
  }

  test("single-token and empty documents emit no row") {
    assert(!rows.contains(13L))
    val withEmpty = docs.union(Seq((14L, "?!")).toDF("doc_id", "text"))
    val r = LanguageModel.bigramXent(withEmpty, "doc_id", "text")
      .filter($"doc_id" === 14L).count()
    assert(r === 0L)
  }

  test("refMod validation") {
    intercept[IllegalArgumentException](
      LanguageModel.bigramXent(docs, "doc_id", "text", refMod = 0))
  }

  test("vocab never contains the unk sentinel (the mapping-free scoring invariant)") {
    // scoreArtifact drops the OOV→<unk> mapping ONLY because
    // TextAnalysis.normalize strips non-alphanumerics, so the literal
    // token "<unk>" can never enter the fitted vocabulary (nor, a
    // fortiori, the bigram/left key columns). A doc that SPELLS the
    // sentinel must still not plant it.
    val withSentinel = docs.union(
      Seq((30L, "the <unk> cat <unk> sat")).toDF("doc_id", "text"))
    val model = LanguageModel.fit(withSentinel, "doc_id", "text")
    assert(model.vocab.filter($"tok" === "<unk>").count() === 0L)
    assert(model.c12.filter($"w1" === "<unk>" || $"w2" === "<unk>").count() === 0L)
    // and "unk" only via real words: the sentinel's brackets are gone,
    // its residue is the plain token "unk" — present, harmless, distinct
    assert(model.vocab.filter($"tok" === "unk").count() === 1L)
  }
}
