package graft

import java.util.{ConcurrentModificationException => CME}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.store.SnapshotStore

/** The injectable commit-claim seam (SnapshotStore.ClaimArbiter) — the
  * docs/OBJECT-STORES.md CAS upgrade path made code. The double below
  * emulates exactly what an S3-class store provides since conditional PUT
  * (`If-None-Match: *`): a SERVER-SIDE-ATOMIC "create iff absent" with no
  * rename and no link. These tests pin the arbiter contract (one winner
  * per name), the store's behavior when a claim is lost mid-commit, and
  * that the stalled-writer nonce re-verify composes with an injected
  * arbiter unchanged.
  */
class ClaimArbiterSpec extends SparkSpec {
  import spark.implicits._

  private def hfs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Conditional-PUT double: check+create under one lock (the server-side
    * atomicity the real store provides), write-through to the local
    * filesystem so the store's ordinary readers see claimed objects.
    * Fault injection: `beforeClaim` runs before the atomic section — a
    * test can interleave a competitor's PUT into the exact window a
    * cross-JVM race would hit.
    */
  private final class ConditionalPut(root: String)
      extends SnapshotStore.ClaimArbiter {
    private val fs = hfs(root)
    private val lock = new Object
    val wins = new AtomicInteger(0)
    val losses = new AtomicInteger(0)
    @volatile var beforeClaim: Path => Unit = _ => ()

    def claim(dst: Path, content: Array[Byte]): Unit = {
      beforeClaim(dst)
      lock.synchronized {
        if (fs.exists(dst)) {
          losses.incrementAndGet()
          throw new CME(s"conditional PUT failed: $dst already exists")
        }
        val out = fs.create(dst, false)
        try out.write(content) finally out.close()
        wins.incrementAndGet()
        ()
      }
    }
  }

  private def freshStore(name: String): (SnapshotStore, ConditionalPut, String) = {
    val root = tempDir(name) + "/snap"
    val arb = new ConditionalPut(root)
    (new SnapshotStore(spark, root, "id", arbiter = Some(arb)), arb, root)
  }

  private def batch(lo: Long, hi: Long) =
    spark.range(lo, hi + 1).select(
      col("id"), (col("id") % 7).cast("string").as("k"),
      (col("id") * 2).cast("double").as("v"))

  private def age(root: String, rel: String): Unit = {
    val p = new Path(root + "/" + rel)
    hfs(root).setTimes(p, System.currentTimeMillis() - 10 * 60 * 1000L, -1L)
  }

  test("arbiter contract: N simultaneous claimants on one name, exactly one wins") {
    val root = tempDir("arb-race")
    val arb = new ConditionalPut(root)
    val dst = new Path(s"$root/contested.manifest")
    val winners = new AtomicInteger(0)
    val losers = new AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        start.await()
        try { arb.claim(dst, s"claimant-$i".getBytes("UTF-8"))
              winners.incrementAndGet(); () }
        catch { case _: CME => losers.incrementAndGet(); () }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(winners.get() === 1, "exactly one claimant may win")
    assert(losers.get() === 7, "every loser must observe the CME failure")
    // the winner's bytes stand untouched — a lost PUT never overwrites
    val in = hfs(root).open(dst)
    val body = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    assert(body.startsWith("claimant-"), "winner content must be intact")
  }

  test("claim-won: full commit/read lifecycle routes claims through the arbiter") {
    val (st, arb, _) = freshStore("arb-won")
    assert(st.commit(batch(0, 99)) === 1L)
    assert(st.commit(batch(100, 149)) === 2L)
    assert(st.read().count() === 150L)
    assert(st.readAt(1).count() === 100L)
    // both manifests AND their group files claimed through the seam
    assert(arb.wins.get() >= 4,
      s"expected manifest+group claims through the arbiter, saw ${arb.wins.get()}")
    assert(arb.losses.get() === 0)
  }

  test("claim-lost mid-commit: competitor PUTs the version first; loser throws, winner stands") {
    val (st, arb, root) = freshStore("arb-lost")
    st.commit(batch(0, 9)) // v1
    val fs = hfs(root)
    val competitor = "#nonce=competitor\nbogus\t2\t1\t0.0\t1.0\t10\n"
    // fire in the exact cross-JVM window: after this writer's debris check,
    // immediately before its own v2 manifest PUT
    arb.beforeClaim = { dst =>
      if (dst.getName == "v00002.manifest") {
        arb.beforeClaim = _ => ()
        val out = fs.create(dst, false)
        try out.write(competitor.getBytes("UTF-8")) finally out.close()
      }
    }
    val ex = intercept[CME](st.commit(batch(10, 19)))
    assert(ex.getMessage.contains("conditional PUT failed"))
    // the winner's claim is untouched and the loser left no staging debris
    val in = fs.open(new Path(s"$root/_manifests/v00002.manifest"))
    val body = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    assert(body.contains("#nonce=competitor"),
      "a lost claim must never clobber the winner's manifest")
    assert(!fs.listStatus(new Path(s"$root/data"))
      .exists(_.getPath.getName.startsWith(".staging-")),
      "the losing commit must clean its staging directory")
    // the competitor never acknowledged; once its claim ages out as crash
    // debris the loser's retry reclaims the version and lands
    age(root, "_manifests/v00002.manifest")
    assert(st.commit(batch(10, 19)) === 2L)
    assert(st.read().count() === 20L)
  }

  test("stale-nonce composes with an injected arbiter: a superseded writer cannot acknowledge") {
    val (st, _, root) = freshStore("arb-stale")
    st.commit(batch(0, 9)) // v1
    val fs = hfs(root)
    // writer A claims v2 (forged via direct PUT — same bytes the store
    // would write), then stalls past the grace window
    val m2 = new Path(s"$root/_manifests/v00002.manifest")
    val out = fs.create(m2, false)
    out.write("#nonce=aaa-stalled\nbogus\t2\t1\t0.0\t1.0\t10\n".getBytes("UTF-8"))
    out.close()
    age(root, "_manifests/v00002.manifest")
    // writer B (through the arbiter) ages A's claim out and takes v2
    assert(st.commit(batch(10, 19)) === 2L)
    // A wakes: nonce re-verify must refuse, B's commit stands
    val ex = intercept[CME](st.acknowledge(2L, "aaa-stalled"))
    assert(ex.getMessage.contains("superseded"))
    assert(st.read().count() === 20L)
  }

  test("acknowledge refuses a manifest whose group files were reclaimed while stalled") {
    val (st, _, root) = freshStore("arb-dangling")
    st.commit(batch(0, 9)) // v1
    val fs = hfs(root)
    // forge writer A's claim on v2: nonce valid, but its @group ref was
    // deleted by a concurrent recover()/expire() while A stalled — the
    // r13 advice window: nonce alone would bless an unreadable table
    val m2 = new Path(s"$root/_manifests/v00002.manifest")
    val out = fs.create(m2, false)
    out.write(("#nonce=bbb-dangling\n" +
      "@g-reclaimed-while-stalled.group\t1\t0.0\t1.0\n").getBytes("UTF-8"))
    out.close()
    val ex = intercept[CME](st.acknowledge(2L, "bbb-dangling"))
    assert(ex.getMessage.contains("g-reclaimed-while-stalled.group"),
      "the refusal must name the dangling group ref")
    // the live pointer still names v1 — no unreadable table was published
    assert(st.latestVersion === Some(1L))
    assert(st.read().count() === 10L)
  }

  test("changelog refuses endpoints above the acknowledged ceiling") {
    val (st, _, root) = freshStore("arb-cdc-ceiling")
    st.commit(batch(0, 9))
    st.commit(batch(10, 19))
    // forge the crash window: v3 manifest exists, never acknowledged —
    // its rows were never committed and must not surface as CDC inserts
    val fs = hfs(root)
    val m3 = new Path(s"$root/_manifests/v00003.manifest")
    val out = fs.create(m3, false)
    out.write("#nonce=orphan\nbogus\t3\t1\t0.0\t1.0\t10\n".getBytes("UTF-8"))
    out.close()
    val ex = intercept[IllegalArgumentException](
      st.changelog(1L, 3L, Seq("id")))
    assert(ex.getMessage.contains("ceiling"))
    // acknowledged endpoints still work with the orphan present
    assert(st.changelog(1L, 2L, Seq("id")).count() === 10L)
  }

  test("commitIdOf: never repeats across a rollback's version-number reuse") {
    val (st, _, _) = freshStore("arb-commit-id")
    st.commit(batch(0, 9))
    st.commit(batch(10, 19))
    val id1 = st.commitIdOf(1L)
    val oldId2 = st.commitIdOf(2L)
    assert(id1.isDefined && oldId2.isDefined && id1 != oldId2)
    st.rollbackTo(1L)
    assert(st.commitIdOf(2L).isEmpty, "an abandoned version has no commit id")
    // the recommit REUSES version number 2 — the bare number is ambiguous,
    // the commit id is not: a pinned reader re-checking (2, oldId2) detects
    // the rollback instead of silently reading different data
    assert(st.commit(batch(100, 109)) === 2L)
    val newId2 = st.commitIdOf(2L)
    assert(newId2.isDefined && newId2 != oldId2,
      "a reused version number must carry a fresh commit id")
    assert(st.commitIdOf(1L) === id1, "untouched versions keep their id")
  }
}
