package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: inclusive match, latest-wins, null when nothing precedes") {
    val left = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00")), // exact-tie with right at 10:00
      (2L, 1L, ts("2026-01-01 11:00:00")), // latest right is 10:30
      (3L, 2L, ts("2026-01-01 10:00:00")), // key has no right rows
      (4L, 1L, ts("2026-01-01 09:00:00"))  // nothing precedes
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0),
      (1L, ts("2026-01-01 10:30:00"), 200.0),
      (3L, ts("2026-01-01 09:00:00"), 300.0)
    ).toDF("k", "ts", "rv")
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("rv"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("r_rv"))) None else Some(r.getAs[Double]("r_rv")))).toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(200.0), 3L -> None, 4L -> None))
  }

  test("asofForward: inclusive match, earliest-wins, null when nothing follows") {
    val left = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00")), // exact-tie with right at 10:00
      (2L, 1L, ts("2026-01-01 10:10:00")), // next right is 10:30
      (3L, 2L, ts("2026-01-01 10:00:00")), // key has no right rows
      (4L, 1L, ts("2026-01-01 11:00:00"))  // nothing follows
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0),
      (1L, ts("2026-01-01 10:30:00"), 200.0),
      (3L, ts("2026-01-01 11:00:00"), 300.0)
    ).toDF("k", "ts", "rv")
    val out = AsofJoin.asofForward(left, right, Seq("k"), "ts", "ts", Seq("rv"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("r_rv"))) None else Some(r.getAs[Double]("r_rv")))).toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(200.0), 3L -> None, 4L -> None))
  }

  test("asofForward: a null left timestamp gets NO match (regression: desc nulls-last)") {
    // desc's default NULLS LAST sorted an unknown-timestamp left row after
    // every right row, handing it the globally earliest right payload
    val left = Seq(
      (1L, 1L, Option(ts("2026-01-01 10:10:00"))),
      (2L, 1L, Option.empty[java.sql.Timestamp])
    ).toDF("id", "k", "ts")
    val right = Seq((1L, ts("2026-01-01 10:30:00"), 200.0)).toDF("k", "ts", "rv")
    val out = AsofJoin.asofForward(left, right, Seq("k"), "ts", "ts", Seq("rv"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("r_rv"))) None else Some(r.getAs[Double]("r_rv")))).toMap
    assert(out === Map(1L -> Some(200.0), 2L -> None))
  }

  test("asof/asofForward: a null RIGHT timestamp is never carried as a match") {
    // a null-ts right row sorts first under nulls-first in both directions;
    // unfiltered, its payload could be fabricated as the match for null-ts
    // left rows and (forward) for left rows past the last real right ts
    val left = Seq(
      (1L, 1L, Option(ts("2026-01-01 10:10:00"))),
      (2L, 1L, Option.empty[java.sql.Timestamp]),
      (3L, 1L, Option(ts("2026-01-01 12:00:00"))) // after every real right ts
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, Option(ts("2026-01-01 10:30:00")), 200.0),
      (1L, Option.empty[java.sql.Timestamp], 666.0) // must never match
    ).toDF("k", "ts", "rv")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("r_rv"))) None else Some(r.getAs[Double]("r_rv")))).toMap
    val fwd = res(AsofJoin.asofForward(left, right, Seq("k"), "ts", "ts", Seq("rv")))
    assert(fwd === Map(1L -> Some(200.0), 2L -> None, 3L -> None))
    val back = res(AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("rv")))
    assert(back === Map(1L -> None, 2L -> None, 3L -> Some(200.0)))
  }

  test("asofForward matches a brute-force reference on randomized data") {
    val rnd = new scala.util.Random(13)
    val left = (1 to 300).map(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(1000).toLong)).toDF("id", "k", "t")
    val right = (1 to 150).map(i =>
      ((i % 7).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble())).toDF("k", "t", "rv")
      .groupBy("k", "t").agg(max("rv").as("rv"))
    val got = AsofJoin.asofForward(left, right, Seq("k"), "t", "t", Seq("rv"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("r_t"))) None else Some(r.getAs[Long]("r_t")))).toMap
    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    left.collect().foreach { l =>
      val (id, k, t) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val expect = rightRows.filter(r => r._1 == k && r._2 >= t)
        .map(_._2).sorted.headOption
      assert(got(id) === expect, s"left id=$id k=$k t=$t")
    }
  }

  test("asof result columns carry the matched right timestamp") {
    val left = Seq((1L, 1L, ts("2026-01-01 12:00:00"))).toDF("id", "k", "ts")
    val right = Seq((1L, ts("2026-01-01 10:30:00"), 7.0)).toDF("k", "ts", "rv")
    val r = AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("rv")).collect()(0)
    assert(r.getAs[Timestamp]("r_ts") === ts("2026-01-01 10:30:00"))
  }

  test("range join equals the naive BETWEEN join, pairs exactly once") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("pid", "p")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF("iid", "lo", "hi")
    val binned = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = pts.crossJoin(ivs).filter($"p".between($"lo", $"hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length === binned.distinct.length, "no duplicate pairs")
    assert(binned.toSet === naive.toSet)
  }

  test("asof matches a brute-force reference on randomized data") {
    val rnd = new scala.util.Random(11)
    val leftRows = (1 to 300).map { i =>
      (i.toLong, (rnd.nextInt(10) + 1).toLong,
        ts(f"2026-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }
    val rightRows = (1 to 200).map { i =>
      ((rnd.nextInt(12) + 1).toLong,
        ts(f"2026-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${i % 60}%02d"),
        i.toDouble)
    }
    // right side unique per (k, ts) by construction (distinct seconds)
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.distinct.toDF("k", "ts", "rv")
    val got = AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("rv"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("r_rv")).map(_.toDouble)).toMap
    val byKey = rightRows.distinct.groupBy(_._1)
    val want = leftRows.map { case (id, k, lts) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(lts))
        .sortBy(_._2.getTime)
        .lastOption.map(_._3)
    }.toMap
    assert(got === want)
  }

  test("overlap join equals the naive quadratic join, pairs exactly once") {
    val rnd = new scala.util.Random(7)
    def intervals(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(500).toLong
      (idBase + i, s, s + rnd.nextInt(120).toLong)
    }
    val l = intervals(60, 0L).toDF("lid", "ls", "le")
    val r = intervals(50, 1000L).toDF("rid", "rs", "re")
    val got = graft.operators.OverlapJoin.overlapPairs(l, r, Nil,
      "lid", "ls", "le", "rid", "rs", "re", binWidth = 64)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val want = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length === got.distinct.length, "each pair exactly once")
    assert(got.toSet === want.toSet)
    assert(want.nonEmpty, "fixture must actually overlap")
  }

  test("overlap join respects equi-keys (no cross-key pairs)") {
    val l = Seq((1L, 10L, 0L, 100L), (2L, 11L, 0L, 100L)).toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 20L, 50L, 60L), (2L, 21L, 50L, 60L)).toDF("k", "rid", "rs", "re")
    val got = graft.operators.OverlapJoin.overlapPairs(l, r, Seq("k"),
      "lid", "ls", "le", "rid", "rs", "re", binWidth = 16)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === Set((1L, 10L, 20L), (2L, 11L, 21L)))
  }

  test("range join handles negative domains (floor binning)") {
    val pts = Seq((1L, -15.0), (2L, -5.0), (3L, 0.0), (4L, 7.5)).toDF("pid", "p")
    val ivs = Seq((1L, -20.0, -10.0), (2L, -6.0, 1.0), (3L, 5.0, 8.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 4.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L)))
  }

  test("range join with per-key intervals") {
    val pts = Seq((1L, "a", 5.0), (2L, "b", 5.0)).toDF("pid", "k", "p")
    val ivs = Seq(("a", 0.0, 10.0)).toDF("k", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 5.0, keys = Seq("k"))
    assert(out.select("pid").collect().map(_.getLong(0)).toSeq === Seq(1L),
      "interval for key 'a' must not match key 'b' points")
  }
}
