package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Plan-shape contracts for the scale-sensitive operators: the properties
  * that make them survive a 100 TB corpus are asserted on the physical
  * plan, so a refactor that silently degrades the shape (a broadcast that
  * becomes a shuffle join, a narrow op that grows an Exchange, a per-shard
  * window that collapses to a single partition) fails the build.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 50L)
    .map(i => (i, if (i % 2 == 0) "en" else "de",
      Seq.fill(20)(s"w${i % 11}").mkString(" ")))
    .toDF("doc_id", "lang", "text")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Flatten an executed plan THROUGH the AQE leaf boundaries: finished
    * subtrees are QueryStageExec leaves (their inner plan is a member, not
    * a child) and the whole tree may sit inside AdaptiveSparkPlanExec /
    * ReusedExchangeExec — a plain typed `collect{}` sees none of it, which
    * made the h2-style "lineitem never broadcasts" pins vacuous.
    */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    p +: (p.children ++ inner).flatMap(flatten)
  }

  /** Root paths of parquet scans that sit INSIDE a broadcast build side. */
  private def broadcastScanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    flatten(df.queryExecution.executedPlan)
      .collect { case b: BroadcastExchangeExec => b }
      .flatMap(flatten(_).collect {
        case s: FileSourceScanExec => s.relation.location.rootPaths.mkString
      })
  }

  test("d8 contamination: benchmark broadcasts; no corpus-on-corpus join") {
    val p = planOf(Dedup.contaminationRate(docs, "doc_id", "text",
      docs.limit(5), "text", shingleN = 3))
    assert(p.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus must never shuffle for a join:\n$p")
  }

  test("t7 chunking: executor-local 1->N expansion, zero Exchange") {
    val p = planOf(docs.select(col("doc_id"),
      posexplode(TextAnalysis.chunkWindows(col("text"), 8, 4))))
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("t8 packing: per-shard window, never a single-partition sort") {
    val p = planOf(TextAnalysis.packSequences(docs, "doc_id", "text", "lang", 64))
    assert(p.contains("hashpartitioning"), s"window must partition by shard:\n$p")
    assert(!p.contains("SinglePartition"), s"no global window allowed:\n$p")
  }

  test("t20 packing: doc-stream window per shard; only the sublinear bases frame is global") {
    val p = planOf(graft.text.Packing.packChunks(docs, "doc_id", "text",
      ctxLen = 16, shardSize = 8))
    // the corpus-sized running sum is partitioned by the shard key
    assert(p.contains("hashpartitioning(shard"),
      s"the document window must partition by shard:\n$p")
    // exactly ONE single-partition exchange: the shard-totals prefix sum
    // (a frame smaller than the corpus by shardSize×) — a second one would
    // mean the document stream itself collapsed to one partition
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles == 1,
      s"expected exactly the bases frame on a single partition, got $singles:\n$p")
    // the per-shard base offsets join back by broadcast
    assert(p.contains("BroadcastHashJoin"), s"bases must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the offset join must not shuffle the corpus:\n$p")
  }

  test("t21 LM scoring: the model ships to the data — every model join broadcasts") {
    val p = planOf(graft.text.LanguageModel.bigramXent(docs, "doc_id", "text",
      refMod = 10))
    assert(p.contains("BroadcastHashJoin"), s"model joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the token stream must never shuffle-join against the model:\n$p")
    // bigram re-assembly is ARRAY-SIDE (r16): no per-doc window, so the
    // exploded token stream never shuffles or sorts before the final agg
    assert(!p.contains("Window"),
      s"scoring must not window the token stream:\n$p")
    // the only id-keyed exchange left is the per-doc aggregate itself
    assert(p.contains("hashpartitioning(id"),
      s"the per-doc aggregate must partition by document:\n$p")
    // single-partition stages: ONLY the one-row vocabulary-size aggregate
    // (the model constant V, computed over the sublinear reference vocab),
    // which the surprisal-table construction instantiates once per
    // artifact branch (bigram / left-fallback / base) in the in-memory
    // path — exactly three, every one sublinear; a fourth would mean the
    // token stream itself funneled to one task. (The persisted-artifact
    // path the t21/st9 queries run has ZERO: the model frames are plain
    // parquet scans.)
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    assert(singles == 3,
      s"only the V-constant aggregates may be single-partition, got $singles:\n$p")
  }

  test("t21 artifact scoring: the persisted-model path has no single-partition stage at all") {
    val model = graft.text.LanguageModel.fit(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("t21audit").toString
    graft.text.LanguageModel.saveSurprisal(model, dir)
    val art = graft.text.LanguageModel.loadSurprisal(spark, dir)
    val p = planOf(graft.text.LanguageModel.scoreArtifact(docs, "doc_id", "text", art))
    assert(!p.contains("Exchange SinglePartition"),
      s"artifact scoring must have zero single-partition stages:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"model joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the token stream must never shuffle-join against the model:\n$p")
    assert(!p.contains("Window"),
      s"scoring must not window the token stream (r16 array-side zip):\n$p")
  }

  test("t23 encode: the fitted vocab broadcasts back to the corpus scan") {
    val p = planOf(TextAnalysis.bpeEncode(docs, "doc_id", "text", rounds = 2))
    assert(p.contains("BroadcastHashJoin"),
      s"the word->symbols vocab must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the exploded corpus must never shuffle for the vocab join:\n$p")
  }

  test("sm10 epoch shuffle: the position window is (epoch, shard)-partitioned," +
      " never a single partition") {
    val p = planOf(graft.functions.Sampling.epochShuffle(
      docs, "doc_id", epochs = 2, nShards = 8))
    assert(!p.contains("SinglePartition"),
      s"epoch shuffle must not plan a corpus-wide single-partition stage:\n$p")
    assert(p.contains("Window"), s"expected the position window:\n$p")
  }

  test("v17 filtered ANN: probes and the allowed-id set broadcast; " +
      "the inverted lists never shuffle for a join") {
    import graft.sim.Ivf
    val emb = (0L until 40L).map(i =>
      (i, (i % 4).toInt, Seq.tabulate(8)(j => if (j == (i % 4).toInt * 2) 1.0f
        else 0.01f * ((i + j) % 5))))
      .toDF("vec_id", "label", "embedding")
    val idx = Ivf.build(emb, "vec_id", "embedding", nLists = 4)
    val q = Ivf.searchFiltered(idx, emb.filter(col("vec_id") < 3), "vec_id",
      "embedding", allowed = emb.filter(col("label") === 1).select("vec_id"),
      nProbe = 2, k = 3)
    val p = planOf(q)
    assert(p.contains("BroadcastHashJoin"),
      s"probe lists and allowed ids must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the inverted lists must never shuffle for a join:\n$p")
  }

  test("w1 top-k: the rank filter plans as WindowGroupLimit, not a full sort") {
    val p = SparkEntry.queries("w1_topk_per_group")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k must push a group limit below the window:\n$p")
  }

  test("a2j3 serving flagship: probes and lineage dims broadcast") {
    val p = SparkEntry.queries("a2j3_serving_flagship")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"small sides must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the serving path must not shuffle-join:\n$p")
  }

  test("j7 bloom prune: the sketch probe filters the probe side BELOW the join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val big = spark.range(0, 2000).select(col("id").as("k"), col("id").as("v"))
    val small = spark.range(0, 50).select((col("id") * 3).as("bk"))
    val df = graft.functions.BloomSketch.prunedJoin(big, "k", small, "bk")
    val join = df.queryExecution.optimizedPlan.collectFirst { case j: Join => j }
    assert(join.isDefined, "no join in the pruned-join plan")
    val probeFiltered = join.get.left.collectFirst {
      case f: Filter
          if f.condition.find(_.isInstanceOf[graft.functions.BloomContains]).isDefined =>
        f
    }
    assert(probeFiltered.isDefined,
      s"bloom probe must prune the scan side below the join:\n${df.queryExecution.optimizedPlan}")
  }

  test("filter pushdown: contract scans reach parquet with PushedFilters") {
    val sfDir = "/root/testdata/sf0.001"
    // f1 filters lat/lon; f3 filters variable+timestamp — both must reach
    // the parquet reader, not evaluate post-scan only
    Seq("f1_bbox_filter", "f3_variable_slice", "h5_filter_sum").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
      assert(pushed.contains("PushedFilters: [") && !pushed.contains("PushedFilters: []"),
        s"$q lost its parquet pushdown:\n$pushed")
    }
  }

  test("d9 dup-spans: tokenize+md5 runs once — both consumers read the cached frame") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val plan = Dedup.dupSpans(docs, "doc_id", "text", window = 4)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan // AQE hides the tree
        case p => p
      }
    val gens = plan.collect { case g: GenerateExec => g }
    assert(gens.isEmpty,
      s"chunk explode must live inside the cached frame, not re-run per consumer:\n$plan")
    val scans = plan.collect { case s: InMemoryTableScanExec => s.relation.cacheBuilder }
    assert(scans.length == 2 && scans.distinct.length == 1,
      s"both consumers must read the SAME cached (id, fp) frame:\n$plan")
  }

  test("d10 span scrub: single chunk explode, shared across all three consumers") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val plan = Dedup.scrubDupSpans(docs, "doc_id", "text", window = 4)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    assert(plan.collect { case g: GenerateExec => g }.isEmpty,
      s"chunk explode must live inside the persisted frame:\n$plan")
    val scans = plan.collect { case s: InMemoryTableScanExec => s.relation.cacheBuilder }
    assert(scans.length == 3 && scans.distinct.length == 1,
      s"first-seen agg, join-back, and totals must share ONE cached chunk frame:\n$plan")
  }

  test("t12/sm4 top-k: plan as TakeOrderedAndProject, not a global sort") {
    val top = TextAnalysis.topNgrams(docs, "doc_id", "text", n = 2, k = 5)
    assert(planOf(top).contains("TakeOrderedAndProject"),
      s"heavy-hitter top-k must be a bounded heap:\n${planOf(top)}")
    val ws = graft.functions.Sampling.weightedSample(
      docs.select(col("doc_id"), length(col("text")).as("w")), "doc_id", "w", 5)
    assert(planOf(ws).contains("TakeOrderedAndProject"),
      s"weighted-sample top-k must be a bounded heap:\n${planOf(ws)}")
  }

  test("h2 regional revenue: dimensions broadcast; lineitem is never a build side") {
    val sfDir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("h2_regional_revenue")(spark, sfDir)
    df.collect()
    val planStr = planOf(df)
    assert(planStr.contains("BroadcastHashJoin"),
      s"nation/region must broadcast:\n$planStr")
    // smaller sides (dims, and at tiny SF even filtered orders) may broadcast
    // by size — but the big fact scan must NEVER be materialized on the driver.
    // flatten() pierces the AQE QueryStageExec leaves; the scans MUST be
    // visible or the assertion below is vacuous
    val scans = broadcastScanPaths(df)
    assert(scans.nonEmpty, s"no broadcast scans found — pin is vacuous:\n$planStr")
    assert(!scans.exists(_.contains("lineitem")),
      s"lineitem must not be a broadcast build side:\n$planStr")
  }

  test("h9 nation volume: pair-filtered supplier broadcasts; lineitem is never a build side") {
    val df = SparkEntry.queries("h9_nation_volume")(spark, "/root/testdata/sf0.001")
    df.collect()
    val planStr = planOf(df)
    assert(planStr.contains("BroadcastHashJoin"),
      s"the pair-filtered supplier/nation dims must broadcast:\n$planStr")
    val scans = broadcastScanPaths(df)
    assert(scans.nonEmpty, s"no broadcast scans found — pin is vacuous:\n$planStr")
    assert(!scans.exists(_.contains("lineitem")),
      s"lineitem must not be a broadcast build side:\n$planStr")
    // the ship-date predicate must reach the lineitem scan, not sit above a join
    val liScanLines = planStr.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("lineitem")).toSeq
    assert(liScanLines.nonEmpty &&
      liScanLines.forall(_.contains("l_shipdate")),
      s"ship-date filter must be pushed to the lineitem scan:\n$planStr")
  }

  /** Every broadcast subtree that reaches a scan of `table` must also
    * contain an aggregate: what ships is a dim-bounded REDUCTION of the
    * fact (a per-part threshold, a per-order rollup), never fact rows.
    */
  private def factBroadcastsAreAggShielded(df: org.apache.spark.sql.DataFrame,
      table: String): Unit = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    flatten(df.queryExecution.executedPlan)
      .collect { case b: BroadcastExchangeExec => b }
      .foreach { b =>
        val sub = flatten(b)
        val hasFact = sub.exists {
          case s: FileSourceScanExec =>
            s.relation.location.rootPaths.mkString.contains(table)
          case _ => false
        }
        val hasAgg = sub.exists {
          case _: HashAggregateExec | _: ObjectHashAggregateExec |
               _: SortAggregateExec => true
          case _ => false
        }
        assert(!hasFact || hasAgg,
          s"a broadcast ships raw $table rows (no aggregate above the scan):\n$b")
      }
  }

  test("h11 Q17 shape: thresholds broadcast as a dim-bounded aggregate, never raw lineitem") {
    val df = SparkEntry.queries("h11_small_qty_revenue")(spark, "/root/testdata/sf0.001")
    df.collect()
    val planStr = planOf(df)
    assert(planStr.contains("BroadcastHashJoin"),
      s"the filtered part dim and the per-part threshold table must broadcast:\n$planStr")
    factBroadcastsAreAggShielded(df, "lineitem")
    // the brand/size predicate reaches the part scan
    val partScan = planStr.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("part.parquet")).toSeq
    assert(partScan.nonEmpty && partScan.forall(_.contains("p_brand")),
      s"the part filter must push to the scan:\n$planStr")
  }

  test("h15 Q20 shape: parts/totals/suppliers broadcast, fact cached once, never raw") {
    // the contract query seals its caches (sealResult), so the audit
    // drives the same decorrelation shape directly: per-(part,supplier)
    // aggregate persisted, its own rollup as the correlated total
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val window = (col("l_shipdate") >= lit("1996-01-01").cast("timestamp")) &&
      (col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val redParts = Tables(spark, d, "part")
      .filter(col("p_name").startsWith("red")).select("p_partkey")
    val bySupp = Tables(spark, d, "lineitem").filter(window)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(30,2)")).as("q_supp"))
      .persist()
    val byPart = bySupp.groupBy("l_partkey").agg(sum("q_supp").as("q_total"))
    val df = bySupp.join(broadcast(byPart), "l_partkey")
      .filter(col("q_supp") * 2 > col("q_total"))
    df.collect()
    val planStr = planOf(df)
    assert(planStr.contains("BroadcastHashJoin"),
      s"the per-part totals must broadcast:\n$planStr")
    // both consumers read the CACHED aggregate — the fact scans once
    assert(planStr.contains("InMemoryTableScan"),
      s"bySupp's consumers must read the cache, not re-scan lineitem:\n$planStr")
    val scans = broadcastScanPaths(df)
    assert(!scans.exists(_.contains("lineitem")),
      s"lineitem must not be a broadcast build side:\n$planStr")
    bySupp.unpersist()
  }

  test("h12 Q21 shape: order-partitioned window, no self-join, lineitem never ships raw") {
    val df = SparkEntry.queries("h12_waiting_suppliers")(spark, "/root/testdata/sf0.001")
    df.collect()
    val planStr = planOf(df)
    assert(planStr.contains("hashpartitioning(l_orderkey"),
      s"the existence tests must run as an order-partitioned window:\n$planStr")
    assert(!planStr.contains("SinglePartition"),
      s"no global window allowed:\n$planStr")
    factBroadcastsAreAggShielded(df, "lineitem")
  }

  test("h13 Q22 shape: the scalar aggregate broadcasts; customer never ships raw") {
    val df = SparkEntry.queries("h13_dormant_customers")(spark, "/root/testdata/sf0.001")
    df.collect()
    val planStr = planOf(df)
    // the decorrelated scalar subquery is exactly a broadcast nested loop
    // of a one-row aggregate
    assert(planStr.contains("BroadcastNestedLoopJoin"),
      s"the positive-balance scalar must join as a broadcast cross:\n$planStr")
    factBroadcastsAreAggShielded(df, "customer")
  }

  test("j13 PIT join: interval predicate rides the user_id equi-join, never a nested loop") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("j13_pit_join")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the PIT interval predicate must be a post-filter on the user_id equi-join:\n$plan")
  }

  test("p8 drift PSI: the bucket-edge spec joins by broadcast, events never shuffle for it") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("p8_drift_psi")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // the 5-row min/max edge table must broadcast onto the event scan; a
    // SortMergeJoin here would shuffle the full event stream on event_type
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket edges must broadcast:\n$plan")
  }

  test("t15 novelty: tokenize+md5 runs once — both consumers read the cached frame") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val plan = Dedup.novelSpans(docs, "doc_id", "text", window = 4)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    val gens = plan.collect { case g: GenerateExec => g }
    assert(gens.isEmpty,
      s"chunk explode must live inside the cached frame, not re-run per consumer:\n$plan")
    val scans = plan.collect { case s: InMemoryTableScanExec => s.relation.cacheBuilder }
    assert(scans.length == 2 && scans.distinct.length == 1,
      s"both consumers must read the SAME cached (id, fp) frame:\n$plan")
  }

  test("h7 shipping priority: top-10 is a bounded heap with pushed date filters") {
    val df = SparkEntry.queries("h7_shipping_priority")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"Q3 top-10 must plan as a bounded heap, not a global sort:\n$p")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("l_shipdate")) && pushed.exists(_.contains("o_orderdate")),
      s"date predicates must reach both parquet scans:\n${pushed.mkString("\n")}")
  }

  test("binned joins never degrade to nested-loop: d13, j12, e18 plan hash joins only") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    Seq("d13_incremental_dedup", "j12_overlap_join", "e18_cooccurrence").foreach { q =>
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bad = plan.collect {
        case b: BroadcastNestedLoopJoinExec => b
        case c: CartesianProductExec => c
      }
      assert(bad.isEmpty,
        s"$q must keep every join equi-keyed (bin/bucket/fingerprint):\n$plan")
    }
  }

  test("g3: the capped triangle census keeps every join hash-keyed (no nested loop)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // the hub anti-joins, wedge join, and closing-edge semi-join are all
    // equi-keyed; the only tolerated non-equi joins are the final 1×1
    // scalar crossJoins stitching the four aggregates together
    val df = SparkEntry.queries("g3_triangles")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bad = plan.collect {
      case b: BroadcastNestedLoopJoinExec
        if b.joinType != org.apache.spark.sql.catalyst.plans.Cross => b
      case c: CartesianProductExec => c
    }
    assert(bad.isEmpty, s"non-scalar nested-loop join in the census:\n$plan")
  }

  test("d15: the serve plan reads history from the index artifact tables") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("d15_indexed_screen")(spark, "/root/testdata/sf0.001")
    df.collect()
    // typed collect{FileSourceScanExec} is blind here even after unwrapping:
    // AQE rewrites finished subtrees into QueryStageExec LEAVES whose inner
    // plan is a member, not a child — the string rendering includes them
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("d15_index/docs") && plan.contains("d15_index/bands"),
      s"history must come from the persisted index parquet:\n$plan")
  }

  test("m7: the media screen reads only the blob-free feature artifacts") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("m7_media_incremental")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // the serve plan must touch history and batch FEATURES only — if a
    // payload table (the PNG blobs) enters the scan set, the screen is
    // re-decoding pixels it already paid for
    assert(plan.contains("media/features") && plan.contains("media_inc/features"),
      s"screen must read both persisted feature artifacts:\n$plan")
    assert(!plan.contains("payloads"),
      s"the media screen must never scan a payload (blob) table:\n$plan")
  }

  test("m8/au2: the near-dup pairings read only their blob-free artifacts") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def executedPlan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      (df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
    }
    // frame-level pairing: only the 8-byte-hash frame artifact may enter
    // the scan set — a payload scan would mean re-decoding pixels the
    // artifact already paid for, per pair generation
    val m8 = executedPlan("m8_frame_neardup")
    assert(m8.contains("media/frames"),
      s"m8 must pair over the persisted frame features:\n$m8")
    assert(!m8.contains("payloads"),
      s"m8 must never scan a payload (blob) table:\n$m8")
    // audio pairing: features only, never the WAV blobs
    val au2 = executedPlan("au2_audio_neardup")
    assert(au2.contains("audio/features"),
      s"au2 must pair over the persisted audio features:\n$au2")
    assert(!au2.contains("payloads"),
      s"au2 must never scan a payload (blob) table:\n$au2")
  }

  test("v15: radius search carries no rank window; probe lists broadcast") {
    import graft.sim.Ivf
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = Ivf.build(emb, "vec_id", "embedding", nLists = 4)
    val df = Ivf.radiusSearch(idx, emb.filter($"vec_id" < 5), "vec_id",
      "embedding", nProbe = 2, minCosine = 0.3)
    df.collect()
    val frames = flatten(df.queryExecution.executedPlan)
    // the candidate side must never sort or window: the threshold is a pure
    // filter, which is the whole reason radius beats top-k at scale. The
    // probe-list derivation's own tiny window (nearest lists per probe)
    // sits INSIDE the broadcast build side — assert the corpus-side join
    // consumes a broadcast, and no Window touches the probe-side stream
    // above it.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val joins = frames.collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "corpus-side candidate join must be broadcast-hash")
    val aboveJoin = frames.takeWhile {
      case _: BroadcastHashJoinExec => false
      case _ => true
    }
    assert(!aboveJoin.exists(_.isInstanceOf[WindowExec]),
      "no rank window may sit above the candidate join in a radius search")
  }

  test("d18: the sharded screen probes sketch COLUMNS; x3 broadcasts only the bench side") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = "/root/testdata/sf0.001"
    val d18 = SparkEntry.queries("d18_bloom_screen_sharded")(spark, dir)
    d18.collect()
    val d18Plan = (d18.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // the probe must ride as the per-row BINARY-column kernel — a
    // driver-held sketch (graft_bloom_contains) would mean the shards were
    // collected, which is exactly what the sharded form exists to avoid
    assert(d18Plan.contains("graft_bloom_contains_bytes"),
      s"sharded screen must probe the joined sketch column:\n$d18Plan")
    assert(!d18Plan.contains("graft_bloom_contains("),
      s"no driver-held sketch may appear in the sharded plan:\n$d18Plan")

    // audit the PRE-seal pipeline: the query lambda itself returns a
    // sealed local relation (cache-free contract), which carries no plan
    val (x3, x3Persisted) = SparkEntry.x3Unsealed(spark, dir)
    x3.collect()
    // every broadcast build side must be bench-derived (the 1/17 split or
    // its shingle set) — the corpus must never broadcast
    val scans = broadcastScanPaths(x3)
    assert(scans.nonEmpty, "x3 must broadcast the bench-derived sides")
    // both broadcast inputs scan documents.parquet but carry the bench
    // filter; assert the corpus-sized side stays out of every build side
    // by checking the doc_id % 17 = 0 predicate reached each broadcast scan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // broadcasts with no file scan read the persisted flagged-id shortlist
    // (batch-sized by construction) — the pin is about PARQUET-backed build
    // sides, which must all carry the bench predicate
    val buildFilters = flatten(x3.queryExecution.executedPlan)
      .collect { case b: BroadcastExchangeExec => b }
      .flatMap(b => flatten(b).collect { case s: FileSourceScanExec => s }
        .map(_.dataFilters.mkString(",")))
    assert(buildFilters.nonEmpty && buildFilters.forall(_.contains("% 17) = 0")),
      s"every parquet-backed broadcast build side must be the bench split:\n$buildFilters")
    x3Persisted.foreach(_.unpersist())
  }

  test("k9: the bucketed co-located join has ZERO Exchange below the merge join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("k9_pin").toString
    graft.store.Bucketing.writeBucketed(
      Tables(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
      "k9_orders_b", Seq("o_orderkey"), 8, sortCols = Seq("o_orderkey"),
      path = Some(s"$tmp/orders"))
    graft.store.Bucketing.writeBucketed(
      Tables(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
      "k9_lineitem_b", Seq("l_orderkey"), 8, sortCols = Seq("l_orderkey"),
      path = Some(s"$tmp/lineitem"))
    val joined = graft.store.Bucketing.coLocatedJoin(spark,
      "k9_lineitem_b", "l_orderkey", "k9_orders_b", "o_orderkey")
    joined.collect()
    val plan = (joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("SortMergeJoin"),
      s"the co-located join must plan as a merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"matching bucketed scans must satisfy the join distribution with no shuffle:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"both sides must be bucketed scans:\n$plan")
  }

  test("d15s/v8s: the amortized serve plans read ONLY persisted artifacts for history") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def servedPlan(q: String): String = {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      (df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
    }
    // d15s: history shingles/bands come from the index parquet; the only
    // documents.parquet scan is the batch being screened
    val d15s = servedPlan("d15s_screen_amortized")
    assert(d15s.contains("d15s_screen/docs") && d15s.contains("d15s_screen/bands"),
      s"d15s history must come from the persisted index parquet:\n$d15s")
    // v8s: candidates are ranked from the persisted PQ codes; the only
    // embeddings.parquet scan is the probe set (vec_id < 5, pushed down)
    val v8s = servedPlan("v8s_search_amortized")
    assert(v8s.contains("v8s_search/codes"),
      s"v8s candidates must come from the persisted codes parquet:\n$v8s")
    // the codes scan must PRUNE to the probed listId partitions (dynamic
    // partition pruning off the broadcast probe lists) — without it a serve
    // reads the whole archive's codes and the flat-in-corpus claim dies
    val codesScanLine = v8s.linesIterator
      .find(l => l.contains("v8s_search/codes") && l.contains("PartitionFilters"))
    assert(codesScanLine.exists(l =>
        l.contains("dynamicpruning") && l.contains("listId")),
      s"codes scan must carry a dynamic listId partition filter:\n$v8s")
    // this test built the shared artifacts from sf0.001 — delete them so a
    // later Verify at another sf can never be checked against THESE (the
    // buildOnce fingerprint would rebuild anyway, but stale-on-crash beats
    // stale-on-read)
    Seq("/tmp/graft_oracle/d15s_screen", "/tmp/graft_oracle/v8s_search")
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(new java.io.File(d))
      }
  }

  test("v10 margin mining: probes broadcast — the corpus is never a build side") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("v10_margin_pairs")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the tiny probe set must broadcast onto the corpus scan:\n$plan")
  }

  test("w6 pareto: the ordered window runs over the post-aggregate frame, not lineitem") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // logical plan — the physical one hides subtrees in AQE QueryStage
    // leaves; the altitude claim (window ABOVE the supplier aggregate, so
    // the single-partition sort sees suppliers, never fact rows) is a
    // logical-plan property anyway
    val lp = SparkEntry.queries("w6_pareto")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty, s"expected window nodes:\n$lp")
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"cumulative window must consume the aggregated supplier frame:\n$w")
    }
  }

  test("f6 haversine top-k: bounded heap, never a global sort") {
    val p = SparkEntry.queries("f6_haversine_rank")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"haversine top-k must plan as a bounded heap:\n$p")
  }

  test("t14 classifier: map-side sum combine, bounded shuffles") {
    val p = SparkEntry.queries("t14_quality_classifier")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the weight SUM specifically must combine map-side (partial_sum in the
    // partial HashAggregate) — `contains("partial")` alone would be
    // satisfied by any unrelated partial stage
    assert(p.contains("partial_sum"),
      s"classifier weight sum must combine map-side:\n$p")
    // one hash exchange for the per-doc aggregate, at most one more for the
    // left join back to the document base
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"classifier must not cascade shuffles ($exchanges):\n$p")
  }

  test("e11 funnel: chained min-aggregates, no full-stream window") {
    val p = SparkEntry.queries("e11_funnel")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"funnel must not window the event stream:\n$p")
  }

  test("m14 seek plan: keyed windows only, and no payload blob enters the plan") {
    val df = SparkEntry.queries("m14_seek_plan")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(mediaId"),
      s"cut/seek windows must partition by mediaId:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no single-partition stage in the seek plan:\n$p")
    // the plan composes the two flat ARTIFACTS — the container/media blobs
    // must never reach it
    assert(!p.contains("bytes"), s"payload blob leaked into the seek plan:\n$p")
  }

  test("d2 portable minhash: signature projection sits below the band Generate") {
    // the CollapseProject guard: the band explode must consume the
    // signature as a bound attribute, not recompute it per band
    val pairs = Dedup.minhashLshPairsPortable(docs, "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 2, threshold = 0.1)
    val p = pairs.queryExecution.optimizedPlan.toString
    val generateLine = p.linesIterator.find(_.contains("Generate explode")).getOrElse("")
    assert(!generateLine.contains("md5") && !generateLine.contains("portable_minhash"),
      s"signature hashing leaked into the per-band generator:\n$generateLine")
  }

  test("d4 block self-join: both sides share ONE exchange (tokenize runs once)") {
    // r17: the rename projections sit ABOVE one explicit repartition(pfx),
    // so AQE reuses the shuffle stage for the b side — the corpus
    // tokenize+normalize pass runs once, not once per side. Must execute:
    // reuse is an AQE runtime decision, invisible in the initial plan.
    val pairs = Dedup.prefixBlockedJaccard(docs, "doc_id", "text",
      prefixLen = 8, threshold = 0.0)
    pairs.collect()
    val nodes = flatten(pairs.queryExecution.executedPlan)
    val reused = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec])
    assert(reused >= 1, "self-join sides must share the block-key exchange")
  }
}
