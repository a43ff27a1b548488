package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** EXECUTED-plan shape gates for the top-cost queries (VERDICT r13 #3).
  *
  * RelationalSpec pins STATIC plan properties (pushdown, pruning, broadcast
  * at planning time); this spec pins the FINAL ADAPTIVE plan after
  * execution, because the two multi-× regressions this project has caught
  * were both AQE-era flips invisible statically: q150 round 13 (accurate
  * cache stats → static shuffle join → AQE converts to broadcast only
  * AFTER the stream-side exchange ran → the distinct re-shuffles the
  * 10⁸-row pair stream; 4.6×) and q168 round 10 (plan-chaining re-analysis;
  * 12×). A Spark upgrade or stats drift now fails a test instead of
  * silently multiplying a query.
  *
  * The exchange counts pinned here are the known-good plan's — they are
  * tripwires, not laws; an INTENTIONAL plan change updates the pin in the
  * same commit. The q150 test proves its own sensitivity: stripping the
  * broadcast hint through the dev knob must add exchanges.
  */
class ExecutedPlanSpec extends SparkSuite {

  /** AdaptiveSparkPlanExec.toString appends the INITIAL plan after the
    * final one; every count below must run on the final section only or
    * each operator is double-counted. One definition (round-14 review). */
  private def cutInitial(s: String): String = {
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  private def finalPlan(df: DataFrame): String = {
    df.count()
    cutInitial(df.queryExecution.executedPlan.toString)
  }

  private def n(plan: String, token: String): Int =
    java.util.regex.Pattern.quote(token).r.findAllMatchIn(plan).length

  private def shuffles(plan: String): Int = n(plan, "Exchange hashpartitioning")

  /** The q150 candidate input — the persisted, materialized
    * [[Relational.coActivityUserSlots]] frame on the production path, so
    * the candidate subplan is measured with the partitioning AND the
    * accurate in-memory stats production has — the exact regime that
    * flipped the plan in round 13 when the hint was absent. */
  private lazy val uaCut: DataFrame = {
    val ua = Relational.coActivityUserSlots(
      Relational.coActivityPairs(spark, sf001), minCo = 26)
    ua.count()
    ua
  }

  test("q150 candidates (hinted): broadcast prefix join, no shuffle join, distinct adds no exchange") {
    val p = finalPlan(Relational.coActivityCandidates(uaCut, 26))
    assert(n(p, "BroadcastHashJoin") >= 1, s"prefix self-join must broadcast:\n$p")
    assert(n(p, "SortMergeJoin") == 0, s"no shuffle join on the 150-key slot_id:\n$p")
    // r18: the prefix is an in-row sort over the cached per-user arrays —
    // the slotFreq agg collects driver-side in its own action and the
    // window exchange is GONE, so the measured plan (prefix explode +
    // broadcast self-join + distinct riding the y side's user_id
    // partitioning) must add NO hash exchange at all; the only exchanges
    // the plan string may show are the ones inside the ua cache definition
    assert(shuffles(p) <= 2,
      s"expected no exchange beyond the ua cache definition prints (the " +
        s"distinct must ride hash(b)), got ${shuffles(p)}:\n$p")
  }

  test("q150 candidates: the hint wins when stats say don't-broadcast, and stripping it goes red") {
    // At sf0.01 everything fits the 10 MB broadcast threshold, so the
    // unhinted plan broadcasts anyway and no flip is visible. Model the
    // at-scale regime round 13 measured (accurate stats steering the
    // planner AWAY from broadcast) by disabling the threshold: the hint
    // must still pin the broadcast plan, and removing it (dev knob) must
    // add exchanges — proving the first test's invariant catches the flip.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val hinted = finalPlan(Relational.coActivityCandidates(uaCut, 26))
      assert(n(hinted, "BroadcastHashJoin") >= 1 && shuffles(hinted) <= 2,
        s"the explicit hint must override the stats regime:\n$hinted")
      val p = finalPlan(Relational.coActivityCandidates(uaCut, 26, nobcast = true))
      assert(shuffles(p) > 2,
        s"unhinted plan should shuffle the pair stream (the round-13 4.6x flip); " +
          s"if this starts planning clean, re-evaluate the hint:\n$p")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
  }

  test("q168 edge build: candidate join broadcasts, no sort-merge/nested-loop in the build plan") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // unique bucketCap -> unique layout name -> the build always executes
      Similarity.knnEdges(spark, sf001, k = 3, cap = 2000, bucketCap = 513)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      // the session (and so the listener) is SHARED across concurrently
      // running suites — other suites' dot_i queries land in the capture
      // queue too, so the filter must also match THIS build's unique
      // layout-table name (the bucketCap=513 CTAS), not just the kernel
      def build: Option[String] = {
        import scala.jdk.CollectionConverters._
        captured.asScala.find(p =>
          p.contains("dot_i") && p.contains("knnedges_3_2000_4s513"))
      }
      while (build.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      val p = cutInitial(
        build.getOrElse(fail("no captured plan contains the candidate join (dot_i)")))
      assert(n(p, "BroadcastHashJoin") >= 1,
        s"cap-bounded candidate sides must broadcast-join on (bucket, salt):\n$p")
      assert(n(p, "SortMergeJoin") == 0 && n(p, "NestedLoop") == 0 &&
        n(p, "CartesianProduct") == 0, s"no blowup joins in the edge build:\n$p")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q139 triangles: closing-edge probe stays an equi hash join — no unpinned nested-loop") {
    val p = finalPlan(Relational.triangleCounts(spark, sf001))
    // exactly ONE BroadcastNestedLoopJoin is the plan: marketBasket's 1-row
    // basket-count totals frame (bounded by construction). The regression
    // this pins — the closing-edge probe as an OR over orientations — would
    // plan a SECOND nested loop over edge-sized relations.
    assert(n(p, "BroadcastNestedLoopJoin") <= 1 && n(p, "CartesianProduct") == 0,
      s"the OR-over-orientations regression plans an extra nested loop:\n$p")
    assert(n(p, "BroadcastHashJoin") >= 1, s"degree/closing-edge joins broadcast:\n$p")
  }

  test("q169 bootstrap CI: one fact scan — dim join broadcasts, no shuffle join, pinned exchanges") {
    val p = finalPlan(Relational.bootstrapCi(spark, sf001))
    assert(n(p, "BroadcastHashJoin") >= 1, s"orders-customer dim join must broadcast:\n$p")
    assert(n(p, "SortMergeJoin") == 0 && n(p, "CartesianProduct") == 0,
      s"no shuffle join / cartesian on the fact path:\n$p")
    // the 64 replicate expressions ride ONE partial-agged (segment) shuffle;
    // anything above it is control-plane (1-row / segment-row frames)
    assert(shuffles(p) <= 2,
      s"expected at most 2 exchanges (segment agg + control plane), got ${shuffles(p)}:\n$p")
  }

  /** Capture every plan executed while `body` runs whose string satisfies
    * `want` — the q168 listener idiom, factored for the round-16 pins. The
    * session (and so the listener) is shared across concurrently running
    * suites, so `want` must identify the target query's plans by tokens
    * unique to it. */
  private def capturePlans(want: String => Boolean, atLeast: Int)
                          (body: => Unit): Seq[String] = {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def hits = captured.asScala.toSeq.filter(want)
      while (hits.size < atLeast && System.nanoTime() < deadline)
        Thread.sleep(100)
      // a drifted want-token must FAIL the pin, not make every downstream
      // foreach vacuously green (round-16 self-review #3)
      assert(hits.size >= atLeast,
        s"capturePlans: only ${hits.size} of $atLeast expected plans " +
          s"matched the filter within 30s — the identifying tokens have " +
          s"drifted; captured ${captured.size} plans total")
      hits.map(cutInitial)
    } finally spark.listenerManager.unregister(listener)
  }

  test("q175 LPA rounds: each round is one join + ONE plurality exchange; final plan is one join") {
    // round-16 VERDICT #6 / r18 reshape: each LPA round (identified by the
    // plurality ObjectHashAggregate over the lbl column — unique to q175 on
    // the shared session) must be ONE equi-join edges⋈labels + ONE
    // partial-agged plurality exchange — the r17 two-groupBy form paid a
    // second exchange and a join-back per round — and never a
    // sort-merge/nested-loop blowup. The returned frame must be cut down
    // to one broadcast size-join over a LogicalRDD, not a chained
    // re-analysis of every round (the q168 12× class).
    // rounds = 2 batches into ONE cut action (the every-second-round cut),
    // so one captured plan carries both rounds' plurality aggs
    val rounds = capturePlans(
      p => p.contains("ObjectHashAggregate") && p.contains("lbl#"),
      atLeast = 1) {
      val p = finalPlan(
        Similarity.lpaCommunities(spark, sf001, k = 3, cap = 2000, rounds = 2))
      assert(n(p, "BroadcastHashJoin") == 1 && n(p, "SortMergeJoin") == 0,
        s"the final frame is labels ⋈ broadcast(sizes), nothing else:\n$p")
      assert(shuffles(p) == 1,
        s"only the community-size agg may shuffle after the cuts:\n$p")
    }
    rounds.foreach { p =>
      // the captured string embeds the round's cached-subtree definition,
      // so counts run over the whole final section: the invariants are
      // no blowup joins anywhere and a bounded exchange budget (a chained
      // re-analysis, or a regression back to the two-groupBy + join-back
      // round, multiplies exchanges past this)
      assert(n(p, "SortMergeJoin") == 0 && n(p, "NestedLoop") == 0 &&
        n(p, "CartesianProduct") == 0, s"no blowup joins inside a round:\n$p")
      assert(n(p, "BroadcastHashJoin") >= 1,
        s"the label-update join must broadcast at this scale:\n$p")
      assert(shuffles(p) <= 4,
        s"a two-round batch is ONE plurality exchange per round (got " +
          s"${shuffles(p)}) — more is the two-groupBy/join-back or " +
          s"chained-plan shape:\n$p")
    }
  }

  test("q175 LPA: stripping the per-round cut goes red (the plan-chaining shape)") {
    // `nocut = true` is a call-site parameter (not a sys.prop), so a
    // concurrent suite's lpaCommunities keeps its load-bearing cut
    val p = finalPlan(
      Similarity.lpaCommunities(spark, sf001, k = 3, cap = 2000, rounds = 2,
        nocut = true))
    assert(n(p, "BroadcastHashJoin") + n(p, "SortMergeJoin") >= 3 ||
      shuffles(p) >= 2,
      s"without the cut the final action must execute the chained rounds " +
        s"(many joins/shuffles in ONE plan) — if this starts planning " +
        s"clean, re-evaluate the cut:\n$p")
  }

  test("q181 source select: ONE corpus scan feeds the cell-closure collect — no per-round re-scan, no shuffle join") {
    // round-17: the k per-round cache scans (and the persist they needed)
    // are GONE — the greedy walk runs driver-side over the (source-set →
    // term count) cell closure, so the whole query is ONE collect whose
    // plan must contain exactly the single corpus FileScan feeding the
    // collect_set aggregation (the q203/q206 single-materialization pin
    // idiom). A regression back to per-round Spark work would execute
    // extra plans with their own corpus scans / anti-joins.
    val plans = capturePlans(p => p.contains("collect_set"), atLeast = 1) {
      graft.operators.TextOps.sourceSelect(spark, sf001, k = 3)
    }
    plans.foreach { p =>
      assert(n(p, "FileScan parquet") <= 1,
        s"the cell closure is one corpus scan:\n$p")
      assert(n(p, "SortMergeJoin") == 0 && n(p, "CartesianProduct") == 0 &&
        n(p, "LeftAnti") == 0,
        s"no joins anywhere in the closure plan:\n$p")
    }
  }

  test("q203 DoReMi: the control-plane collect reads the persisted count frame — one corpus materialization, no branch re-scan") {
    // round-17 PLANS: unpersisted, the branched cap/recount subtrees
    // re-ran the corpus explode SIX times. The collect plan (identified
    // by the '<unk>' bucketing literal) must read the cache for every
    // count-frame reference; a FileScan may print only inside the
    // InMemoryRelation definition (the cache's own build — the one
    // corpus scan), never as a top-level operator.
    // the AQE print wraps cache reads as TableCacheQueryStage and elides
    // deep subtrees, so the robust invariant is the SCAN count: the whole
    // collect plan may contain at most the ONE FileScan inside the cache
    // definition — the unpersisted regression shape printed six
    val plans = capturePlans(p => p.contains("<unk>") &&
      (p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage")),
      atLeast = 1) {
      graft.operators.TextOps.doremiWeights(spark, sf001)
    }
    plans.foreach { p =>
      assert(n(p, "FileScan parquet") <= 1,
        s"at most one corpus scan (the cache build) may appear:\n$p")
    }
  }

  test("q206 PMI: one tagged-explode materialization feeds all four count-frame consumers; global cut is a TakeOrdered") {
    // pmiFrom collects the top-K internally (the doremiFrom leak-free
    // discipline), so the pin captures the INTERNAL collect's executed
    // plan — identified by the pmi_q alias. The print elides deep
    // broadcast subtrees, so pin the SCAN count: at most the one FileScan
    // inside the cache definition may appear — a branch re-scan
    // regression prints one per consumer
    val plans = capturePlans(p => p.contains("pmi_q") &&
      p.contains("TakeOrdered"), atLeast = 1) {
      graft.operators.TextOps.pmiCollocations(spark, sf001)
    }
    plans.foreach { p =>
      assert(n(p, "InMemoryTableScan") >= 1,
        s"the count-frame consumers must read the one materialization:\n$p")
      assert(n(p, "FileScan parquet") <= 1,
        s"at most one corpus scan (the cache build) may appear:\n$p")
    }
  }

  test("q154 sketch rollup: ONE cube Expand, no shuffle join — sketch merges ride the leaf cache") {
    // twice-deferred pin (VERDICT r16 #3, r17 #6): the exact audit must
    // stay ONE cube pass (a per-node count(distinct) regression would
    // multiply Expands or plan N scans), the lattice merges must read the
    // leaf cache, and nothing may plan a sort-merge/cartesian blowup.
    // Pinned on the FORMATTED static plan: the executed AQE print elides
    // completed-stage subtrees (the cube sits inside a stage reference),
    // while the formatted print dedups-but-lists every operator exactly
    // once — the N-scan / multiplied-Expand regression this guards is
    // structural, so the static shape is the right surface for it.
    val p = Relational.sketchRollup(spark, sf001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    // 1 Expand for the grouping sets; session state can add one more for
    // the distinct-agg rewrite — what the pin refuses is the per-node
    // count(distinct) regression, which multiplies Expands/scans past this
    assert(n(p, "Expand") >= 1 && n(p, "Expand") <= 2,
      s"the exact audit is ONE cube pass, got ${n(p, "Expand")} Expands:\n$p")
    assert(n(p, "SortMergeJoin") == 0 && n(p, "CartesianProduct") == 0,
      s"no shuffle join/cartesian in the lattice:\n$p")
    assert(n(p, "InMemoryTableScan") >= 2,
      s"lattice merges and the audit must read the el/leaf caches:\n$p")
  }

  test("q177 ALS rank-1: every cust-grain step rides the bucketed ratings layout — zero cust exchange") {
    // twice-deferred pin (VERDICT r16 #3, r17 #6): the layout table exists
    // so the per-step cust-keyed joins/aggs NEVER re-shuffle the rating
    // matrix — a lost bucket property (layout drift, cut reintroduced,
    // scan-partitioning regression) shows up as hashpartitioning(cust
    // exchanges. Item-grain steps are item-dim sized and may exchange.
    val p = finalPlan(Relational.alsRank1(spark, sf001))
    assert(n(p, "Exchange hashpartitioning(cust") == 0,
      s"cust-grain work must ride the bucketBy(cust) layout:\n$p")
    assert(n(p, "SortMergeJoin") == 0 && n(p, "CartesianProduct") == 0,
      s"no shuffle join/cartesian in the ALS steps:\n$p")
  }

  test("q133 market basket: a-priori prune is a broadcast semi-join — no unpinned nested-loop") {
    val p = finalPlan(Relational.marketBasket(spark, sf001))
    // the single allowed BroadcastNestedLoopJoin is the 1-row totals frame
    assert(n(p, "BroadcastNestedLoopJoin") <= 1 && n(p, "CartesianProduct") == 0, p)
    assert(n(p, "BroadcastHashJoin") >= 1, s"frequent-item prune should broadcast:\n$p")
    assert(n(p, "SortMergeJoin") == 0, s"basket self-pairing happens per order key, not by SMJ:\n$p")
  }
}
