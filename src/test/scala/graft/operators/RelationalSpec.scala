package graft.operators

import graft.SparkSuite

/** Plan-shape assertions: at 100 TB the *plan* is the product — these tests pin
  * the properties that make the queries scale (pushdown, pruning, broadcast),
  * plus smoke row counts at sf0.001.
  */
class RelationalSpec extends SparkSuite {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Full (un-elided) formatted explain — plain toString truncates PushedFilters. */
  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("pricingSummary pushes the shipdate filter to the parquet scan") {
    val plan = formatted(Relational.pricingSummary(spark, sf0001))
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
  }

  test("filterProject prunes the scan to the 5 selected columns") {
    val plan = formatted(Relational.filterProject(spark, sf0001))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"),
      s"scan must not read unused columns: $readSchema")
    assert(plan.contains("GreaterThan(l_quantity,45.0)") && plan.contains("EqualTo(l_returnflag,R)"),
      plan)
  }

  test("starEnrichment broadcasts every dimension side") {
    val plan = physicalPlan(Relational.starEnrichment(spark, sf0001))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"customer/nation/region joins should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join expected at dim sizes")
  }

  test("orderLinesWindowJoin keeps the equi-key hash join with the band as post-filter") {
    val plan = physicalPlan(Relational.orderLinesWindowJoin(spark, sf0001))
    assert(plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"banded equi-join must not degrade to a cartesian:\n$plan")
  }

  test("topK aggregator ≡ row_number window, including ties") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic synthetic data with deliberate value ties inside groups
    val df = (0 until 500).map { i =>
      (i % 7, (i * 31 % 11).toDouble, i.toLong, (i * 13 % 97).toLong)
    }.toDF("g", "v", "id", "ct")
    val viaAgg = df.groupBy("g")
      .agg(graft.functions.Aggregators.topK(3, col("v"), col("id"), col("ct")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("g"), col("s.id").as("id"), col("s.p").as("ct"), (col("pos") + 1).as("rn"))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select(col("g"), col("id"), col("ct"), col("rn"))
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty,
      "bounded top-k aggregator must reproduce the window exactly")
  }

  test("smoke: every SparkEntry query runs, returns rows, and emits only driver-proven edge types at sf0.001") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      graft.SparkEntry.assertDriverSafeEdgeTypes(name, df.schema)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("edge-type gate: a decimal-emitting entry is rejected (the round-14 q200 incident)") {
    import org.apache.spark.sql.functions._
    val toy = spark.range(3).select(
      col("id"), col("id").cast("decimal(38,0)").as("gain"))
    val e = intercept[IllegalArgumentException] {
      graft.SparkEntry.assertDriverSafeEdgeTypes("toy_decimal", toy.schema)
    }
    assert(e.getMessage.contains("decimal") && e.getMessage.contains("q200"),
      s"the error must name the offending type and the precedent: ${e.getMessage}")
    // binary is equally unproven at the edge
    val toyBin = spark.range(3).select(col("id").cast("string").cast("binary").as("b"))
    intercept[IllegalArgumentException] {
      graft.SparkEntry.assertDriverSafeEdgeTypes("toy_binary", toyBin.schema)
    }
    ()
  }

  test("retentionCohorts: equals a driver-side replay; day-0 row per cohort covers all its users") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Relational.retentionCohorts(spark, sf0001)
      .select(col("cohort").cast("string"), col("day_offset"), col("active_users"))
      .as[(String, Int, Long)].collect().toSet
    val ud = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), to_date(col("event_time")).cast("string").as("d"))
      .as[(Long, String)].collect().toSet
    val first = ud.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val exp = ud.toSeq
      .map { case (u, d) => (first(u),
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(first(u)), java.time.LocalDate.parse(d)).toInt) }
      .groupBy(identity).map { case ((c, off), xs) => (c, off, xs.size.toLong) }.toSet
    assert(got == exp, s"missing=${exp -- got} extra=${got -- exp}")
    // every user appears in their cohort's day-0 row by definition
    val day0 = got.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    val cohortSizes = first.groupBy(_._2).map { case (c, us) => c -> us.size.toLong }
    assert(day0 == cohortSizes)
  }

  test("incrementalStats: delta-merge equals a one-pass full recompute") {
    import org.apache.spark.sql.functions._
    val full = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_type"), to_date(col("event_time")).as("event_date"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "event_date")
      .agg(count(lit(1)).as("ct"), sum(col("cents")).as("sum_cents"),
        max(col("cents")).as("max_cents"))
      .collect().toSet
    val inc = Relational.incrementalStats(spark, sf0001).collect().toSet
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("bucketedJoin: co-located SMJ with zero Exchange; equals the plain join") {
    // disable broadcast so the bucket property is what's under test — with it
    // on, a small orders side would broadcast and trivially show no Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import org.apache.spark.sql.functions._
    try {
      val df = Relational.bucketedJoin(spark, sf0001)
      val plan = physicalPlan(df)
      assert(plan.contains("SortMergeJoin"), plan)
      // the join must read bucket-aligned scans with no shuffle on either
      // join key (the final 4-group priority agg legitimately repartitions)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Bucketed: false"), plan)
      val plain = graft.Tables.load(spark, sf0001, "lineitem")
        .join(graft.Tables.load(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("line_ct"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"))
      assert(df.collect().toSet == plain.collect().toSet)
      // second call must take the catalog-reuse path (tables already exist)
      assert(Relational.bucketedJoin(spark, sf0001).collect().toSet == df.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("layoutTable: two concurrent first callers build exactly once (in-JVM race)") {
    import org.apache.spark.sql.functions._
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def call(): Long = Relational.layoutTable(spark, sf0001, "spec_conc", 4, "id") {
      builds.incrementAndGet()
      spark.range(100).toDF("id").withColumn("v", col("id") * 2)
    }.count()
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ts = Seq.fill(2)(new Thread(() =>
      try counts.add(call()) catch { case t: Throwable => errs.set(t) }))
    ts.foreach(_.start()); ts.foreach(_.join())
    Option(errs.get).foreach(t => throw t)
    assert(builds.get == 1, s"concurrent first callers must build once, built ${builds.get}")
    assert(counts.size == 2 && counts.stream().allMatch(_ == 100L))
  }

  test("layoutTable: a half-written layout (no commit marker) is rebuilt, not trusted") {
    import org.apache.spark.sql.functions._
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def call(): Set[org.apache.spark.sql.Row] =
      Relational.layoutTable(spark, sf0001, "spec_marker", 4, "id") {
        builds.incrementAndGet()
        spark.range(50).toDF("id").withColumn("v", col("id") + 7)
      }.collect().toSet
    val first = call()
    assert(builds.get == 1)
    assert(call() == first && builds.get == 1, "committed layout must be reused")
    // simulate a build that died between saveAsTable and the marker write:
    // the catalog entry exists, the data is garbage, the marker is absent
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), "graft_bucketed")
    val markers = java.nio.file.Files.walk(tmp).iterator()
    var found = false
    markers.forEachRemaining { p =>
      if (p.getFileName.toString == "spec_marker._graft_committed") {
        java.nio.file.Files.delete(p)
        found = true
        // corrupt the data dir the catalog points at
        val data = p.getParent.resolve("spec_marker")
        if (java.nio.file.Files.isDirectory(data)) {
          val fs = java.nio.file.Files.list(data).iterator()
          fs.forEachRemaining(f => if (!java.nio.file.Files.isDirectory(f))
            java.nio.file.Files.delete(f))
        }
      }
    }
    assert(found, "the commit marker must exist after a successful build")
    assert(call() == first, "rebuild must restore the exact layout content")
    assert(builds.get == 2, "a marker-less layout must trigger a rebuild")
  }

  test("ratingsBucketed: layout equals the direct fact-fact build; q147's " +
      "self-join on u is bucket-aligned (zero Exchange on the join key)") {
    import org.apache.spark.sql.functions._
    // value contract: the stored layout IS the (cust, item) matrix both
    // q147 and q177 would build from the raw facts
    val direct = graft.Tables.load(spark, sf0001, "lineitem")
      .join(graft.Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, sf0001, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("cust"), col("p_brand").as("item"))
      .agg(sum(col("l_quantity")).cast("long").as("r"), count(lit(1)).as("ct"))
      .collect().toSet
    val layout = Relational.ratingsBucketed(spark, sf0001)
    assert(layout.collect().toSet == direct)
    // plan contract: the per-customer co-occurrence self-join (q147's hot
    // path) must ride the buckets — no Exchange on the join key, both scans
    // bucketed (broadcast disabled so bucketing is what's under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val m = layout.select(col("cust").as("u"), col("item"), col("ct"))
      val co = m.select(col("u"), col("item").as("item_a"), col("ct").as("ca"))
        .join(m.select(col("u"), col("item").as("item_b"), col("ct").as("cb")),
          Seq("u"))
        .filter(col("item_a") =!= col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(sum(col("ca") * col("cb")).as("dot"))
      val plan = physicalPlan(co)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(u") &&
        !plan.contains("Exchange hashpartitioning(cust"),
        s"bucketed ratings self-join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Bucketed: false"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("entry flagship query returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("every query has a full oracle AND a bench-floor entry") {
    // round-4 ADVICE: queries missing from BENCH_FLOOR.json silently escape
    // the regression gate — pin the invariant in the suite
    val floor = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_FLOOR.json")), "UTF-8")
    val qs = graft.SparkEntry.queries.keySet
    val noFloor = qs.filterNot(q => floor.contains("\"" + q + "\""))
    assert(noFloor.isEmpty, s"queries without a bench floor: $noFloor")
    val noOracle = qs -- graft.SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without a DuckDB oracle: $noOracle")
  }

  test("skewProfile: top-10 heavy hitters with exact shares, ranked densely") {
    import spark.implicits._
    val out = Relational.skewProfile(spark, sf001)
      .as[(Long, Long, Double, Double, Int)].collect()
    assert(out.length == 10)
    assert(out.map(_._5).sorted.toSeq == (1 to 10), "ranks dense")
    val byRank = out.sortBy(_._5)
    assert(byRank.map(_._2).toSeq == byRank.map(_._2).sorted.reverse.toSeq, "counts descend")
    assert(out.map(_._3).sum <= 1.0)
    // cross-check the heavy hitters against a driver recount
    val counts = graft.Tables.load(spark, sf001, "events")
      .select("user_id").as[Long].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expectTop = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(byRank.map(r => (r._1, r._2)).toSeq == expectTop,
      "reported heavy hitters must match a driver recount")
    val nKeys = counts.size
    byRank.foreach(r => assert(r._4 == r._3 * nKeys, "skew_x = share * n_keys"))
  }

  test("percentilesApprox: each approx pN lies within the exact rank band N -/+ 2/accuracy") {
    import spark.implicits._
    val acc = 10000
    val approx = Relational.percentilesApprox(spark, sf001, acc)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(0.5 -> r._2, 0.9 -> r._3, 0.99 -> r._4)).toMap
    val byType = graft.Tables.load(spark, sf001, "events")
      .select($"event_type", $"value".cast("double")).as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == byType.keySet)
    for ((tpe, ps) <- approx; (q, got) <- ps) {
      val vals = byType(tpe)
      val n = vals.length
      def atRank(p: Double): Double =
        vals(math.min(n - 1, math.max(0, math.ceil(p * n).toInt - 1)))
      val (lo, hi) = (atRank(q - 2.0 / acc), atRank(q + 2.0 / acc))
      assert(got >= lo && got <= hi,
        s"$tpe p$q: approx $got outside exact rank band [$lo, $hi] (n=$n)")
    }
  }

  test("sessionFunnelSinglePass equals the chained join form row-for-row") {
    val chained = Relational.sessionFunnel(spark, sf001)
    val single = Relational.sessionFunnelSinglePass(spark, sf001)
    assert(chained.columns.toSeq == single.columns.toSeq, "schema drift between forms")
    assert(single.exceptAll(chained).isEmpty && chained.exceptAll(single).isEmpty,
      "single-pass funnel must reproduce the sequential v->c->p mins exactly, " +
        "including null chaining when an earlier stage is absent")
  }

  test("cmsHeavyHitters: never undercounts any key, matches a driver sketch replay, bounded error") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id")).as[Long].collect()
    val n = ids.length
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(r: Int, uid: Long): String = md5hex(s"${r}_$uid").substring(0, 2)
    // driver sketch: 4 rows x 256 md5-prefix cells, same derivation
    val cells = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    ids.foreach(u => (0 until 4).foreach { r =>
      val k = (r, bucket(r, u)); cells(k) = cells.getOrElse(k, 0L) + 1 })
    def est(uid: Long): Long = (0 until 4).map(r => cells((r, bucket(r, uid)))).min
    val exact = ids.groupBy(identity).map { case (u, xs) => u -> xs.length.toLong }
    // CMS theorem on every key in the fixture, not just the emitted top-10
    exact.foreach { case (u, c) =>
      assert(est(u) >= c, s"sketch must never undercount (key $u: est ${est(u)} < exact $c)") }
    val got = Relational.cmsHeavyHitters(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = exact.toSeq.sortBy { case (u, c) => (-c, u) }.take(10)
      .map { case (u, c) => (u, c, est(u), est(u) - c) }.toSet
    assert(got == want, "operator output must equal the driver sketch replay")
    got.foreach { case (u, _, _, over) =>
      assert(over >= 0 && over <= n / 64,
        s"key $u overcount $over outside the plausible CMS band for n=$n") }
  }
}
