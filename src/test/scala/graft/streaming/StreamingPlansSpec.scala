package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Physical-plan audit of the HEADLINE STREAMING queries (the batch twins are
  * covered by PLANS.md/RelationalSpec): the stateful path must shuffle exactly
  * once per stateful operator — an extra Exchange between the shuffle and the
  * state store would repartition every micro-batch forever, the streaming
  * equivalent of a scan-time regression.
  */
class StreamingPlansSpec extends SparkSuite {

  private def executedPlan(q: StreamingQuery): SparkPlan =
    q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution.executedPlan

  private def nodes(p: SparkPlan): Seq[String] =
    p.collect { case n => n.nodeName }

  private def run(df: DataFrame, name: String, mode: String = "append")(feed: => Unit): SparkPlan = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try { feed; q.processAllAvailable(); executedPlan(q) } finally q.stop()
  }

  private val t0 = 1700000000000L

  test("visitorStats streaming plan: one Exchange, partial agg before it, StateStoreSave after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String, String, String, Long, Long)]
    val deltas = ms.toDF().toDF("ar", "ch", "vc", "is_new", "pv_ct", "ts")
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withColumn("sv_ct", lit(0L)).withColumn("uv_ct", lit(0L))
      .withColumn("uj_ct", lit(0L)).withColumn("dur_sum", lit(0L))
    val plan = run(Pipelines.visitorStats(deltas), "plan_vs") {
      ms.addData(("110000", "web", "v1", "1", 1L, t0))
    }
    val ns = nodes(plan)
    assert(ns.contains("StateStoreSave"), s"windowed agg holds pane state: $ns")
    assert(ns.count((_ == "Exchange")) == 1,
      s"exactly ONE shuffle for the keyed window agg (no re-partitioning): $ns")
    // partial aggregation must run BEFORE the exchange (map-side combine):
    // in execution order (leaf→root), a HashAggregate precedes the Exchange
    val order = plan.collect { case n => n.nodeName }.reverse // leaves first
    val firstAgg = order.indexWhere(_.contains("Aggregate"))
    val firstExchange = order.indexWhere((_ == "Exchange"))
    assert(firstAgg >= 0 && firstAgg < firstExchange,
      s"partial agg upstream of the shuffle: ${order.mkString(" <- ")}")
  }

  test("orderWide streaming plan: StreamingSymmetricHashJoin fed by one Exchange per side") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msI = MemoryStream[OrderInfo]
    val msD = MemoryStream[OrderDetail]
    val plan = run(Pipelines.orderWide(msI.toDS(), msD.toDS()), "plan_ow") {
      msI.addData(OrderInfo(1L, 10L, 110L, BigDecimal("9.90"), t0))
      msD.addData(OrderDetail(100L, 1L, 7L, BigDecimal("9.90"), 1L, BigDecimal("9.90"), t0))
    }
    val ns = nodes(plan)
    assert(ns.contains("StreamingSymmetricHashJoin"), s"interval join is the streaming join: $ns")
    assert(ns.count((_ == "Exchange")) == 2,
      s"one shuffle per join side on the equi key, none after: $ns")
  }

  test("productStats streaming plan: union → single shuffle → windowed state, dims broadcast") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val clicks = ms.toDF().toDF("sku_id", "click_ct", "ts")
      .withColumn("event_time", timestamp_millis(col("ts"))).drop("ts")
    val sku = Seq((7L, "widget", 3L, 4L, 5L))
      .toDF("id", "sku_name", "spu_id", "tm_id", "category3_id")
    val spu = Seq((3L, "line")).toDF("id", "spu_name")
    val tm = Seq((4L, "acme")).toDF("id", "tm_name")
    val c3 = Seq((5L, "gadgets")).toDF("id", "name")
    val enriched = ProductStats.enrich(
      ProductStats.aggregate(ProductStats.unionDeltas(Seq(clicks))), sku, spu, tm, c3)
    val plan = run(enriched, "plan_ps") { ms.addData((7L, 1L, t0)) }
    val ns = nodes(plan)
    assert(ns.contains("StateStoreSave"), s"windowed agg state: $ns")
    assert(ns.count((_ == "Exchange")) == 1,
      s"ONE shuffle for the sku window agg; dim joins add none: $ns")
    assert(ns.count((_ == "BroadcastHashJoin")) == 4,
      s"all four dim enrichments broadcast: $ns")
  }

  test("stateful trio plan: FlatMapGroupsWithState behind exactly one Exchange") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val plan = run(Stateful.repairIsNew(ms.toDS()).toDF(), "plan_repair") {
      ms.addData(LogEvent("m1", "u", "ar", "ch", "vc", "1", Some("home"), None, Some(1L), t0))
    }
    val ns = nodes(plan)
    assert(ns.contains("FlatMapGroupsWithState"), ns.toString)
    assert(ns.count((_ == "Exchange")) == 1,
      s"keyed state = one hash shuffle on mid, nothing else: $ns")
  }
}
