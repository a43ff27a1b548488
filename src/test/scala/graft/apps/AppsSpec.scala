package graft.apps

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Wiring-level test of the app layer: chain the transforms the way the
  * reference chains jobs through Kafka topics, batch-driven. Stateful/windowed
  * internals have their own streaming specs; here the contract is topology —
  * topic names, schemas, and layer composition.
  */
class AppsSpec extends SparkSuite {

  private val t0 = 1700000000000L

  private def rawLog = {
    import spark.implicits._
    Seq(
      s"""{"common":{"ar":"110000","uid":"1","ch":"web","is_new":"1","mid":"m1","vc":"v1"},"start":{"entry":"icon","loading_time":100},"ts":$t0}""",
      s"""{"common":{"ar":"110000","uid":"1","ch":"web","is_new":"1","mid":"m1","vc":"v1"},"page":{"page_id":"good_list","item":"spark engine","item_type":"keyword","during_time":30},"ts":${t0 + 1000}}""",
      s"""{"common":{"ar":"120000","uid":"2","ch":"app","is_new":"0","mid":"m2","vc":"v1"},"page":{"page_id":"home","during_time":10},"displays":[{"display_type":"promo","item":"7","item_type":"sku_id"}],"ts":${t0 + 2000}}""",
      """garbage not json at all""")
      .toDF("value")
  }

  test("BaseLog → UniqueVisit → KeywordStats chain composes through topic maps") {
    val dwd = Apps.baseLog(Map("ods_base_log" -> rawLog))
    assert(dwd.keySet ==
      Set("dwd_start_log", "dwd_page_log", "dwd_display_log", "dwd_dirty_log"))
    assert(dwd("dwd_start_log").count() == 1)
    assert(dwd("dwd_page_log").count() == 2)
    assert(dwd("dwd_display_log").count() == 1)
    assert(dwd("dwd_dirty_log").count() == 1, "malformed line routes to dirty, not a crash")

    val uv = Apps.uniqueVisit(Map("dwd_page_log" -> dwd("dwd_page_log")))
    // both page events are session entries (no last_page_id) from distinct mids
    assert(uv("dwm_unique_visit").count() == 2)

    val kw = Apps.keywordStats(Map("dwd_page_log" -> dwd("dwd_page_log")))
    val kws = kw("dws_keyword_stats").collect()
      .map(r => r.getAs[String]("keyword") -> r.getAs[Long]("ct")).toMap
    assert(kws == Map("spark" -> 1L, "engine" -> 1L), s"got $kws")
  }

  test("OrderWide → PaymentWide → ProvinceStats chain with dim enrichment") {
    import spark.implicits._
    val info = Seq((1L, 10L, 110L, BigDecimal("99.50"), t0))
      .toDF("id", "user_id", "province_id", "total_amount", "create_ts")
    val detail = Seq((100L, 1L, 7L, BigDecimal("99.50"), 1L, BigDecimal("99.50"), t0))
      .toDF("id", "order_id", "sku_id", "order_price", "sku_num", "split_total_amount", "create_ts")
    val users = Seq((10L, "F", "1990-05-01")).toDF("id", "gender", "birthday")
    val provinces = Seq((110L, "Beijing", "110000", "CN-11"))
      .toDF("id", "name", "area_code", "iso_code")
    val skus = Seq((7L, "widget", 3L, 4L, 5L))
      .toDF("id", "sku_name", "spu_id", "tm_id", "category3_id")

    val ow = Apps.orderWide(Map(
      "dwd_order_info" -> info, "dwd_order_detail" -> detail,
      "dim_user_info" -> users, "dim_base_province" -> provinces,
      "dim_sku_info" -> skus))("dwm_order_wide")
    val owRow = ow.collect().head
    assert(owRow.getAs[String]("province_name") == "Beijing")
    assert(owRow.getAs[String]("sku_name") == "widget")
    assert(owRow.getAs[Long]("user_age") >= 35L) // born 1990, fixture-stable lower bound

    val pay = Seq((500L, 1L, "1102", BigDecimal("99.50"), t0 + 60000))
      .toDF("id", "order_id", "payment_type", "total_amount", "callback_ts")
    val pw = Apps.paymentWide(Map(
      "dwd_payment_info" -> pay, "dwm_order_wide" -> ow))("dwm_payment_wide")
    assert(pw.count() == 1)

    val ps = Apps.provinceStats(Map("dwm_order_wide" -> ow))("dws_province_stats")
    val p = ps.collect().head
    assert(p.getAs[Long]("order_count") == 1L)
    assert(p.getAs[java.math.BigDecimal]("order_amount")
      .compareTo(new java.math.BigDecimal("99.50")) == 0)
  }

  test("provinceStats streaming branch: approx distinct + watermark, windows close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val msI = MemoryStream[graft.streaming.OrderInfo]
    val msD = MemoryStream[graft.streaming.OrderDetail]
    val ow = Apps.orderWide(Map(
      "dwd_order_info" -> msI.toDF(), "dwd_order_detail" -> msD.toDF()))("dwm_order_wide")
      .withColumn("province_name", lit("P")).withColumn("area_code", lit("1"))
      .withColumn("iso_code", lit("CN-1"))
    val q = Apps.provinceStats(Map("dwm_order_wide" -> ow))("dws_province_stats")
      .writeStream.format("memory").queryName("pstats_out").outputMode("append").start()
    try {
      msI.addData(graft.streaming.OrderInfo(1L, 10L, 110L, BigDecimal("99.50"), t0))
      msD.addData(graft.streaming.OrderDetail(100L, 1L, 7L, BigDecimal("99.50"), 1L,
        BigDecimal("99.50"), t0))
      q.processAllAvailable()
      msI.addData(graft.streaming.OrderInfo(99L, 1L, 1L, BigDecimal("0.01"), t0 + 600000))
      msD.addData(graft.streaming.OrderDetail(999L, 99L, 1L, BigDecimal("0.01"), 1L,
        BigDecimal("0.01"), t0 + 600000))
      q.processAllAvailable()
      val res = spark.table("pstats_out").filter(col("province_id") === 110L).collect()
      assert(res.length == 1, s"one closed pane: ${res.toSeq}")
      assert(res.head.getAs[Long]("order_count") == 1L) // HLL exact at cardinality 1
    } finally q.stop()
  }

  test("VisitorStats / ProductStats / KeywordStats4Product app wrappers compose") {
    import spark.implicits._
    val deltas = Seq(
      ("110000", "web", "v1", "1", 1L, 1L, 0L, 0L, 30L, t0),
      ("110000", "web", "v1", "1", 1L, 0L, 1L, 0L, 40L, t0 + 1000))
      .toDF("ar", "ch", "vc", "is_new", "pv_ct", "sv_ct", "uv_ct", "uj_ct", "dur_sum", "ts")
      .withColumn("event_time", timestamp_millis(col("ts"))).drop("ts")
    val vs = Apps.visitorStats(Map("pv" -> deltas))("dws_visitor_stats").collect()
    assert(vs.length == 1 && vs.head.getAs[Long]("pv_ct") == 2L)

    val clicks = Seq((7L, 1L, t0)).toDF("sku_id", "click_ct", "ts")
      .withColumn("event_time", timestamp_millis(col("ts"))).drop("ts")
    val sku = Seq((7L, "super widget", 3L, 4L, 5L))
      .toDF("id", "sku_name", "spu_id", "tm_id", "category3_id")
    val spu = Seq((3L, "super widget line")).toDF("id", "spu_name")
    val tm = Seq((4L, "acme")).toDF("id", "tm_name")
    val c3 = Seq((5L, "gadgets")).toDF("id", "name")
    val ps = Apps.productStats(Map(
      "dwd_click" -> clicks, "dim_sku_info" -> sku, "dim_spu_info" -> spu,
      "dim_base_trademark" -> tm, "dim_base_category3" -> c3))("dws_product_stats")
    val psRow = ps.collect().head
    assert(psRow.getAs[String]("spu_name") == "super widget line")

    val kw = Apps.keywordStats4Product(Map("dws_product_stats" -> ps))
    val kws = kw("dws_keyword_stats_product").collect()
      .map(r => (r.getAs[String]("keyword"), r.getAs[String]("source"))).toSet
    assert(kws.contains(("super", "CLICK")) && kws.contains(("widget", "CLICK")),
      s"spu_name tokens cross the nonzero count sources: $kws")
  }

  test("UserJumpDetail app wrapper detects in-batch bounces") {
    val dwd = Apps.baseLog(Map("ods_base_log" -> rawLog))
    val uj = Apps.userJumpDetail(Map("dwd_page_log" -> dwd("dwd_page_log")))
    // batch mode: only gap-proven bounces emit (no timeout); both fixture page
    // events are single-visit entries with no follow-up -> none provable in-batch
    assert(uj("dwm_user_jump_detail").count() == 0)
  }

  test("BaseDB app splits facts (dynamic topic) from dims") {
    import spark.implicits._
    val cdc = Seq(
      ("gmall", "order_info", "insert", 1L, """{"id":"1","user_id":"7","total_amount":"9.9"}"""),
      ("gmall", "user_info", "insert", 2L, """{"id":"5","name":"a"}"""))
      .toDF("database", "table", "type", "ts", "data")
    val cfg = Seq(
      ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount", null.asInstanceOf[String]),
      ("user_info", "insert", "hbase", "dim_user_info", "id,name", "id"))
      .toDF("source_table", "operate_type", "sink_type", "sink_table", "sink_columns", "sink_pk")
    val out = Apps.baseDb(Map("ods_base_db_m" -> cdc, "table_process" -> cfg))
    assert(out("kafka_facts").select("topic").head.getString(0) == "dwd_order_info")
    assert(out("hbase_dims").select("sink_pk").head.getString(0) == "id")
  }
}
