package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class PipelinesSpec extends SparkSuite {

  private val logSchema = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("ar", StringType), StructField("ch", StringType),
      StructField("vc", StringType), StructField("is_new", StringType),
      StructField("mid", StringType)))),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType), StructField("last_page_id", StringType),
      StructField("during_time", LongType)))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType), StructField("loading_time", LongType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("display_type", StringType), StructField("item", StringType),
      StructField("page_id", StringType))))),
    StructField("ts", LongType)))

  test("splitLog routes start/page/display with page_id injection") {
    val rows = Seq(
      Row(Row("110000", "web", "v1", "1", "m1"), null, Row("icon", 1200L), null, 1L),
      Row(Row("110000", "web", "v1", "1", "m1"),
        Row("good_detail", "home", 30L), null,
        Seq(Row("promo", "sku_9", null), Row("query", "sku_7", null)), 2L),
      Row(Row("120000", "app", "v2", "0", "m2"), Row("home", null, 10L), null, null, 3L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), logSchema)
    val (start, page, display) = Pipelines.splitLog(df)
    assert(start.count() == 1)
    assert(page.count() == 2)
    val d = display.collect()
    assert(d.length == 2)
    // page_id of the hosting page event is injected into each display row
    assert(d.forall(_.getStruct(d.head.fieldIndex("display"))
      .getAs[String]("page_id") == "good_detail"))
  }

  test("visitorStats closes 10s windows under watermark (streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String, String, String, Long, Long, Long, Long, Long, Long)]
    val deltas = ms.toDF().toDF(
      "ar", "ch", "vc", "is_new", "pv_ct", "sv_ct", "uv_ct", "uj_ct", "dur_sum", "ts")
      .withColumn("event_time", timestamp_millis(col("ts")))
    val out = Pipelines.visitorStats(deltas)
    val q = out.writeStream.format("memory").queryName("vs_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L // aligned enough: windows are [t0 floor 10s, +10s)
      ms.addData(
        ("110000", "web", "v1", "1", 1L, 0L, 1L, 0L, 30L, t0),
        ("110000", "web", "v1", "1", 1L, 1L, 0L, 0L, 40L, t0 + 1000))
      q.processAllAvailable()
      ms.addData(("110000", "web", "v1", "1", 1L, 0L, 0L, 0L, 5L, t0 + 60000)) // advance wm
      q.processAllAvailable()
      val res = spark.table("vs_out").collect()
      assert(res.length == 1, s"one closed window expected, got ${res.toSeq}")
      val r = res.head
      assert(r.getAs[Long]("pv_ct") == 2L)
      assert(r.getAs[Long]("sv_ct") == 1L)
      assert(r.getAs[Long]("dur_sum") == 70L)
      assert(r.getAs[String]("stt") == "2023-11-14 22:13:20") // 1700000000 epoch, 10s-aligned
    } finally q.stop()
  }

  test("parseRawLog: real reference-shaped JSON strings through the full split") {
    import spark.implicits._
    // shapes from the samples embedded at BaseLogApp.java:32-110
    val raw = Seq(
      """{"common":{"ar":"110000","uid":"47","os":"Android 9.0","ch":"oppo","is_new":"1","md":"m1","mid":"mid_10","vc":"v2.0.1","ba":"Xiaomi"},"start":{"entry":"icon","open_ad_skip_ms":0,"open_ad_ms":8632,"loading_time":4339,"open_ad_id":16},"ts":1608259485000}""",
      """{"common":{"ar":"110000","uid":"47","os":"Android 9.0","ch":"oppo","is_new":"1","md":"m1","mid":"mid_10","vc":"v2.0.1","ba":"Xiaomi"},"page":{"page_id":"good_detail","last_page_id":"home","during_time":11622,"item":"9","item_type":"sku_id","source_type":"promotion"},"displays":[{"display_type":"recommend","item":"3","item_type":"sku_id","pos_id":1,"order":1},{"display_type":"query","item":"5","item_type":"sku_id","pos_id":2,"order":2}],"ts":1608259490000}""",
      """not even json""")
      .toDF("value")
    val parsed = Pipelines.parseRawLog(raw)
    val (start, page, display) = Pipelines.splitLog(parsed)
    assert(start.count() == 1)
    // permissive mode: the garbage row parses to all-null → lands in "page" side
    assert(page.filter(col("common").isNotNull).count() == 1)
    val d = display.collect()
    assert(d.length == 2)
    assert(d.forall(_.getStruct(d.head.fieldIndex("display"))
      .getAs[String]("page_id") == "good_detail"))
    assert(start.select("common.mid").head.getString(0) == "mid_10")
  }

  test("keywordStats tokenizes search phrases into windowed counts (streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String, Long)]
    val pages = ms.toDF().toDF("page_id", "item", "ts")
      .withColumn("event_time", timestamp_millis(col("ts")))
    val q = Pipelines.keywordStats(pages).writeStream
      .format("memory").queryName("kw_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      ms.addData(("good_list", "spark 数据 engine", t0), ("good_list", "spark fast", t0 + 1000),
        ("home", "ignored", t0 + 2000))
      q.processAllAvailable()
      ms.addData(("good_list", "later", t0 + 60000))
      q.processAllAvailable()
      val res = spark.table("kw_out").collect()
        .map(r => r.getAs[String]("keyword") -> r.getAs[Long]("ct")).toMap
      assert(res("spark") == 2L)
      assert(res("数据") == 1L) // CJK bigram from the UDF tokenizer
      assert(res.values.forall(_ > 0) && !res.contains("ignored"))
    } finally q.stop()
  }

  test("keywordStatsForProduct crosses tokenizer with count unpivot, skipping zeros") {
    import spark.implicits._
    val ps = Seq(("w1", "w2", "super widget", 3L, 0L, 2L))
      .toDF("stt", "edt", "spu_name", "click_ct", "cart_ct", "order_ct")
    val out = Pipelines.keywordStatsForProduct(ps).collect()
      .map(r => (r.getAs[String]("keyword"), r.getAs[String]("source"), r.getAs[Long]("ct")))
    assert(out.toSet == Set(
      ("super", "CLICK", 3L), ("super", "ORDER", 2L),
      ("widget", "CLICK", 3L), ("widget", "ORDER", 2L)),
      s"zeros (CART) skipped, 2 tokens x 2 nonzero sources: ${out.toSeq}")
  }

  test("orderWide stream-stream interval join matches within the time band") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msI = MemoryStream[OrderInfo]
    val msD = MemoryStream[OrderDetail]
    val joined = Pipelines.orderWide(msI.toDS(), msD.toDS(), slackMillis = 5L)
    val q = joined.writeStream.format("memory").queryName("ow_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      msI.addData(OrderInfo(1L, 10L, 110L, BigDecimal("99.50"), t0))
      msD.addData(
        OrderDetail(100L, 1L, 7L, BigDecimal("99.50"), 1L, BigDecimal("99.50"), t0 + 3),
        OrderDetail(101L, 1L, 8L, BigDecimal("1.00"), 1L, BigDecimal("1.00"), t0 + 60000))
      q.processAllAvailable()
      // close watermarks
      msI.addData(OrderInfo(99L, 1L, 1L, BigDecimal("0.01"), t0 + 300000))
      msD.addData(OrderDetail(999L, 99L, 1L, BigDecimal("0.01"), 1L, BigDecimal("0.01"), t0 + 300001))
      q.processAllAvailable()
      val res = spark.table("ow_out").collect()
      val pairs = res.map(r => (r.getAs[Long]("id"), r.getAs[Long]("detail_id"))).toSet
      assert(pairs.contains((1L, 100L)), s"in-band detail should join: ${pairs}")
      assert(!pairs.contains((1L, 101L)), "out-of-band detail must not join")
    } finally q.stop()
  }

  test("orderWide left-outer emits unmatched orders with null details at watermark (A28)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msI = MemoryStream[OrderInfo]
    val msD = MemoryStream[OrderDetail]
    val joined = Pipelines.orderWide(msI.toDS(), msD.toDS(), slackMillis = 5L,
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("owl_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      msI.addData(
        OrderInfo(1L, 10L, 110L, BigDecimal("99.50"), t0),  // will match
        OrderInfo(2L, 11L, 111L, BigDecimal("5.00"), t0))   // never matches
      msD.addData(OrderDetail(100L, 1L, 7L, BigDecimal("99.50"), 1L, BigDecimal("99.50"), t0 + 3))
      q.processAllAvailable()
      msI.addData(OrderInfo(99L, 1L, 1L, BigDecimal("0.01"), t0 + 600000))
      msD.addData(OrderDetail(999L, 99L, 1L, BigDecimal("0.01"), 1L, BigDecimal("0.01"), t0 + 600000))
      q.processAllAvailable()
      val res = spark.table("owl_out").collect()
      val byId = res.groupBy(_.getAs[Long]("id"))
      assert(byId(1L).head.getAs[Long]("detail_id") == 100L)
      assert(byId.contains(2L), s"unmatched order must emit: ${res.toSeq}")
      assert(byId(2L).head.isNullAt(res.head.fieldIndex("detail_id")),
        "unmatched left row carries null right side")
    } finally q.stop()
  }

  test("session_window works in streaming with watermark-closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Double, Long)]
    val events = ms.toDF().toDF("user_id", "value", "ts")
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "0 seconds")
    val out = events
      .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"), col("session_window.start").as("stt"), col("events"))
    val q = out.writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      ms.addData((1L, 1.0, t0), (1L, 2.0, t0 + 60000), (1L, 3.0, t0 + 5400000)) // 2 sessions
      q.processAllAvailable()
      ms.addData((2L, 9.9, t0 + 90000000L)) // advance watermark far
      q.processAllAvailable()
      val res = spark.table("sess_out").filter(col("user_id") === 1L).collect()
      assert(res.map(_.getAs[Long]("events")).sorted.toSeq == Seq(1L, 2L),
        s"one 2-event session + one 1-event session: ${res.toSeq}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: declarative UV-dedup alternative (A17/D7)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)] // (mid, ts)
    val events = ms.toDF().toDF("mid", "ts")
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "10 seconds")
      .withColumn("dt", date_format(col("event_time"), "yyyy-MM-dd"))
    val out = events.dropDuplicatesWithinWatermark("mid", "dt")
    val q = out.writeStream.format("memory").queryName("ddw_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      ms.addData(("m1", t0), ("m1", t0 + 1000), ("m2", t0 + 2000))
      q.processAllAvailable()
      ms.addData(("m1", t0 + 3000)) // still duplicate within watermark
      q.processAllAvailable()
      val res = spark.table("ddw_out").collect().map(_.getAs[String]("mid"))
      assert(res.sorted.toSeq == Seq("m1", "m2"), s"one row per (mid, day): ${res.toSeq}")
    } finally q.stop()
  }

  test("stream-static dim join (A29): streaming facts enriched from a batch dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((110L, "Beijing"), (120L, "Shanghai")).toDF("id", "province_name")
    val ms = MemoryStream[(Long, Long, Long)] // order_id, province_id, ts
    val facts = ms.toDF().toDF("order_id", "province_id", "ts")
    // stream-static join = temporal join AS OF processing time: the dim
    // snapshot is re-read per micro-batch (SURVEY A29 verdict)
    val joined = facts.join(broadcast(dim), col("province_id") === col("id"), "left")
    val q = joined.writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      ms.addData((1L, 110L, 1L), (2L, 999L, 2L))
      q.processAllAvailable()
      val res = spark.table("ssj_out").collect()
      assert(res.find(_.getAs[Long]("order_id") == 1L).get
        .getAs[String]("province_name") == "Beijing")
      assert(res.find(_.getAs[Long]("order_id") == 2L).get
        .isNullAt(res.head.fieldIndex("province_name")), "unknown dim key → null enrichment")
    } finally q.stop()
  }

  test("paymentWide joins payments to orders within preceding 30 minutes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msP = MemoryStream[PaymentInfo]
    val msI = MemoryStream[OrderInfo]
    val msD = MemoryStream[OrderDetail]
    val ow = Pipelines.orderWide(msI.toDS(), msD.toDS())
    val joined = Pipelines.paymentWide(msP.toDS(), ow)
    val q = joined.writeStream.format("memory").queryName("pw_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      msI.addData(OrderInfo(1L, 10L, 110L, BigDecimal("99.50"), t0))
      msD.addData(OrderDetail(100L, 1L, 7L, BigDecimal("99.50"), 1L, BigDecimal("99.50"), t0))
      msP.addData(PaymentInfo(500L, 1L, "1102", BigDecimal("99.50"), t0 + 600000)) // +10 min
      q.processAllAvailable()
      msI.addData(OrderInfo(98L, 1L, 1L, BigDecimal("0.01"), t0 + 7200000))
      msD.addData(OrderDetail(998L, 98L, 1L, BigDecimal("0.01"), 1L, BigDecimal("0.01"), t0 + 7200000))
      msP.addData(PaymentInfo(999L, 98L, "1101", BigDecimal("0.01"), t0 + 7200000))
      q.processAllAvailable()
      val res = spark.table("pw_out").collect()
      assert(res.exists(r => r.getAs[Long]("payment_id") == 500L && r.getAs[Long]("detail_id") == 100L),
        s"payment 500 should enrich with order 1 lines: ${res.toSeq}")
    } finally q.stop()
  }
}
