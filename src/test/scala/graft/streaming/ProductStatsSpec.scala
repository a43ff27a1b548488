package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ProductStatsSpec extends SparkSuite {

  test("7-way union + windowed agg with exact distinct order counts (streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    // two heterogeneous delta streams: clicks and orders
    val msClicks = MemoryStream[(Long, Long, Long)] // sku_id, click_ct, ts
    val clicks = msClicks.toDF().toDF("sku_id", "click_ct", "ts")
      .withColumn("event_time", timestamp_millis(col("ts"))).drop("ts")
    val msOrders = MemoryStream[(Long, Long, java.math.BigDecimal, Long, Long)]
    val orders = msOrders.toDF().toDF("sku_id", "order_id", "order_amount", "order_sku_num", "ts")
      .withColumn("order_amount", col("order_amount").cast("decimal(16,2)"))
      .withColumn("event_time", timestamp_millis(col("ts"))).drop("ts")
    val unioned = ProductStats.unionDeltas(Seq(clicks, orders))
    val out = ProductStats.aggregate(unioned)
    val q = out.writeStream.format("memory").queryName("ps_out").outputMode("append").start()
    try {
      msClicks.addData((7L, 1L, t0), (7L, 1L, t0 + 1000))
      msOrders.addData(
        (7L, 100L, new java.math.BigDecimal("10.50"), 2L, t0 + 2000),
        (7L, 100L, new java.math.BigDecimal("5.25"), 1L, t0 + 3000), // same order, 2nd line
        (7L, 101L, new java.math.BigDecimal("1.00"), 1L, t0 + 4000))
      q.processAllAvailable()
      msClicks.addData((9L, 1L, t0 + 60000)) // advance watermark, close window
      msOrders.addData((9L, 999L, new java.math.BigDecimal("0.01"), 1L, t0 + 60000))
      q.processAllAvailable()
      val res = spark.table("ps_out").filter(col("sku_id") === 7L).collect()
      assert(res.length == 1, s"one closed pane for sku 7: ${res.toSeq}")
      val r = res.head
      assert(r.getAs[Long]("click_ct") == 2L)
      assert(r.getAs[Long]("order_sku_num") == 4L)
      assert(r.getAs[Long]("order_ct") == 2L, "order 100 counted once despite 2 lines")
      assert(r.getAs[java.math.BigDecimal]("order_amount").compareTo(
        new java.math.BigDecimal("16.75")) == 0)
    } finally q.stop()
  }

  test("enrich: post-agg broadcast left joins attach dim attributes") {
    import spark.implicits._
    val stats = Seq((7L, 10L)).toDF("sku_id", "click_ct")
    val sku = Seq((7L, "widget", 3L, 4L, 5L))
      .toDF("id", "sku_name", "spu_id", "tm_id", "category3_id")
    val spu = Seq((3L, "widgets")).toDF("id", "spu_name")
    val tm = Seq((4L, "acme")).toDF("id", "tm_name")
    val c3 = Seq((5L, "gadgets")).toDF("id", "name")
    val out = ProductStats.enrich(stats, sku, spu, tm, c3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("sku_name") == "widget")
    assert(r.getAs[String]("spu_name") == "widgets")
    assert(r.getAs[String]("tm_name") == "acme")
    assert(r.getAs[String]("name") == "gadgets")
  }
}
