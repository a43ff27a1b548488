package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end trace of the reference's VisitorStats path (SURVEY §3.1):
  * one app-log stream → stateful DWM operators (is_new repair, UV dedup,
  * bounce detection) → per-source delta rows → union → 10 s windowed DWS agg.
  *
  * Layering mirrors the reference: each layer is its own job connected by a
  * topic (here: collected micro-batch output), so the stateful stage runs as
  * a real streaming query and the DWS aggregation consumes its output.
  */
class VisitorStatsEndToEndSpec extends SparkSuite {

  private def ev(mid: String, ts: Long, isNew: String = "1",
                 lastPage: Option[String] = None, dur: Long = 10L): LogEvent =
    LogEvent(mid, s"u_$mid", "110000", "web", "v1", isNew, Some("home"), lastPage, Some(dur), ts)

  test("log stream → stateful DWM → union → windowed visitor stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L // 10s-aligned epoch

    def watermarked(ms: MemoryStream[LogEvent]): Dataset[LogEvent] =
      ms.toDS().withColumn("event_time", timestamp_millis(col("ts")))
        .withWatermark("event_time", "0 seconds").as[LogEvent]

    // --- DWM stage: three stateful streams off the same log ---
    val msLog = MemoryStream[LogEvent]
    val repaired = Stateful.repairIsNew(msLog.toDS())
    val msUv = MemoryStream[LogEvent]
    val uv = Stateful.dailyUv(watermarked(msUv))
    val msBounce = MemoryStream[LogEvent]
    val bounces = Stateful.detectBounces(watermarked(msBounce), gapMillis = 10000L)

    val qs = Seq(
      repaired.writeStream.format("memory").queryName("e2e_page").outputMode("append").start(),
      uv.writeStream.format("memory").queryName("e2e_uv").outputMode("append").start(),
      bounces.writeStream.format("memory").queryName("e2e_uj").outputMode("append").start())
    try {
      val batch = Seq(
        ev("m1", t0, "1"),                                  // entry; will bounce (no follow-up)
        ev("m2", t0 + 1000, "1"),                           // entry
        ev("m2", t0 + 3000, "1", lastPage = Some("home")),  // follow-up: m2 not a bounce
        ev("m3", t0 + 4000, "0"))                           // entry, old visitor
      Seq(msLog, msUv, msBounce).foreach(_.addData(batch: _*))
      qs.foreach(_.processAllAvailable())
      // advance watermark to fire bounce timeout + close nothing yet for agg
      val tick = ev("m9", t0 + 120000, "0")
      Seq(msLog, msUv, msBounce).foreach(_.addData(tick))
      qs.foreach(_.processAllAvailable())

      // --- delta construction (the per-source map steps) ---
      def deltas(tbl: String, pv: Int, sv: Int, uvc: Int, uj: Int) =
        spark.table(tbl).select(
          col("ar"), col("ch"), col("vc"), col("is_new"),
          lit(pv.toLong).as("pv_ct"),
          (when(col("last_page_id").isNull, sv.toLong).otherwise(0L)).as("sv_ct"),
          lit(uvc.toLong).as("uv_ct"), lit(uj.toLong).as("uj_ct"),
          // only the page stream carries duration (VisitorStatsApp.java:96-117)
          (if (pv > 0) coalesce(col("during_time"), lit(0L)) else lit(0L)).as("dur_sum"),
          timestamp_millis(col("ts")).as("event_time"))
      val unioned = deltas("e2e_page", 1, 1, 0, 0)
        .unionByName(deltas("e2e_uv", 0, 0, 1, 0).withColumn("sv_ct", lit(0L)))
        .unionByName(deltas("e2e_uj", 0, 0, 0, 1).withColumn("sv_ct", lit(0L)))

      // --- DWS stage: windowed aggregation (batch over the layer boundary) ---
      val stats = Pipelines.visitorStats(unioned)
        .filter(col("stt") === "2023-11-14 22:13:20") // the t0 window
        .collect()
      // two key groups in the window: is_new=1 (m1,m2) and is_new=0 (m3)
      assert(stats.length == 2, s"two key groups for the t0 window: ${stats.toSeq}")
      def total(c: String) = stats.map(_.getAs[Long](c)).sum
      assert(total("pv_ct") == 4L, "4 page views in window")
      assert(total("sv_ct") == 3L, "3 session entries")
      assert(total("uv_ct") == 3L, "3 unique visitors (m1,m2,m3)")
      assert(total("uj_ct") == 2L, "m1 and m3 bounced (entries with no follow-up)")
      assert(total("dur_sum") == 40L)
      val newGroup = stats.find(_.getAs[String]("is_new") == "1").get
      assert(newGroup.getAs[Long]("uv_ct") == 2L, "m1,m2 are new-visitor uniques")
    } finally qs.foreach(_.stop())
  }
}
