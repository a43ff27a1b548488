package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics of the flatMapGroupsWithState operators, driven through
  * MemoryStream micro-batches so cross-batch state and event-time timeouts are
  * actually exercised (not the degenerate single-batch path).
  */
class StatefulSpec extends SparkSuite {

  import scala.language.implicitConversions

  private def ev(mid: String, ts: Long, isNew: String = "1",
                 lastPage: Option[String] = None, page: Option[String] = Some("home")): LogEvent =
    LogEvent(mid, s"u_$mid", "110000", "web", "v1", isNew, page, lastPage, Some(1000L), ts)

  private def withWatermarkDs(ms: MemoryStream[LogEvent]): Dataset[LogEvent] = {
    import spark.implicits._
    ms.toDS()
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "0 seconds")
      .as[LogEvent]
  }

  test("repairIsNew rewrites stale is_new=1 claims across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = Stateful.repairIsNew(ms.toDS()).writeStream
      .format("memory").queryName("repair_out").outputMode("append").start()
    try {
      val day1 = 1700000000000L // 2023-11-14
      val day2 = day1 + 86400000L
      ms.addData(ev("m1", day1, "1"), ev("m2", day1, "1"))
      q.processAllAvailable()
      ms.addData(ev("m1", day2, "1"), ev("m3", day2, "1")) // m1 is now a known device
      q.processAllAvailable()
      val out = spark.table("repair_out").as[LogEvent].collect()
      val byMidTs = out.map(e => (e.mid, e.ts) -> e.is_new).toMap
      assert(byMidTs(("m1", day1)) == "1") // first sighting keeps claim
      assert(byMidTs(("m1", day2)) == "0") // later-day claim repaired
      assert(byMidTs(("m2", day1)) == "1")
      assert(byMidTs(("m3", day2)) == "1")
    } finally if (q != null) q.stop()
  }

  test("repairIsNew: is_new=0 events never touch state (exact reference machine)") {
    // BaseLogApp.java:177-201 reads/writes firstVisitDateState ONLY inside the
    // is_new=="1" branch: a device first seen with is_new=0 is NOT marked, so
    // a later-day is_new=1 claim must be TRUSTED (it sets the state then)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = Stateful.repairIsNew(ms.toDS()).writeStream
      .format("memory").queryName("repair_zero_out").outputMode("append").start()
    try {
      val day1 = 1700000000000L
      val day2 = day1 + 86400000L
      ms.addData(ev("mz", day1, "0"))
      q.processAllAvailable()
      ms.addData(ev("mz", day2, "1")) // state still empty → claim trusted
      q.processAllAvailable()
      ms.addData(ev("mz", day2 + 86400000L, "1")) // now state=day2 → repaired
      q.processAllAvailable()
      val byTs = spark.table("repair_zero_out").as[LogEvent].collect()
        .map(e => e.ts -> e.is_new).toMap
      assert(byTs(day1) == "0")
      assert(byTs(day2) == "1", "is_new=0 must not have marked the device as seen")
      assert(byTs(day2 + 86400000L) == "0", "the trusted claim set the state")
    } finally q.stop()
  }

  /** transformWithState needs the RocksDB provider; the checkpoint-file
    * checksum path deadlocks in this container (round-1 note in
    * Stateful.scala) — run `body` with the provider on and checksums off,
    * under a watchdog so a resurfaced deadlock fails loudly instead of
    * hanging the suite. */
  private def withRocksDbTws(body: => Unit): Unit = {
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevChecksum = conf.getOption("spark.sql.streaming.checkpoint.fileChecksum.enabled")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try {
      var err: Option[Throwable] = None
      val worker = new Thread(() => try body catch { case t: Throwable => err = Some(t) })
      worker.setDaemon(true)
      worker.start()
      worker.join(180000L)
      assert(!worker.isAlive, "RocksDB/transformWithState micro-batches deadlocked (>180s)")
      err.foreach(throw _)
    } finally {
      prevProvider.fold(conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        conf.set("spark.sql.streaming.stateStore.providerClass", _))
      prevChecksum.fold(conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled"))(
        conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", _))
    }
  }

  test("repairIsNewTws (transformWithState + RocksDB) matches repairIsNew cross-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val day1 = 1700000000000L
      val day2 = day1 + 86400000L
      withRocksDbTws {
        q = Stateful.repairIsNewTws(ms.toDS()).writeStream
          .format("memory").queryName("repair_tws_out").outputMode("append").start()
        ms.addData(ev("m1", day1, "1"), ev("m2", day1, "1"))
        q.processAllAvailable()
        ms.addData(ev("m1", day2, "1"), ev("m3", day2, "1"))
        q.processAllAvailable()
      }
      val byMidTs = spark.table("repair_tws_out").as[LogEvent].collect()
        .map(e => (e.mid, e.ts) -> e.is_new).toMap
      // identical contract to the flatMapGroupsWithState twin above
      assert(byMidTs(("m1", day1)) == "1")
      assert(byMidTs(("m1", day2)) == "0", "cross-batch RocksDB state repaired the stale claim")
      assert(byMidTs(("m2", day1)) == "1")
      assert(byMidTs(("m3", day2)) == "1")
    } finally if (q != null) q.stop()
  }

  test("dailyUvTws (native TTLConfig) matches dailyUv's dedup contract cross-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val t0 = 1700000000000L
      withRocksDbTws {
        q = Stateful.dailyUvTws(ms.toDS()).writeStream
          .format("memory").queryName("uv_tws_out").outputMode("append").start()
        // ProcessingTime mode schedules batches continuously (TTL sweeps can
        // fire anytime), so processAllAvailable never quiesces — poll the sink
        def awaitRows(n: Long): Unit = {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (spark.table("uv_tws_out").count() < n && System.nanoTime() < deadline &&
            q.exception.isEmpty) Thread.sleep(200)
          q.exception.foreach(throw _)
        }
        ms.addData(
          ev("m1", t0),                                  // first entry: kept
          ev("m1", t0 + 1000),                           // same day: dropped
          ev("m1", t0 + 2000, lastPage = Some("home")))  // not an entry: dropped
        awaitRows(1)
        ms.addData(ev("m1", t0 + 5000), ev("m2", t0 + 5000)) // m1 dup cross-batch, m2 new
        awaitRows(2)
        // one extra poll round so a late wrong emission would still be caught
        Thread.sleep(1000)
      }
      val out = spark.table("uv_tws_out").as[LogEvent].collect()
      assert(out.map(e => (e.mid, e.ts)).toSet == Set(("m1", t0), ("m2", t0 + 5000)))
    } finally if (q != null) q.stop()
  }

  test("detectBouncesTws (event-time timers) emits the CEP timeout branch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val t0 = 1700000000000L
      withRocksDbTws {
        q = Stateful.detectBouncesTws(withWatermarkDs(ms), gapMillis = 10000L).writeStream
          .format("memory").queryName("bounce_tws_out").outputMode("append").start()
        ms.addData(
          ev("m1", t0),                                 // entry…
          ev("m1", t0 + 3000, lastPage = Some("home")), // …followed within 10 s: no bounce
          ev("m2", t0))                                 // entry, nothing after (yet)
        q.processAllAvailable()
        ms.addData(ev("m3", t0 + 60000)) // watermark passes m2's timer
        q.processAllAvailable()
        ms.addData(ev("m4", t0 + 120000)) // fires m3's timer too
        q.processAllAvailable()
      }
      val out = spark.table("bounce_tws_out").as[LogEvent].collect()
      assert(out.exists(e => e.mid == "m2" && e.ts == t0),
        s"m2's timer fired the timeout branch: ${out.toSeq}")
      assert(!out.exists(_.mid == "m1"), "m1 had a follow-up within gap: timer deleted")
    } finally if (q != null) q.stop()
  }

  test("streamingAsof matches the batch as-of join semantics cross-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Stateful.AsofEvent]
    val q = Stateful.streamingAsof(ms.toDS()).writeStream
      .format("memory").queryName("asof_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def view(u: Long, ts: Long, id: Long) = Stateful.AsofEvent(u, ts, Some(id), None)
      def buy(u: Long, ts: Long, id: Long) = Stateful.AsofEvent(u, ts, None, Some(id))
      ms.addData(
        view(1L, t0, 10L),
        view(1L, t0 + 1000, 11L),
        buy(1L, t0 + 2000, 100L),  // matches view 11
        buy(2L, t0, 200L),         // no prior view: null match
        view(3L, t0 + 500, 30L),
        buy(3L, t0 + 500, 300L))   // same-instant view matches (tie rule)
      q.processAllAvailable()
      // cross-batch: the latest-view STATE carries over
      ms.addData(buy(1L, t0 + 9000, 101L)) // still view 11
      ms.addData(view(1L, t0 + 10000, 12L), buy(1L, t0 + 11000, 102L))
      q.processAllAvailable()
      val got = spark.table("asof_out").as[Stateful.AsofMatch].collect()
        .map(m => m.purchase_id -> m.asof_view_id).toMap
      assert(got == Map(
        100L -> Some(11L), 200L -> None, 300L -> Some(30L),
        101L -> Some(11L), 102L -> Some(12L)), s"got $got")
    } finally q.stop()
  }

  test("repairIsNewTws restarts from a RocksDB checkpoint with state intact") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("tws-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("tws-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tws-ckpt").toString
    val day1 = 1700000000000L
    val day2 = day1 + 86400000L
    def logLine(mid: String, isNew: String, ts: Long): String =
      s"""{"mid":"$mid","uid":"u","ar":"1","ch":"web","vc":"v1","is_new":"$isNew","page_id":"home","during_time":1,"ts":$ts}"""
    def runOnce(): Unit = withRocksDbTws {
      val src = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[LogEvent].schema)
        .json(inDir).as[LogEvent]
      val q = Stateful.repairIsNewTws(src).toDF()
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "b1.jsonl"),
      java.util.Arrays.asList(logLine("t1", "1", day1)))
    runOnce()
    // restart: the day-2 claim can only be repaired if the RocksDB state
    // (firstVisitDate=day1) survived the checkpoint round-trip
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "b2.jsonl"),
      java.util.Arrays.asList(logLine("t1", "1", day2)))
    runOnce()
    val out = spark.read.json(outDir).collect()
      .map(r => r.getAs[Long]("ts") -> r.getAs[String]("is_new")).toMap
    assert(out == Map(day1 -> "1", day2 -> "0"),
      s"exactly-once + RocksDB state continuity across restart: $out")
  }

  test("dailyUv keeps only first session-entry per device per day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = Stateful.dailyUv(withWatermarkDs(ms)).writeStream
      .format("memory").queryName("uv_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      ms.addData(
        ev("m1", t0),                                  // first entry: kept
        ev("m1", t0 + 1000),                           // same day: dropped
        ev("m1", t0 + 2000, lastPage = Some("home")))  // not an entry: dropped
      q.processAllAvailable()
      ms.addData(ev("m1", t0 + 5000), ev("m2", t0 + 5000)) // m1 dup (cross-batch), m2 new
      q.processAllAvailable()
      val out = spark.table("uv_out").as[LogEvent].collect()
      assert(out.map(e => (e.mid, e.ts)).toSet == Set(("m1", t0), ("m2", t0 + 5000)))
    } finally q.stop()
  }

  test("detectBounces emits entries with no follow-up within gap, incl. via timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LogEvent]
    val q = Stateful.detectBounces(withWatermarkDs(ms), gapMillis = 10000L).writeStream
      .format("memory").queryName("bounce_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      ms.addData(
        ev("m1", t0),                                        // entry…
        ev("m1", t0 + 3000, lastPage = Some("home")),        // …followed within 10 s: no bounce
        ev("m2", t0))                                        // entry, nothing after (yet)
      q.processAllAvailable()
      // advance the watermark far past m2's gap via another device's event
      ms.addData(ev("m3", t0 + 60000))
      q.processAllAvailable()
      ms.addData(ev("m4", t0 + 120000))
      q.processAllAvailable()
      val out = spark.table("bounce_out").as[LogEvent].collect()
      assert(out.exists(e => e.mid == "m2" && e.ts == t0), s"m2 should bounce, got ${out.toSeq}")
      assert(!out.exists(_.mid == "m1"), "m1 had a follow-up within gap")
    } finally q.stop()
  }
}
