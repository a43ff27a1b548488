package graft.apps

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Runnable-app layer: end-to-end file-bound jobs through [[Mains.start]],
  * including the D8/D10 recovery contract — stop a streaming app, restart it
  * from its checkpoint, and observe exactly-once output AND keyed-state
  * continuity across the restart.
  */
class MainsSpec extends SparkSuite {

  private val day1 = 1700000000000L // 2023-11-14
  private val day2 = day1 + 86400000L // next day

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def logLine(mid: String, isNew: String, ts: Long, pageId: String = "home"): String =
    s"""{"common":{"ar":"110000","uid":"u-$mid","ch":"web","is_new":"$isNew","mid":"$mid","vc":"v1"},"page":{"page_id":"$pageId","during_time":30},"ts":$ts}"""

  /** Run `body` with the given state API selected (v2 ⇒ tws twins on RocksDB,
    * configured by Mains.start from the same conf key a deployment would set). */
  private def withStateApi(api: String)(body: => Unit): Unit = {
    spark.conf.set("spark.graft.stateApi", api)
    try body finally spark.conf.unset("spark.graft.stateApi")
  }

  for (api <- Seq("v1", "v2"))
    test(s"base_log restarts from checkpoint on state API $api: " +
      "exactly-once output + state continuity") { withStateApi(api) { restartBody() } }

  private def restartBody(): Unit = {
    val inDir = tmp("mains-in"); val outDir = tmp("mains-out"); val ckptDir = tmp("mains-ckpt")
    val srcDir = new java.io.File(s"$inDir/ods_base_log"); srcDir.mkdirs()

    // ---- run 1: m1's first-ever visit on day1 (is_new=1 is genuine) ----
    Files.write(new java.io.File(srcDir, "batch1.txt").toPath,
      java.util.Arrays.asList(
        logLine("m1", "1", day1),
        logLine("m2", "0", day1 + 1000L)))
    Mains.start(spark, "base_log", inDir, outDir, ckptDir).foreach(_.awaitTermination())

    val pageAfterRun1 = spark.read.json(s"$outDir/dwd_page_log")
    assert(pageAfterRun1.count() == 2)
    assert(pageAfterRun1.filter(col("mid") === "m1").head.getAs[String]("is_new") == "1",
      "day1 first visit keeps its genuine is_new=1")

    // ---- kill + restart: new file, same checkpoints ----
    // m1 claims is_new=1 again on day2 — only the CHECKPOINTED state (first
    // visit day1) can prove the claim stale; a fresh state store would trust it.
    Files.write(new java.io.File(srcDir, "batch2.txt").toPath,
      java.util.Arrays.asList(logLine("m1", "1", day2)))
    Mains.start(spark, "base_log", inDir, outDir, ckptDir).foreach(_.awaitTermination())

    val page = spark.read.json(s"$outDir/dwd_page_log")
    assert(page.count() == 3, s"exactly-once: batch1 rows are NOT reprocessed (${page.count()})")
    val m1ByTs = page.filter(col("mid") === "m1").collect()
      .map(r => r.getAs[Long]("ts") -> r.getAs[String]("is_new")).toMap
    assert(m1ByTs == Map(day1 -> "1", day2 -> "0"),
      s"state survived the restart: day2 claim repaired to 0 (got $m1ByTs)")
  }

  test("kill MID-stream: stop with input still unprocessed, restart finishes exactly-once") {
    val inDir = tmp("kill-in"); val outDir = tmp("kill-out"); val ckptDir = tmp("kill-ckpt")
    val srcDir = new java.io.File(s"$inDir/ods_base_log"); srcDir.mkdirs()
    val n = 12
    (0 until n).foreach { i =>
      Files.write(new java.io.File(srcDir, f"f$i%02d.txt").toPath,
        java.util.Arrays.asList(logLine(s"k$i", "0", day1 + i * 1000L)))
    }
    // one file per micro-batch → the run is a sequence of 12 batches per query;
    // stop() the moment the first batches commit, leaving most files pending
    val qs = Mains.start(spark, "base_log", inDir, outDir, ckptDir,
      sourceOptions = Map("maxFilesPerTrigger" -> "1"))
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!qs.exists(q => Option(q.lastProgress).exists(_.batchId >= 1)) &&
        System.nanoTime() < deadline) Thread.sleep(20)
    } finally qs.foreach(_.stop())
    val partial = spark.read.schema(Mains.Wire.logEvent).json(s"$outDir/dwd_page_log").count()
    assert(partial < n, s"killed mid-stream: only $partial of $n files processed")

    // restart from the same checkpoints: remaining files drain, nothing twice
    Mains.start(spark, "base_log", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    val page = spark.read.json(s"$outDir/dwd_page_log")
    assert(page.count() == n, s"all $n events present after restart")
    assert(page.select("mid").distinct().count() == n, "no event delivered twice")
  }

  test("unique_visit and user_jump_detail run END-TO-END on state API v2 (tws)") {
    withStateApi("v2") {
      // unique_visit: two visits by one device on one day → one UV row
      val uvIn = tmp("uv2-in"); val uvOut = tmp("uv2-out"); val uvCk = tmp("uv2-ck")
      val pageDir = new java.io.File(s"$uvIn/dwd_page_log"); pageDir.mkdirs()
      def pageRow(mid: String, ts: Long, lastPage: String): String = {
        val lp = if (lastPage == null) "null" else s""""$lastPage""""
        s"""{"mid":"$mid","uid":"u-$mid","ar":"1","ch":"web","vc":"v1","is_new":"0","page_id":"home","last_page_id":$lp,"during_time":10,"ts":$ts}"""
      }
      Files.write(new java.io.File(pageDir, "b.jsonl").toPath, java.util.Arrays.asList(
        pageRow("mT", day1, null), pageRow("mT", day1 + 5000L, null)))
      // the tws uniqueVisit runs in ProcessingTime mode (native TTL contract),
      // and a ProcessingTime transformWithState does NOT self-terminate under
      // Trigger.AvailableNow — it keeps scheduling micro-batches while TTL
      // timers are pending. Poll the sink and stop, exactly like the
      // StatefulTws specs; awaitTermination would hang forever here.
      val uvQs = Mains.start(spark, "unique_visit", uvIn, uvOut, uvCk)
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        def uvRows(): Long =
          try spark.read.json(s"$uvOut/dwm_unique_visit")
            .filter(col("mid").isNotNull).count()
          catch { case _: org.apache.spark.sql.AnalysisException => 0L } // sink not created yet
        while (uvRows() < 1 && uvQs.forall(_.exception.isEmpty) &&
          System.nanoTime() < deadline) Thread.sleep(100)
        uvQs.flatMap(_.exception).foreach(throw _)
      } finally uvQs.foreach(_.stop())
      val uv = spark.read.json(s"$uvOut/dwm_unique_visit")
      assert(uv.collect().map(_.getAs[String]("mid")).toSeq == Seq("mT"),
        "native-TTL tws dedup: one row per device-day")

      // user_jump_detail: unanswered entry bounces via a REAL event-time timer
      val ujIn = tmp("uj2-in"); val ujOut = tmp("uj2-out"); val ujCk = tmp("uj2-ck")
      val ujPage = new java.io.File(s"$ujIn/dwd_page_log"); ujPage.mkdirs()
      Files.write(new java.io.File(ujPage, "b.jsonl").toPath, java.util.Arrays.asList(
        pageRow("mJ2", day1, null),               // entry, never followed → bounce
        pageRow("mW2", day1 + 60000L, "home")))   // watermark driver
      Mains.start(spark, "user_jump_detail", ujIn, ujOut, ujCk).foreach(_.awaitTermination())
      Files.write(new java.io.File(ujPage, "b2.jsonl").toPath, java.util.Arrays.asList(
        pageRow("mW2", day1 + 120000L, "home")))  // advance watermark → timer fires
      Mains.start(spark, "user_jump_detail", ujIn, ujOut, ujCk).foreach(_.awaitTermination())
      val uj = spark.read.json(s"$ujOut/dwm_user_jump_detail")
      assert(uj.select("mid").collect().map(_.getString(0)).toSet == Set("mJ2"),
        "tws event-time timer emitted exactly the timed-out entry")
    }
  }

  test("base_log repairs is_new BEFORE the split: start events carry it too") {
    val inDir = tmp("mains-in"); val outDir = tmp("mains-out"); val ckptDir = tmp("mains-ckpt")
    val srcDir = new java.io.File(s"$inDir/ods_base_log"); srcDir.mkdirs()
    val startLine =
      s"""{"common":{"ar":"1","uid":"u","ch":"web","is_new":"1","mid":"m9","vc":"v1"},"start":{"entry":"icon","loading_time":10},"ts":$day2}"""
    Files.write(new java.io.File(srcDir, "b1.txt").toPath,
      java.util.Arrays.asList(logLine("m9", "1", day1), startLine))
    Mains.start(spark, "base_log", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    val start = spark.read.json(s"$outDir/dwd_start_log")
    assert(start.count() == 1)
    assert(start.head.getAs[org.apache.spark.sql.Row]("common").getAs[String]("is_new") == "0",
      "the day2 start event's stale is_new=1 is repaired pre-split (BaseLogApp order)")
  }

  test("visitor_stats windows close across drain runs (watermark from checkpoint)") {
    val inDir = tmp("vs-in"); val outDir = tmp("vs-out"); val ckptDir = tmp("vs-ckpt")
    val pv = new java.io.File(s"$inDir/pv"); pv.mkdirs()
    def delta(ts: Long, pvCt: Long): String =
      s"""{"ar":"110000","ch":"web","vc":"v1","is_new":"1","pv_ct":$pvCt,"sv_ct":0,"uv_ct":0,"uj_ct":0,"dur_sum":5,"event_time":"${java.time.Instant.ofEpochMilli(ts)}"}"""
    Files.write(new java.io.File(pv, "b1.jsonl").toPath,
      java.util.Arrays.asList(delta(day1, 1), delta(day1 + 1000, 1)))
    Mains.start(spark, "visitor_stats", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    // pane [day1, day1+10s) is still open: nothing may emit yet (append mode)
    val afterRun1 = spark.read.schema("stt string, pv_ct long").json(s"$outDir/dws_visitor_stats")
    assert(afterRun1.count() == 0, "open pane must not emit in append mode")

    // second run: an event 30 s later pushes the checkpointed watermark past the pane
    Files.write(new java.io.File(pv, "b2.jsonl").toPath,
      java.util.Arrays.asList(delta(day1 + 30000, 1)))
    Mains.start(spark, "visitor_stats", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    val closed = spark.read.json(s"$outDir/dws_visitor_stats")
    assert(closed.count() == 1, "exactly the first pane closed")
    assert(closed.head.getAs[Long]("pv_ct") == 2L, "both day1 rows aggregated once")
  }

  test("base_log output chains into unique_visit and keyword_stats through files") {
    val inDir = tmp("chain-in"); val outDir = tmp("chain-out"); val ckptDir = tmp("chain-ckpt")
    val srcDir = new java.io.File(s"$inDir/ods_base_log"); srcDir.mkdirs()
    val searchLine =
      s"""{"common":{"ar":"1","uid":"u1","ch":"web","is_new":"1","mid":"mA","vc":"v1"},"page":{"page_id":"good_list","item":"spark engine","item_type":"keyword","during_time":30},"ts":$day1}"""
    Files.write(new java.io.File(srcDir, "b.txt").toPath, java.util.Arrays.asList(
      logLine("mA", "1", day1 - 1000L), searchLine, logLine("mB", "0", day1 + 1000L)))
    Mains.start(spark, "base_log", inDir, outDir, ckptDir).foreach(_.awaitTermination())

    // the DWD page topic (file dir) IS the next layer's source — same as Kafka
    val uvOut = tmp("uv-out")
    Mains.start(spark, "unique_visit", outDir, uvOut, ckptDir).foreach(_.awaitTermination())
    val uv = spark.read.json(s"$uvOut/dwm_unique_visit")
    assert(uv.select("mid").collect().map(_.getString(0)).toSet == Set("mA", "mB"),
      "one first-visit row per device")

    val kwOut = tmp("kw-out")
    Mains.start(spark, "keyword_stats", outDir, kwOut, ckptDir).foreach(_.awaitTermination())
    // windowed agg: the pane is still open after one drain (watermark
    // semantics); only SEARCH events advance keywordStats' watermark (the
    // page filter precedes it), so run 2 feeds a later search event
    val srcDir2 = new java.io.File(s"$inDir/ods_base_log")
    Files.write(new java.io.File(srcDir2, "b2.txt").toPath, java.util.Arrays.asList(
      s"""{"common":{"ar":"1","uid":"u9","ch":"web","is_new":"0","mid":"mC","vc":"v1"},"page":{"page_id":"good_list","item":"later probe","item_type":"keyword","during_time":5},"ts":${day1 + 600000L}}"""))
    Mains.start(spark, "base_log", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    Mains.start(spark, "keyword_stats", outDir, kwOut, ckptDir).foreach(_.awaitTermination())
    val kw = spark.read.json(s"$kwOut/dws_keyword_stats")
    val kws = kw.collect().map(r => r.getAs[String]("keyword")).toSet
    assert(kws == Set("spark", "engine"), s"tokenized search keywords in closed pane: $kws")
  }

  test("remaining apps launch file-bound: user_jump, product_stats chain, province_stats") {
    // --- user_jump_detail over a directly-written page topic ---
    val ujIn = tmp("uj-in"); val ujOut = tmp("uj-out"); val ujCk = tmp("uj-ck")
    val pageDir = new java.io.File(s"$ujIn/dwd_page_log"); pageDir.mkdirs()
    def pageRow(mid: String, ts: Long, lastPage: String): String = {
      val lp = if (lastPage == null) "null" else s""""$lastPage""""
      s"""{"mid":"$mid","uid":"u-$mid","ar":"1","ch":"web","vc":"v1","is_new":"0","page_id":"home","last_page_id":$lp,"during_time":10,"ts":$ts}"""
    }
    Files.write(new java.io.File(pageDir, "b.jsonl").toPath, java.util.Arrays.asList(
      pageRow("mJ", day1, null),                   // entry, no follow-up → bounce via timeout
      pageRow("mK", day1, null),                   // entry…
      pageRow("mK", day1 + 3000L, "home"),         // …followed within 10 s: not a bounce
      pageRow("mW", day1 + 60000L, "home")))       // watermark driver past mJ's gap
    Mains.start(spark, "user_jump_detail", ujIn, ujOut, ujCk).foreach(_.awaitTermination())
    // the timeout fires once a LATER batch advances the watermark
    Files.write(new java.io.File(pageDir, "b2.jsonl").toPath, java.util.Arrays.asList(
      pageRow("mW", day1 + 120000L, "home")))
    Mains.start(spark, "user_jump_detail", ujIn, ujOut, ujCk).foreach(_.awaitTermination())
    val uj = spark.read.json(s"$ujOut/dwm_user_jump_detail")
    assert(uj.select("mid").collect().map(_.getString(0)).toSet == Set("mJ"),
      "only the unanswered session entry bounces")

    // --- product_stats (delta + dims) chained into keyword_stats_product ---
    val psIn = tmp("ps-in"); val psOut = tmp("ps-out"); val psCk = tmp("ps-ck")
    val clickDir = new java.io.File(s"$psIn/dwd_click"); clickDir.mkdirs()
    def delta(ts: Long): String =
      s"""{"sku_id":7,"click_ct":1,"event_time":"${java.time.Instant.ofEpochMilli(ts)}"}"""
    Files.write(new java.io.File(clickDir, "b.jsonl").toPath,
      java.util.Arrays.asList(delta(day1), delta(day1 + 1000L)))
    def dim(topic: String, rows: String*): Unit = {
      val d = new java.io.File(s"$psIn/$topic"); d.mkdirs()
      Files.write(new java.io.File(d, "d.jsonl").toPath, java.util.Arrays.asList(rows: _*))
    }
    dim("dim_sku_info", """{"id":7,"sku_name":"widget","spu_id":3,"tm_id":4,"category3_id":5}""")
    dim("dim_spu_info", """{"id":3,"spu_name":"super widget"}""")
    dim("dim_base_trademark", """{"id":4,"tm_name":"acme"}""")
    dim("dim_base_category3", """{"id":5,"name":"gadgets"}""")
    Mains.start(spark, "product_stats", psIn, psOut, psCk).foreach(_.awaitTermination())
    Files.write(new java.io.File(clickDir, "b2.jsonl").toPath,
      java.util.Arrays.asList(delta(day1 + 60000L))) // closes the first pane
    Mains.start(spark, "product_stats", psIn, psOut, psCk).foreach(_.awaitTermination())
    val ps = spark.read.schema(Mains.Wire.productStats(spark)).json(s"$psOut/dws_product_stats")
    val psRow = ps.collect()
    assert(psRow.length == 1 && psRow.head.getAs[String]("spu_name") == "super widget" &&
      psRow.head.getAs[Long]("click_ct") == 2L, s"enriched closed pane: ${psRow.toSeq}")

    val kwOut = tmp("kwp-out")
    Mains.start(spark, "keyword_stats_product", psOut, kwOut, psCk).foreach(_.awaitTermination())
    val kw = spark.read.json(s"$kwOut/dws_keyword_stats_product")
    assert(kw.collect().map(r => (r.getAs[String]("keyword"), r.getAs[String]("source"))).toSet
      .contains(("widget", "CLICK")), "spu tokens crossed the unpivot")

    // --- province_stats over a directly-written order-wide topic ---
    val pvIn = tmp("pv-in"); val pvOut = tmp("pv-out"); val pvCk = tmp("pv-ck")
    val owDir = new java.io.File(s"$pvIn/dwm_order_wide"); owDir.mkdirs()
    def owRow(id: Long, ts: Long): String =
      s"""{"id":$id,"user_id":10,"province_id":110,"total_amount":9.90,"create_ts":$ts,"i_time":"${java.time.Instant.ofEpochMilli(ts)}","detail_id":${id * 100},"order_id":$id,"sku_id":7,"order_price":9.90,"sku_num":1,"split_total_amount":9.90,"province_name":"Beijing","area_code":"110000","iso_code":"CN-11"}"""
    Files.write(new java.io.File(owDir, "b.jsonl").toPath,
      java.util.Arrays.asList(owRow(1L, day1), owRow(2L, day1 + 1000L)))
    Mains.start(spark, "province_stats", pvIn, pvOut, pvCk).foreach(_.awaitTermination())
    Files.write(new java.io.File(owDir, "b2.jsonl").toPath,
      java.util.Arrays.asList(owRow(3L, day1 + 60000L)))
    Mains.start(spark, "province_stats", pvIn, pvOut, pvCk).foreach(_.awaitTermination())
    val pv = spark.read.json(s"$pvOut/dws_province_stats")
    val pvRow = pv.collect()
    assert(pvRow.length == 1 && pvRow.head.getAs[String]("province_name") == "Beijing" &&
      pvRow.head.getAs[Long]("order_count") == 2L,
      s"closed pane with approx-exact distinct at low cardinality: ${pvRow.toSeq}")
  }

  test("base_db main routes facts to per-topic dirs and upserts dim stores") {
    val inDir = tmp("db-in"); val outDir = tmp("db-out"); val ckptDir = tmp("db-ckpt")
    val cdc = new java.io.File(s"$inDir/ods_base_db_m"); cdc.mkdirs()
    val cfg = new java.io.File(s"$inDir/table_process"); cfg.mkdirs()
    Files.write(new java.io.File(cdc, "b1.jsonl").toPath, java.util.Arrays.asList(
      """{"database":"gmall","table":"order_info","type":"insert","ts":1,"data":"{\"id\":\"1\",\"user_id\":\"7\",\"total_amount\":\"9.9\"}"}""",
      """{"database":"gmall","table":"user_info","type":"insert","ts":2,"data":"{\"id\":\"5\",\"name\":\"a\"}"}""",
      """{"database":"gmall","table":"user_info","type":"update","ts":3,"data":"{\"id\":\"5\",\"name\":\"b\"}"}"""))
    Files.write(new java.io.File(cfg, "cfg.jsonl").toPath, java.util.Arrays.asList(
      """{"source_table":"order_info","operate_type":"insert","sink_type":"kafka","sink_table":"dwd_order_info","sink_columns":"id,user_id,total_amount"}""",
      """{"source_table":"user_info","operate_type":"insert","sink_type":"hbase","sink_table":"dim_user_info","sink_columns":"id,name","sink_pk":"id"}""",
      """{"source_table":"user_info","operate_type":"update","sink_type":"hbase","sink_table":"dim_user_info","sink_columns":"id,name","sink_pk":"id"}"""))
    Mains.start(spark, "base_db", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    val facts = spark.read.json(s"$outDir/kafka_facts")
    assert(facts.filter(col("topic") === "dwd_order_info").count() == 1)
    val dim = spark.read.parquet(s"$outDir/hbase_dims/dim_user_info")
    assert(dim.count() == 1, "same-key records collapse to one upserted row")
    assert(dim.head.getAs[String]("value").contains("\"name\":\"b\""),
      "last writer (ts=3) wins inside the micro-batch")

    // restart leg: a later CDC update for the same key in a new file — the
    // checkpointed offsets skip batch 1, the upsert applies only the delta
    Files.write(new java.io.File(cdc, "b2.jsonl").toPath, java.util.Arrays.asList(
      """{"database":"gmall","table":"user_info","type":"update","ts":9,"data":"{\"id\":\"5\",\"name\":\"c\"}"}"""))
    Mains.start(spark, "base_db", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    val facts2 = spark.read.json(s"$outDir/kafka_facts")
    assert(facts2.count() == facts.count(), "fact batch 1 NOT re-emitted after restart")
    val dim2 = spark.read.parquet(s"$outDir/hbase_dims/dim_user_info")
    assert(dim2.count() == 1 && dim2.head.getAs[String]("value").contains("\"name\":\"c\""),
      "restart applied only the new update; key still single-rowed")
  }

  test("order_wide → payment_wide chain runs file-bound with derived wire schemas") {
    val inDir = tmp("ow-in"); val outDir = tmp("ow-out"); val ckptDir = tmp("ow-ckpt")
    def writeTopic(topic: String, lines: String*): Unit = {
      val d = new java.io.File(s"$inDir/$topic"); d.mkdirs()
      Files.write(new java.io.File(d, "b.jsonl").toPath, java.util.Arrays.asList(lines: _*))
    }
    writeTopic("dwd_order_info",
      s"""{"id":1,"user_id":10,"province_id":110,"total_amount":99.50,"create_ts":$day1}""")
    writeTopic("dwd_order_detail",
      s"""{"id":100,"order_id":1,"sku_id":7,"order_price":99.50,"sku_num":1,"split_total_amount":99.50,"create_ts":$day1}""")
    writeTopic("dim_base_province",
      """{"id":110,"name":"Beijing","area_code":"110000","iso_code":"CN-11"}""")
    Mains.start(spark, "order_wide", inDir, outDir, ckptDir).foreach(_.awaitTermination())
    val ow = spark.read.schema(Mains.Wire.orderWide(spark)).json(s"$outDir/dwm_order_wide")
    assert(ow.count() == 1 && ow.head.getAs[String]("province_name") == "Beijing")

    // chain layer to layer the way the reference chains topics: the payment
    // app's input dir IS the order app's output dir (the file-sink manifest
    // binds entries to their own directory, so the topic dir must be consumed
    // in place — no copies or symlinks, exactly like a Kafka topic)
    val pwOut = tmp("pw-out")
    val payDir = new java.io.File(s"$outDir/dwd_payment_info"); payDir.mkdirs()
    Files.write(new java.io.File(payDir, "b.jsonl").toPath, java.util.Arrays.asList(
      s"""{"id":500,"order_id":1,"payment_type":"1102","total_amount":99.50,"callback_ts":${day1 + 60000}}"""))
    Mains.start(spark, "payment_wide", outDir, pwOut, ckptDir).foreach(_.awaitTermination())
    val pw = spark.read.json(s"$pwOut/dwm_payment_wide")
    assert(pw.count() == 1, "payment matched its order within the 30-minute band")
  }
}
