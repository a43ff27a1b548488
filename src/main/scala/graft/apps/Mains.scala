package graft.apps

import java.io.File

import graft.streaming.{CdcRouter, LogEvent, OrderDetail, OrderInfo, PaymentInfo}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Launchable streaming jobs — one per reference app, mirroring the
  * `main()` → `env.execute()` shape of the reference (BaseLogApp.java:121-272,
  * ProductStatsApp.java:42-340). Each binds file-backed topic directories
  * around the pure [[Apps]] transforms:
  *
  *  - inputs stream from `inDir/<topic>` as JSONL with an explicit wire schema
  *    (`ods_base_log` is raw text lines; `dim_*` inputs are static reads);
  *  - outputs land in `outDir/<topic>` through Spark's transactional file sink
  *    (manifest-committed ⇒ exactly-once across restarts, proven by
  *    CheckpointRestartSpec);
  *  - each output query checkpoints under `ckptDir/<topic>`.
  *
  * On a cluster with the Kafka connector jar the file bindings swap for
  * Io.kafkaStream / Io.kafkaSink with NO change to the transforms (see
  * KAFKA.md); the source/sink decoupling is the same one the reference gets
  * from MyKafkaUtil (utils/MyKafkaUtil.java:17-55).
  *
  * The default trigger is AvailableNow: drain everything present, commit, exit
  * — the deterministic mode for scheduled/backfill runs. A 24×7 deployment
  * passes a processing-time trigger instead. Note the streaming-correct
  * consequence: windowed aggregates only emit panes the WATERMARK has closed,
  * so the last windows of a drain run emit on the next run (state is in the
  * checkpoint) — the same behavior as the reference's event-time windows.
  *
  * One state-API-v2 exception to drain-and-exit: `unique_visit` on tws uses a
  * NATIVE processing-time TTL (the StateTtlConfig contract), and a
  * ProcessingTime-mode transformWithState keeps scheduling micro-batches
  * under AvailableNow while TTL timers are pending — it runs as a SERVICE.
  * Callers poll the sink and `stop()` when drained (MainsSpec shows the
  * pattern); `awaitTermination` on it never returns. The v1
  * (flatMapGroupsWithState) binding drains and exits like every other app.
  */
object Mains {

  // ---------------- wire schemas ----------------

  /** Wire schemas of the file-bound topics. Typed topics derive from the same
    * case classes the transforms use; derived topics (order-wide, product-stats)
    * take their schema from the producing transform applied to empty inputs —
    * one source of truth, no hand-maintained duplicate. */
  object Wire {
    val logEvent: StructType = Encoders.product[LogEvent].schema
    val orderInfo: StructType = Encoders.product[OrderInfo].schema
    val orderDetail: StructType = Encoders.product[OrderDetail].schema
    val paymentInfo: StructType = Encoders.product[PaymentInfo].schema

    val visitorDelta: StructType = StructType(
      Seq("ar", "ch", "vc", "is_new").map(StructField(_, StringType)) ++
        Seq("pv_ct", "sv_ct", "uv_ct", "uj_ct", "dur_sum").map(StructField(_, LongType)) :+
        StructField("event_time", TimestampType))

    /** Superset delta row for product-stats: any producer fills its own
      * measures, absent ones arrive null and aggregate as 0. */
    val productDelta: StructType = StructType(
      StructField("sku_id", LongType) +:
        graft.streaming.ProductStats.measureCols.map(StructField(_, LongType)) ++:
        graft.streaming.ProductStats.amountCols.map(StructField(_, DecimalType(16, 2))) ++:
        Seq("order_id", "paid_order_id", "refund_order_id").map(StructField(_, StringType)) :+
        StructField("event_time", TimestampType))

    val userDim: StructType = StructType(Seq(
      StructField("id", LongType), StructField("gender", StringType),
      StructField("birthday", StringType)))
    val provinceDim: StructType = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("area_code", StringType), StructField("iso_code", StringType)))
    val skuDim: StructType = StructType(Seq(
      StructField("id", LongType), StructField("sku_name", StringType),
      StructField("spu_id", LongType), StructField("tm_id", LongType),
      StructField("category3_id", LongType)))
    val spuDim: StructType = StructType(Seq(
      StructField("id", LongType), StructField("spu_name", StringType)))
    val trademarkDim: StructType = StructType(Seq(
      StructField("id", LongType), StructField("tm_name", StringType)))
    val category3Dim: StructType = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))

    private def empty(spark: SparkSession, s: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)

    /** dwm_order_wide as produced by [[Apps.orderWide]] with all three dims
      * present (the full enrichment; missing dims at runtime just read null). */
    def orderWide(spark: SparkSession): StructType =
      Apps.orderWide(Map(
        "dwd_order_info" -> empty(spark, orderInfo),
        "dwd_order_detail" -> empty(spark, orderDetail),
        "dim_user_info" -> empty(spark, userDim),
        "dim_base_province" -> empty(spark, provinceDim),
        "dim_sku_info" -> empty(spark, skuDim)))("dwm_order_wide").schema

    /** dws_product_stats as produced by [[Apps.productStats]] fully enriched. */
    def productStats(spark: SparkSession): StructType =
      Apps.productStats(Map(
        "dwd_delta" -> empty(spark, productDelta),
        "dim_sku_info" -> empty(spark, skuDim),
        "dim_spu_info" -> empty(spark, spuDim),
        "dim_base_trademark" -> empty(spark, trademarkDim),
        "dim_base_category3" -> empty(spark, category3Dim)))("dws_product_stats").schema
  }

  val appNames: Seq[String] = Seq(
    "base_log", "unique_visit", "user_jump_detail", "order_wide", "payment_wide",
    "visitor_stats", "product_stats", "province_stats", "keyword_stats",
    "keyword_stats_product", "base_db")

  // ---------------- bindings ----------------

  /** Extra options for the streaming file sources (e.g. `maxFilesPerTrigger`
    * for rate-limited backfills); applied by [[start]] to every source it
    * binds. Set per call, not global state. */
  private def streamJson(spark: SparkSession, inDir: String, topic: String,
                         schema: StructType,
                         options: Map[String, String]): DataFrame =
    spark.readStream.options(options).schema(schema).json(s"$inDir/$topic")

  private def staticJson(spark: SparkSession, inDir: String, topic: String,
                         schema: StructType): Option[(String, DataFrame)] = {
    val d = new File(s"$inDir/$topic")
    if (d.isDirectory) Some(topic -> spark.read.schema(schema).json(d.getPath)) else None
  }

  private def subTopics(inDir: String): Seq[String] = {
    val d = new File(inDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  private def sinkAll(outputs: Map[String, DataFrame], outDir: String, ckptDir: String,
                      trigger: Trigger): Seq[StreamingQuery] =
    outputs.toSeq.sortBy(_._1).map { case (topic, df) =>
      df.writeStream.format("json")
        .option("path", s"$outDir/$topic")
        .option("checkpointLocation", s"$ckptDir/$topic")
        .outputMode("append")
        .trigger(trigger)
        .start()
    }

  private def hasWatermark(df: DataFrame): Boolean =
    df.queryExecution.analyzed.output.exists(_.metadata.contains("spark.watermarkDelayMs"))

  /** Bind and launch one app's queries. Returns the started queries so callers
    * (and the checkpoint-restart spec) own their lifecycle; [[main]] awaits. */
  def start(spark: SparkSession, app: String, inDir: String, outDir: String,
            ckptDir: String, trigger: Trigger = Trigger.AvailableNow(),
            sourceOptions: Map[String, String] = Map.empty): Seq[StreamingQuery] = {
    // state API v2 (transformWithState twins, selected by spark.graft.stateApi)
    // requires the RocksDB provider; the checkpoint-file checksum writer
    // deadlocks in some containers (round-1 finding, StatefulSpec) — disable.
    // Set BEFORE any query starts: provider choice binds at query start.
    if (spark.conf.get("spark.graft.stateApi", "v1") == "v2") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    }
    def sink(outputs: Map[String, DataFrame]) = sinkAll(outputs, outDir, ckptDir, trigger)
    def streamJson(spark: SparkSession, inDir: String, topic: String, schema: StructType) =
      Mains.streamJson(spark, inDir, topic, schema, sourceOptions)
    app match {
      case "base_log" =>
        sink(Apps.baseLog(Map("ods_base_log" ->
          spark.readStream.options(sourceOptions).text(s"$inDir/ods_base_log"))))
      case "unique_visit" =>
        sink(Apps.uniqueVisit(Map(
          "dwd_page_log" -> streamJson(spark, inDir, "dwd_page_log", Wire.logEvent))))
      case "user_jump_detail" =>
        sink(Apps.userJumpDetail(Map(
          "dwd_page_log" -> streamJson(spark, inDir, "dwd_page_log", Wire.logEvent))))
      case "order_wide" =>
        val dims = Seq(
          staticJson(spark, inDir, "dim_user_info", Wire.userDim),
          staticJson(spark, inDir, "dim_base_province", Wire.provinceDim),
          staticJson(spark, inDir, "dim_sku_info", Wire.skuDim)).flatten.toMap
        sink(Apps.orderWide(Map(
          "dwd_order_info" -> streamJson(spark, inDir, "dwd_order_info", Wire.orderInfo),
          "dwd_order_detail" -> streamJson(spark, inDir, "dwd_order_detail", Wire.orderDetail))
          ++ dims))
      case "payment_wide" =>
        // a file-read dwm_order_wide carries no watermark (unlike the chained
        // in-process DF) — the stream-stream interval join needs one per side
        val owRaw = streamJson(spark, inDir, "dwm_order_wide", Wire.orderWide(spark))
        val ow = if (hasWatermark(owRaw)) owRaw else owRaw.withWatermark("i_time", "3 seconds")
        sink(Apps.paymentWide(Map(
          "dwd_payment_info" -> streamJson(spark, inDir, "dwd_payment_info", Wire.paymentInfo),
          "dwm_order_wide" -> ow)))
      case "visitor_stats" =>
        val deltas = subTopics(inDir)
          .map(t => t -> streamJson(spark, inDir, t, Wire.visitorDelta)).toMap
        require(deltas.nonEmpty, s"visitor_stats: no delta topic directories under $inDir")
        sink(Apps.visitorStats(deltas))
      case "product_stats" =>
        val dims = Seq(
          staticJson(spark, inDir, "dim_sku_info", Wire.skuDim),
          staticJson(spark, inDir, "dim_spu_info", Wire.spuDim),
          staticJson(spark, inDir, "dim_base_trademark", Wire.trademarkDim),
          staticJson(spark, inDir, "dim_base_category3", Wire.category3Dim)).flatten.toMap
        val deltas = (subTopics(inDir).toSet -- dims.keySet -- Set(
          "dim_sku_info", "dim_spu_info", "dim_base_trademark", "dim_base_category3"))
          .toSeq.sorted.map(t => t -> streamJson(spark, inDir, t, Wire.productDelta)).toMap
        require(deltas.nonEmpty, s"product_stats: no delta topic directories under $inDir")
        sink(Apps.productStats(deltas ++ dims))
      case "province_stats" =>
        sink(Apps.provinceStats(Map(
          "dwm_order_wide" -> streamJson(spark, inDir, "dwm_order_wide", Wire.orderWide(spark)))))
      case "keyword_stats" =>
        sink(Apps.keywordStats(Map(
          "dwd_page_log" -> streamJson(spark, inDir, "dwd_page_log", Wire.logEvent))))
      case "keyword_stats_product" =>
        sink(Apps.keywordStats4Product(Map(
          "dws_product_stats" ->
            streamJson(spark, inDir, "dws_product_stats", Wire.productStats(spark)))))
      case "base_db" =>
        // facts → dynamic-topic dir, dims → keyed upsert stores: the composed
        // router sink (CdcRouter.run) with the config re-read per micro-batch
        val cdc = streamJson(spark, inDir, "ods_base_db_m", CdcRouter.envelopeSchema)
        Seq(CdcRouter.run(spark, cdc,
          () => spark.read.schema(CdcRouter.configSchema).json(s"$inDir/table_process"),
          factDir = s"$outDir/kafka_facts", dimDir = s"$outDir/hbase_dims",
          checkpoint = s"$ckptDir/base_db"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown app '$other' — one of: ${appNames.mkString(", ")}")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: graft.apps.Mains <app> <inDir> <outDir> <ckptDir>")
    val Array(app, inDir, outDir, ckptDir) = args.take(4)
    val builder = SparkSession.builder()
      .appName(s"graft-$app")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit provides the master; standalone runs default to local
    val spark =
      (if (sys.props.contains("spark.master")) builder else builder.master("local[*]"))
        .getOrCreate()
    start(spark, app, inDir, outDir, ckptDir).foreach(_.awaitTermination())
  }
}

// One thin launchable object per reference app (spark-submit --class targets).
object BaseLogApp { def main(a: Array[String]): Unit = Mains.main("base_log" +: a) }
object UniqueVisitApp { def main(a: Array[String]): Unit = Mains.main("unique_visit" +: a) }
object UserJumpDetailApp { def main(a: Array[String]): Unit = Mains.main("user_jump_detail" +: a) }
object OrderWideApp { def main(a: Array[String]): Unit = Mains.main("order_wide" +: a) }
object PaymentWideApp { def main(a: Array[String]): Unit = Mains.main("payment_wide" +: a) }
object VisitorStatsApp { def main(a: Array[String]): Unit = Mains.main("visitor_stats" +: a) }
object ProductStatsApp { def main(a: Array[String]): Unit = Mains.main("product_stats" +: a) }
object ProvinceStatsApp { def main(a: Array[String]): Unit = Mains.main("province_stats" +: a) }
object KeywordStatsApp { def main(a: Array[String]): Unit = Mains.main("keyword_stats" +: a) }
object KeywordStats4ProductApp { def main(a: Array[String]): Unit = Mains.main("keyword_stats_product" +: a) }
object BaseDbApp { def main(a: Array[String]): Unit = Mains.main("base_db" +: a) }
