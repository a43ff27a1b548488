package graft.streaming

import graft.functions.Aggregators
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ProductStats windowed aggregation (A24, ProductStatsApp.java:202-265): the
  * reference's integration stress test — a 7-way union of per-source delta
  * rows, keyed 10 s tumbling window per sku with sums + EXACT distinct
  * order/payment/refund counts, then post-aggregation dim enrichment joins.
  *
  * The exact distinct counts use `collect_set` size over the window state —
  * semantically identical to the reference's per-pane HashSet
  * (bean/ProductStats.java:77-86). For the batch/typed path,
  * [[graft.functions.Aggregators.exactDistinct]] provides the single-shuffle
  * typed Aggregator alternative. Amount columns are DecimalType end-to-end
  * (the reference uses BigDecimal — bean/ProductStats.java).
  *
  * Expected delta columns (absent measures are 0 / null):
  * sku_id, click_ct, display_ct, favor_ct, cart_ct, order_sku_num, order_amount,
  * order_id, paid_order_id, refund_order_id, refund_amount, payment_amount,
  * comment_ct, good_comment_ct, event_time.
  */
object ProductStats {

  val measureCols: Seq[String] = Seq(
    "click_ct", "display_ct", "favor_ct", "cart_ct", "order_sku_num",
    "comment_ct", "good_comment_ct")

  val amountCols: Seq[String] = Seq("order_amount", "payment_amount", "refund_amount")

  /** Union heterogeneous delta streams by name, null-filling absent columns —
    * the Spark shape of the reference's 7× map-to-ProductStats + union. */
  def unionDeltas(deltas: Seq[DataFrame]): DataFrame = {
    require(deltas.nonEmpty)
    deltas.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private val idCols = Seq("order_id", "paid_order_id", "refund_order_id")

  def aggregate(deltas: DataFrame,
                watermark: String = "3 seconds",
                windowLen: String = "10 seconds"): DataFrame = {
    // null-fill any measure a given delta mix doesn't carry, so callers union
    // only the streams they have (the reference unions 7; tests may use 2)
    val complete = (measureCols ++ amountCols ++ idCols).foldLeft(deltas) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(if (amountCols.contains(c)) "decimal(16,2)" else "bigint"))
    }
    complete
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("sku_id"))
      .agg(
        sum(coalesce(col("click_ct"), lit(0L))).as("click_ct"),
        sum(coalesce(col("display_ct"), lit(0L))).as("display_ct"),
        sum(coalesce(col("favor_ct"), lit(0L))).as("favor_ct"),
        sum(coalesce(col("cart_ct"), lit(0L))).as("cart_ct"),
        sum(coalesce(col("order_sku_num"), lit(0L))).as("order_sku_num"),
        sum(coalesce(col("comment_ct"), lit(0L))).as("comment_ct"),
        sum(coalesce(col("good_comment_ct"), lit(0L))).as("good_comment_ct"),
        sum(coalesce(col("order_amount"), lit(BigDecimal(0)).cast("decimal(16,2)")))
          .as("order_amount"),
        sum(coalesce(col("payment_amount"), lit(BigDecimal(0)).cast("decimal(16,2)")))
          .as("payment_amount"),
        sum(coalesce(col("refund_amount"), lit(BigDecimal(0)).cast("decimal(16,2)")))
          .as("refund_amount"),
        // long like every other count (size() is int; downstream unpivot
        // requires homogeneous types across stacked count columns)
        size(collect_set(col("order_id"))).cast("long").as("order_ct"), // nulls skipped
        size(collect_set(col("paid_order_id"))).cast("long").as("paid_order_ct"),
        size(collect_set(col("refund_order_id"))).cast("long").as("refund_order_ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("*")).drop("window")
  }

  /** Post-agg dim enrichment (the reference's 4 chained async lookups,
    * ProductStatsApp.java:267-332) as broadcast left joins. */
  def enrich(stats: DataFrame, skuDim: DataFrame, spuDim: DataFrame,
             tmDim: DataFrame, c3Dim: DataFrame): DataFrame =
    stats
      .join(broadcast(skuDim), stats("sku_id") === skuDim("id"), "left").drop("id")
      .join(broadcast(spuDim), col("spu_id") === spuDim("id"), "left").drop("id")
      .join(broadcast(tmDim), col("tm_id") === tmDim("id"), "left").drop("id")
      .join(broadcast(c3Dim), col("category3_id") === c3Dim("id"), "left").drop("id")
}
