package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint validation — the "unit tests for
  * data" layer a 100 TB ingest runs before anything downstream trusts a
  * table (Schelter et al., "Automating Large-Scale Data Quality
  * Verification", VLDB 2018 — the Deequ model: constraints compile to
  * METRICS, metrics compute in as few passes as possible, checks are
  * assertions over the metric values).
  *
  * The reference engine's ODS→DWD hop assumes validity filtering per record
  * (BaseDBApp.java:44-48 drops malformed rows inline); this operator is the
  * corpus-level generalization: instead of judging rows one at a time it
  * publishes a verdict per CONSTRAINT over the whole table, so a bad load
  * fails loudly before fan-out.
  *
  * Scale shape (the Deequ design point, kept here):
  *  - ALL row-local measures of one table fuse into ONE aggregate scan —
  *    completeness, compliance, min/max and size are `sum(when(...))`
  *    branches of a single map-side-combinable agg; adding a constraint
  *    adds an expression, not a pass.
  *  - The single holistic measure (key uniqueness) rides the same agg as
  *    one `count_distinct` — Spark plans it as a two-phase partial
  *    aggregate on the key, the only shuffle the orders check pays.
  *  - Referential integrity is a per-fact-row EXISTS against the parent
  *    keyset: customer keys broadcast (dim-sized); lineitem→orders probes
  *    the distinct-key frame with a shuffle join on the key — at 100 TB
  *    that is the one genuinely fact-×-fact check, and its cheap first
  *    pass is q107's bloom semi-join (documented there), with this exact
  *    count as the audit-grade second pass.
  *  - The check report itself is control-plane: a handful of 1-row frames
  *    unioned — no window, no collect of data rows.
  *
  * Output: one row per constraint `(check, entity, metric, passed)` —
  * metric is the measured value (fractions in [0,1], sizes as counts),
  * `passed` the assertion verdict. Fractions are exact integer ratios cast
  * to double at the edge (IEEE division is exactly rounded ⇒ cross-engine
  * hash-stable). */
object Quality {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  def qualityChecks(spark: SparkSession, dir: String): DataFrame =
    qualityChecksFrom(t(spark, dir, "orders"), t(spark, dir, "customer"),
      t(spark, dir, "lineitem"))

  /** Frame form of [[qualityChecks]] — the spec drives constructed
    * corruptions (duplicate keys, orphan foreign keys, out-of-domain
    * values) through it and pins that exactly the right constraints fail
    * with exactly the right metrics. */
  def qualityChecksFrom(orders: DataFrame, customer: DataFrame,
                        lineitem: DataFrame): DataFrame = {

    def frac(pred: org.apache.spark.sql.Column) =
      sum(when(pred, 1L).otherwise(0L)).cast("double") / count(lit(1))

    // One fused scan: every row-local orders measure + the key-uniqueness
    // count_distinct in a single aggregate.
    val om = orders.agg(
      count(lit(1)).as("size"),
      frac(col("o_custkey").isNotNull).as("complete_custkey"),
      frac(col("o_orderstatus").isin("O", "F", "P")).as("status_ok"),
      frac(col("o_totalprice") > 0).as("price_positive"),
      countDistinct(col("o_orderkey")).cast("double").as("distinct_keys"),
      min(col("o_totalprice")).as("min_price"))

    def check(name: String, entity: String, metric: org.apache.spark.sql.Column,
              passed: org.apache.spark.sql.Column)(src: DataFrame): DataFrame =
      src.select(lit(name).as("check"), lit(entity).as("entity"),
        metric.cast("double").as("metric"), passed.as("passed"))

    val rowChecks = Seq(
      check("size_min", "orders", col("size"), col("size") >= 1L)(om),
      check("completeness_custkey", "orders", col("complete_custkey"),
        col("complete_custkey") === 1.0)(om),
      check("uniqueness_orderkey", "orders",
        col("distinct_keys") / col("size"),
        col("distinct_keys") === col("size"))(om),
      check("compliance_status", "orders", col("status_ok"),
        col("status_ok") === 1.0)(om),
      check("range_totalprice", "orders", col("price_positive"),
        col("price_positive") === 1.0)(om))

    // Referential integrity: fraction of child rows whose parent key exists.
    // customer keyset is dim-sized → broadcast; orders keyset is fact-sized
    // → distinct-key shuffle probe (bloom pre-pass documented in q107).
    val riOrders = orders
      .join(broadcast(customer.select(col("c_custkey")).distinct()),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(frac(col("c_custkey").isNotNull).as("m"))
    val riLines = lineitem
      .join(orders.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(frac(col("o_orderkey").isNotNull).as("m"))

    val refChecks = Seq(
      check("ri_orders_customer", "orders", col("m"), col("m") === 1.0)(riOrders),
      check("ri_lineitem_orders", "lineitem", col("m"), col("m") === 1.0)(riLines))

    (rowChecks ++ refChecks).reduce(_ unionByName _)
  }

  /** ANALYZE-style COLUMN STATISTICS (q137) — the per-column profile a
    * cost-based optimizer (and the q131 check author) reads before
    * touching a table: count, min/max, exact NDV, plus the engine's HLL
    * estimate self-checked against the exact value (the q34/q95 oracle
    * pattern — raw approx values differ per engine and stay out of the
    * output; the within-tolerance FLAG is the driver-visible gate).
    *
    * Shape: the numeric columns MELT (`stack`) into (column, value) rows —
    * one pass over the table produces every per-column aggregate in a
    * single partial-agged groupBy, including the one genuinely holistic
    * measure (exact NDV) as a per-column two-phase distinct. The melt
    * multiplies scanned rows by |columns|; the alternative at very wide
    * tables is one un-melted agg computing ONLY sketched NDVs
    * (`approx_count_distinct` is an HLL — register-max merge, no Expand,
    * mergeable map-side) next to min/max/count, trading exact NDV for a
    * single narrow pass — that variant is this same code minus the melt
    * and the exact column. Spark's HLL++ here is deterministic (hash-based,
    * order-independent register max), so the flag is replay-stable. */
  def columnStats(spark: SparkSession, dir: String, tol: Double = 0.15): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice")
    val melted = li.select(expr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', cast($c as double)").mkString(", ") +
        ") as (col, value)"))
    melted.groupBy("col").agg(
      count(col("value")).as("ct"),
      min(col("value")).as("min_val"),
      max(col("value")).as("max_val"),
      countDistinct(col("value")).as("ndv"),
      approx_count_distinct(col("value")).as("__andv"))
      .select(col("col"), col("ct"), col("min_val"), col("max_val"), col("ndv"),
        (abs(col("__andv") - col("ndv")).cast("double")
          <= col("ndv").cast("double") * tol).as("approx_ok"))
  }
}
