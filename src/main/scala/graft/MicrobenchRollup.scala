package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (PLANS.md evidence): measure the round-10 session-4 scale
  * claims on sf0.1 —
  *  1. q154's sketch rollup lattice (one scan into KMV leaf partials +
  *     array merges) vs the two naive forms: N separate count(distinct)
  *     scans, and one cube pass (whose expand multiplies every input row
  *     by the lattice-node count before the distinct shuffle);
  *  2. q153's HDR cells vs exact percentile vs approx_percentile — cost of
  *     the deterministic sketch relative to both ends.
  */
object MicrobenchRollup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.load(spark, dir, "events")

    val el = ev.select(col("event_type"),
      date_format(col("event_time"), "yyyy-MM-dd").as("day"),
      col("user_id").cast("string").as("u")).distinct()

    Microbench.time("lattice: 4 separate count(distinct) passes") {
      el.groupBy("event_type", "day").agg(countDistinct("u")).count() +
        el.groupBy("event_type").agg(countDistinct("u")).count() +
        el.groupBy("day").agg(countDistinct("u")).count() +
        el.agg(countDistinct("u")).count()
    }
    Microbench.time("lattice: one cube pass (expand x4 before distinct)") {
      el.cube(col("event_type"), col("day")).agg(countDistinct("u")).count()
    }
    Microbench.time("lattice: q154 sketch path (KMV leaves + array merges, no exact audit)") {
      val hashed = el.select(col("event_type"), col("day"),
        conv(substring(md5(col("u").cast("binary")), 1, 13), 16, 10)
          .cast("long").as("h"))
      val leaf = hashed.groupBy("event_type", "day")
        .agg(graft.functions.Aggregators
          .topK(512, negate(col("h")).cast("double"), col("h"), col("h")).as("top"))
        .select(col("event_type"), col("day"),
          expr("transform(top, s -> s.id)").as("ks"))
        .persist()
      val merge = expr("slice(array_sort(array_distinct(flatten(kss))), 1, 512)")
      val n = leaf.select(col("ks"))
        .unionByName(leaf.groupBy("event_type")
          .agg(collect_list(col("ks")).as("kss")).select(merge.as("ks")))
        .unionByName(leaf.groupBy("day")
          .agg(collect_list(col("ks")).as("kss")).select(merge.as("ks")))
        .unionByName(leaf.agg(collect_list(col("ks")).as("kss"))
          .select(merge.as("ks")))
        .count()
      leaf.unpersist(); n
    }

    Microbench.time("quantiles: exact percentile (full value buffer per group)") {
      graft.operators.Relational.percentiles(spark, dir).count()
    }
    Microbench.time("quantiles: approx_percentile sketch") {
      graft.operators.Relational.percentilesApprox(spark, dir).count()
    }
    Microbench.time("quantiles: q153 HDR cells + rank walk (deterministic)") {
      graft.operators.Relational.hdrQuantiles(spark, dir).count()
    }
    spark.stop()
  }
}
