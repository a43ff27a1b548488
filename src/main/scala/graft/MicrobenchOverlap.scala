package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (PLANS.md evidence): measure the two round-10 session-2 scale
  * claims on sf0.1 —
  *  1. the binned interval overlap join (q126 shape) vs the plain non-equi
  *     join Catalyst plans as BroadcastNestedLoop;
  *  2. KMV direct-intersection error (q127) vs HLL inclusion-exclusion
  *     error (q118) on the same audience pairs.
  */
object MicrobenchOverlap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val ev = Tables.load(spark, dir, "events")

    val sess = graft.operators.Relational.userSessions(ev).persist()
    val hours = ev.select(col("event_type"),
      date_trunc("hour", col("event_time")).as("h")).distinct().persist()
    println(s"sessions=${sess.count()} hourIntervals=${hours.count()}")

    Microbench.time("overlap join: plain non-equi (BroadcastNestedLoop)") {
      sess.join(hours,
        col("h") < col("en") && col("st") < col("h") + expr("interval 1 hour"))
        .count()
    }
    Microbench.time("overlap join: binned equi + residual (q126 shape)") {
      sess.select(col("user_id"), col("st"), col("en"), col("events"),
        explode(sequence(date_trunc("hour", col("st")),
          date_trunc("hour", col("en")), expr("interval 1 hour"))).as("cell"))
        .join(hours, col("cell") === col("h"))
        .filter(col("h") < col("en") &&
          col("st") < col("h") + expr("interval 1 hour"))
        .count()
    }
    sess.unpersist(); hours.unpersist()

    // ---- estimator error: HLL inclusion-exclusion vs KMV direct ----
    val el = ev.select(col("event_type"),
      concat_ws("_", col("user_id"),
        date_format(col("event_time"), "yyyy-MM-dd")).as("u"))
      .distinct().persist()
    val exact = el.select(col("event_type").as("ta"), col("u"))
      .join(el.select(col("event_type").as("tb"), col("u")), Seq("u"))
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("exact"))
    val perType = el.groupBy("event_type").agg(hll_sketch_agg(col("u")).as("sk"))
    val hll = perType.select(col("event_type").as("ta"), col("sk").as("ska"))
      .join(perType.select(col("event_type").as("tb"), col("sk").as("skb")),
        col("ta") < col("tb"))
      .select(col("ta"), col("tb"),
        (hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb"))
          - hll_sketch_estimate(hll_union(col("ska"), col("skb")))).as("est"))
    val hllErr = hll.join(exact, Seq("ta", "tb"))
      .select(abs(col("est") - col("exact")) / col("exact")).as[Double](
        org.apache.spark.sql.Encoders.scalaDouble).collect()
    val kmv = graft.operators.Relational.thetaSketchOverlap(spark, dir)
      .select((abs(col("est_overlap") - col("overlap_exact"))
        / col("overlap_exact")).as("re"))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect()
    def stats(xs: Array[Double]): String =
      f"mean ${xs.sum / xs.length * 100}%.1f%% max ${xs.max * 100}%.1f%%"
    println(s"HLL inclusion-exclusion rel-err (q118 estimator): ${stats(hllErr)}")
    println(s"KMV direct-intersection rel-err (q127, k=1024):  ${stats(kmv)}")
    el.unpersist()

    // ---- streaming entity-registry maintenance rate (PLANS round-10
    // rates table): synthetic 200k-key population, 180k-seed registry,
    // 20k-row arriving batch through the full applyBatch path ----
    {
      val n = 200000L
      val pop = spark.range(1, n + 1).select(
        col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        pmod(xxhash64(col("id")), lit(25L)).cast("int").as("c_nationkey"),
        element_at(array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
          lit("HOUSEHOLD"), lit("MACHINERY")),
          (pmod(xxhash64(col("id"), lit(1)), lit(5L)) + 1).cast("int")).as("c_mktsegment"),
        (pmod(xxhash64(col("id"), lit(2)), lit(1099900L)) - 99990L).as("cents"))
        .persist()
      pop.count()
      val store = java.nio.file.Files.createTempDirectory("graft-regbench").toString
      val t0 = System.nanoTime()
      graft.streaming.EntityRegistry.applyBatch(spark,
        pop.filter(pmod(col("c_custkey"), lit(10)) =!= 0), store, epoch = 0L)
      val seedSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.streaming.EntityRegistry.applyBatch(spark,
        pop.filter(pmod(col("c_custkey"), lit(10)) === 0), store, epoch = 1L)
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"entity-registry seed: 180k rows in $seedSec%.1f s (${180000 / seedSec}%.0f rows/s)")
      println(f"entity-registry link batch: 20k rows vs 180k registry in $sec%.1f s (${20000 / sec}%.0f rows/s)")
      pop.unpersist()
    }
    spark.stop()
  }
}
