package graft.io

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Runtime-scale machinery proofs: the two Spark mechanisms that, alongside
  * the manual salting pattern (q31/q53), carry skew and pruning at 100 TB —
  * AQE's skew-join split (OptimizeSkewedJoin) and dynamic partition pruning.
  * Both replan at RUNTIME, so the assertions read the executed plan after an
  * action, not the static one.
  */
class AdaptiveScaleSpec extends SparkSuite {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (skew=true in the executed plan)") {
    import spark.implicits._
    // one pathological key: 200k rows of key 0 vs 100 rows spread over keys
    // 1..100 — the power-law shape that melts a naive shuffle join
    val skewed = spark.range(0, 200100)
      .select(when(col("id") < 200000, 0L).otherwise(col("id") % 100 + 1).as("k"),
        concat(lit("payload-"), col("id")).as(("v")))
    val small = spark.range(0, 101).select(col("id").as("k"), lit("dim").as("d"))
    withConf(
      // force a shuffle join and make the thresholds small enough that the
      // hot partition counts as skewed at test size
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB") {
      val joined = skewed.join(small, "k")
      // collect() drives THIS DataFrame's queryExecution (count() would build
      // a separate one and leave this plan isFinalPlan=false)
      assert(joined.collect().length == 200100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition (no skew=true):\n$plan")
    }
  }

  test("runtime bloom filter prunes the big side of a selective shuffle join") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // shrink the production thresholds (10MB creation side / big scan side)
      // so the injection triggers at test data sizes
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val lineitem = graft.Tables.load(spark, sf001, "lineitem")
      val orders = graft.Tables.load(spark, sf001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"selective orders filter should inject a bloom filter on the lineitem scan:\n$plan")
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    val fact = graft.Tables.load(spark, sf001, "orders")
      .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM"))
    Io.writePartitioned(fact, s"$dir/fact", Seq("dt"))
    val factP = spark.read.parquet(s"$dir/fact")
    val dim = factP.select("dt").distinct().limit(2)
      .withColumn("flag", lit("keep"))
    Io.writePartitioned(dim, s"$dir/dim", Seq())
    val dimP = spark.read.parquet(s"$dir/dim")

    val joined = factP.join(dimP.filter(col("flag") === "keep"), "dt")
    val rows = joined.count()
    assert(rows > 0)
    val formatted = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("dynamicpruning"),
      s"fact scan should carry a dynamicpruning partition filter:\n$formatted")
  }
}
