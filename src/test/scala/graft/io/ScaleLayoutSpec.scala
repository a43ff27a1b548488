package graft.io

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Data-layout features that carry the 100 TB design: partition pruning and
  * bucketed (pre-shuffled) joins. These are plan assertions — the point is
  * what the scan/join DOESN'T do (read other partitions; shuffle). */
class ScaleLayoutSpec extends SparkSuite {

  test("partitioned write → partition-pruned read (PartitionFilters, not a scan filter)") {
    val tmp = java.nio.file.Files.createTempDirectory("part").toString
    val events = Tables.load(spark, sf0001, "events")
      .withColumn("dt", date_format(col("event_time"), "yyyy-MM-dd"))
    Io.writePartitioned(events, s"$tmp/events_by_dt", Seq("dt"))

    val dirs = new java.io.File(s"$tmp/events_by_dt").listFiles()
      .filter(_.getName.startsWith("dt=")).map(_.getName)
    assert(dirs.length > 1, s"one directory per day expected: ${dirs.toSeq}")

    val read = spark.read.parquet(s"$tmp/events_by_dt").filter(col("dt") === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)
    val expected = events.filter(col("dt") === "2024-01-02").count()
    assert(read.count() == expected && expected > 0)
  }

  test("csvSource round-trips a config table with explicit schema") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/cfg.csv"),
      "order_info,insert,kafka,dwd_order_info,id,\nuser_info,insert,hbase,dim_user_info,\"id,name\",id\n")
    val schema = StructType(Seq("source_table", "operate_type", "sink_type",
      "sink_table", "sink_columns", "sink_pk").map(StructField(_, StringType)))
    val cfg = Io.csvSource(spark, tmp, schema)
    assert(cfg.count() == 2)
    val dim = cfg.filter(col("sink_type") === "hbase").head
    assert(dim.getAs[String]("sink_columns") == "id,name", "quoted CSV field parses")
    assert(dim.getAs[String]("sink_pk") == "id")
  }

  test("jsonValue wire encoding round-trips through from_json (A2 serialization)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val rows = Seq((1L, "a", Some(2.5)), (2L, "b", None)).toDF("id", "name", "score")
    val encoded = Io.jsonValue(rows)
    assert(encoded.columns.toSeq == Seq("value"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val decoded = encoded.select(from_json(col("value"), schema).as("j")).select("j.*")
    assert(decoded.collect().toSet == rows.collect().toSet, "lossless round-trip incl. nulls")
  }

  test("bucketed tables join without an Exchange (co-located join)") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    Io.writeBucketed(Tables.load(spark, sf0001, "orders"), "orders_b", "o_orderkey", 4)
    Io.writeBucketed(
      Tables.load(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 4)
    try {
      // merge hint on the join SIDE forces sort-merge, so the bucket layout
      // (not a broadcast) is what eliminates the shuffle
      val joined = spark.table("orders_b").hint("merge")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").count()
      assert(joined.count() > 0) // materialize so AQE's final plan is available
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle either side:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
