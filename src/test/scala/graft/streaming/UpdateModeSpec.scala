package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A31 — the retract-stream bridge (reference Demo1.java:64 `toRetractStream`):
  * Flink's retract stream maps to Spark's `update` output mode, where each
  * micro-batch re-emits ONLY the result rows that changed. This spec pins the
  * two properties the bridge is used for in the reference's console demos:
  * changed keys re-emit with their new value, unchanged keys stay silent.
  */
class UpdateModeSpec extends SparkSuite {

  test("update mode re-emits changed aggregates only (toRetractStream bridge)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val counts = ms.toDF().toDF("word", "n")
      .groupBy("word")
      .agg(count(lit(1)).as("ct"))
    val q = counts.writeStream.format("memory").queryName("upd_out")
      .outputMode("update").start()
    try {
      ms.addData(("hello", 1L), ("world", 1L))
      q.processAllAvailable()
      val batch1 = spark.table("upd_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(batch1 == Set("hello" -> 1L, "world" -> 1L))

      // second batch touches only "hello": update mode must emit hello=2 and
      // must NOT re-emit the unchanged world=1 (that re-emission is what
      // distinguishes complete mode; the retract bridge relies on its absence)
      ms.addData(("hello", 1L))
      q.processAllAvailable()
      val all = spark.table("upd_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(all.count(_ == ("hello" -> 2L)) == 1, s"changed key re-emitted once: $all")
      assert(all.count(_._1 == "world") == 1, s"unchanged key NOT re-emitted: $all")
      assert(all.count(_._1 == "hello") == 2, s"old hello=1 emission remains from batch 1: $all")
    } finally q.stop()
  }

  test("complete mode re-emits the WHOLE result each batch (the full-retract twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val counts = ms.toDF().toDF("word", "n").groupBy("word").agg(count(lit(1)).as("ct"))
    val q = counts.writeStream.format("memory").queryName("cmp_out")
      .outputMode("complete").start()
    try {
      ms.addData(("hello", 1L), ("world", 1L))
      q.processAllAvailable()
      ms.addData(("hello", 1L))
      q.processAllAvailable()
      // complete mode REPLACES the memory table: final state only, world kept
      val all = spark.table("cmp_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(all == Set("hello" -> 2L, "world" -> 1L),
        s"complete mode shows the whole latest result incl. unchanged keys: $all")
    } finally q.stop()
  }

  test("update mode works with the stateful operators' non-windowed aggregations") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the reference's demo aggregates a keyed sum (Demo1.java:52-64 shape)
    val ms = MemoryStream[(String, java.math.BigDecimal)]
    val sums = ms.toDF().toDF("province", "amount")
      .groupBy("province")
      .agg(sum(col("amount").cast("decimal(18,2)")).as("total"))
    val q = sums.writeStream.format("memory").queryName("upd_sum")
      .outputMode("update").start()
    try {
      ms.addData(("bj", new java.math.BigDecimal("1.10")))
      q.processAllAvailable()
      ms.addData(("bj", new java.math.BigDecimal("2.20")))
      q.processAllAvailable()
      val versions = spark.table("upd_sum").collect()
        .map(r => r.getDecimal(1).toPlainString).toSeq.sorted
      assert(versions == Seq("1.10", "3.30"),
        s"each batch emitted the updated running sum: $versions")
    } finally q.stop()
  }
}
