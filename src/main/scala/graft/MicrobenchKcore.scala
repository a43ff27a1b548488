package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: phase breakdown of q150 kCore at sf0.1 — edge build vs the
  * 6-round peel — to target the right half of its ~10 s. */
object MicrobenchKcore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // mirror Bench: without small splits the events scan (and everything
      // cached downstream of it) sits on a handful of fat partitions
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // dev knob: SPARK_KCORE_CONF="spark.x=y;spark.a=b" for plan bisection
    sys.env.get("SPARK_KCORE_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(ck, cv) if ck.nonEmpty => spark.conf.set(ck, cv)
        case _ if kv.trim.isEmpty          => () // trailing/double ';'
        case _ => sys.error(s"SPARK_KCORE_CONF: bad segment '$kv' (want k=v;k=v)")
      }
    })
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val (k, minCo) = (6, 26L)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // r18: mirror kCore's shape — raw pair stream in, the single user-keyed
    // collect_set exchange (dedup + eligibility + prefix base + verify
    // arrays) inside coActivityUserSlots. The count here materializes the
    // cache that production materializes via the slotFreq collect.
    val ua = operators.Relational.coActivityUserSlots(
      operators.Relational.coActivityPairs(spark, dir), minCo)
    t("user-slot arrays")(ua.count())
    val edges0 = operators.Relational.coActivityCandidates(ua, minCo)
      .join(ua.select(col("user_id").as("a"), col("ss").as("sa")), Seq("a"))
      .join(ua.select(col("user_id").as("b"), col("ss").as("sb")), Seq("b"))
      .filter(size(array_intersect(col("sa"), col("sb"))) >= minCo)
      .select("a", "b")
      .persist()
    t("edges (prefix+verify)")(println(s"  edges=${edges0.count()}"))
    if (sys.env.contains("SPARK_KCORE_PLAN"))
      println("MB-PLAN\n" + edges0.queryExecution.executedPlan.toString)

    def degrees(e: org.apache.spark.sql.DataFrame) =
      e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
    def cut(df: org.apache.spark.sql.DataFrame) = {
      val p = df.persist(); p.count()
      spark.createDataFrame(p.rdd, p.schema)
    }
    val allNodes = t("allNodes")(cut(edges0.select(col("a").as("v"))
      .unionByName(edges0.select(col("b").as("v"))).distinct()))
    var alive = allNodes
    var edges = edges0
    for (r <- 1 to 6) t(s"peel round $r") {
      val low = cut(alive.join(degrees(edges), Seq("v"), "left")
        .filter(coalesce(col("dg"), lit(0L)) < k)
        .select("v"))
      alive = alive.join(broadcast(low), Seq("v"), "left_anti")
      edges = cut(edges
        .join(broadcast(low.withColumnRenamed("v", "a")), Seq("a"), "left_anti")
        .join(broadcast(low.withColumnRenamed("v", "b")), Seq("b"), "left_anti"))
    }
    spark.stop()
  }
}
