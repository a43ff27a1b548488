package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Dev-only: q169 cost decomposition — which stage of the Poisson
  * bootstrap owns the wall-clock: the orders⋈customer scan, the two md5
  * digests, the 32 weight columns, or the 66-expression aggregate. Run on
  * sf0.1 (default) or a probe dir. Results land in NOTES as measurements
  * behind any optimization (or the decision not to). */
object MicrobenchBootstrap {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO q169 $label%-40s median ${ts.sorted.apply(reps / 2)}%.3f s")
    }

    val j = Relational.bootstrapJoined(spark, dir)
    time("scan+join only (count)") { j.count(); () }
    val P = 4503599627370449L
    def h52(tag: String) =
      conv(substring(md5(concat(lit(tag),
        col("okey").cast("string")).cast("binary")), 1, 13), 16, 10).cast("long")
    val withH = j.withColumn("h_a", h52("bootA_")).withColumn("h_b", h52("bootB_"))
    time("+ two md5 digests (agg bit_xor)") {
      withH.agg(expr("bit_xor(h_a)"), expr("bit_xor(h_b)")).head(); ()
    }
    val thr = Relational.poissonThresholds
    val withW = (0 until 32).foldLeft(withH) { (d, r) =>
      val h = (col("h_a") + lit(r.toLong) * col("h_b")) % P
      d.withColumn(s"w_$r", thr.map(t => when(h >= t, 1L).otherwise(0L)).reduce(_ + _))
    }
    time("+ 32 weight columns (agg sum w)") {
      withW.agg(expr((0 until 32).map(r => s"sum(w_$r)").mkString("+"))).head(); ()
    }
    time("full bootstrapCells (66-col agg)") {
      Relational.bootstrapCells(j).count(); ()
    }
    time("full bootstrapCi") {
      Relational.bootstrapCi(spark, dir).count(); ()
    }
    // candidate: explode the replicate index — ONE h expression and ONE
    // 9-compare weight chain through codegen, 32x the row stream but no
    // extra scan (explode is in-pipeline), partial agg collapses to
    // (segment, rep) groups map-side
    val wExpr = thr.map(t => when(col("h") >= t, 1L).otherwise(0L)).reduce(_ + _)
    time("explode-by-rep variant (agg)") {
      withH.select(col("segment"), col("cents"), col("h_a"), col("h_b"),
          explode(lit((0 until 32).toArray)).as("rep"))
        .withColumn("h", (col("h_a") + col("rep").cast("long") * col("h_b")) % P)
        .withColumn("w", wExpr)
        .groupBy("segment", "rep")
        .agg(sum(col("w") * col("cents")), sum(col("w")))
        .count(); ()
    }
    // candidate: same wide shape but branch-free casts instead of CaseWhen
    val withW2 = (0 until 32).foldLeft(withH) { (d, r) =>
      val h = (col("h_a") + lit(r.toLong) * col("h_b")) % P
      d.withColumn(s"w_$r",
        thr.map(t => (h >= t).cast("long")).reduce(_ + _))
    }
    time("wide variant, cast instead of when") {
      withW2.agg(expr((0 until 32).map(r => s"sum(w_$r)").mkString("+"))).head(); ()
    }
    spark.stop()
  }
}
