package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Dev-only: q169 cost decomposition — which stage of the Poisson
  * bootstrap owns the wall-clock. The hash constructions come from
  * Relational's own private[graft] members so the probe measures the REAL
  * production expressions and cannot drift. The "old wide shape" sections
  * re-build the 32-wide-weight-column formulation this round REMOVED —
  * kept here as the measured justification: the wide projection blows the
  * generated code past the JIT compile threshold and runs interpreted
  * (round 16: 5.2 s vs 0.6 s at sf0.1; branch-free casts change nothing —
  * it is code size, not branching). Run on sf0.1 (default) or a probe
  * dir. */
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
      println(f"MICRO q169 $label%-44s median ${ts.sorted.apply(reps / 2)}%.3f s")
    }

    val j = Relational.bootstrapJoined(spark, dir)
    time("scan+join only (count)") { j.count(); () }
    val P = Relational.bootstrapP
    val withH = j.withColumn("h_a", Relational.bootstrapH52("bootA_"))
      .withColumn("h_b", Relational.bootstrapH52("bootB_"))
    time("+ two md5 digests (agg bit_xor)") {
      withH.agg(expr("bit_xor(h_a)"), expr("bit_xor(h_b)")).head(); ()
    }
    val thr = Relational.poissonThresholds
    // the REMOVED formulation: 32 wide weight columns (when-chains)
    val withW = (0 until 32).foldLeft(withH) { (d, r) =>
      val h = (col("h_a") + lit(r.toLong) * col("h_b")) % P
      d.withColumn(s"w_$r", thr.map(t => when(h >= t, 1L).otherwise(0L)).reduce(_ + _))
    }
    time("OLD wide shape: 32 weight cols (agg)") {
      withW.agg(expr((0 until 32).map(r => s"sum(w_$r)").mkString("+"))).head(); ()
    }
    // the REMOVED formulation with branch-free casts — proves the cliff is
    // code SIZE, not branch misprediction
    val withW2 = (0 until 32).foldLeft(withH) { (d, r) =>
      val h = (col("h_a") + lit(r.toLong) * col("h_b")) % P
      d.withColumn(s"w_$r", thr.map(t => (h >= t).cast("long")).reduce(_ + _))
    }
    time("OLD wide shape, casts not whens (agg)") {
      withW2.agg(expr((0 until 32).map(r => s"sum(w_$r)").mkString("+"))).head(); ()
    }
    // the CURRENT production shape (explode-by-replicate + eager local
    // materialization of the (segment, rep) cells)
    time("current bootstrapCells (explode+collect)") {
      Relational.bootstrapCells(j).count(); ()
    }
    time("full bootstrapCi") {
      Relational.bootstrapCi(spark, dir).count(); ()
    }
    spark.stop()
  }
}
