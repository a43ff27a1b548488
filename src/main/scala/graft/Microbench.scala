package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Aggregators, VectorFns}
import graft.plans.VectorExpressions

/** Dev tool: measure the custom kernels against their composable baselines on
  * sf0.1 — the numbers backing the "custom Expression beats HOF beats UDF"
  * claims. Results are appended manually to PLANS.md. */
object Microbench {
  def time(label: String, reps: Int = 3)(f: => Long): Unit = {
    f // warmup
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"MICRO $label%-46s median ${times.sorted.apply(reps / 2)}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorExpressions.register(spark)
    val dir = "/root/testdata/sf0.1"
    val e = Tables.load(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val pairs = a.join(b, col("va") < col("vb")) // ~2M pairs at sf0.1

    time("pairwise dot: zip_with+aggregate (interpreted HOF)") {
      pairs.select(VectorFns.dotCol(col("ea"), col("eb")).as("d"))
        .agg(count(when(col("d") > 0, 1))).head().getLong(0)
    }
    time("pairwise dot: dot_f custom expression (codegen)") {
      pairs.select(VectorFns.dotFastCol(col("ea"), col("eb")).as("d"))
        .agg(count(when(col("d") > 0, 1))).head().getLong(0)
    }

    val ev = Tables.load(spark, dir, "events")
    time("distinct users: count(distinct) built-in") {
      ev.groupBy("event_type").agg(countDistinct(col("user_id"))).count()
    }
    time("distinct users: typed HashSet Aggregator") {
      ev.groupBy("event_type").agg(Aggregators.exactDistinct(col("user_id"))).count()
    }
    // ADVICE (round 1): the Kryo HashSet buffer round-trips on every partial
    // merge — measure at HIGH per-group cardinality (group by day: ~5k uniques
    // per group at sf0.1), not just the 5-group event_type split
    val byDay = ev.withColumn("dt", to_date(col("event_time")))
    time("distinct users/day (high card): count(distinct)") {
      byDay.groupBy("dt").agg(countDistinct(col("user_id"))).count()
    }
    time("distinct users/day (high card): typed Aggregator") {
      byDay.groupBy("dt").agg(Aggregators.exactDistinct(col("user_id"))).count()
    }

    // hyperplane LSH signature (round-5 md5-sign planes): per-(row,plane,dim)
    // md5 derivation vs the memoized plane matrix (VectorFns.hyperplanePlanes)
    val sigU = VectorFns.hyperplaneSigUdf(16)
    time("hyperplane sig(16 planes): memoized plane matrix") {
      e.select(sigU(col("embedding")).as("s")).agg(sum(col("s"))).head().get(0); 0L
    }
    val inlineSig = udf { (v: Seq[Float]) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      var sig = 0; var p = 0
      while (p < 16) {
        var dot = 0L; var d = 0
        while (d < v.length) {
          md.reset()
          val h = md.digest(s"${p}_${d}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          dot += math.floor(v(d).toDouble * 1048576.0).toLong * (if ((h(0) & 1) == 1) 1 else -1)
          d += 1
        }
        if (dot >= 0) sig |= (1 << p); p += 1
      }
      sig
    }
    time("hyperplane sig(16 planes): per-row md5 derivation") {
      e.select(inlineSig(col("embedding")).as("s")).agg(sum(col("s"))).head().get(0); 0L
    }

    // n-gram span extraction (q69's kernel finding, round 5): the
    // transform/slice/concat_ws HOF chain is CodegenFallback-interpreted
    val docTexts = Tables.load(spark, dir, "documents")
    time("10-gram spans/doc: shinglesCol HOF chain (interpreted)") {
      docTexts.select(explode(graft.functions.TextFns.shinglesCol(
        graft.functions.TextFns.tokensCol(col("text")), 10)).as("g")).count()
    }
    time("10-gram spans/doc: gramCounts single-pass kernel") {
      docTexts.select(explode(graft.functions.TextFns.gramCountsUdf(10)(col("text"))))
        .count()
    }

    // int8-quantized dot: codegen'd dot_i vs the interpreted HOF chain
    val qe = e.selectExpr("vec_id",
      "transform(embedding, x -> cast(round(x * 100) as int)) as qv")
    val qa = qe.select(col("vec_id").as("va"), col("qv").as("qa"))
    val qb = qe.select(col("vec_id").as("vb"), col("qv").as("qb"))
    val qpairs = qa.join(qb, col("va") < col("vb"))
    time("pairwise int8 dot: zip_with+aggregate (interpreted HOF)") {
      qpairs.selectExpr(
        "aggregate(zip_with(qa, qb, (x, y) -> cast(x as bigint) * y), cast(0 as bigint), (a, v) -> a + v) as d")
        .agg(count(when(col("d") > 0, 1))).head().getLong(0)
    }
    time("pairwise int8 dot: dot_i custom expression (codegen)") {
      qpairs.select(call_function("dot_i", col("qa"), col("qb")).as("d"))
        .agg(count(when(col("d") > 0, 1))).head().getLong(0)
    }

    // connected components at 1M edges (far beyond any LSH candidate set in
    // the fixtures): distributed large-star/small-star vs driver union-find.
    // Deterministic splitmix graph over 400k nodes: ~mix of chains and hubs.
    {
      import spark.implicits._
      val edges1m = spark.range(1000000).select(
        (pmod(expr("xxhash64(id)"), lit(400000L))).as("da"),
        (pmod(expr("xxhash64(id + 1000000)"), lit(400000L))).as("db"))
        .filter(col("da") =!= col("db"))
        .cache()
      edges1m.count()
      time("connected components 1M edges: driver union-find", reps = 1) {
        graft.operators.Dedup.clusters(edges1m).count()
      }
      time("connected components 1M edges: large-star/small-star", reps = 1) {
        graft.operators.Dedup.clusters(edges1m, collectThreshold = 0L).count()
      }
      val a = graft.operators.Dedup.clusters(edges1m)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = graft.operators.Dedup.clusters(edges1m, collectThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"MICRO cc-1m regimes agree: ${a == b} (${a.size} nodes)")
      edges1m.unpersist()
    }

    import graft.functions.TextFns._
    val docs = Tables.load(spark, dir, "documents")
    time("shingle sets: composed HOF columns") {
      docs.select(array_distinct(shinglesCol(tokensCol(col("text")), 3)).as("s"))
        .agg(sum(size(col("s")))).head().get(0); 0L
    }
    time("shingle sets: single-pass hash kernel UDF") {
      docs.select(shingleHashesUdf(col("text")).as("s"))
        .agg(sum(size(col("s")))).head().get(0); 0L
    }
    spark.stop()
  }
}
