package graft.operators

import graft.Tables
import graft.functions.VectorFns._
import graft.plans.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`array<float>` columns).
  *
  * Scale design: the brute-force path broadcasts the (small) QUERY set against
  * the (huge) candidate corpus — a map-side-only scan with no shuffle of the
  * corpus; per-query top-k then shuffles only k·|queries| rows. The LSH path
  * buckets candidates by random-hyperplane signature so each query only scans
  * its own bucket — the 100 TB ANN strategy (IVF-style, deterministic planes).
  *
  * Hot-path arithmetic uses the codegen'd `dot_f` Catalyst expression
  * (graft.plans.DotProductF); row norms are computed ONCE per row before any
  * pairwise join, never per pair. `cos = dot/(sqrt(dot(a,a))*sqrt(dot(b,b)))`
  * keeps the exact operation order of the composed VectorFns version, so
  * results stay bit-identical to the DuckDB oracle comparison.
  */
object Similarity {

  /** Salt threshold of the [[knnEdges]] bounded-bucket construction — the
    * ONE definition both engines read: Spark through knnEdges' default and
    * DuckDB through [[graft.Oracles.knnEdgeCtes]]' default. Tuning it in
    * one place keeps the cross-engine constructions identical; a split
    * value would diverge only when some bucket exceeds the smaller cap —
    * exactly the regime the sf0.01 hash gate cannot see (round-14
    * review). */
  private[graft] val KnnBucketCap = 512

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(spark)
    Tables.load(spark, dir, "embeddings")
  }

  /** Exact top-5 cosine neighbors for queries vec_id < 10 (broadcast queries,
    * scan corpus once, rank per query). */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        normFastCol(col("embedding")).as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      normFastCol(col("embedding")).as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotFastCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** All embedding pairs with cosine > 0.4 (embedding near-dup detection).
    * Quadratic VERIFIER path, key-capped at vec_id < 500 exactly like the other
    * all-pairs oracle paths (Dedup.ngramJaccard / winnowPairs) so no oracled
    * query carries an unbounded cartesian; [[annLsh]]/[[ivfAnn]] are the
    * bucketed scale paths for the full corpus. */
  def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
      .filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding"), normFastCol(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("va") < col("vb"))
      .filter(dotFastCol(col("ea"), col("eb")) / (col("na") * col("nb")) > 0.4)
      .select(col("va"), col("vb"))
  }

  /** Embedding near-dup CLUSTERS: connected components over the verified
    * cosine pair graph — the vector-modality twin of
    * [[graft.operators.Dedup.nearDupClusters]], closing the embedding dedup
    * loop (pairs → clusters → keeper = min vec_id). Runs on the capped
    * verifier pair set; at scale the pair source swaps to [[annLsh]]/[[ivfAnn]]
    * candidates with the same clustering, and clusters() itself is the
    * two-regime (bounded union-find / large-star-small-star) implementation.
    * Oracle: recursive-CTE components over DuckDB's exact cosine pairs. */
  def embeddingClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.clusters(
      cosineNearDup(spark, dir).select(col("va").as("da"), col("vb").as("db")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))

  /** Cross-modal dedup-consistency audit: for every TEXT near-dup pair
    * (MinHash-LSH, the q26 path) with embeddings on both sides, report the
    * embedding cosine and whether the vector modality corroborates the text
    * signal (cos ≥ 0.4, [[cosineNearDup]]'s threshold). When both signals
    * feed a dedup decision at scale, systematic disagreement is the first
    * sign of an embedding-pipeline fault (stale vectors, wrong alignment) —
    * this is the audit that catches it. Pair set is LSH-bounded; the two
    * embedding lookups are joins on the (doc ≡ vec) id. */
  def modalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(spark, dir)
    val e = emb(spark, dir)
      .select(col("vec_id"), col("embedding"), normFastCol(col("embedding")).as("nrm"))
    pairs
      .join(e.select(col("vec_id").as("da"), col("embedding").as("ea"), col("nrm").as("na")), "da")
      .join(e.select(col("vec_id").as("db"), col("embedding").as("eb"), col("nrm").as("nb")), "db")
      .withColumn("cos", dotFastCol(col("ea"), col("eb")) / (col("na") * col("nb")))
      .select(col("da"), col("db"), col("jac"), col("cos"),
        (col("cos") >= 0.4).as("modality_agree"))
  }

  /** Hard-negative mining for dense-retrieval training (DPR-style): for each
    * query vector, the top-5 most-similar candidates EXCLUDING itself and
    * every member of its own near-dup cluster — cluster mates are positives
    * or duplicates, and keeping them would train on false negatives. Same
    * broadcast-queries/one-corpus-scan shape as [[knnBruteForce]]; the
    * cluster labels ([[embeddingClusters]]) are near-dup-sized, so both label
    * joins broadcast. */
  def hardNegatives(spark: SparkSession, dir: String,
                    clusterLabels: Option[DataFrame] = None): DataFrame = {
    val labels = clusterLabels.getOrElse(embeddingClusters(spark, dir))
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        normFastCol(col("embedding")).as("qn"))
      .join(broadcast(labels.select(col("vec_id").as("query_id"), col("cluster_id").as("qcl"))),
        Seq("query_id"), "left")
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      normFastCol(col("embedding")).as("cn"))
      .join(broadcast(labels.select(col("vec_id").as("neighbor_id"), col("cluster_id").as("ccl"))),
        Seq("neighbor_id"), "left")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .filter(col("qcl").isNull || col("ccl").isNull || col("qcl") =!= col("ccl"))
      .withColumn("cos", dotFastCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Top-3 neighbors on int8-QUANTIZED embeddings — the memory-scale path: a
    * 64-dim float32 vector is 256 B, its int8 twin 64 B, so a 100 TB corpus's
    * ANN working set shrinks 4× (the standard IVF-PQ-lite move). Per-vector
    * symmetric scale = 127/max|x|; ranking uses the quantized cosine
    * (int dot / int norms), which preserves neighbor order up to quantization
    * error — recall vs [[knnBruteForce]] is gated in DedupSimilaritySpec.
    * Quantization runs once per ROW (higher-order transform); the per-PAIR
    * kernel is the codegen'd `dot_i` Catalyst expression (exact long
    * arithmetic: 127²·dim ≪ 2⁶³), mirroring the float path's `dot_f`. */
  /** Per-vector symmetric int8 quantization (scale = 127/max|x|, the q51
    * construction shared by [[knnQuantized]], [[mmrRerank]] and [[dbscan]]):
    * adds `qv: array<int>`. */
  private def int8(e: DataFrame): DataFrame =
    e.withColumn("scale",
      expr("127.0 / greatest(aggregate(embedding, cast(0.0 as double), " +
        "(a, x) -> greatest(a, abs(cast(x as double)))), cast(1e-9 as double))"))
      .withColumn("qv", expr("transform(embedding, x -> cast(round(x * scale) as int))"))

  def knnQuantized(spark: SparkSession, dir: String): DataFrame = {
    val e = int8(emb(spark, dir))
      .withColumn("qn", sqrt(call_function("dot_i", col("qv"), col("qv")).cast("double")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"), col("qn").as("qqn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("qv").as("cv"), col("qn").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("qcos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      // zero-norm guard: an all-zero embedding would make qcos = 0/0 = NaN,
      // and NaN sorts ABOVE every real cosine in descending order — pin such
      // rows to the bottom instead of the top of every ranking
      .withColumn("qcos",
        when(col("qqn") * col("cn") > 0,
          call_function("dot_i", col("qq"), col("cv")).cast("double") / (col("qqn") * col("cn")))
          .otherwise(lit(-2.0)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  // ---------------- IVF (inverted-file) ANN ----------------

  /** Quantize a vector to the exact-integer grid the coarse quantizer lives
    * on: floor(x·2²⁰) — float scaling by a power of two then floor is exact
    * in IEEE double on every engine (the same trick as the q28 LSH planes). */
  private def qgrid(v: Seq[Float]): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { out(i) = math.floor(v(i).toDouble * 1048576.0).toLong; i += 1 }
    out
  }

  /** Deterministic Lloyd's k-means over a driver-side sample — the coarse
    * quantizer. Real systems train the quantizer on a small sample centrally
    * (CPU/GPU) and only ASSIGN + SEARCH distributed; at 100 TB the sample stays
    * O(k·dim·1000) no matter the corpus size.
    *
    * Integer-exact by design (round 5): points are floor(x·2²⁰) ints,
    * centroids are TRUNCATED integer means (S/n — Java Long division ≡
    * DuckDB `//`), so every distance is an exact integer ≤ 64·2⁴⁴ — no float
    * accumulation order, no rational comparisons, and the whole training run
    * replays bit-identically as unrolled SQL (q33's oracle). The
    * sub-quantization-step perturbation vs classic Lloyd (< 2⁻²⁰ of the data
    * scale per mean) is irrelevant to a coarse quantizer; recall stays
    * spec-gated in DedupSimilaritySpec. */
  def trainCentroids(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Long]] =
    trainCentroidsQ(sample.map(v => qgrid(v)), k, iters)

  /** The integer core of [[trainCentroids]], reusable on points that are
    * ALREADY on the integer grid — in particular the coarse-cell RESIDUALS
    * the IVF-PQ codebooks train on ([[ivfPq]]). */
  private[graft] def trainCentroidsQ(pts: Array[Array[Long]], k: Int, iters: Int): Array[Array[Long]] = {
    val dim = pts.head.length
    // deterministic init: evenly strided sample points
    var centroids = Array.tabulate(k)(i => pts(i * pts.length / k).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Long](dim))
      val counts = new Array[Long](k)
      pts.foreach { v =>
        var best = 0; var bestD = Long.MaxValue
        var c = 0
        while (c < k) {
          var d = 0L; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => sums(c)(i) / counts(c)))
    }
    centroids
  }

  private[graft] def nearestCentroids(v: Seq[Float], centroids: Array[Array[Long]], n: Int): Seq[Int] = {
    val q = qgrid(v)
    centroids.indices.sortBy { c =>
      var d = 0L; var i = 0
      while (i < q.length) { val t = q(i) - centroids(c)(i); d += t * t; i += 1 }
      (d, c)
    }.take(n)
  }

  /** IVF ANN: corpus bucketed by nearest coarse centroid (one assignment scan);
    * each query probes its `nprobe` nearest cells and exact-cosine reranks only
    * those candidates — scanning nprobe/k of the corpus instead of all of it. */
  def ivfAnn(spark: SparkSession, dir: String, k: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val sample = e.filter(col("vec_id") < 1024).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val centroids = trainCentroids(sample, k, iters = 5)
    val assignU = udf((v: Seq[Float]) => nearestCentroids(v, centroids, 1).head)
    val probeU = udf((v: Seq[Float]) => nearestCentroids(v, centroids, nprobe))
    // materialize the assigned corpus once: it feeds both join sides and the
    // assignment UDF scan would otherwise run per branch (the cluster-scale
    // analog is writing the IVF index — assignment is a build step, not a
    // per-query cost). persist, not localCheckpoint: recomputable lineage,
    // nothing pinned to live executors.
    val corpus = e
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        normFastCol(col("embedding")).as("cn"), assignU(col("embedding")).as("cell"))
      .persist()
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        normFastCol(col("embedding")).as("qn"),
        explode(probeU(col("embedding"))).as("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotFastCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** ANN RECALL@K EVALUATION (q204) — the measurement that makes an ANN
    * index trustworthy at scale: recall@3 of the [[ivfAnn]] probed search
    * against the exact brute-force ground truth ([[knnBruteForce]]), per
    * query. Every production ANN deployment gates on exactly this number
    * (FAISS's `nprobe` tuning loop, the recall/latency Pareto curve);
    * shipping an IVF index without it is flying blind — a recall
    * regression from a bad centroid train or an undersized nprobe is
    * invisible in the index's own output.
    *
    * Scale shape: the ground truth is ONE corpus scan against a BOUNDED
    * broadcast query sample (the q23 shape — at 100 TB you evaluate on a
    * fixed query panel, never all-pairs), the approximate side probes
    * nprobe/k of the corpus as always, and the recall join is
    * query-panel-sized (control plane). Evaluation cost is therefore one
    * extra corpus scan per index build, amortized over its lifetime. */
  def annRecall(spark: SparkSession, dir: String, k: Int = 16,
                nprobe: Int = 4): DataFrame =
    recallAgainstExact(spark, dir,
      ivfAnn(spark, dir, k, nprobe).select("query_id", "neighbor_id"))

  /** PQ RECALL@K EVALUATION (q207) — the QUANTIZATION companion of
    * [[annRecall]]: recall@3 of the [[ivfPq]] ADC search (8-subspace
    * product codes, ~16× vector compression on top of the same coarse
    * probing) against the identical exact ground truth. Together with
    * q204 this is the recall/compression Pareto a deployment actually
    * tunes: IVF pays only the probe-miss recall loss, IVF-PQ adds the
    * code-distortion loss — this query measures that delta on the same
    * panel, same k, same tie-breaks. Scale shape identical to q204. */
  def pqRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstExact(spark, dir,
      ivfPq(spark, dir).select("query_id", "neighbor_id"))

  /** Shared recall@3 frame: per-query overlap of an approximate top-3
    * (query_id, neighbor_id) result with the exact brute-force top-3. */
  private def recallAgainstExact(spark: SparkSession, dir: String,
                                 appr: DataFrame): DataFrame = {
    val exact = knnBruteForce(spark, dir).filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(appr.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(col("hit")).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / lit(3.0d)).as("recall"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication of
    * the embedding corpus. Vectors are bucketed by the SAME integer-exact
    * coarse quantizer [[ivfAnn]] trains; within each cell, a vector with any
    * LOWER-id cell-mate at cosine ≥ `tau` is a semantic duplicate and is
    * dropped — the min-id member of every similar pair survives. One row per
    * vector: (vec_id, cell, kept).
    *
    * Documented divergence from the paper: the paper scans each cluster
    * sequentially (order-dependent greedy); the min-id rule is the
    * deterministic, fully parallel variant — a vector's fate depends only on
    * its own cell's smaller-id members, so the pass is one cell-bounded
    * semi-join, no iteration. Recall loss across cell boundaries is inherent
    * to SemDeDup (the paper accepts it for the k-fold pair-space cut).
    *
    * Scale: pairwise work is quadratic only WITHIN a cell (E[|cell|] = n/k;
    * raise k ∝ √n at 100 TB exactly as an IVF index would) and cells process
    * independently after one shuffle on cell id. Training stays the bounded
    * driver-side sample build step shared with [[ivfAnn]]. */
  def semanticDedup(spark: SparkSession, dir: String, k: Int = 16, tau: Double = 0.4): DataFrame = {
    val e = emb(spark, dir)
    val sample = e.filter(col("vec_id") < 1024).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val centroids = trainCentroids(sample, k, iters = 5)
    val assignU = udf((v: Seq[Float]) => nearestCentroids(v, centroids, 1).head)
    // one assignment scan feeds both self-join sides and the final
    // projection; stays cached until the harness's per-query cache release
    // (Bench/Verify clear caches between queries — a long-lived session
    // embedding this operator owns the release)
    val assigned = e
      .select(col("vec_id"), col("embedding"), normFastCol(col("embedding")).as("nrm"),
        assignU(col("embedding")).as("cell"))
      .persist()
    val a = assigned.select(col("cell"), col("vec_id").as("ua"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("ub"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("ua") < col("ub"))
      .filter(dotFastCol(col("ea"), col("eb")) / (col("na") * col("nb")) >= tau)
      .select(col("ub").as("vec_id")).distinct()
    assigned
      .join(dropped.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        not(coalesce(col("is_dup"), lit(false))).as("kept"))
  }

  /** Incremental SEMANTIC admission — the vector twin of
    * [[graft.operators.Dedup.ingestNearDup]]: a newly embedded batch vector
    * (vec_id ≥ max/3, matching the q74/q76 store split) is rejected when the
    * historical store holds a same-cell vector at cosine ≥ `tau`. Cross-set
    * only: store×batch cell collisions — never store×store or batch×batch —
    * so the daily admission cost is |batch|-proportional, not corpus². Emits
    * the rejection evidence (store_vec_id, batch_vec_id, cos); admitted
    * batch = anti-join on this. Cells come from the SAME integer-exact
    * coarse quantizer as [[semanticDedup]]/[[ivfAnn]] (one training, one
    * assignment scan, persisted). */
  def ingestSemanticDedup(spark: SparkSession, dir: String, k: Int = 16,
                          tau: Double = 0.4): DataFrame = {
    val e = emb(spark, dir)
    val sample = e.filter(col("vec_id") < 1024).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val centroids = trainCentroids(sample, k, iters = 5)
    val assignU = udf((v: Seq[Float]) => nearestCentroids(v, centroids, 1).head)
    val wm = e.agg(expr("max(vec_id) div 3").as("wm"))
    // cached until the harness's per-query release, as in semanticDedup above
    val assigned = e.crossJoin(broadcast(wm))
      .select(col("vec_id"), col("wm"), col("embedding"),
        normFastCol(col("embedding")).as("nrm"), assignU(col("embedding")).as("cell"))
      .persist()
    val store = assigned.filter(col("vec_id") < col("wm"))
      .select(col("cell"), col("vec_id").as("store_vec_id"),
        col("embedding").as("ea"), col("nrm").as("na"))
    val batch = assigned.filter(col("vec_id") >= col("wm"))
      .select(col("cell"), col("vec_id").as("batch_vec_id"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    store.join(batch, Seq("cell"))
      .withColumn("cos", dotFastCol(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("store_vec_id"), col("batch_vec_id"), col("cos"))
  }

  /** Johnson–Lindenstrauss dimensionality reduction via dense ±1
    * (Rademacher) sign projection — the Charikar-style matrix with every
    * entry nonzero: 64-dim float embeddings → 16 integer
    * coordinates, proj(j) = Σ_d sign(j,d)·floor(v_d·2²⁰), with the SAME
    * memoized md5-derived plane matrix as the q28 LSH (so the oracle
    * re-derives every sign). The cheap pre-step that lets downstream
    * clustering/kNN run at 4× less memory and compute; one map-side pass,
    * zero shuffles (posexplode to (vec_id, j, val) rows only so the driver
    * can hash-compare a scalar schema). */
  def randomProject(spark: SparkSession, dir: String, outDim: Int = 16): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"), posexplode(projectPlanesUdf(outDim)(col("embedding"))))
      .select(col("vec_id"), col("pos").cast("int").as("j"), col("col").as("val"))

  /** Streaming twin of [[ingestSemanticDedup]]: a STREAM of new vectors
    * admitted against a static historical store. Per micro-batch:
    * `dropDuplicates(vec_id)` state absorbs exact re-sends across batches,
    * then a stream-static LEFT ANTI join on (same cell AND cosine ≥ tau)
    * drops semantic duplicates of the store. The store is static within a
    * run (the daily-compaction model [[graft.operators.Dedup.streamingIngest]]
    * documents): vectors admitted in-flight do NOT extend it mid-run —
    * cross-batch semantic state would need the store re-broadcast per batch,
    * which is the next compaction cycle's job, not the stream's.
    * The quantizer (trained once, closure-shipped) assigns cells on both
    * sides, so the anti-join's equi-key bounds the cosine work per batch
    * row to its own cell's store slice. */
  def streamingSemanticAdmission(stream: DataFrame, store: DataFrame,
                                 centroids: Array[Array[Long]],
                                 tau: Double = 0.4,
                                 dedupResends: Boolean = true,
                                 keepAllCols: Boolean = false): DataFrame = {
    // dedupResends=false: for composition behind a stage that ALREADY holds
    // dedup state (StreamingCuration's fingerprint dedup) — one stateful
    // operator per stream keeps the plan in Spark's supported envelope.
    // keepAllCols=true: emit the full admitted row (minus scratch) instead
    // of the (vec_id, cell) projection, so downstream sinks see the doc.
    VectorExpressions.register(stream.sparkSession)
    val assignU = udf((v: Seq[Float]) => nearestCentroids(v, centroids, 1).head)
    val s0 = stream
      .withColumn("cell", assignU(col("embedding")))
      .withColumn("nrm", normFastCol(col("embedding")))
    // UNBOUNDED state caveat (same run model as streamingIngest's docs):
    // dropDuplicates on an unwatermarked stream keeps one state row per
    // vec_id forever; within the documented daily-compaction cycle that
    // is bounded by a day's ingest, and a deployment that can attach an
    // event-time column should use dropDuplicatesWithinWatermark instead
    val s = if (dedupResends) s0.dropDuplicates("vec_id") else s0
    val st = store
      .select(col("embedding").as("se"))
      .withColumn("scell", assignU(col("se")))
      .withColumn("sn", normFastCol(col("se")))
    val admitted = s.join(st,
      col("cell") === col("scell") &&
        dotFastCol(col("embedding"), col("se")) / (col("nrm") * col("sn")) >= tau,
      "left_anti")
    if (keepAllCols) admitted.drop("nrm")
    else admitted.select(col("vec_id"), col("cell"))
  }

  /** Product-quantization ANN (Jégou et al. 2011, "Product Quantization for
    * Nearest Neighbor Search"): each 64-dim vector splits into M=8 8-dim
    * subvectors, each encoded as its nearest of 16 per-subspace centroids —
    * 8 codes per vector (vs 256 B float32: a 32× working-set compression,
    * the memory regime past [[knnQuantized]]'s int8 4×). Search is
    * asymmetric (ADC): the query stays unquantized; a per-query M×16 table
    * of exact integer subspace distances is built once, and each corpus
    * vector's approximate distance is M table lookups summed.
    *
    * Integer-exact end to end — the same floor(x·2²⁰) grid and
    * truncated-integer-mean k-means as [[ivfAnn]], per subspace — so the
    * WHOLE pipeline (8 quantizer trainings, corpus encoding, ADC ranking)
    * replays as unrolled SQL in the q82 oracle.
    *
    * Scale: training is 8 tiny driver-side k-means over a bounded sample
    * (the index build step); encoding is one linear corpus scan; search
    * broadcasts the 10 query tables against the coded corpus with no
    * shuffle until the per-query top-k. The two bounded collects (sample,
    * query vectors) are index-build/query-set control plane, not
    * corpus-sized actions.
    *
    * Recall is spec-gated on PLANTED cluster structure (top-3 all from the
    * query's own cluster): PQ's premise is clusterable data, and on the
    * uniform random fixture the codebook error swamps the concentrated
    * neighbor gaps (~0.15 L2-top-3 recall — same documented caveat as
    * [[annLsh]]; real embedding corpora have low intrinsic dimension). */
  def pqAnn(spark: SparkSession, dir: String, m: Int = 8, ksub: Int = 16): DataFrame = {
    val e = emb(spark, dir)
    val sample = e.filter(col("vec_id") < 1024).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dim = sample.head.length
    val sub = dim / m
    val cent: Array[Array[Array[Long]]] = Array.tabulate(m)(mi =>
      trainCentroids(sample.map(_.slice(mi * sub, (mi + 1) * sub)), ksub, iters = 5))
    def subgrid(v: Seq[Float], mi: Int): Array[Long] = {
      val out = new Array[Long](sub); var i = 0
      while (i < sub) { out(i) = math.floor(v(mi * sub + i).toDouble * 1048576.0).toLong; i += 1 }
      out
    }
    def d2(a: Array[Long], c: Array[Long]): Long = {
      var d = 0L; var i = 0
      while (i < a.length) { val t = a(i) - c(i); d += t * t; i += 1 }; d
    }
    val encodeU = udf((v: Seq[Float]) =>
      (0 until m).map { mi =>
        val q = subgrid(v, mi)
        var best = 0; var bestD = Long.MaxValue; var c = 0
        while (c < ksub) { val d = d2(q, cent(mi)(c)); if (d < bestD) { bestD = d; best = c }; c += 1 }
        best
      })
    val qvecs = e.filter(col("vec_id") < 10).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val tables: Map[Long, Array[Array[Long]]] = qvecs.map { case (id, v) =>
      id -> Array.tabulate(m, ksub)((mi, c) => d2(subgrid(v, mi), cent(mi)(c)))
    }.toMap
    val adcU = udf((qid: Long, code: Seq[Int]) => {
      val t = tables(qid); var s = 0L; var mi = 0
      while (mi < m) { s += t(mi)(code(mi)); mi += 1 }; s
    })
    val corpus = e.select(col("vec_id").as("neighbor_id"), encodeU(col("embedding")).as("code"))
    val qdf = spark.createDataFrame(qvecs.map(q => Tuple1(q._1)).toSeq).toDF("query_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    corpus.crossJoin(broadcast(qdf))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcU(col("query_id"), col("code")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("adist"), col("rnk"))
  }

  /** IVF-PQ composite index (Jégou et al. 2011 §IV — the FAISS IVFPQ shape):
    * the coarse quantizer routes each vector to one of `k` cells, and the
    * per-cell RESIDUAL (vector − its centroid) is product-quantized with
    * `m`×`ksub` codebooks. Search probes `nprobe` cells and ADC-ranks ONLY
    * their members using per-(query, probed-cell) residual distance tables —
    * the full memory-scale ANN stack: nprobe/k of the corpus scanned, 8
    * codes + a cell id per stored vector. Residual encoding (vs [[pqAnn]]'s
    * raw PQ) is what keeps codebook error small near cell centers — the
    * composite's point.
    *
    * Integer-exact end to end: residuals are differences of 2²⁰-grid
    * integers, so the coarse training (5 Lloyd rounds), the 8 residual
    * codebook trainings (3 rounds each), the encoding, and the ADC sums all
    * replay as generated SQL in the q91 oracle. Index build = bounded
    * driver-side sample work; encoding = one linear corpus scan; search =
    * broadcast probe frame + closure-shipped tables, one top-k shuffle. */
  def ivfPq(spark: SparkSession, dir: String, k: Int = 16, m: Int = 8,
            ksub: Int = 16, nprobe: Int = 4): DataFrame = {
    val e = emb(spark, dir)
    val sample = e.filter(col("vec_id") < 1024).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dim = sample.head.length
    val sub = dim / m
    val pts = sample.map(v => qgrid(v))
    val coarse = trainCentroidsQ(pts, k, iters = 5)
    def distFull(a: Array[Long], c: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val t = a(i) - c(i); s += t * t; i += 1 }; s
    }
    def assignQ(q: Array[Long]): Int = {
      var best = 0; var bd = Long.MaxValue; var c = 0
      while (c < k) { val d = distFull(q, coarse(c)); if (d < bd) { bd = d; best = c }; c += 1 }
      best
    }
    def residOf(q: Array[Long], cell: Int): Array[Long] =
      Array.tabulate(dim)(i => q(i) - coarse(cell)(i))
    val residuals = pts.map(p => residOf(p, assignQ(p)))
    val pq: Array[Array[Array[Long]]] = Array.tabulate(m)(mi =>
      trainCentroidsQ(residuals.map(_.slice(mi * sub, (mi + 1) * sub)), ksub, iters = 3))
    def subDist(r: Array[Long], mi: Int, c: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < sub) { val t = r(mi * sub + i) - c(i); s += t * t; i += 1 }; s
    }
    val encodeU = udf((v: Seq[Float]) => {
      val q = qgrid(v); val cell = assignQ(q); val r = residOf(q, cell)
      cell +: (0 until m).map { mi =>
        var best = 0; var bd = Long.MaxValue; var c = 0
        while (c < ksub) {
          val d = subDist(r, mi, pq(mi)(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        best
      }
    })
    val qvecs = e.filter(col("vec_id") < 10).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> qgrid(r.getSeq[Float](1)))
    def probes(q: Array[Long]): Seq[Int] =
      (0 until k).sortBy(c => (distFull(q, coarse(c)), c)).take(nprobe)
    // per-(query, probed cell) ADC table over the query's residual IN THAT CELL
    val tables: Map[(Long, Int), Array[Array[Long]]] = (for {
      (qid, q) <- qvecs
      cell <- probes(q)
    } yield {
      val r = residOf(q, cell)
      (qid, cell) -> Array.tabulate(m, ksub)((mi, cc) => subDist(r, mi, pq(mi)(cc)))
    }).toMap
    val probeDf = spark.createDataFrame(
      qvecs.flatMap { case (qid, q) => probes(q).map(c => (qid, c)) }.toSeq)
      .toDF("query_id", "cell")
    val adcU = udf((qid: Long, cell: Int, code: Seq[Int]) => {
      val t = tables((qid, cell)); var s = 0L; var mi = 0
      while (mi < m) { s += t(mi)(code(mi)); mi += 1 }; s
    })
    val corpus = e.select(col("vec_id").as("neighbor_id"), encodeU(col("embedding")).as("cc"))
      .select(col("neighbor_id"), col("cc").getItem(0).as("cell"),
        expr(s"slice(cc, 2, $m)").as("code"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    corpus.join(broadcast(probeDf), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adcU(col("query_id"), col("cell"), col("code")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("adist"), col("rnk"))
  }

  /** Approximate top-3 neighbors via random-hyperplane LSH with multi-probe:
    * the corpus is bucketed by a 4-bit signature; each query probes its own
    * bucket plus the 4 hamming-1 buckets, and exact cosine re-ranks within the
    * probed candidates. Multi-probe trades a 5× candidate factor for recall —
    * the standard move when the data has no cluster structure (as here: random
    * embeddings). Recall measured against [[knnBruteForce]] in ScalaTest. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val planes = 4
    val sigU = hyperplaneSigUdf(planes)
    val e = emb(spark, dir)
      .withColumn("bucket", sigU(col("embedding")))
      .withColumn("nrm", normFastCol(col("embedding")))
    val probe = explode(array(
      col("bucket") +: (0 until planes).map(i => col("bucket").bitwiseXOR(lit(1 << i))): _*))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"), probe.as("bucket"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      col("nrm").as("cn"), col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotFastCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** The 2²⁰-grid quantization as a SQL-side map (float→double cast, scale by
    * a power of two, floor — every step IEEE-exact on both engines), the
    * column twin of [[qgrid]]. `array<int>` because the grid fits (|x|·2²⁰ ≪
    * 2³¹ for unit-scale embeddings) and `dot_i` rides it codegen'd. */
  private def qgridCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(c, x => floor(x.cast("double") * lit(1048576.0d)).cast("int"))

  /** EMBEDDING CENTROID DRIFT (q193) — the classifier-free distribution
    * check between sources: per-source mean embedding (the linear-kernel
    * MMD statistic [Gretton et al., JMLR 2012 — with k(x,y) = x·y, MMD² is
    * exactly the squared centroid distance]) and the pairwise L2² matrix
    * between the means. Large drift = the sources occupy different
    * embedding regions (mixing them changes the training distribution;
    * routing/curation should know); near-zero everywhere = one domain. The
    * EMBEDDING-space sibling of q90's token drift and q187's lexical
    * overlap.
    *
    * Exact integers: components on the 2²⁰ grid, per-source sums via the
    * element-wise [[graft.functions.Aggregators.vecSum]] partial agg
    * (mappers forward ≤ K dim-length rows), centroid = truncated integer
    * mean per dim (the q33/q108 convention), pairwise distance = exact
    * long Σδ² over the K-row control-plane frame.
    *
    * Scale shape: ONE corpus scan (embeddings ⋈ broadcast-joined source
    * labels at test scale; co-partitioned ids at 100 TB), one K-group
    * partial agg, then K(K−1)/2 fixed-size centroid pairs — no all-pairs
    * over rows anywhere. */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame =
    driftFromSums(centroidSums(spark, dir))

  /** The (source, n, Σq) sufficient-statistic frame under q193 — ADDITIVE
    * per source (count and element-wise vector sum), which is exactly what
    * [[graft.streaming.CentroidStream]] maintains incrementally. */
  def centroidSums(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "documents").select(
      col("doc_id").as("vec_id"), col("source"))
    emb(spark, dir)
      .join(src, Seq("vec_id"))
      .select(col("source"), qgridCol(col("embedding")).as("q"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        graft.functions.Aggregators.vecSum(col("q")).as("s"))
  }

  /** Pairwise drift matrix from a (source, n, s) sufficient-statistic
    * frame — the read half shared by batch q193 and the streaming
    * maintainer (centroid = truncated integer mean, exact long L2²). */
  def driftFromSums(sums: DataFrame): DataFrame = {
    val cent = sums.select(col("source"), col("n"),
      expr("transform(s, x -> x div n)").as("c"))
    val a = cent.select(col("source").as("src_a"), col("n").as("n_a"), col("c").as("ca"))
    val b = cent.select(col("source").as("src_b"), col("n").as("n_b"), col("c").as("cb"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("l2sq", expr(
        "aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("l2sq"))
  }

  /** DIMENSION-ABLATION RECALL CURVE (q183) — the Matryoshka evaluation
    * [Kusupati et al., "Matryoshka Representation Learning", NeurIPS'22]:
    * how much top-k retrieval quality each PREFIX of the embedding keeps.
    * Truncating to the first d dims is the standard storage/latency lever
    * (a d-dim index is 64/d× smaller and faster); this measures what it
    * costs: for each d ∈ {8, 16, 32, 64}, brute top-k cosine on the
    * d-prefix for the probe queries, recall = overlap with the full-dim
    * top-k (d = 64 is its own ground truth, recall 1 — the audit row).
    *
    * Determinism: 2²⁰-grid integer components (the q108/kmeans grid), so
    * every dot is an exact long; cosine is the q51 double construction
    * (one sqrt per side, one division — replays in SQL); ranking by
    * (qcos desc, neighbor_id); recall 2²⁰-quantized — the integer div of
    * two exact counts.
    *
    * Scale shape: queries are broadcast (the q23 bounded-query-side
    * argument), the corpus is scanned ONCE with the dim axis EXPLODED
    * map-side (4 slices of an already-loaded row — no re-scan per dim);
    * per-(dim, query) ranking is a bounded-key window; recall is one
    * |dims|-row aggregate. At 100 TB the brute pair stage swaps for the
    * LSH/IVF candidate source like every ANN query here — the ablation
    * logic (slice, rank, overlap) is unchanged. */
  def dimAblation(spark: SparkSession, dir: String,
                  dims: Seq[Int] = Seq(8, 16, 32, 64), k: Int = 3): DataFrame = {
    VectorExpressions.register(spark)
    val e = emb(spark, dir).select(col("vec_id"), qgridCol(col("embedding")).as("qv"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("qv").as("cv"))
    val w = Window.partitionBy(col("dim"), col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    val topk = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        explode(array(dims.map(lit(_)): _*)).as("dim"), col("qq"), col("cv"))
      .withColumn("qs", expr("slice(qq, 1, dim)"))
      .withColumn("cs", expr("slice(cv, 1, dim)"))
      .withColumn("qn", sqrt(call_function("dot_i", col("qs"), col("qs")).cast("double")))
      .withColumn("cn", sqrt(call_function("dot_i", col("cs"), col("cs")).cast("double")))
      .withColumn("qcos", when(col("qn") * col("cn") > 0,
        call_function("dot_i", col("qs"), col("cs")).cast("double") / (col("qn") * col("cn")))
        .otherwise(lit(-2.0)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("dim"), col("query_id"), col("neighbor_id"))
      .persist() // feeds truth AND the recall join; released by the caller's clearCache
    val truth = topk.filter(col("dim") === dims.max)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    topk.join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("dim")
      .agg(count(lit(1)).as("possible"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("recall_q", expr("(hits * 1048576) div possible"))
  }

  /** Distributed Lloyd's k-means over the FULL embedding corpus — the
    * training-at-scale sibling of [[trainCentroids]]. The sample-to-driver
    * trainer is right for a coarse ANN quantizer; cluster-based CURATION
    * (SemDeDup's cluster stage, SSL-prototype pruning — Sorscher et al. 2022)
    * reads per-point distances, which need the full-corpus iteration. Here
    * each round is two Spark jobs and O(k·dim) driver state:
    *
    *  - E-step: map-only — centroids ship as literals (the broadcast of a
    *    control-plane-sized model), assignment is an `array_min` over k
    *    (dist, cid) structs, distances via the polarization identity
    *    Σ(a−b)² = a·a + c·c − 2·a·c on the codegen'd `dot_i` kernel, so the
    *    corpus is never shuffled for assignment.
    *  - M-step: ONE partially-aggregated groupBy(cid) — [[Aggregators.vecSum]]
    *    + count; every mapper forwards at most k dim-length partial rows, so
    *    shuffle volume is O(k·dim·mappers) at any corpus size.
    *
    * Integer-exact like every ANN path in this file: points floor(x·2²⁰),
    * truncated integer centroid means (JVM Long division ≡ DuckDB `//`, the
    * q33-proven parity), exact Long distances — the whole run replays
    * bit-identically as q108's unrolled CTE chain. Seeds = the k lowest
    * vec_ids; empty clusters keep their previous centroid; argmin ties go to
    * the lowest cid (struct ordering on (reduced dist, cid): the reduced
    * dist rd = c·c − 2·q·c differs from the true dist by the per-row
    * constant q·q, so argmin and tie order are identical). The quantized
    * frame is persisted for the iters+1 passes — at cluster scale that
    * boundary is the materialized quantized-corpus table, built once per
    * training run. */
  def kmeansAssign(spark: SparkSession, dir: String, k: Int = 8, iters: Int = 4): DataFrame =
    kmeansAssignFrom(emb(spark, dir), k, iters)

  /** Frame form of [[kmeansAssign]]: `e` needs vec_id + embedding. */
  def kmeansAssignFrom(e: DataFrame, k: Int = 8, iters: Int = 4): DataFrame = {
    val spark = e.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val pts = e.select(col("vec_id"), qgridCol(col("embedding")).as("q")).persist()

    def best(cs: Array[Array[Int]]): org.apache.spark.sql.Column =
      array_min(array(cs.zipWithIndex.map { case (c, i) =>
        val cLit = typedLit(c.toSeq)
        val c2 = c.foldLeft(0L)((a, v) => a + v.toLong * v)
        struct(
          (lit(c2) - lit(2L) * call_function("dot_i", col("q"), cLit)).as("rd"),
          lit(i).as("cid"))
      }: _*))

    var centroids: Array[Array[Int]] = pts.filter(col("vec_id") < k)
      .orderBy("vec_id").select("q").as[Seq[Int]].collect().map(_.toArray)
    require(centroids.length == k, s"need the $k seed vec_ids present")
    for (_ <- 0 until iters) {
      val stats = pts
        .select(best(centroids).getField("cid").as("cid"), col("q"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), graft.functions.Aggregators.vecSum(col("q")).as("s"))
        .as[(Int, Long, Seq[Long])].collect()
      val next = centroids.map(_.clone())
      stats.foreach { case (cid, n, s) =>
        next(cid) = s.map(v => (v / n).toInt).toArray // truncated mean ≡ `//`
      }
      centroids = next
    }
    pts.select(
      col("vec_id"),
      best(centroids).getField("cid").as("cid"),
      (call_function("dot_i", col("q"), col("q")) +
        best(centroids).getField("rd")).as("dist"))
  }

  /** GREEDY k-CENTER CORESET (q199) — farthest-point traversal [Gonzalez
    * 1985, a 2-approximation to the optimal k-center cover; the coreset
    * selection of Sener & Savarese ICLR 2018]: seed at the lowest vec_id,
    * then k−1 times pick the point FARTHEST from everything chosen — the k
    * exemplars that cover the embedding space with minimal radius. The
    * diversity complement of density-biased curation: [[semanticDedup]] and
    * [[kmeansPrototypes]] keep the TYPICAL, k-center keeps the SPREAD (the
    * rare modes a proportional sample would miss). Output, one row per
    * center: selection order, sel_d2 = its distance² to the
    * previously-chosen set at selection (a non-increasing curve that IS
    * the k-vs-cover-radius decision table — read it to pick k), and the
    * final Voronoi load (n_assigned / max_d2 / sum_d2; max_d2 over centers
    * is the cover radius the 2-approximation bounds).
    *
    * Scale shape: k bounded rounds, each ONE map-only corpus pass — the
    * chosen set rides as literals into the codegen'd `dot_i`
    * (min-dist² = |q|² + min over centers of (|c|² − 2·q·c), exact longs on
    * the 2²⁰ grid: |rd| ≤ 3·64·2⁴² ≪ 2⁶³) reduced by ONE tie-free max_by
    * partial agg to a single driver row, so O(k) rows ever reach the driver
    * and nothing corpus-shaped shuffles (the [[trainCentroids]] /
    * [[kmeansAssignFrom]] control-plane discipline; the final assignment
    * pass is a k-key partial-agged groupBy). Replays bit-identically as
    * unrolled SQL: grid ints, long arithmetic, (d², round) assignment tie
    * order and (d² DESC, vec_id) selection tie order. */
  def kcenterCoreset(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    kcenterCoresetFrom(emb(spark, dir), k)

  /** One chosen k-center: selection round, the point, its grid vector, and
    * its distance² to the previously-chosen set at selection. */
  private[graft] final case class KCenter(round: Int, vecId: Long,
                                          qv: Seq[Int], selD2: Long)

  /** The greedy selection loop of [[kcenterCoresetFrom]] over a PRE-GRIDDED
    * (vec_id, q: array<int>) frame — factored out so the streaming
    * composable-coreset maintainer ([[graft.streaming.KCenterStream]]) runs
    * the IDENTICAL traversal per micro-batch and again over the stored
    * candidates at read time. Deterministic: seed = lowest vec_id, each
    * round the (min-dist² DESC, vec_id) maximum over the NOT-YET-CHOSEN
    * points — already-chosen vec_ids are excluded from the max_by frame
    * (round-14 ADVICE #2: with duplicate embeddings every remaining point
    * can sit at min-dist² 0, and an unfiltered argmax would re-pick the
    * already-chosen lowest vec_id, emitting the same center twice and
    * leaving the streamed vec_id-keyed store with fewer than k candidates;
    * duplicate embeddings are the NORM at corpus scale — duplicate docs
    * embed identically — so the degenerate case is handled, not
    * documented away; the oracle and KCenterRef mirror the exclusion).
    * O(k) driver rows; the exclusion is ≤ k−1 literals, so each round
    * stays one map-only pass. Rounds clamp at the point count — with
    * fewer than k points every point IS a center; an empty frame fails
    * loudly instead of NPE-ing inside the seed decode. */
  private[graft] def kcenterSelect(pts: DataFrame, k: Int): Seq[KCenter] = {
    val spark = pts.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val n = pts.count()
    require(n > 0L, "kcenterSelect: empty input frame (no embeddings)")
    val seed = pts
      .select(min_by(struct(col("vec_id"), col("q")), col("vec_id")).as("s"))
      .select(col("s.vec_id"), col("s.q")).as[(Long, Seq[Int])].head()
    val centers = scala.collection.mutable.ArrayBuffer(KCenter(0, seed._1, seed._2, 0L))
    for (r <- 1 until math.min(k.toLong, n).toInt) {
      val mind2 = call_function("dot_i", col("q"), col("q")) +
        array_min(array(kcenterRds(centers.toSeq).map(_._1): _*))
      // d2 is PROJECTED once before the argmax: the max_by form needs it in
      // both the value and the comparator struct, and relying on codegen
      // subexpression elimination to dedup r+1 dot products per row across
      // two agg arguments proved fragile (round-16 q199 adjudication —
      // the projection alone claws back most of the round-15 slowdown)
      val far = pts
        .filter(!col("vec_id").isin(centers.toSeq.map(_.vecId): _*))
        .select(col("vec_id"), col("q"), mind2.as("d2"))
        .select(max_by(struct(col("vec_id"), col("q"), col("d2")),
          struct(col("d2"), negate(col("vec_id")))).as("s"))
        .select(col("s.vec_id"), col("s.q"), col("s.d2"))
        .as[(Long, Seq[Int], Long)].head()
      centers += KCenter(r, far._1, far._2, far._3)
    }
    centers.toSeq
  }

  /** rd(c) = |c|² − 2·q·c per chosen center, so d²(q, c) = |q|² + rd(c) —
    * the chosen set as literals into the codegen'd `dot_i`. */
  private def kcenterRds(centers: Seq[KCenter])
  : Seq[(org.apache.spark.sql.Column, Int)] = centers.map { c =>
    val c2 = c.qv.foldLeft(0L)((a, v) => a + v.toLong * v)
    (lit(c2) - lit(2L) * call_function("dot_i", col("q"), typedLit(c.qv)), c.round)
  }

  /** The 2²⁰ grid as a (vec_id, q) frame — shared by the batch operator and
    * the streaming maintainer's per-batch selection. */
  private[graft] def kcenterPts(e: DataFrame): DataFrame =
    e.select(col("vec_id"), qgridCol(col("embedding")).as("q"))

  /** Voronoi load of a chosen set over `pts`: one row per center round with
    * n_assigned / max_d2 / sum_d2; assignment ties go to the earliest round
    * (array_min over (rd, rnd) structs is the (d², round) lexicographic
    * order because |q|² is a per-row constant). */
  private[graft] def kcenterLoads(pts: DataFrame, centers: Seq[KCenter]): DataFrame = {
    val bestS = array_min(array(kcenterRds(centers).map { case (rd, rnd) =>
      struct(rd.as("rd"), lit(rnd).as("rnd")) }: _*))
    pts
      .select((call_function("dot_i", col("q"), col("q")) + bestS.getField("rd")).as("d2"),
        bestS.getField("rnd").as("rnd"))
      .groupBy("rnd")
      .agg(count(lit(1)).as("n_assigned"), max(col("d2")).as("max_d2"),
        sum(col("d2")).as("sum_d2"))
  }

  /** Frame form of [[kcenterCoreset]]: `e` needs vec_id + embedding. */
  def kcenterCoresetFrom(e: DataFrame, k: Int = 8): DataFrame = {
    val spark = e.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val pts = kcenterPts(e).persist()
    try {
      val centers = kcenterSelect(pts, k)
      val trace = centers.map(c => (c.round, c.vecId, c.selD2))
        .toDF("sel_round", "center_vec_id", "sel_d2")
      trace.join(kcenterLoads(pts, centers), col("sel_round") === col("rnd"))
        .select(col("sel_round"), col("center_vec_id"), col("sel_d2"),
          col("n_assigned"), col("max_d2"), col("sum_d2"))
    } finally { pts.unpersist(); () }
  }

  /** GREEDY FACILITY-LOCATION SELECTION (q200) — the REPRESENTATIVENESS
    * member of the data-selection triad [Nemhauser–Wolsey–Fisher '78
    * (1−1/e) greedy on a monotone submodular objective; CRAIG/submodular
    * coreset selection, Mirzasoleiman et al. ICML'20]: q181 maximizes
    * lexical COVERAGE, q199 maximizes geometric SPREAD, this maximizes
    * f(S) = Σ_x max(0, max_{s∈S} ⟨x, s⟩) — total corpus mass REPRESENTED
    * by the chosen exemplars, the objective that favors dense-mode
    * centers over outliers (the mirror image of k-center). Candidates
    * come from a deterministic bounded pool (the `pool` smallest
    * md5(vec_id) — the q184/q196 sampling rule: selection quality is set
    * by pool coverage, not corpus size); each greedy round picks the
    * pool member with the largest marginal gain, ties to the lowest
    * vec_id. Output: one row per pick — selection order, the exemplar,
    * its marginal gain, and the running total coverage. The gain SUM is
    * corpus-sized and a 10⁹-vector corpus at 2⁴⁰-scale dots overflows a
    * long, so the ARITHMETIC runs in decimal(38,0) (the q188
    * HUGEINT-mirror move) — but the EDGE columns are emitted as canonical
    * digit-string VARCHAR: the round-14 driver gate proved that a
    * decimal(38,0) edge column is exactly where two loaders' canonical
    * renderings diverge (`Decimal('…')` vs float64 scientific notation)
    * while the values are cell-for-cell equal; digit strings are the
    * simplest exact loader-canonical encoding of a ≥2⁶³-capable integer,
    * and the oracle emits the same `cast(… as varchar)` digits.
    *
    * Scale shape: k bounded rounds, each ONE map-only corpus pass — all
    * |pool| candidate dots AND the chosen-set coverage ride as literal
    * `dot_i` expressions, reduced by ONE agg to |pool| partial sums (a
    * single driver row per round; the corpus never shuffles). The
    * accumulation identity Σ new_cur = Σ cur + gain (cur ≥ 0 makes
    * max(cur, dot) = cur + max(0, dot − cur) pointwise) keeps the running
    * total exact without a second pass. Replays bit-identically as
    * unrolled SQL: long dots per pair, HUGEINT gain sums, (gain DESC,
    * vec_id) tie order. */
  def facilityLocation(spark: SparkSession, dir: String, k: Int = 4,
                       pool: Int = 16): DataFrame =
    facilityLocationFrom(emb(spark, dir), k, pool)

  /** Frame form of [[facilityLocation]]: `e` needs vec_id + embedding. */
  def facilityLocationFrom(e: DataFrame, k: Int = 4, pool: Int = 16): DataFrame = {
    val spark = e.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val pts = kcenterPts(e).persist()
    try {
      require(pts.count() > 0L, "facilityLocation: empty input frame (no embeddings)")
      val poolRows = pts
        .withColumn("h", md5(col("vec_id").cast("string")))
        .orderBy(col("h"), col("vec_id")).limit(pool)
        .select(col("vec_id"), col("q")).as[(Long, Seq[Int])].collect().sortBy(_._1)
      // (vecId, qv, gain, totalCov) in selection order
      var chosen = Vector.empty[(Long, Seq[Int], BigDecimal, BigDecimal)]
      for (_ <- 0 until math.min(k, poolRows.length)) {
        val cands = poolRows.filter(c => !chosen.exists(_._1 == c._1))
        val cur =
          if (chosen.isEmpty) lit(0L)
          else greatest((lit(0L) +: chosen.map(s =>
            call_function("dot_i", col("q"), typedLit(s._2)))): _*)
        // cur is PROJECTED once per row: every gain column subtracts the
        // same covered-so-far max, and inlining it would compute |chosen|
        // dot products per CANDIDATE per row instead of per row (round-16
        // q200 adjudication — the projection claws back the round-15
        // slowdown; same identity, same decimal sums, oracle unchanged)
        val scored = pts.select(col("q"), cur.as("cur"))
        val gainCols = cands.map { c =>
          sum(greatest(call_function("dot_i", col("q"), typedLit(c._2)) - col("cur"),
            lit(0L)).cast("decimal(38,0)")).as(s"g_${c._1}")
        }
        val row = scored.agg(gainCols.head, gainCols.tail: _*).head()
        val gains = cands.indices.map(i =>
          cands(i)._1 -> BigDecimal(row.getDecimal(i)))
        val (vid, gain) = gains.maxBy { case (id, g) => (g, -id) }
        val qv = cands.find(_._1 == vid).get._2
        val total = (if (chosen.isEmpty) BigDecimal(0) else chosen.last._4) + gain
        chosen :+= ((vid, qv, gain, total))
      }
      // gain/total_cov leave as canonical digit strings, NOT decimal —
      // the internal sums stay decimal(38,0) for the ≥2⁶³ headroom, but a
      // decimal edge type hashes differently under the driver's two
      // loaders (the round-14 q200 incident; see the scaladoc). BigInteger
      // .toString is the canonical form: no exponent, no leading zeros.
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("sel_round", IntegerType, nullable = false),
        StructField("rep_vec_id", LongType, nullable = false),
        StructField("gain", StringType, nullable = false),
        StructField("total_cov", StringType, nullable = false)))
      val out = chosen.zipWithIndex.map { case ((vid, _, g, t), r) =>
        org.apache.spark.sql.Row(r, vid,
          g.bigDecimal.setScale(0).toBigInteger.toString,
          t.bigDecimal.setScale(0).toBigInteger.toString) }
      spark.createDataFrame(
        java.util.Arrays.asList(out: _*), schema)
    } finally { pts.unpersist(); () }
  }

  /** SSL-prototype data pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws"): keep, per k-means cluster, the m MOST CENTRAL points —
    * the prototypical examples whose distance-to-centroid ranks lowest.
    * Consumes [[kmeansAssign]]'s per-point distances (the reason that
    * training runs full-corpus) and selects with the k-bounded
    * [[Aggregators.topK]] partial aggregate, NOT a per-cluster window:
    * cluster sizes are power-law (one web-boilerplate cluster can hold
    * millions of members), and `row_number().over(partitionBy("cid"))`
    * would sort every member of the hottest cluster on one reducer — the
    * exact q78/q36 pathology this repo de-skewed twice. The aggregator
    * forwards ≤ m rows per cluster per mapper; ranking ties break on the
    * lowest vec_id, and −dist rides the aggregator's (v DESC, id ASC) order
    * exactly (|dist| < 2⁵³, so the Double negation is exact). The DuckDB
    * oracle ranks with row_number over the replayed q108 chain, proving the
    * window ≡ aggregator equivalence on every run. */
  def kmeansPrototypes(spark: SparkSession, dir: String, k: Int = 8,
                       iters: Int = 4, m: Int = 20): DataFrame =
    kmeansPrototypesFrom(kmeansAssign(spark, dir, k, iters), m)

  /** Frame form of [[kmeansPrototypes]]: `assign` needs vec_id, cid, dist. */
  def kmeansPrototypesFrom(assign: DataFrame, m: Int = 20): DataFrame =
    assign.groupBy("cid")
      .agg(graft.functions.Aggregators
        .topK(m, -col("dist").cast("double"), col("vec_id"), col("dist")).as("top"))
      .select(col("cid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("cid"), col("s.id").as("vec_id"), col("s.p").as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))

  /** Windowed reference construction of [[kmeansPrototypesFrom]] — kept ONLY
    * for the equality spec; do not use on real data (per-cluster sort of
    * power-law cluster sizes on one reducer). */
  private[graft] def kmeansPrototypesWindowed(assign: DataFrame, m: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("cid")).orderBy(col("dist"), col("vec_id"))
    assign
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= m)
      .select(col("cid"), col("vec_id"), col("dist"), col("rnk"))
  }

  /** Distributed PCA by power iteration — the LEARNED-projection complement
    * of [[randomProject]] (q87 projects onto random signs; this learns the
    * corpus's top principal direction and scores every row's projection onto
    * it — the embedding-space axis for outlier triage, whitening checks, and
    * 1-D curriculum ordering). The distributed part is exactly ONE corpus
    * scan: the Gram matrix G = Σ qqᵀ over 2²⁰-grid integer vectors,
    * accumulated per (i ≤ j) dimension pair as DECIMAL(38,0) — overflow-free
    * at ANY corpus size (each row adds < 2³⁸ per cell; 10³⁸/2³⁸ ≈ 10²⁶ rows)
    * — with map-side combine, so the shuffle carries dim²/2 partial rows per
    * task no matter the row count. The dim×dim result is bounded
    * control-plane (like the quantizer samples): the driver mirrors it into
    * BigInt and runs `iters` exact power steps, rescaling to the 2²⁰ grid by
    * truncated division each step (BigInt `/` ≡ DECIMAL DIV ≡ DuckDB HUGEINT
    * `//`, the q98-proven parity) — every step is integer arithmetic, so the
    * learned direction replays bit-identically in q110's oracle CTE chain.
    * The final scoring pass is map-only: the direction ships as a literal
    * into the codegen'd `dot_i` kernel (|q·v| < 2¹⁹·2²⁰·dim ≪ 2⁶³). */
  def pcaPowerScores(spark: SparkSession, dir: String, iters: Int = 8): DataFrame =
    pcaPowerScoresFrom(emb(spark, dir), iters)

  /** Frame form of [[pcaPowerScores]]: `e` needs vec_id + embedding.
    *
    * Dim budget: the Gram scan explodes dim·(dim+1)/2 cells PER ROW before
    * the map-side combine (testdata dim=16 → 136 cells/row; a 768-dim
    * embedding table would be 295k cells/row — 4 orders of magnitude more
    * scan work, and the wrong algorithm shape). Guarded at dim ≤ 128
    * (≤ 8.3k cells/row, still scan-dominated). Past that, switch the one
    * corpus scan to a per-partition outer-product accumulator
    * (`mapPartitions` over primitive arrays emitting one dim×dim block per
    * partition) — same exact integer Gram, no row-wise explode. */
  def pcaPowerScoresFrom(e: DataFrame, iters: Int = 8): DataFrame = {
    val spark = e.sparkSession
    VectorExpressions.register(spark)
    import spark.implicits._
    val pts = e.select(col("vec_id"), qgridCol(col("embedding")).as("q"))
    val dim = pts.select(size(col("q"))).as[Int].head()
    require(dim <= 128,
      s"pcaPowerScoresFrom: dim=$dim explodes ${dim * (dim + 1) / 2} Gram cells " +
        "per row; above 128 dims use a mapPartitions outer-product accumulator " +
        "instead of the posexplode scan (see scaladoc)")
    // one scan: upper-triangle Gram cells, exact decimal accumulation
    val cells = pts
      .select(col("q"), posexplode(col("q")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum((col("xi").cast("long") * col("xj")).cast("decimal(38,0)")).as("g"))
      .as[(Int, Int, java.math.BigDecimal)].collect()
    val gram = Array.fill(dim, dim)(BigInt(0))
    cells.foreach { case (i, j, g) =>
      val v = BigInt(g.toBigIntegerExact)
      gram(i)(j) = v; gram(j)(i) = v
    }
    var v = Array.fill(dim)(BigInt(1))
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + gram(i)(j) * v(j)))
      val m = w.map(_.abs).max
      require(m > 0, "pcaPowerScores: zero Gram matrix")
      v = w.map(x => x * BigInt(1048576) / m) // truncated rescale to the 2^20 grid
    }
    val vLit = typedLit(v.map(_.toInt).toSeq)
    pts.select(col("vec_id"), call_function("dot_i", col("q"), vLit).as("score_q"))
  }

  /** HYBRID RETRIEVAL VIA RECIPROCAL RANK FUSION (q124) — the standard
    * two-tower RAG retrieval stack: a LEXICAL leg (BM25, the q81 ranking)
    * and a DENSE leg (embedding cosine, the q23 ranking) fused by RRF
    * [Cormack, Clarke & Büttcher, SIGIR 2009]: score(d) = Σ_legs
    * 1/(60 + rank_leg(d)). RRF needs only RANKS, never the incomparable
    * raw scores — which is exactly why it is the production default for
    * mixing BM25 with cosine. Each query q1–q3 pairs its q81 term set with
    * the embedding of vec_id 1–3 (the doc ≡ vec identity the modality
    * audit q77 pins).
    *
    * Determinism: each leg's rank is already engine-stable (q81's
    * integer-quantized BM25; q23's cosine with id tiebreak), and the RRF
    * contribution is the INTEGER floor(10^6/(60+rank)) — so the fused
    * score is an exact long and the final (score DESC, doc_id) order
    * replays bit-for-bit in DuckDB.
    *
    * Scale shape: both legs are the corpus-scan + broadcast-small-side
    * plans they already are (q81: query-term semi-filter before any
    * shuffle; dense: broadcast 3 query vectors, one corpus scan,
    * k-bounded top-k). The fusion itself touches only 2·K·topN rank rows
    * — a full outer join on (query, doc) of two tiny frames. Depth 20 per
    * leg, fused top-10. */
  def hybridRrf(spark: SparkSession, dir: String,
                depth: Int = 20, topK: Int = 10): DataFrame = {
    val lex = TextOps.bm25Search(spark, dir, depth)
      .select(col("query"), col("doc_id"), col("rnk").as("rnk_lex"))
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id").isin(1, 2, 3))
      .select(concat(lit("q"), col("vec_id")).as("query"),
        col("vec_id").as("qid"), col("embedding").as("qv"),
        normFastCol(col("embedding")).as("qn"))
    val c = e.select(col("vec_id").as("doc_id"), col("embedding").as("cv"),
      normFastCol(col("embedding")).as("cn"))
    val wd = Window.partitionBy(col("query"))
      .orderBy(col("cos").desc, col("doc_id"))
    val dense = c.join(broadcast(q), col("qid") =!= col("doc_id"))
      .withColumn("cos", dotFastCol(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk_vec", row_number().over(wd))
      .filter(col("rnk_vec") <= depth)
      .select(col("query"), col("doc_id"), col("rnk_vec"))
    def contrib(rnk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(floor(lit(1000000L) / (lit(60) + rnk)).cast("long"), lit(0L))
    val wf = Window.partitionBy(col("query"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    lex.join(dense, Seq("query", "doc_id"), "full_outer")
      .withColumn("rrf_score", contrib(col("rnk_lex")) + contrib(col("rnk_vec")))
      .withColumn("rnk", row_number().over(wf))
      .filter(col("rnk") <= topK)
      .select(col("query"), col("doc_id"), col("rrf_score"),
        col("rnk").cast("int").as("rnk"),
        col("rnk_lex").isNotNull.as("in_lex"), col("rnk_vec").isNotNull.as("in_vec"))
  }

  /** MMR DIVERSIFIED RERANKING (q142) — Maximal Marginal Relevance
    * [Carbonell & Goldstein, SIGIR'98], the standard fix for a retrieval
    * stack (q23/q81/q124) that returns five copies of the same answer: the
    * final list is built GREEDILY, each pick maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s). At λ = ½ the argmax is
    * equivalent to the all-INTEGER criterion rel − maxSim (both sides
    * scaled by 2), so with q51's int8-quantized dot products as rel and
    * sim, the entire greedy selection — ranking, marginal penalties,
    * tiebreaks (score DESC, id ASC) — replays bit-for-bit in the oracle's
    * unrolled rounds. On a near-dup-heavy corpus the reranker provably
    * demotes the twins the pure-relevance list stacks (spec).
    *
    * Scale shape: relevance is the q23 broadcast-queries map-only scan;
    * per-query candidates come from a k-BOUNDED `topK` partial agg (the
    * corpus is never sorted); candidate vectors join back via one
    * broadcast semi-join; the greedy itself runs per query over a
    * ≤ topC-element array in a UDF — bounded control-plane work per
    * group, the same budget class as a re-ranker model call, NOT a
    * corpus-sized loop (the driver never collects anything). */
  def mmrRerank(spark: SparkSession, dir: String,
                topC: Int = 12, select: Int = 5): DataFrame = {
    val e = int8(emb(spark, dir))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"))
    val c = e.select(col("vec_id").as("cand_id"), col("qv").as("cv"))
    val rel = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("rel", call_function("dot_i", col("qq"), col("cv")))
    val top = rel.groupBy("query_id")
      .agg(graft.functions.Aggregators.topK(
        topC, col("rel").cast("double"), col("cand_id"), col("rel")).as("top"))
      .select(col("query_id"), explode(col("top")).as("s"))
      .select(col("query_id"), col("s.id").as("cand_id"), col("s.p").as("rel"))
    val packed = top.join(c, Seq("cand_id"))
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("cand_id"), col("rel"), col("cv"))))
        .as("cands"))
    val mmr = udf { (cands: Seq[org.apache.spark.sql.Row]) =>
      val cs = cands.map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2)))
      def dot(a: Seq[Int], b: Seq[Int]): Long = {
        var s = 0L; var i = 0
        while (i < a.length) { s += a(i).toLong * b(i); i += 1 }; s
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Int])]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      while (selected.length < select && selected.length < cs.length) {
        val remaining = cs.filterNot(c => selected.exists(_._1 == c._1))
        val best = remaining.map { case (id, r, v) =>
          val pen = if (selected.isEmpty) 0L else selected.map(s => dot(v, s._3)).max
          (id, r - pen, v)
        }.minBy { case (id, sc, _) => (-sc, id) }
        selected += best
        out += ((out.length + 1, best._1, best._2))
      }
      out.toSeq
    }
    packed.select(col("query_id"), explode(mmr(col("cands"))).as("pick"))
      .select(col("query_id"), col("pick._1").as("rank"),
        col("pick._2").as("cand_id"), col("pick._3").as("mmr_score"))
  }

  /** DBSCAN DENSITY CLUSTERING (q143) — [Ester, Kriegel, Sander & Xu,
    * KDD'96] over the embedding space: the clustering family member
    * k-means (q108) can't be — no k chosen up front, arbitrary-shape
    * clusters, and an explicit NOISE verdict, which for a training corpus
    * is the interesting output (noise = embedding-space outliers the
    * curation loop inspects; dense cores = semantic duplicate families,
    * the q79 SemDeDup signal by another route).
    *
    * Determinism: distances are int8-quantized L2² via three codegen'd
    * integer dots (|a−b|² = a·a + b·b − 2a·b) — exact longs, engine-equal;
    * the classic DBSCAN nondeterminism (a border point within eps of two
    * clusters joins whichever scanned it first) is resolved to the MIN
    * cluster id, making the labeling replay-stable and oracle-checkable.
    * Core components label through [[Dedup.clusters]] (component-min id,
    * the q32 machinery).
    *
    * Scale shape: the neighbor stage here is the QUADRATIC VERIFIER on the
    * key-capped prefix (vec_id < cap — the q24/q19 all-pairs oracle-path
    * convention: no oracled query carries an unbounded cartesian). The
    * 100 TB candidate generator is the same banded LSH/IVF bucketing the
    * ANN suite uses (q28/q33): neighbors-within-eps per bucket, identical
    * verify predicate — swap the pair source, keep everything downstream. */
  def dbscan(spark: SparkSession, dir: String, eps2: Long = 150000L,
             minPts: Int = 4, cap: Int = 500): DataFrame = {
    val e = int8(emb(spark, dir)).filter(col("vec_id") < cap)
      .withColumn("sq", call_function("dot_i", col("qv"), col("qv")))
      .select(col("vec_id"), col("qv"), col("sq"))
      .persist()
    val a = e.select(col("vec_id").as("va"), col("qv").as("qa"), col("sq").as("sa"))
    val b = e.select(col("vec_id").as("vb"), col("qv").as("qb"), col("sq").as("sb"))
    val pairs = a.join(b, col("va") < col("vb"))
      .withColumn("d2",
        col("sa") + col("sb") - lit(2L) * call_function("dot_i", col("qa"), col("qb")))
      .filter(col("d2") <= eps2)
      .select(col("va"), col("vb"))
      .persist()
    val sym = pairs.unionByName(pairs.select(col("vb").as("va"), col("va").as("vb")))
    // |N_eps(p)| counts the point itself (the KDD'96 convention)
    val nbc = sym.groupBy("va").agg((count(lit(1)) + 1).as("n"))
    val core = nbc.filter(col("n") >= minPts).select(col("va").as("id"))
    val coreEdges = sym
      .join(core.select(col("id").as("va")), Seq("va"), "left_semi")
      .join(core.select(col("id").as("vb")), Seq("vb"), "left_semi")
      .select(col("va").as("da"), col("vb").as("db"))
    // component-min labels; isolated cores fall back to their own id
    val lbl = graft.operators.Dedup.clusters(coreEdges)
      .select(col("doc_id").as("id"), col("cluster_id"))
    val coreLbl = core.join(lbl, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    // border = non-core within eps of >= 1 core; deterministic MIN-cluster
    // assignment resolves the classic scan-order ambiguity
    val borderLbl = sym
      .join(coreLbl.select(col("id").as("vb"), col("cluster_id")), Seq("vb"))
      .join(core.select(col("id").as("va")), Seq("va"), "left_anti")
      .groupBy(col("va").as("id"))
      .agg(min(col("cluster_id")).as("cluster_id"))
    e.select(col("vec_id"))
      .join(coreLbl.select(col("id").as("vec_id"), col("cluster_id").as("c1")),
        Seq("vec_id"), "left")
      .join(borderLbl.select(col("id").as("vec_id"), col("cluster_id").as("c2")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("c1").isNotNull, "core")
          .when(col("c2").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("c1"), col("c2"), lit(-1L)).as("cluster_id"))
  }

  /** EMBEDDING WHITENING (q172) — per-dimension z-score normalization of
    * the embedding table, the standard preprocessing in front of the ANN /
    * clustering family (distance comparisons assume comparably-scaled
    * dimensions; a high-variance dimension otherwise dominates every L2 in
    * q23/q33/q143). Output is an int8-range re-quantization: dimension d's
    * component becomes clamp(⌊32·z⌋, ±127) with z = (x−μ_d)/σ_d.
    *
    * Exactness discipline: components quantize to integers FIRST
    * (⌊x·2²⁰⌋ — the q28 move), so the per-dimension moment sums are exact
    * decimals with no float accumulation order; z's numerator is the exact
    * integer n·x_q − Σ_d, its denominator the per-dim constant
    * ⌊√(n·Σx² − (Σx)²)⌋ (one exactly-rounded double sqrt of an exact
    * integer — deterministic in both engines), and the final ⌊32·z⌋ is one
    * mirrored double op chain. Shape: one posexplode scan → a 64-row
    * moment aggregate (map-side combinable) → broadcast join back → the
    * rewrite is map-only. Constant dimensions (σ = 0) emit 0. */
  def whitenEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val comp = emb(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("xq", floor(col("x").cast("double") * 1048576L).cast("long"))
      .select(col("vec_id"), col("dim"), col("xq"))
    val mom = comp.groupBy("dim").agg(
      count(lit(1)).as("n"),
      sum(col("xq").cast("decimal(38,0)")).as("s"),
      // dec-first: xq ≈ x·2^20 wraps in long when squared past |x| ≈ 2900;
      // cast the factors before the product (oracle is HUGEINT-first too).
      sum(col("xq").cast("decimal(38,0)") * col("xq").cast("decimal(38,0)")).as("s2"))
      .withColumn("v", col("n") * col("s2") - col("s") * col("s"))
      .withColumn("r", floor(sqrt(col("v").cast("double"))).cast("decimal(38,0)"))
      .select(col("dim"), col("n"), col("s"), col("r"))
    comp.join(broadcast(mom), Seq("dim"))
      .withColumn("z",
        when(col("r") > 0,
          (col("n").cast("decimal(38,0)") * col("xq") - col("s")).cast("double")
            / col("r").cast("double"))
          .otherwise(lit(0.0)))
      .select(col("vec_id"), col("dim"), col("xq"),
        greatest(lit(-127L), least(lit(127L),
          floor(col("z") * 32).cast("long"))).as("z32"))
  }

  /** kNN-GRAPH BFS (q168) — hop distances over the embedding space's
    * k-nearest-neighbor graph, from a deterministic source (the min
    * `vec_id`). The kNN graph is the navigable-small-world substrate that
    * graph-ANN indexes (NSW/HNSW — Malkov & Yashunin 2018) search over;
    * its hop-distance profile from a probe point is the connectivity /
    * expansion diagnostic for that index family (a corpus that BFS cannot
    * reach in few hops is one greedy search will struggle on), and doubles
    * as a semantic-diffusion distance for curation (how many neighbor steps
    * separate a document from a trusted seed).
    *
    * Construction, all integer-exact so DuckDB replays it hash-for-hash:
    *  - int8-quantized vectors (the q51 convention); L2² via three codegen'd
    *    integer `dot_i` calls (the q143 neighbor stage);
    *  - per-node k smallest by the composite `d2·cap + vb` (unique ⇒
    *    deterministic kNN, ties broken toward the smaller id) through the
    *    k-bounded [[graft.functions.Aggregators.topK]] partial agg — no
    *    per-node window sort;
    *  - edges symmetrized (kNN is directed; BFS wants the undirected view);
    *  - BFS by level-synchronous frontier expansion: each round is ONE
    *    equi-join of the frontier against the edge list plus anti-joins
    *    against the LAST TWO layers (sufficient on an undirected graph —
    *    a neighbor of a hops = r−1 node has hops ≥ r−2) — work
    *    proportional to the frontier's edge neighborhood, never all-pairs
    *    and never the O(n) visited union, and rounds are bounded by the
    *    graph diameter (O(log n) on small-world graphs). One action per
    *    round both materializes the round's cache and tests emptiness; a
    *    non-converged run throws (the `Dedup.clusters` discipline) rather
    *    than returning silent nulls.
    *
    * The candidate stage is the q28 random-hyperplane LSH bucketing with
    * hamming-1 multi-probe — the plan IS the 100 TB path, not a documented
    * alternative: candidates are the pairs whose 4-bit signatures differ in
    * ≤ 1 bit (an equi-join on the probed bucket, 5/16 of the quadratic
    * pair count at 4 planes; at corpus scale `planes` grows ~log₂(n) to
    * keep buckets bounded). The graph is therefore the LSH-kNN graph —
    * approximate like every production kNN-graph build (NN-Descent, HNSW
    * construction); recall vs the brute kNN edges is measured in
    * DedupSimilaritySpec (the q28 discipline), and the oracle replays the
    * identical bucketing (md5-derived ±1 planes over the 2²⁰ grid — exact
    * integer dots both engines) so correctness stays hash-gated. */
  /** Shared symmetrized LSH-kNN-graph edge frame of q168/q175: int8
    * vectors, hamming≤1 bucket candidates, k smallest by the unique
    * composite `d2·cap + vb` through the k-bounded topK partial agg, both
    * edge orientations, persisted + plan-cut.
    * Returns (node frame, edge frame (ea, eb)).
    *
    * BOUNDED BUCKETS (VERDICT r13 #1): random-hyperplane signatures cannot
    * split a tight embedding blob — every member shares the sign on EVERY
    * plane (the centroid term dominates each dot, so the within-blob noise
    * never flips it), and more planes don't help. On a clustered corpus
    * (the real-data shape; ScaleGen "clustered" manufactures it) the
    * hottest bucket inherits the hottest blob's mass — measured 49.8% of
    * the corpus vs 8.5% on the driver's near-uniform synthetic vectors —
    * and the bucket self-join goes quadratic in it: the q150 hot-slot
    * hazard, one table over. The bound: each bucket with m members gets
    * `nsalt = ceil(m / bucketCap)` salt groups, members hash into one
    * group (md5, oracle-replayable), and a probing node draws ONE
    * md5-chosen group per probed bucket — so per-probe candidates are
    * ≤ ~bucketCap and total candidate work is n·(planes+1)·bucketCap,
    * LINEAR in the corpus where the unsalted join is quadratic (measured
    * on clustered 2k→20k nodes: unsalted 14.2 s → 63.9 s vs salted
    * 14.7 s → 20.5 s single-pass including ~10 s fixed session/layout
    * cost — the variable part grows ~13× vs ~2.2×; PLANS.md round 14).
    * On balanced buckets nsalt = 1 everywhere and the construction is
    * BIT-IDENTICAL to the unsalted one (salt = anything mod 1 = 0), so
    * the driver-data hashes are unchanged and the salted regime is gated
    * by KnnSaltSpec: cross-engine (DuckDB replays the same md5 salts via
    * Oracles.knnEdgeCtes) equality on a hot-blob fixture, a per-group
    * occupancy bound, and blob-local neighbor quality vs brute force —
    * recall loss inside a tight blob is bounded because ANY bucketCap-
    * sized subset of a blob contains near neighbors (the members are
    * mutually close; that's what made the bucket hot). */
  private[graft] def knnEdges(spark: SparkSession, dir: String, k: Int,
                              cap: Int, planes: Int = 4,
                              bucketCap: Int = KnnBucketCap): (DataFrame, DataFrame) = {
    val sigU = hyperplaneSigUdf(planes)
    val e = int8(emb(spark, dir)).filter(col("vec_id") < cap)
      .withColumn("sq", call_function("dot_i", col("qv"), col("qv")))
      .withColumn("bucket", sigU(col("embedding")))
      .select(col("vec_id"), col("qv"), col("sq"), col("bucket"))
      .persist()
    // occupancy frame: ≤ 2^planes rows — control plane, broadcast both uses
    val occ = e.groupBy("bucket")
      .agg(ceil(count(lit(1)).cast("double") / lit(bucketCap)).cast("long").as("nsalt"))
    def mdmod(tag: String, id: org.apache.spark.sql.Column,
              bkt: org.apache.spark.sql.Column,
              n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(tag), id.cast("string"), lit("_"),
        bkt.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long") % n
    // Self-probe + hamming-1 probes on ONE side turn the hamming≤1 pair
    // predicate into an equi-join on bucket; each qualifying pair matches
    // exactly one probe (xor(b, 1<<i) ≠ b), so no dedup is needed. The
    // salt joins the (bucket, salt) key on both sides; probed buckets with
    // no members drop out of the inner occ join exactly as they produced
    // no matches before.
    val probe = explode(array(
      col("bucket") +: (0 until planes).map(i => col("bucket").bitwiseXOR(lit(1 << i))): _*))
    val b = e.join(broadcast(occ), Seq("bucket"))
      .select(col("vec_id").as("vb"), col("qv").as("qb"), col("sq").as("sb"),
        col("bucket"),
        mdmod("salt_", col("vec_id"), col("bucket"), col("nsalt")).as("salt"))
    val knn = e.select(col("vec_id").as("va"), col("qv").as("qa"), col("sq").as("sa"),
        probe.as("bucket"))
      .join(broadcast(occ), Seq("bucket"))
      .withColumn("salt", mdmod("probe_", col("va"), col("bucket"), col("nsalt")))
      .drop("nsalt")
      .join(b, Seq("bucket", "salt"))
      .filter(col("va") =!= col("vb"))
      .withColumn("comp",
        (col("sa") + col("sb") - lit(2L) * call_function("dot_i", col("qa"), col("qb")))
          * lit(cap.toLong) + col("vb"))
      .groupBy("va")
      .agg(graft.functions.Aggregators.topK(k,
        negate(col("comp")).cast("double"), col("vb"), col("vb")).as("top"))
      .select(col("va"), explode(col("top")).as("t"))
      .select(col("va"), col("t.id").as("vb"))
    // The symmetrized edge frame is SHARED between q168 (BFS) and q175
    // (LPA) and identical across bench passes — materialize it once per
    // process through the q113/ratingsBucketed layout lifecycle (bucketed
    // by ea: every per-round BFS/LPA equi-join probes that key). The
    // build above runs only on the first call; later calls read the
    // edge parquet and skip the candidate join + topK entirely.
    val edges0 = Relational.layoutTable(spark, dir,
        s"knnedges_${k}_${cap}_${planes}s$bucketCap", 8, "ea") {
      knn.select(col("va").as("ea"), col("vb").as("eb"))
        .unionByName(knn.select(col("vb").as("ea"), col("va").as("eb")))
        .distinct()
    }.persist()
    edges0.count()
    // r18: return the persisted bucketed-scan frame ITSELF, not a LogicalRDD
    // cut of it — the cut erased the scan's HashPartitioning(ea, 8) and
    // bucket sort order, so every per-round BFS/LPA equi-join on ea
    // re-exchanged the edge frame it was bucketed to avoid (guide §2.4).
    // Plan chaining is not a risk here: the frame is STATIC (a constant
    // cache leaf reused per round), unlike the per-round label/frontier
    // frames the cut discipline exists for.
    (e, edges0)
  }

  def knnBfs(spark: SparkSession, dir: String, k: Int = 3, cap: Int = 2000,
             maxRounds: Int = 32): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val (e, edges) = knnEdges(spark, dir, k, cap)
    val src = e.agg(min(col("vec_id"))).as[Long].head()
    // Frontier expansion, two scale-critical moves per round:
    //  - PLAN CUT (the Dedup.clusters lesson, re-learned here with data):
    //    each round's frame is rebuilt as a LogicalRDD over the CACHED rows.
    //    Chaining raw plans — even fully persisted ones — re-analyzes an
    //    exponentially growing tree and the per-round cost compounds ~5x
    //    (measured at sf0.1: rounds 1-6 went 0.6/0.6/0.8/2.1/10.1/61.9 s
    //    chained vs flat ~0.7 s each with the cut — 85 s -> 12 s total).
    //  - TWO-LAYER VISITED CHECK: on an UNDIRECTED graph a neighbor of a
    //    hops = r-1 node has hops >= r-2, so the anti-join only needs the
    //    last two layers — frontier-sized state instead of the O(n) visited
    //    union every round (the standard level-synchronous BFS trick).
    val zero = Seq((src, 0L)).toDF("node", "hops").persist()
    zero.count()
    def cut(d: DataFrame): DataFrame = spark.createDataFrame(d.rdd, d.schema)
    var frontier = cut(zero)
    var prev = frontier.limit(0)
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    var round = 1
    var done = false
    // one anti-join against the lazy union of the two cached layers — the
    // split form paid a second broadcast exchange per round for the same
    // visited set (r17; rounds are action/exchange-latency-bound).
    // r18: BOTH small sides carry explicit broadcast hints — the frontier
    // and the two-layer visited set are frontier-sized BY the level-
    // synchronous argument (never the graph), but they are LogicalRDD
    // cuts whose stats the planner cannot see, so unhinted rounds planned
    // shuffle joins that re-exchanged the edge frame the layout table had
    // pre-bucketed (guide §3.1: broadcast the side you KNOW is small).
    // The expansion join streams the bucketed edge cache exchange-free;
    // the only per-hop exchange left is the distinct on the new layer.
    // (a two-hops-per-action batch was A/B'd here in r18 and measured
    // WORSE — 4.3-4.8 s vs 3.6 s at sf0.1: each hop's broadcast builds are
    // their own jobs, so chaining hops serializes MORE broadcast-build
    // jobs on the critical path than the halved count actions save, and
    // the second hop's builds race the first hop's still-uncached frame.
    // Rejection ledger, OPTIMIZATION_r18.md.)
    // <= maxRounds + 1: the final allowed layer (hops = maxRounds) still
    // needs one follow-up empty-frontier probe to be declared converged —
    // without it a graph whose eccentricity equals maxRounds exactly would
    // throw despite being fully explored.
    while (!done && round <= maxRounds + 1) {
      // ONE shared broadcast per round (r18): the tagged two-layer union
      // serves BOTH as the expansion probe source (tag = 1 selects the
      // frontier as a join condition under the same hashed relation) and
      // as the visited anti side — the two builds canonicalize equal, so
      // ReuseExchange ships one broadcast job per round instead of two
      // (each build is its own job; rounds are job-latency-bound locally).
      val visited = broadcast(
        frontier.withColumn("tag", lit(1))
          .unionByName(prev.withColumn("tag", lit(0)))
          .select("node", "tag"))
      val next0 = edges
        .join(visited, edges("ea") === visited("node") && visited("tag") === 1)
        .select(col("eb").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hops", lit(round.toLong))
        .persist()
      // ONE action: materializes the round's cache AND tests convergence
      if (next0.count() == 0) { done = true; next0.unpersist() }
      else {
        val next = cut(next0)
        layers += next
        prev = frontier
        frontier = next
        round += 1
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"knnBfs frontier still alive after $maxRounds rounds — " +
          "raise maxRounds (rounds needed = the graph's eccentricity from the source)")
    val dist = layers.reduce(_ unionByName _)
    e.select(col("vec_id"))
      .join(dist.select(col("node").as("vec_id"), col("hops")), Seq("vec_id"), "left")
  }

  /** LABEL-PROPAGATION COMMUNITIES (q175) — [Raghavan, Albert & Kumara,
    * Phys. Rev. E 2007] over the q168 kNN graph: the k-free community
    * detector. Where [[Dedup.entityGroups]]-style connected components
    * merge everything touching (one bridge edge fuses two clusters), LPA
    * assigns each node the label the PLURALITY of its neighbors carry —
    * dense semantic neighborhoods keep their label, bridges don't
    * propagate majorities — which is the "semantic clusters without
    * choosing k" pass of corpus curation (k-means q108 needs k; DBSCAN
    * q143 needs ε; LPA needs neither).
    *
    * Determinism (the published algorithm is randomized — random order,
    * random tie-break; that would never oracle): SYNCHRONOUS rounds at a
    * FIXED count, argmax by (count desc, label asc) via ONE
    * `max(struct(ct, -lbl))` partial agg, labels initialized to vec_id.
    * Fixed rounds also sidestep synchronous LPA's known bipartite
    * oscillation (convergence-looping could live-lock; R bounded ends).
    *
    * Scale shape: corpus work = the kNN candidate stage (key-capped here,
    * LSH/IVF-bucketed at 100 TB — the q168 note); each round is ONE
    * equi-join edges⋈labels + ONE (node, lbl) partial agg + ONE node agg —
    * O(E) shuffle per round, bounded rounds, no window, per-round plan cut
    * (the Dedup.clusters discipline). Community sizes: one final groupBy. */
  def lpaCommunities(spark: SparkSession, dir: String, k: Int = 3,
                     cap: Int = 2000, rounds: Int = 4,
                     nocut: Boolean = false): DataFrame = {
    val (e, edges) = knnEdges(spark, dir, k, cap)
    // the per-round plan cut is LOAD-BEARING (the q168 plan-chaining
    // re-analysis class: without it every round's join re-analyzes the
    // whole chain and one giant plan executes at the end); the `nocut`
    // dev parameter exists so ExecutedPlanSpec can red-prove exactly that
    // shape — a PARAMETER, not a sys.prop, so a red-proof run cannot
    // strip the cut out from under a concurrent suite on the shared
    // session (round-16 ADVICE #2)
    def cut(d: DataFrame): DataFrame =
      if (nocut) d
      else {
        d.persist(); d.count()
        spark.createDataFrame(d.rdd, d.schema)
      }
    // the initial label frame is a projection of the CACHED vec frame —
    // no cut action needed for a depth-0 plan (r18)
    var labels = e.select(col("vec_id").as("node"), col("vec_id").as("lbl"))
    // r18 round shape (guide §2.4 — two exchanges cut per round):
    //  - the per-round argmax is ONE plurality aggregate (count-map partial
    //    agg, ties to the smallest label — bit-identical to the former
    //    max(struct(ct, -lbl)) over per-(node, lbl) counts) instead of two
    //    chained groupBys, whose FIRST exchange carried the edge-grain join
    //    output — corpus-scale for a kNN graph;
    //  - the label-update join-back is GONE: on the static symmetric edge
    //    frame every non-isolated node receives votes every round, so
    //    labels_r = cand_r ∪ iso, where iso (nodes with no edges — they
    //    keep their initial label forever by the same argument) is computed
    //    once before the loop;
    //  - rounds are CUT every second round (the q150 peel discipline): one
    //    chained round adds one join + one agg of bounded depth to the next
    //    cut's plan, and halving the persist+count actions removes fixed
    //    per-action latency the bounded graph cannot amortize. The final
    //    round always cuts so the returned frame stays a LogicalRDD.
    val iso = cut(e.select(col("vec_id").as("node"))
      .join(edges.select(col("ea").as("node")), Seq("node"), "left_anti")
      .withColumn("lbl", col("node")))
    for (r <- 1 to rounds) {
      val cand = edges.join(labels, edges("ea") === labels("node"))
        .groupBy(col("eb").as("node"))
        .agg(graft.functions.Aggregators.plurality(col("lbl")).as("new_lbl"))
        .select(col("node"), col("new_lbl").as("lbl"))
      val next = cand.unionByName(iso)
      labels = if (r % 2 == 0 || r == rounds) cut(next) else next
    }
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("csize"))
    labels.join(broadcast(sizes), Seq("lbl"))
      .select(col("node").as("vec_id"), col("lbl").as("community"), col("csize"))
  }
}
