package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact (hash groupBy),
  * n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (100 TB): exact dedup is a single hash shuffle on a 128-bit
  * fingerprint (never on the full text). Near-dup paths never materialize the
  * O(n²) pair space — MinHash/LSH banding and SimHash segment-blocking both
  * bound candidate generation to same-bucket pairs; the exact-Jaccard verifier
  * then runs only on candidates. The quadratic `ngramJaccard` exists as the
  * correctness oracle and is key-capped.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Exact dedup via 128-bit content fingerprint: one shuffle on md5(text),
    * keeper = lowest doc_id per group. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("fingerprint"))
      .agg(count(lit(1)).as("dup_ct"), min(col("doc_id")).as("keeper_doc_id"))

  /** Exact pairwise 3-gram-shingle Jaccard ≥ 0.5 (capped at doc_id < 500: this
    * is the oracle/verifier path; the scale path is [[minhashLsh]]). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), tokensCol(col("text")).as("toks"))
    val sh = toks
      .select(col("doc_id"), explode(array_distinct(shinglesCol(col("toks"), 3))).as("sh"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= 0.5)
      .select(col("da"), col("db"), col("jac"))
  }

  /** Near-dup candidate pairs that band-collide under MinHash LSH (64 perms,
    * 16 bands × 4 rows ⇒ S-curve threshold ≈ (1/16)^(1/4) ≈ 0.5), then verified
    * with exact shingle Jaccard ≥ 0.5 so every emitted pair is a true near-dup.
    * Cost: one shuffle on (band, bandHash) + verification on candidates only. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshFrom(docs(spark, dir))

  /** MinHash-LSH near-dup pairs over any (doc_id, text) DataFrame — lets
    * pipeline stages (e.g. [[graft.operators.TextOps.cleanCorpus]]) run
    * near-dup detection on an already-filtered corpus instead of rescanning
    * everything. */
  def minhashLshFrom(corpus: DataFrame): DataFrame = {
    val bands = 16
    // Single-pass kernels (TextFns.textBands / shingleHashes): the banding side
    // shuffles only (doc_id, band, band_hash); the verification side joins
    // 64-bit shingle-hash arrays back for surviving candidates only, so the
    // expensive text processing runs O(n) times, never per candidate pair.
    val banded = corpus
      .select(col("doc_id"), posexplode(textBandsUdf(bands)(col("text"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .dropDuplicates("da", "db")
    val hashes = corpus
      .select(col("doc_id"), shingleHashesUdf(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    cand
      .join(hashes.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
      .join(hashes.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jac",
        col("inter").cast("double") / (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jac") >= 0.5)
      .select(col("da"), col("db"), col("jac"))
  }

  /** SimHash near-dup: 64-bit fingerprints, candidates blocked on 4×16-bit
    * segments (guaranteed recall for hamming ≤ 3), emitted with their hamming
    * distance ≤ 16 after verification on candidates. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = docs(spark, dir)
      .select(col("doc_id"), simhashUdf(tokensCol(col("text"))).as("fp"))
    val segments = array((0 until 4).map(i =>
      shiftrightunsigned(col("fp"), i * 16).bitwiseAND(lit(0xffffL))): _*)
    val seg = fp.select(col("doc_id"), col("fp"), posexplode(segments))
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "seg_val")
    val cand = seg.as("a")
      .join(seg.as("b"),
        col("a.seg") === col("b.seg") && col("a.seg_val") === col("b.seg_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.fp").as("fpa"), col("b.fp").as("fpb"))
      .dropDuplicates("da", "db")
    cand
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))))
      .filter(col("hamming") <= 16)
      .select(col("da"), col("db"), col("hamming"))
  }

  /** Connected components over near-dup pairs → dedup clusters: every doc gets
    * the min doc_id reachable through the pair graph as its cluster id (the
    * "keeper"). Alternating min-label propagation, driver-bounded iterations —
    * near-dup components are shallow (duplicates of one source), so this
    * converges in O(component diameter) rounds; at 100 TB swap in the
    * large-star/small-star formulation (same join shape, better skew behavior).
    */
  def clusters(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("da").as("a"), col("db").as("b"))
      .unionByName(pairs.select(col("db").as("a"), col("da").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    // loop runs until a round with ZERO changes confirms convergence (a round
    // that still changes labels may itself be the final one — only the
    // following all-quiet round proves it), or maxIters rounds elapsed
    while (changed > 0 && iter < maxIters) {
      // each node adopts the min label among itself and its neighbors
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("doc_id"))
        .agg(min(col("cluster_id")).as("n_label"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("n_label"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), Seq("doc_id"))
        .filter(col("n.cluster_id") =!= col("o.cluster_id")).count()
      labels = next
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"clusters() did not converge after $iter rounds ($changed labels still moving) — " +
          "component diameter exceeds maxIters; pass a larger maxIters or use large-star/small-star")
    labels
  }

  /** Dedup clusters of the MinHash-LSH near-dup graph: (doc_id, cluster_id)
    * for every doc in at least one near-dup pair; keeper = cluster_id. */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame =
    clusters(minhashLsh(spark, dir))

  /** Winnowing document fingerprints (rolling hash; Schleimer et al. SIGMOD'03):
    * per-doc compact fingerprint set for copy detection. */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), winnowUdf(col("text")).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fps"),
        array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))

  /** Copy detection via winnowing: pairs whose fingerprint sets overlap by
    * ≥ `minOverlap` of the smaller set — the MOSS-style containment measure,
    * which (unlike Jaccard) also catches a short doc embedded in a long one.
    * Shape: explode on fingerprint, equi-join, verify on candidates only.
    * Candidate volume scales with gram selectivity; on low-entropy corpora
    * (like this synthetic vocab) shared 8-grams approach all-pairs, so the
    * query is key-capped like the other quadratic verifier paths — the
    * unbounded scale path for near-dup remains [[minhashLsh]]. */
  def winnowPairs(spark: SparkSession, dir: String, minOverlap: Double = 0.5): DataFrame = {
    val fps = docs(spark, dir)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), array_distinct(winnowUdf(col("text"))).as("fps"))
      .filter(size(col("fps")) > 0)
    val exploded = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val shared = exploded.as("a")
      .join(exploded.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(fps.select(col("doc_id").as("da"), size(col("fps")).as("na")), "da")
      .join(fps.select(col("doc_id").as("db"), size(col("fps")).as("nb")), "db")
      .withColumn("containment", col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= minOverlap)
      .select(col("da"), col("db"), col("containment"))
  }
}
