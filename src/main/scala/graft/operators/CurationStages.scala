package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once/read-many curation stages — the production shape of the
  * near-dup label pipeline (round-5 VERDICT "Next round" #5).
  *
  * A real curation run does NOT recompute MinHash-LSH banding and connected
  * components inside every consumer the way the single-query bench forms do
  * (q62/q72/q78/q84/q93 are per-query-honest for the oracle, not
  * deployment-honest): it materializes the expensive stages once —
  *
  *   1. `neardup_pairs` — the LSH band-join pair table (the one banding
  *      pass over the corpus; everything downstream is near-dup-sized);
  *   2. `neardup_labels` — connected-component labels computed FROM the
  *      written pair table, never from a second banding pass;
  *   3. `embedding_labels` — the vector-modality labels (q59) feeding
  *      hard-negative mining;
  *
  * — and every consumer joins the written parquet. Each consumer operator
  * takes the materialized table through its optional `labels`/`pairTable`
  * parameter; defaults preserve the self-contained per-query forms. The
  * CurationReuseSpec gates that every reuse form equals its recompute form
  * row-for-row and that the reuse plans scan the label parquet instead of
  * re-deriving LSH.
  *
  * At 100 TB these writes are the natural stage boundaries (restartability,
  * lineage cut, audit surface), and the label tables are near-dup-sized —
  * orders of magnitude smaller than the corpus — so every downstream join
  * broadcasts. */
object CurationStages {

  val NearDupPairs = "neardup_pairs"
  val NearDupLabels = "neardup_labels"
  val EmbeddingLabels = "embedding_labels"

  /** Run the expensive stages once and write them under `outRoot`. */
  def materialize(spark: SparkSession, dir: String, outRoot: String): Unit = {
    Dedup.minhashLsh(spark, dir)
      .write.mode("overwrite").parquet(s"$outRoot/$NearDupPairs")
    // labels come from the WRITTEN pairs — the corpus is not re-banded
    val labels = Dedup.nearDupClusters(spark, dir,
      pairs = Some(nearDupPairs(spark, outRoot)))
    labels.write.mode("overwrite").parquet(s"$outRoot/$NearDupLabels")
    labels.unpersist() // clusters() persists its result; the parquet owns it now
    // build the embedding labels from the raw clusters frame so the persist
    // inside clusters() can be released here too — embeddingClusters()'s
    // renamed projection would strand it (a q59 caller's harness owns that
    // release; a stage writer must do its own)
    val embLabels = Dedup.clusters(Similarity.cosineNearDup(spark, dir)
      .select(org.apache.spark.sql.functions.col("va").as("da"),
        org.apache.spark.sql.functions.col("vb").as("db")))
    embLabels
      .select(org.apache.spark.sql.functions.col("doc_id").as("vec_id"),
        org.apache.spark.sql.functions.col("cluster_id"))
      .write.mode("overwrite").parquet(s"$outRoot/$EmbeddingLabels")
    embLabels.unpersist()
  }

  def nearDupPairs(spark: SparkSession, outRoot: String): DataFrame =
    spark.read.parquet(s"$outRoot/$NearDupPairs")

  def nearDupLabels(spark: SparkSession, outRoot: String): DataFrame =
    spark.read.parquet(s"$outRoot/$NearDupLabels")

  def embeddingLabels(spark: SparkSession, outRoot: String): DataFrame =
    spark.read.parquet(s"$outRoot/$EmbeddingLabels")
}
