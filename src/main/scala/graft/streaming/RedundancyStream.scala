package graft.streaming

import graft.io.Io
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING WITHIN-SOURCE REDUNDANCY (q196) — the tenth maintained
  * measure class: a BOTTOM-K-BY-HASH sample store (the KMV/q127 store
  * class, doc-grained). q196's sufficient statistic is, per source, the
  * `k` docs with the smallest md5 sampling hash together with their
  * distinct-shingle sets; bottom-k-by-hash is MERGEABLE (k smallest of a
  * union = k smallest of the per-part k-smallest — the hash is a pure
  * function of doc_id, so every batch reproduces it), which makes
  * maintenance one batch scan + a merge against the ≤ k·K-row store, and
  * maintained ≡ batch-over-absorbed EXACT, not approximate-on-top-of-
  * approximate. Replaying a batch re-presents identical (doc_id, h, shs)
  * rows — the merge is set-idempotent, so like the first-seen shingle
  * store this one needs no epoch gate for correctness.
  *
  * Store shape: ONE row per source, the sample as an array of
  * (doc_id, h, shs) structs — the per-source sample is replaced whole on
  * each merge (last-writer-wins by epoch), which keeps eviction (a new
  * doc entering the bottom-k pushes one out) inside ordinary upsert
  * semantics. Read path replays [[Dedup.redundancyFrom]] — the batch
  * operator's own pair walk. */
object RedundancyStream {

  /** Merge one micro-batch of (source, doc_id, text) document rows into
    * the per-source bottom-k sample store. */
  def applyBatch(spark: SparkSession, delta: DataFrame, store: String,
                 epoch: Long, k: Int = 32): Unit = {
    val fresh = Dedup.redDocs(delta)
    val all =
      if (!Io.dimStoreHasData(store)) fresh
      else fresh.unionByName(
        Io.readDim(spark, store)
          // only sources the batch touches: an untouched source's bottom-k
          // cannot change, and re-merging it would rewrite its bucket and
          // bump its last_epoch every batch — table-proportional write
          // amplification for nothing (round-14 review)
          .join(fresh.select("source").distinct(), Seq("source"), "left_semi")
          .select(col("source"), explode(col("sample")).as("s"))
          .select(col("source"), col("s.doc_id").as("doc_id"),
            col("s.h").as("h"), col("s.shs").as("shs")))
        // a replayed doc appears in both sides with identical content —
        // (source, doc_id) identifies it, and h/shs are pure functions of it
        .dropDuplicates("source", "doc_id")
    val ids = all.groupBy("source")
      .agg(graft.functions.Aggregators.topK(k,
        negate(col("h")).cast("double"), col("doc_id"), col("doc_id")).as("top"))
      .select(col("source"), explode(expr("transform(top, s -> s.id)")).as("doc_id"))
    val merged = all.join(ids, Seq("source", "doc_id"))
      .groupBy("source")
      .agg(collect_list(struct(col("doc_id"), col("h"), col("shs"))).as("sample"))
      .withColumn("last_epoch", lit(epoch))
    Io.upsertDim(spark, merged, store, "source", "last_epoch")
  }

  /** Current q196 report over everything absorbed — the batch pair walk
    * fed the maintained samples. */
  def readRedundancy(spark: SparkSession, store: String): DataFrame =
    Dedup.redundancyFrom(
      Io.readDim(spark, store)
        .select(col("source"), explode(col("sample")).as("s"))
        .select(col("source"), col("s.doc_id").as("doc_id"),
          col("s.shs").as("shs")))
}
