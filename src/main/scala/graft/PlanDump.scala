package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump formatted physical plans of headline queries → PLANS.md,
  * the evidence for the scale-design claims (pushdown, pruning, broadcast,
  * whole-stage codegen spans). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val picks = Seq(
      "q01_pricing_summary" -> "filter pushdown + partial/final hash agg in one codegen span",
      "q02_filter_project"  -> "column pruning: 5 of 16 lineitem columns in ReadSchema",
      "q03_star_enrichment" -> "all three dim joins broadcast, no SortMergeJoin",
      "q04_order_lines_join" -> "equi-key join with the time band as a join-level filter",
      "q05_tumbling_window" -> "window agg: partial agg before the single shuffle",
      "q23_knn_bruteforce"  -> "broadcast query set + codegen'd dot_f, corpus scanned once",
      "q26_minhash_lsh"     -> "narrow band self-join; shingle arrays join only candidates",
      "q50_contamination"   -> "benchmark n-gram set broadcast; corpus side one linear scan",
      "q51_quantized_knn"   -> "int8 corpus, codegen'd dot_i, broadcast queries",
      "q52_asof_join"       -> "as-of via union + forward-fill window: ONE shuffle, no pair blowup",
      "q53_salted_join"     -> "hot-key spread: deterministic salt × replicated build side",
      "q36_clean_corpus"    -> "round 6: exact keeper via min_by(struct) — one bounded-buffer aggregate, NO fingerprint window",
      "q69_span_dedup"      -> "round 6: NO window on the span key — partial-aggregated count + join-back (AQE-skew-splittable), span frame cached once",
      "q94_bigram_fluency_pruned" -> "round 6: pruned-vocabulary LM broadcast (lossless below the rarity cutoff), LEFT join scorer; round 7: the lossless precondition guarded in-plan (raise_error branch on t)",
      "q78_canonical_docs"  -> "round 7: cluster keeper via partial_max_by(struct) — NO Window on the power-law cluster key",
      "q73_mixture_sample"  -> "round 7: per-source hash-rank threshold filter (u < frac broadcast join) UNDER the exact cumsum window — the window sees the sliver, never the source",
      "q63_session_funnel"  -> "round 7: single-pass funnel — ONE ObjectHashAggregate collecting sorted per-session events + array-HOF sequential mins, replacing three chained join+aggregates that each re-ran the session window (2.25×)",
      "q99_tokenizer_fertility" -> "round 7: BPE segmentation vocab BROADCAST onto the (source, word) partial-agg — corpus rows never join row-to-row, no window",
      "q100_temperature_sample" -> "round 7: map-only corpus pass — sqrt-share doc-budget thresholds broadcast, md5-prefix membership filter, no per-source window or sort",
      "q101_dsir_select"    -> "round 7: 256-bucket importance-ratio table from ONE corpus-scan agg, broadcast back to the token stream; per-doc INTEGER score via a single doc_id shuffle",
      "q102_containment_pairs" -> "round 7: prefix-filtered containment join — probe side explodes only the (1−t)-fraction smallest shingle hashes, exact array-intersect verify on candidates only",
      "q112_edit_distance_pairs" -> "round 9: fuzzy dedup — LSH-banded candidates, lossless |Δlen| prune, THRESHOLDED banded Levenshtein verify (O(d·len) per candidate, never full DP on the pair space)",
      "q113_bucketed_join"  -> "round 9: co-located fact⋈fact — both sides bucketBy(join key), SortMergeJoin over bucket-aligned scans with ZERO Exchange on either join key; shuffle paid once at layout time",
      "q114_unigram_prune"  -> "round 9: SentencePiece M-step — alphabet-bounded model broadcast, Viterbi SEGMENTATION map-only over word types, usage one partial-agged groupBy, top-k ranking on a keep-bounded frame",
      "q115_incremental_stats" -> "round 9: MV maintenance — delta micro-batch aggregated + algebraically merged with the stored snapshot; the base table is never re-scanned",
      "q116_retention_cohorts" -> "round 9: retention — (user, day) dedup FIRST, then every downstream agg is plain count/min over unique rows; no holistic distinct anywhere",
      "q117_incremental_sketch" -> "round 10: MV with mergeable-HLL distinct — hll_sketch_agg partials per side (map-side combinable BINARY), hll_union_agg merge; the holistic measure q115 excluded, made algebraic",
      "q118_audience_overlap" -> "round 10: overlap — the element frame is built once (InMemoryTableScan below), the sketch legs aggregate it per type (tiny K-row frames, broadcast pair join), the exact leg self-joins on the element key; no all-pairs, no re-scan per pair",
      "q119_scd2_history" -> "round 10: SCD2 — both window passes partition by the dim key (bounded per-key history, skew-safe); lag-collapse before interval assembly, no join, no global sort",
      "q120_zorder_layout" -> "round 10: z-order — pure integer bit-spread projection + ONE bucket-keyed aggregate; the write path adds only a 1-row bounds agg before repartitionByRange",
      "q121_epoch_plan" -> "round 10: epoch plan — MAP-ONLY (zero Exchange): per-source weights broadcast, copies explode from a generated sequence, shard = md5 per copy",
      "q122_gap_fill" -> "round 10: gap fill — one partial-agged corpus aggregate; the dense axis explodes from the 1-row bounds agg (no driver collect); all joins after the agg are types x hours",
      "q123_record_linkage" -> "round 10: record linkage — both blocking passes are equi-joins on their block keys (broadcast here, hash-partitioned at scale), candidate union deduped on the pair key; Levenshtein + weights run on candidates only, never all pairs",
      "q124_hybrid_rrf" -> "round 10: hybrid RRF — BM25 leg keeps only query terms before any shuffle; dense leg broadcasts 3 query vectors over one corpus scan; WindowGroupLimit prunes each leg to depth k before the full-outer fusion of two tiny rank frames",
      "q125_cluster_safe_split" -> "round 10: cluster-safe split — near-dup labels broadcast onto the corpus (LeftOuter), split = one map-side md5 on the CLUSTER key; no shuffle of the corpus at all",
      "q126_interval_overlap" -> "round 10: interval overlap — the non-equi range join rides an EQUI hash join on the 1-hour grid cell (residual predicate as join condition), sessions from the native session_window partial-merging aggregate; no BroadcastNestedLoop over full relations",
      "q127_theta_sketch" -> "round 10: KMV theta sketch — per-type k-smallest via the k-bounded topK partial agg over the persisted element frame; everything after the sketch build is K arrays of k longs (broadcast pair merges); exact leg = one element-keyed self-join",
      "q128_kanon_release" -> "round 10: k-anonymous release — ONE map-side-combinable aggregate touches the raw table (cached); the generalization hierarchy re-aggregates only the tiny group frames, residual level-0 rows roll into level-1 without re-scanning rows",
      "q129_ingest_linkage" -> "round 10: ingest linkage — batch x store blocked equi-joins only (never store x store); best-match via max_by(struct) bounded buffer, NOT a window over the candidate set; no-candidate rows re-enter via the left join",
      "q130_entity_groups" -> "round 10: entity groups — match-pair components (two-regime clusters), label frame broadcast onto the population, singleton = self via coalesce; the corpus is never shuffled",
      "q131_quality_checks" -> "round 10: data quality — every row-local constraint is a branch of ONE fused aggregate scan (adding a check adds an expression, not a pass); RI probes are a broadcast keyset and a distinct-key join; the report is 1-row control-plane unions",
      "q133_market_basket" -> "round 10: market basket — A-priori prune via broadcast semi-join BEFORE pairing; pairs form per basket on the order key; basket count rides as a broadcast 1-row frame (no driver action, no second corpus pass)",
      "q138_anomaly_zscore" -> "round 10: anomaly detection — the corpus pays one partial-agged hourly aggregate; the trailing window runs over the types x hours GRID (bounded keys), never over raw events",
      "q139_triangle_count" -> "round 10: triangles — degree-ordered edge orientation bounds wedge fan-out; the closing-edge probe is an EQUI hash join against the canonical undirected edge set (an OR over orientations would plan BroadcastNestedLoop)",
      "q141_calibration" -> "round 10: calibration — score binning via a broadcast 1-row (min,max) frame and integer fixed-width buckets, NOT ntile (whose global sort would shuffle the whole corpus to one ordering)",
      "q142_mmr_rerank" -> "round 10: MMR — relevance is a broadcast-queries map-only scan; candidates come from the k-bounded topK partial agg (corpus never sorted); the greedy runs per query over a 12-element array",
      "q143_dbscan" -> "round 10: DBSCAN — key-capped quadratic verifier pairs (the q24 convention) with L2^2 as three codegen'd integer dots; neighbor counts partial-aggregate; components on the core-edge frame only",
      "q144_group_regression" -> "round 10: grouped OLS — ONE map-side-combinable aggregate carries all five DECIMAL(38,0)-exact moments; the closed forms evaluate on the 25-row group frame",
      "q146_join_size" -> "round 10: join-size estimate — each side scanned once map-side into <=1024 CMS cells; the estimate is a 1024-row join + 4-row min; no data shuffles on the join key at all",
      "q147_item_cf" -> "round 11: item-item CF — the per-customer co-pair self-join now reads the SHARED cust-bucketed ratings layout (ratingsBucketed, built once per process): SortMergeJoin over bucket-aligned scans with zero Exchange on the join key; three map-side-combinable aggregates, broadcast norms, k-bounded topKStr ranking",
      "q148_aqp_estimate" -> "round 10: AQP — ONE aggregate carries both the sample and exact moments (the sample predicate is a map-side md5 coin, not a separate scan); everything after is a 1-row projection",
      "q149_skyline" -> "round 10: skyline — per-partition dominance sweep prunes to the local frontier BEFORE the single-partition merge sweep (the classic two-phase skyline; merge input is frontier-sized, not corpus-sized)",
      "q150_kcore" -> "round 11: k-core — the < minCo-slots user pre-filter (provably edge-preserving) shrinks both fan-out sides BEFORE the slot self-join; peel rounds are degree-agg + BROADCAST anti-joins with per-round persist cuts AND a fixpoint early-exit (a round peeling nobody ends the loop — peeling is monotone); alive is a fused map-side anti-join chain",
      "q151_kaplan_meier" -> "round 10: Kaplan-Meier — corpus contributes one partial-agged span groupBy; the survival fold runs over the day-range-bounded life table (control-plane), scaled-integer product so the curve hash-compares",
      "q153_hdr_quantiles" -> "round 10: HDR quantiles — one partial-agged groupBy into <=2^(p+6) buckets per group (key = bucket lower bound, integer mask); the rank walk folds over the bounded sorted cell list; fully deterministic, unlike approx_percentile",
      "q154_sketch_rollup" -> "round 10: sketch rollup — ONE corpus scan into k-bounded KMV leaf partials; every coarser lattice node is a flatten+distinct+slice merge over leaf ARRAYS (work ~ leaves*k, corpus-independent); cube pass carries the exact audit only",
      "q155_attribution" -> "round 10: attribution — ONE range-framed window pass collects each purchase's trailing touches (per-key rows = one user's activity); credit aggregation is map-side combinable over exploded integer micro-credit rows",
      "q156_pit_join" -> "round 10: PIT join — equi-join on user_id + range filter (SCD2 intervals partition the timeline, so no grid/explode needed); fan-out bounded by versions-per-key; both sides shuffle once on the key",
      "q157_bradley_terry" -> "round 10: Bradley-Terry — one partial-agged (user,day,type) count, bounded C(K,2) pair fan-out per slot, MM iterations fold over the K-row control-plane in ONE expression (no per-iteration action)",
      "q159_hierarchy" -> "round 10: pointer doubling — O(log depth) self equi-join rounds instead of one shuffle per level; per-round persist cuts keep the plan O(1); converged audit column",
      "q160_rfm" -> "round 10: RFM — quintile boundaries from bounded HDR cell aggs (no ntile global sort, no exact-percentile buffer over customer-cardinality values); assignment via broadcast 1-row boundary frames",
      "q161_journeys" -> "round 10: journeys — one groupBy to the (user,day) grain with a capped sorted path, then partial-agged path counts; rank window runs over the path domain only",
      "q162_rank_movers" -> "round 10: rank movers — two filtered conditional sums off ONE scan (no second pass per week); rank windows over the bounded item domain",
      "q163_seq_patterns" -> "round 10: sequential patterns — map-only per-journey HOF expansion (<= cap^3 bounded tuples/row, array_distinct presence before counting) into ONE partial-agged pattern count; no projected databases, no candidate join",
      "q164_quota_sample" -> "round 10: quota sample — bottom-k per stratum via the k-bounded topK partial agg (mappers forward <= cap rows/stratum); no window, no corpus sort",
      "q165_day_funnel" -> "round 10: day funnel — one bounded (user, day) groupBy, then the row-local milestone fold (the SAME expression FunnelStream applies incrementally); daily counts partial-agg over the milestone frame",
      "q166_holt_trend" -> "round 10: Holt trend — one partial-agged (type, hour) count; level+trend fold over the time-bounded dense axis per type (control-plane sized), shiftright floor-division for the negative trend term",
      "q168_knn_bfs" -> "round 11: kNN graph — the candidate stage is the LSH equi-join on the probed hyperplane bucket (hamming<=1 pairs; the capped-quadratic theta-join is GONE), k smallest via the k-bounded topK partial agg; BFS rounds are frontier equi-joins with two-layer anti-join visited checks over plan-cut LogicalRDDs",
      "q175_lpa_communities" -> "round 11: LPA — shares q168's LSH-bucketed edge build; each round ONE edges-labels equi-join + two partial aggs (max(struct) argmax), per-round plan cut, O(E) shuffle, fixed rounds",
      "q177_als_rank1" -> "round 11: rank-1 ALS — ratings come from the SHARED cust-bucketed layout (one fact-fact shuffle per process, q147 rides the same table); each half-step ONE equi-join (item side broadcast) + ONE partial-agged groupBy in decimal fixed point",
      "q178_rake_keyphrases" -> "round 11: RAKE — both windows partition by doc_id (bounded per-key), word stats vocab-sized + broadcast back, per-doc argmax = one max(struct) partial agg; no global sort",
      "q179_video_segments" -> "round 11: video — pure flatMap over media rows (each video decodes once inside its task, zero shuffle until the per-media segment/fingerprint join of two tiny frames)",
      "q180_mink_prob" -> "round 11: min-k% — LM tables vocab-bounded broadcasts (the q174 kernel shared); per-doc tail = sort_array over the doc's OWN grams (bounded per key, no global sort); corpus-mean threshold broadcast back",
      "q181_source_select" -> "round 11: greedy max-coverage — ONE corpus scan builds the persisted (source, shingle) distinct; each round = one anti-join vs covered + one partial-agged groupBy(source) + a 1-row argmax collect (control-plane)",
      "q182_budget_allocate" -> "round 11: water-filling — one corpus scan per input grain; the threshold walk is three windows over the SOURCE-dimension frame (bounded domain), decimal(38,0) cross-multiplications",
      "q183_dim_ablation" -> "round 11: dim ablation — corpus scanned ONCE with the dim axis exploded map-side; queries broadcast; per-(dim, query) bounded-key ranking; recall = one |dims|-row agg",
      "q184_conformal" -> "round 11: conformal — calibration set via the k-bounded topK agg (bottom-k by md5, theory-bounded sample); thresholds ride a broadcast 1-row frame; coverage = one aggregate over the held-out scan",
      "q185_mad_outliers" -> "round 11: MAD outliers — one scoring scan; two percentile aggs over the bounded source domain; per-doc flags re-join the 20-row stats frame broadcast",
      "q187_source_overlap" -> "round 11: overlap matrix — ONE self-equi-join on the shingle key (per-shingle fan-out bounded by the source domain, never corpus^2), partial-agged pair counts, K-row sizes broadcast back",
      "q190_cusum_drift" -> "round 11: CUSUM — one scoring scan into a 64-key partial agg; target/allowance ride broadcast 1-row frames; the two-sided recursion folds over the chunk-bounded sorted list (control-plane)",
      "q191_chao1_vocab" -> "round 11: Chao1 — one frequency-of-frequencies pass (per-source gram totals then conditional sums); the estimator is row-local arithmetic on the K-row frame",
      "q193_centroid_drift" -> "round 11: centroid drift — one corpus scan into the element-wise vecSum partial agg (mappers forward <= K dim-length rows); pairwise L2^2 on the K-row control plane, no row-level pairs anywhere")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries (sf0.1)\n\n")
    sb.append("Generated by `graft.PlanDump`; regenerate after plan-affecting changes.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n*$why*\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    // ---- streaming plans (StateStore / streaming-join nodes): the stateful
    // path's scale evidence, asserted by StreamingPlansSpec ----
    sb.append("\n# Streaming plans (micro-batch executedPlan, MemoryStream-driven)\n")
    streamingPlans(spark).foreach { case (name, why, plan) =>
      sb.append(s"\n## $name (streaming)\n\n*$why*\n\n```\n").append(plan.trim).append("\n```\n")
    }
    // everything below the marker is hand-maintained (microbench numbers,
    // baseline context) — survive regeneration
    val path = java.nio.file.Paths.get("PLANS.md")
    val marker = "<!-- MANUAL SECTIONS BELOW: PlanDump preserves everything from here -->"
    if (java.nio.file.Files.exists(path)) {
      val old = java.nio.file.Files.readString(path)
      val at = old.indexOf(marker)
      if (at >= 0) sb.append("\n").append(old.substring(at))
      else sb.append("\n").append(marker).append("\n")
    }
    java.nio.file.Files.writeString(path, sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }

  def streamingPlans(spark: SparkSession): Seq[(String, String, String)] = {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L

    def dump(df: org.apache.spark.sql.DataFrame)(feed: => Unit): String = {
      val q = df.writeStream.format("memory")
        .queryName(s"plandump_${System.nanoTime()}").outputMode("append").start()
      try {
        feed; q.processAllAvailable()
        q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution.executedPlan.toString
      } finally q.stop()
    }

    val msV = MemoryStream[(String, String, String, String, Long, Long)]
    val deltas = msV.toDF().toDF("ar", "ch", "vc", "is_new", "pv_ct", "ts")
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withColumn("sv_ct", lit(0L)).withColumn("uv_ct", lit(0L))
      .withColumn("uj_ct", lit(0L)).withColumn("dur_sum", lit(0L))
    val vs = dump(graft.streaming.Pipelines.visitorStats(deltas)) {
      msV.addData(("110000", "web", "v1", "1", 1L, t0))
    }

    val msI = MemoryStream[graft.streaming.OrderInfo]
    val msD = MemoryStream[graft.streaming.OrderDetail]
    val ow = dump(graft.streaming.Pipelines.orderWide(msI.toDS(), msD.toDS())) {
      msI.addData(graft.streaming.OrderInfo(1L, 10L, 110L, BigDecimal("9.90"), t0))
      msD.addData(graft.streaming.OrderDetail(100L, 1L, 7L, BigDecimal("9.90"), 1L,
        BigDecimal("9.90"), t0))
    }

    val msP = MemoryStream[(Long, Long, Long)]
    val clicks = msP.toDF().toDF("sku_id", "click_ct", "ts")
      .withColumn("event_time", timestamp_millis(col("ts"))).drop("ts")
    val sku = Seq((7L, "w", 3L, 4L, 5L)).toDF("id", "sku_name", "spu_id", "tm_id", "category3_id")
    val spu = Seq((3L, "l")).toDF("id", "spu_name")
    val tm = Seq((4L, "a")).toDF("id", "tm_name")
    val c3 = Seq((5L, "g")).toDF("id", "name")
    val ps = dump(graft.streaming.ProductStats.enrich(
      graft.streaming.ProductStats.aggregate(
        graft.streaming.ProductStats.unionDeltas(Seq(clicks))), sku, spu, tm, c3)) {
      msP.addData((7L, 1L, t0))
    }

    Seq(
      ("visitorStats", "ONE Exchange; HashAggregate (partial) before it; " +
        "StateStoreRestore/Save around the final agg", vs),
      ("orderWide", "StreamingSymmetricHashJoin with one Exchange per side, " +
        "state bounded by the ±5ms band + 3s watermarks", ow),
      ("productStats", "union → one Exchange into the windowed state; " +
        "all four dim joins BroadcastHashJoin AFTER the agg (no stream shuffle)", ps))
  }
}
