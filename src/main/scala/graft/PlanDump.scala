package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    // Builders are thunks evaluated at dump time, in order — the last
    // entry's conf mutation must not leak into earlier entries' planning.
    val picks: Seq[(String, String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("q_scan_project",
        "filter + projection pushdown into the parquet scan",
        () => SparkEntry.queries("q_scan_project")(spark, sf)),
      ("q_star_revenue",
        "star join: every dimension broadcast, fact table never shuffles before the aggregation",
        () => SparkEntry.queries("q_star_revenue")(spark, sf)),
      ("q_merge_full",
        "flagship merge: aligned union -> null-safe anti join -> single-shuffle window dedup",
        () => SparkEntry.queries("q_merge_full")(spark, sf)),
      ("q_minhash_lsh",
        "MinHash+LSH: signature agg + band bucket join, no all-pairs stage",
        () => SparkEntry.queries("q_minhash_lsh")(spark, sf)),
      ("q_range_join",
        "bucketized range join plans as a hash join on (key, bucket) with the range predicate residual",
        () => SparkEntry.queries("q_range_join")(spark, sf)),
      ("q_embed_neardup",
        "IVF-blocked near-dup: k-means fanout is a constant-key BroadcastHashJoin, candidates equi-join on centroid_id, vec_dot verify — no BroadcastNestedLoopJoin/Cross anywhere",
        () => SparkEntry.queries("q_embed_neardup")(spark, sf)),
      ("q_ann_ivf_trained",
        "trained-centroid IVF: Lloyd's iterations as max_by argmax + posexplode mean aggs, search joins on centroid_id",
        () => SparkEntry.queries("q_ann_ivf_trained")(spark, sf)),
      ("q_incremental_dedup",
        "incremental batch-vs-corpus dedup: corpus reduces to distinct md5 keys for the exact anti-join; near-dup candidates come from an ASYMMETRIC batch-band x corpus-band equi-join — the corpus is never self-joined",
        () => SparkEntry.queries("q_incremental_dedup")(spark, sf)),
      ("q_salted_join",
        "skew-safe salted equi-join: every exchange partitions by (key, salt) — each hot key spreads over 16 reducers; result bit-identical to the direct join",
        () => SparkEntry.queries("q_salted_join")(spark, sf)),
      ("q_incremental_dedup_stored",
        "stored-state incremental dedup: scans read ONLY the bucketed warehouse hash/signature tables — the corpus parquet appears nowhere in the plan (the nightly O(batch) shape)",
        () => SparkEntry.queries("q_incremental_dedup_stored")(spark, sf)),
      ("q_tfidf_search",
        "fixed-point TF-IDF retrieval: query-term filter BEFORE the tf shuffle, df relation broadcast (bounded by query length), N attached via constant-key BroadcastHashJoin, TakeOrderedAndProject top-k — no BNLJ, no global sort",
        () => SparkEntry.queries("q_tfidf_search")(spark, sf)),
      ("q_clean_corpus",
        "single-pass corpus cleaner: stats + quality + repetition + langId + PII in ONE WholeStageCodegen projection — one FileScan, zero Exchange",
        () => SparkEntry.queries("q_clean_corpus")(spark, sf)),
      ("q_dup_spans",
        "duplicate-span detection: positional shingle explode -> two-phase count-distinct agg on the gram hash -> semi-join back on the same key; shuffles carry (gram_hash, id, start), never gram text, and no stage is O(docs^2)",
        () => SparkEntry.queries("q_dup_spans")(spark, sf)),
      ("q_quality_gate",
        "histogram quantile gate: the corpus sees only a stats projection, a BroadcastHashJoin against the tiny (group, score, cut) relation, and a hash filter — the ranking windows run over the |groups|x6 histogram, never the corpus",
        () => SparkEntry.queries("q_quality_gate")(spark, sf)),
      ("q_bm25_search",
        "BM25: same shape as TF-IDF (term filter before the tf shuffle, broadcast df, constant-key totals attach) plus the per-doc length relation joining on the doc id — no BNLJ, top-k via TakeOrderedAndProject",
        () => SparkEntry.queries("q_bm25_search")(spark, sf)),
      ("q_ann_ivf_stored",
        "stored-IVF search: scans are the two index tables (centroids, postings bucketed on centroid_id) plus ONE query-side corpus scan — no k-means retraining stage anywhere in the plan",
        () => SparkEntry.queries("q_ann_ivf_stored")(spark, sf)),
      ("q_curation_pipeline",
        "end-to-end curation chain: dedup min-id agg + histogram-gate broadcast + decontamination semi/anti joins + mixture hash filter — the corpus flows through hash/equi-joins only, every tiny relation broadcast, no corpus self-join",
        () => SparkEntry.queries("q_curation_pipeline")(spark, sf)),
      ("q_hybrid_search",
        "hybrid RRF retrieval: BM25 pool (TakeOrderedAndProject) full-outer-joined with the vector pool — the one query vector attaches via constant-key BroadcastHashJoin, rank windows see only pool-sized inputs",
        () => SparkEntry.queries("q_hybrid_search")(spark, sf)),
      ("q_semantic_dedup",
        "semantic dedup: IVF-blocked candidate pairs (constant-key BHJ centroid fanout, equi-join on centroid_id) -> vec_dot verify -> bounded min-label closure over the PAIR relation (localCheckpoint-truncated) -> survivor anti-join; no all-pairs stage, CC never touches the corpus",
        () => SparkEntry.queries("q_semantic_dedup")(spark, sf)),
      ("q_semantic_dedup_stored",
        """semantic dedup against the STORED IVF index: identical shape to q_semantic_dedup except the k-means training jobs are GONE — blocking is one map against the persisted centroid relation (bucketed FileScan, broadcast out), then the same IVF-blocked pair gen + vec_dot verify + bounded min-label closure.
          |
          |**Where the bench time goes** (measured by `graft.ServeSplit`, `Test/runMain`, sf0.1 — proportions are the finding): the one-time IVF bootstrap (`writeIvfIndex`, ~22 s: k-means train + postings/centroids bucketed write) runs only when the stored state is absent — bench samples after the first reuse the live state, so the recorded min_s IS the serve path, measured 9.5/3.8/3.1 s cold/warm/warm at local[8]. The serve's irreducible core is the blocked pair verify + the closure's fixpoint iterations (the Exchange pair in the plan below is the CC label propagation, bounded by the PAIR relation size, never the corpus). The r12 bench flag (1.854 -> 3.391 s, raw 1.83x) matches this split's warm serve at the recorded 1.69x machine drift (1.854 x 1.69 = 3.13): machine, not plan — no stage here reads more than the candidate-pair relation.""".stripMargin,
        () => SparkEntry.queries("q_semantic_dedup_stored")(spark, sf)),
      ("q_bloom_antijoin",
        "bloom semi-join reduction: ONE partial-agg bloom build over the key set, the 1-row bitset fans out via constant-key BroadcastHashJoin, definite-miss rows exit through a codegen filter (no join), only possible-hits reach the shuffled confirm anti-join",
        () => SparkEntry.queries("q_bloom_antijoin")(spark, sf)),
      ("q_pq_adc",
        "PQ/ADC search: subspace explode is map work, the codebook and the per-query distance table attach via BroadcastHashJoins on (subspace, code), the per-candidate sum is a hash aggregate with map-side partial agg — no cross product, the only big shuffle carries (query, neighbor) partial sums",
        () => SparkEntry.queries("q_pq_adc")(spark, sf)),
      ("q_containment",
        "directed containment: one-sided prefix explode joins the full shingle relation on `shingle` (the explode's own key), verify is the same merge-intersect equi-join shape as Jaccard — no all-pairs stage",
        () => SparkEntry.queries("q_containment")(spark, sf)),
      ("q_rare_tokens",
        "corpus-relative rarity: vocab = partial-agg count on the token explode's key, joined back on that same key, then one doc-id aggregate — two shuffle keys total, no window over per-token occurrence lists",
        () => SparkEntry.queries("q_rare_tokens")(spark, sf)),
      ("q_tfidf_stored",
        "stored inverted index: the scan set is the three index tables (postings bucket-pruned by the query-term filter, 1-row totals) — no corpus text, no tokenization anywhere in the plan",
        () => SparkEntry.queries("q_tfidf_stored")(spark, sf)),
      ("q_ivf_pq_stored",
        "stored IVFPQ search: scans are the persisted centroids/codebook/codes relations plus one query-side corpus read — no training or encode stage in the plan; candidate join keys on (centroid, subspace, code)",
        () => SparkEntry.queries("q_ivf_pq_stored")(spark, sf)),
      ("q_bpe_merges",
        "BPE training: ONE corpus scan (word count), then per-iteration plans over the vocab relation only — pair-count hash agg with map-side combine, 1-row TakeOrderedAndProject argmax attached via constant-key BroadcastHashJoin, map-only merge; localCheckpoint truncation keeps iteration plans flat (scans below are checkpointed RDDs, not the corpus)",
        () => SparkEntry.queries("q_bpe_merges")(spark, sf)),
      ("merge_partitioned_slice",
        "partition-pruned merge (steps 1-3): the flagship change-set against the o_orderstatus-partitioned seed — the target slice FileScan carries PartitionFilters (o_orderstatus IN touched), so untouched partitions are never read; downstream is the standard single-shuffle merge over slice ∪ change",
        () => {
          val orders = spark.read.parquet(s"$sf/orders.parquet")
          val wh = "/tmp/graft_plandump_mergewh"
          val base = new org.apache.hadoop.fs.Path(s"$wh/orders_part")
          base.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(base, true)
          graft.io.Tables.writeWarehousePartitioned(
            orders, wh, "orders_part", Seq("o_orderstatus"))
          import org.apache.spark.sql.functions._
          val updates = orders.filter(col("o_orderkey") % 7 === 0)
            .withColumn("o_orderstatus", lit("U"))
          graft.core.Merge.mergePartitionedPlan(spark, wh, "orders_part",
            updates, "o_orderkey", "o_orderstatus",
            Seq(col("o_orderdate").desc_nulls_last),
            col("o_orderstatus") === "DELETED")._2
        }),
      ("containment_large_corpus_path",
        "containmentPairs above the broadcast gate (maxBroadcastDocs=0): no broadcast hint — frequency join and verify sides are shuffled equi-joins on their natural keys; captured with autoBroadcastJoinThreshold=-1 like the Jaccard twin",
        () => {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          graft.ext.Dedup.containmentPairs(
            graft.queries.DedupQueries.corpusWithDups(spark, sf),
            org.apache.spark.sql.functions.col("text"), "doc_id",
            shingleSize = 3, threshold = 0.9, maxBroadcastDocs = 0L)
        }),
      ("jaccard_pairs_large_corpus_path",
        "jaccardPairs above the broadcast gate (maxBroadcastDocs=0): NO broadcast hint anywhere — the shingle-frequency join shuffles on `shingle` (the explode's own key) and the verify joins are shuffled equi-joins on the pair ids — captured with autoBroadcastJoinThreshold=-1 to show the at-scale shape; with thresholds on, AQE may still legitimately re-broadcast a side it MEASURES as small",
        () => {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          graft.ext.Dedup.jaccardPairs(
            graft.queries.DedupQueries.corpusWithDups(spark, sf),
            org.apache.spark.sql.functions.col("text"), "doc_id",
            shingleSize = 3, threshold = 0.6, maxBroadcastDocs = 0L)
        }),
      ("q_merge_cdc",
        "CDC change feed: ONE full-outer SortMergeJoin on the key carrying only key + compared columns (never full row width) — the minimum diff shape; classification and the unchanged-filter are codegen map work on top",
        () => SparkEntry.queries("q_merge_cdc")(spark, sf)),
      ("q_lm_score",
        "Stupid-Backoff LM scoring: unigram/bigram counts are partial-agg shuffles on their own explode keys; scoring joins attach counts via shuffled equi-joins on (w1,w2)/w1/w2 (count relations NOT broadcast — web-scale vocab is not driver-sized), the 1-row total via constant-key BHJ; final per-doc sum carries (id, long)",
        () => SparkEntry.queries("q_lm_score")(spark, sf)),
      ("q_dsir_weights",
        "DSIR importance weights: feature counts are partial-agg shuffles on the bucket id; the λ relation is ≤numBuckets rows BY CONSTRUCTION so its broadcast is size-safe ungated; per-doc weight = one (id,f) count + one id-keyed sum — the corpora are never self-joined",
        () => SparkEntry.queries("q_dsir_weights")(spark, sf)),
      ("q_phrase_search",
        "exact-phrase retrieval, live: ONE FileScan + WholeStageCodegen higher-order filter over each row's own token array — zero Exchange before the final top-k (TakeOrderedAndProject); the corpus never explodes",
        () => SparkEntry.queries("q_phrase_search")(spark, sf)),
      ("q_phrase_stored",
        "stored phrase search: each phrase term reads its term-filtered postings slice (PushedFilters on term, bucket-pruned), m−1 equi-joins on (doc, start) — the corpus text is scanned ZERO times",
        () => SparkEntry.queries("q_phrase_stored")(spark, sf)),
      ("q_image_neardup",
        "perceptual image near-dedup: decode+aHash is one mapPartitions pass; candidates join on the exploded 16-bit band key (keyed equi-join, never all-pairs); verify is two XOR popcounts on the joined halves",
        () => SparkEntry.queries("q_image_neardup")(spark, sf)),
      ("q_temp_mix_sample",
        "temperature-mix sampling: ONE partial-agg shuffle on the group key builds the weight relation; totals attach via constant-key BHJ; the |groups|-row cut relation broadcasts onto the corpus and the lottery filter is map work — zero data-path collect",
        () => SparkEntry.queries("q_temp_mix_sample")(spark, sf)),
      ("q_lm_appended",
        "log-structured LM state: scoring reads the bucketed delta tables (zero train-corpus scans) and the per-key delta sums are co-located on the bucket layout — the state side contributes no Exchange before the scoring joins",
        () => SparkEntry.queries("q_lm_appended")(spark, sf)),
      ("q_ann_join",
        "cross-corpus ANN join: both sides assign via the broadcast centroid fanout; candidates meet on a shuffled equi-join keyed by centroid_id; per-query ranking windows see cluster-sized groups only",
        () => SparkEntry.queries("q_ann_join")(spark, sf)),
      ("q_hll_stored",
        "deterministic HLL state: estimates read ONLY the bucketed register relation (max-fold co-located on the group bucket layout); the corpus is scanned once solely for the side-by-side exact count",
        () => SparkEntry.queries("q_hll_stored")(spark, sf)),
      ("q_expectations",
        "expectations: N rules fold into ONE aggregate over ONE FileScan (conditional sums share the partial-agg tree); the per-rule pivot is an explode over a 1-row relation",
        () => SparkEntry.queries("q_expectations")(spark, sf)),
      ("q_retention",
        "cohort retention: the event scan collapses immediately to distinct (user, period) pairs via a two-phase agg — the first Exchange carries user-periods, not events; the cohort window and the final aggregate run over that already-tiny relation",
        () => SparkEntry.queries("q_retention")(spark, sf)),
      ("q_copurchase",
        "co-occurrence edges: membership distinct -> cap semi-join on the group key -> within-group self-join (fan-out bounded by maxGroupSize) -> pair-keyed partial agg; every Exchange keys on the group or the pair",
        () => SparkEntry.queries("q_copurchase")(spark, sf)),
      ("q_triangles",
        "degree-oriented triangle counting: orientation via a degree join, the wedge stage is a self-equi-join on the lower corner, the closing edge matches on BOTH endpoints — all Exchanges carry edge keys; scans below are checkpointed RDDs, never the corpus",
        () => SparkEntry.queries("q_triangles")(spark, sf)),
      ("q_heavy_hitters",
        "exact heavy hitters, confirm pass: the candidate isin filter is pushed into the scan and the confirm aggregate's key space is <= k — the distinct-key relation is never shuffled (pass 1's Misra-Gries summary carried one k-entry row per partition)",
        () => SparkEntry.queries("q_heavy_hitters")(spark, sf)),
      ("q_collocations",
        "collocations: bigrams via zip_with over each doc's own token array (no self-join), two partial-agg shuffles (bigram, token), unigram attachments join on the bigram's own word columns, the 1-row totals relation attaches via column-derived constant-key BroadcastHashJoin — no BNLJ",
        () => SparkEntry.queries("q_collocations")(spark, sf)),
      ("q_retrieval_eval",
        "retrieval eval: the rank window runs over the top-k-bounded result pool, truth attaches by (query, doc) equi-join, the final aggregate is |queries|-sized",
        () => SparkEntry.queries("q_retrieval_eval")(spark, sf)),
      ("q_join_stored",
        "incrementally-maintained join view (read path): the maintained output is ONE bucketed FileScan — no join, no Exchange; the delta-rule maintenance plans (append path) shuffle the delta side only against co-located state buckets",
        () => SparkEntry.queries("q_join_stored")(spark, sf)),
      ("q_scd_stored",
        "stored SCD2 read: closed history (bucketed FileScan, append-only) unioned with the |keys|-bounded current slice — the nightly fold never rescans or rewrites the history",
        () => SparkEntry.queries("q_scd_stored")(spark, sf)),
      ("q_merge_partitioned_idx",
        "key-indexed partitioned merge (read-back): the merged table scan; touched-partition resolution during the merge is an index-only semi-join against the bucketed {table}__keyidx relation — the full target is never key-scanned",
        () => SparkEntry.queries("q_merge_partitioned_idx")(spark, sf)),
      ("q_join_stored_cdc",
        """counted join view with retractions (read path): the contribution fold groups by all columns ON the bucket layout — zero Exchange before the multiplicity filter/re-expand; maintenance appended signed delta terms with the stored side co-located.
          |
          |**Where the ~6.1 s bench time goes** (measured by `graft.CdcJoinSplit`, `Test/runMain`, sf0.1 — proportions are the finding; the bench sidecar stays the timing of record): setup (`createStoredCounted`, base batch) is benched separately as `setup_s`; the IN-QUERY time is ~95% the two CDC ingests (`appendStoredCounted` n2 ~65%, n3 with signed DELETE retractions ~34%) — the declared query deliberately re-ingests nights 2-3 per run because the oracle checks maintained-with-retractions ≡ recomputed, so the maintenance itself must run inside the measured window; the serve read (this plan) measured 0.5-1.6 s. At 100 TB the ingest is O(nightly batch) by construction (signed delta terms append to the bucketed state; no existing contribution row is read or rewritten) and the serve read is the sub-second shape below.""".stripMargin,
        () => SparkEntry.queries("q_join_stored_cdc")(spark, sf)),
      ("q_join_cdc_asof",
        "time-travel read of the counted join view (r12): the batch predicate (`__graft_batch IN (base, n2)`) PUSHES INTO the bucketed state scan — night 3's contribution rows (including every delete's negative terms) are filtered at the parquet reader, then the same Exchange-free fold runs on the bucket layout; time travel costs a pushed filter, not a snapshot copy. Cost split = q_join_stored_cdc's (the ~6.1 s bench time is the two in-query CDC ingests; the as-of serve read itself measured 1.2 / 0.5 s cold/warm via graft.CdcJoinSplit)",
        () => SparkEntry.queries("q_join_cdc_asof")(spark, sf)),
      ("q_text_index_stats",
        "text-index drift ledger: the report is a |phases|-row fold of the per-ingest summary relation — index postings and corpus text appear nowhere in the plan",
        () => SparkEntry.queries("q_text_index_stats")(spark, sf)),
      ("q_ann_ivf_deleted",
        "tombstoned IVF search: the postings scan anti-joins the deleted-id relation BEFORE the ranking window — ghosts can never occupy top-k slots; after compaction the same plan runs tombstone-free",
        () => SparkEntry.queries("q_ann_ivf_deleted")(spark, sf)),
      ("q_agg_asof",
        "time-travel aggregate read: the batch cutoff lands in the scan's PartitionFilters — post-cutoff partitions never open; the fold is the usual |groups|-sized two-phase agg",
        () => SparkEntry.queries("q_agg_asof")(spark, sf)),
      ("q_heavy_hitters_stored",
        "stored heavy hitters: candidates + total come from the k-rows-per-batch summary relation (the corpus appears ONLY in the isin-pruned confirm scan); the cross-batch merge is a window + constant-key BHJ over a metadata-sized relation",
        () => SparkEntry.queries("q_heavy_hitters_stored")(spark, sf)),
      ("q_scd_pointintime",
        "point-in-time SCD2 enrichment: an EQUI-join on the key (broadcast here, shuffle at scale) with the validity range as a residual predicate — never an interval-overlap nested loop",
        () => SparkEntry.queries("q_scd_pointintime")(spark, sf)),
      ("q_gap_fill",
        "gap-fill resample: per-key span agg -> sequence explode (map-side) -> ONE left join back + ONE running window, all keyed on user — no calendar-dimension scan",
        () => SparkEntry.queries("q_gap_fill")(spark, sf)),
      ("q_anomaly_days",
        "anomaly flags: one (type, slot) partial-agg shuffle; the |types|-row stats relation broadcasts back onto the slot relation — the integer sigma-test is a residual filter",
        () => SparkEntry.queries("q_anomaly_days")(spark, sf)),
      ("q_record_linkage",
        "record linkage: candidates form ONLY via the block equi-join; levenshtein + the two mutual-best windows run over the candidate relation (block-bounded), never a name cross product",
        () => SparkEntry.queries("q_record_linkage")(spark, sf)),
      ("q_kmv_overlap",
        "KMV overlap: BOTH bottom-k sketches aggregate in ONE pass over ONE shingle scan (two kmv_sketch aggregates share the partial-agg tree); everything after the checkpointed 1-row sketch pair touches <= 2k rows",
        () => SparkEntry.queries("q_kmv_overlap")(spark, sf)),
      ("q_session_stored",
        "stored sessionization read: closed history (bucketed FileScan, append-only) unioned with the |keys|-bounded open slice — the nightly fold shuffles (batch ∪ open) once through one native session_window aggregate, never the history",
        () => SparkEntry.queries("q_session_stored")(spark, sf)),
      ("q_cms_window",
        "sliding-window count-min read: the batch window lands in the state scan's PartitionFilters (expired batches never open); the folded <=depth*width grid BROADCASTS onto the probe relation — probes are never shuffled",
        () => SparkEntry.queries("q_cms_window")(spark, sf)),
      ("q_table_diff",
        "table diff: ONE full-outer SortMergeJoin on the key carries the whole audit — data columns ride as a single struct per side, change classification and per-column lists are post-join projections, no second shuffle",
        () => SparkEntry.queries("q_table_diff")(spark, sf)),
      ("q_skew_report",
        "skew report: ONE distinct-key partial-agg shuffle + TakeOrderedAndProject top-k; totals attach by column-derived constant-key BroadcastHashJoin — never a second corpus pass",
        () => SparkEntry.queries("q_skew_report")(spark, sf)),
      ("q_kmv_matrix",
        "KMV overlap matrix: one grouped sketch aggregate over one shingle scan; all pairs form on a constant-key BroadcastHashJoin over the |groups|-row sketch relation (never a cross node); per-cell O(k log k) array kernels",
        () => SparkEntry.queries("q_kmv_matrix")(spark, sf)),
      ("q_cc_stored",
        "incremental CC read: the label fold is one max_by aggregate over the delta log FileScan — the pair graph appears only in the appends, never in the serving read",
        () => SparkEntry.queries("q_cc_stored")(spark, sf)),
      ("q_kcore",
        "k-core peel round: degree partial-agg shuffle + two key-joins on the edge relation only (corpus appears solely in the upstream LSH pair derivation); localCheckpoint truncates each round so plan depth stays flat",
        () => SparkEntry.queries("q_kcore")(spark, sf)),
      ("cc_fixpoint_propagate",
        "one fixpoint-CC propagate round (r7): one equi-join of the cached edge relation against the checkpointed labels + one partial-agg'd min groupBy — edge/vertex-relation-sized, the corpus appears nowhere; rounds are O(log diameter) with a zero-changed-labels stop",
        () => {
          import org.apache.spark.sql.functions._
          import spark.implicits._
          val edges = (1L to 1000L).map(i => (i, i + 1)).toDF("src", "dst").cache()
          val labels = edges.select(col("src").as("id")).distinct()
            .withColumn("comp", col("id")).localCheckpoint(true)
          edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .select(col("src").as("id"), col("comp"))
            .unionAll(labels)
            .groupBy("id").agg(min("comp").as("comp"))
        }),
      ("cc_fixpoint_shortcut",
        "the pointer-doubling shortcut of the same round (comp := label(comp)): a labels self-join on comp — |V| rows both sides; this is what turns O(diameter) min-label into O(log diameter)",
        () => {
          import org.apache.spark.sql.functions._
          import spark.implicits._
          val edges = (1L to 1000L).map(i => (i, i + 1)).toDF("src", "dst")
          val prop = edges.select(col("src").as("id"))
            .distinct().withColumn("comp", col("id")).localCheckpoint(true)
          prop.join(prop.select(col("id").as("comp"), col("comp").as("__c2")),
              Seq("comp"), "left")
            .select(col("id"), coalesce(col("__c2"), col("comp")).as("comp"))
        }),
      ("q_incremental_snapshot",
        "manifest-versioned read: a PLAIN parquet scan over exactly the manifest's generation dirs — the untouched partitions are the SAME files the previous version listed (shared by reference); no pointer indirection survives into the plan, and the timed delta write touched one partition's bytes",
        () => SparkEntry.queries("q_incremental_snapshot")(spark, sf)),
      ("q_merge_manifest",
        "merge-into-manifest (read-back): the committed version's generation dirs — the nightly merge itself read only the TOUCHED partitions' dirs (manifest-level pruning; the slice filter binds before the scan list is even built) and committed survivors as one atomic manifest",
        () => SparkEntry.queries("q_merge_manifest")(spark, sf)),
      ("q_join_skew_policy",
        "policy join, decision 'salted': the big side carries the deterministic __salt in its projection and the dim replicates per salt (explode(sequence) under the aggregate); at this SF the 7x16-row replicated dim auto-broadcasts so no big-side exchange appears, at scale the same shape shuffles on (hk, __salt) — SkewSpec pins (key, salt) in every exchange with broadcast disabled",
        () => SparkEntry.queries("q_join_skew_policy")(spark, sf)),
      ("q_snapshot_rowdiff",
        "partition-pruned version diff: each side's FileScan lists ONLY the changed partitions' generation dirs (3 of 5 segments here — the manifest pre-pass excluded the rest before planning), then the one full-outer co-shuffle on the key carries the whole audit",
        () => SparkEntry.queries("q_snapshot_rowdiff")(spark, sf)),
      ("q_delete_vectors",
        "merge-on-read delete vectors (r8): the data side is the plain generation-dir scan (NO partition was rewritten — the commit wrote only the tiny per-partition delete dirs), the vectors attach as ONE left_anti BroadcastHashJoin on (partition key, row key) — delete cost is O(delete bytes) at commit AND at read",
        () => SparkEntry.queries("q_delete_vectors")(spark, sf)),
      ("q_zonemap_read",
        "zone-map-pruned read (r8): the manifest's per-partition min/max DISPROVE the o_orderdate predicate for pre-1997 year partitions, so the FileScan's InMemoryFileIndex lists ONLY the surviving years' generation dirs (2 of 7 at this SF — pruned partitions are never listed, never planned); the residual row filter on top guarantees exactness",
        () => SparkEntry.queries("q_zonemap_read")(spark, sf)),
      ("q_change_feed",
        "row-level change feed (r8): both version slices list ONLY the changed partitions' dirs (manifest pre-pass), then ONE full-outer join on the key — carrying just key + compared columns — classifies insert/update/delete; untouched partitions contribute zero IO and provably zero feed rows",
        () => SparkEntry.queries("q_change_feed")(spark, sf)),
      ("q_bloom_point",
        "bloom-pruned point lookup (r8): order keys are SCATTERED across the priority partitions (every partition's zone range spans the whole key space — range pruning provably keeps all 5), yet the FileScan lists ONLY the partitions whose bloom sidecar may hold a probe key; the residual IN filter on top guarantees exactness whatever pruned",
        () => SparkEntry.queries("q_bloom_point")(spark, sf)),
      ("q_file_prune",
        "FILE-level zone-map pruning (r8): after optimizeClustered each parquet file owns a narrow l_orderkey slice and its range is recorded in the generation's _filestats sidecar, so the FileScan's InMemoryFileIndex lists individual FILES — the subset whose slice intersects [500, 1000) — not whole partition dirs; partition-level zone maps cannot prune here (every flag partition spans the key domain), which is exactly the granularity step this layer adds",
        () => SparkEntry.queries("q_file_prune")(spark, sf)),
      ("q_zorder_prune",
        "Z-ordered file pruning on the SECOND dimension (r8): the Morton-interleaved rewrite gives every file a small rectangle of the (l_orderkey, l_partkey) plane, so this l_partkey-only predicate still lists a strict subset of files — the dimension a single-key clustering provably cannot skip on; the residual filter guarantees exactness",
        () => SparkEntry.queries("q_zorder_prune")(spark, sf)),
      ("q_filtered_read",
        "native-Column filtered read (r8): the caller's compound predicate — range AND an OR-residual — has its implied conjuncts extracted from the ColumnNode tree (PredExtract); the range drives zone+file pruning (the FileScan lists individual surviving files), while the ORIGINAL Column shows verbatim as the row Filter, OR term included",
        () => SparkEntry.queries("q_filtered_read")(spark, sf)),
      ("q_isnull_prune",
        "NULL-count zone pruning (r8): IS NULL is undecidable from value ranges, but the manifests record per-column null counts — the FileScan lists ONLY the one priority partition that holds any nulls of the probe column; null-free partitions are never listed, and the residual isNull filter guarantees exactness",
        () => SparkEntry.queries("q_isnull_prune")(spark, sf)),
      ("q_sql_pruned",
        "the SQL surface (r8): plain spark.sql over a registered manifest table — ResolveGraftTables resolves the name to the head version, PruneGraftScans converts the resolved WHERE into the zone+file pruned scan (individual surviving FILES in the listing), and the Filter node above is the verbatim residual, OR term included",
        () => SparkEntry.queries("q_sql_pruned")(spark, sf)),
      ("q_sql_meta_agg",
        "metadata-only SQL aggregates (r8): count(*)/count(col)/min/max over a manifest table answer from recorded stats — NO FileScan appears anywhere in this plan (a 1-row local relation carries the manifest fold); inexact stats or unsupported shapes fall back to the real pruned scan",
        () => SparkEntry.queries("q_sql_meta_agg")(spark, sf)),
      ("q_or_union_prune",
        "OR-of-conjuncts pruning (r9): the date-range-union shape — (k IN [100,300)) OR (k IN [5000,5200)) — extracts as a bounded DNF and the FileScan lists the UNION of each branch's zone+file survivors (two narrow slivers of the clustered layout), where the pre-r9 conjunct-only extraction scanned every file; the verbatim OR rides as the residual Filter, so extraction coarseness can never change the answer",
        () => SparkEntry.queries("q_or_union_prune")(spark, sf)),
      ("q_type_widening",
        "type-widening read (r9): v1 generations hold INT o_custkey parquet, the delta's BIGINT widened the recorded head schema, and ONE FileScan reads both generation families under ReadSchema bigint (the parquet reader's native widening) — no per-file mergeSchema, no rewrite of the untouched partitions, no union-of-casts plan",
        () => SparkEntry.queries("q_type_widening")(spark, sf)),
      ("q_sql_update",
        "SQL UPDATE (r9): the statement resolved to one source-wins mergeVersionedMulti over the matching rows — the matching-row scan reads through the registered relation (zone/bloom/file pruning on the WHERE before any data IO), assignments are a single codegen projection with ANSI casts; THIS plan is the post-update head read over exactly the live generation dirs",
        () => SparkEntry.queries("q_sql_update")(spark, sf)),
      ("q_sql_merge",
        """SQL MERGE INTO (r9): the statement resolved to mergeVersionedMulti(sourceWins) — the work happened at DML time (zone-pruned key locate, slice-union-change latest-wins, expectation-carrying commit; see q_merge_versioned for that shape); THIS plan is the post-merge head read, one FileScan over exactly the live generation dirs including the merge-created 9-NEW partition.
          |
          |**Where the ~5.4 s bench time goes** (measured by `graft.ServeSplit`, `Test/runMain`, sf0.1 — proportions are the finding; the bench sidecar stays the timing of record): target-table setup (`writeFull`, ~2.5 s) is benched separately as `setup_s`; the IN-QUERY time is ≥98% the MERGE statement itself — source-slice derivation 0.03 s, the statement (locate + slice merge + versioned OCC commit over every touched partition: the %7/%11/%13 slices touch all partitions by construction) the rest — and the post-merge serve read measured 0.17/0.09 s cold/warm with ZERO Exchange (the single FileScan below). At 100 TB the statement's cost is O(touched partitions) via zone+bloom locate, and the serve read stays this sub-second shape.""".stripMargin,
        () => SparkEntry.queries("q_sql_merge")(spark, sf)),
      ("q_sql_merge_cols",
        "SQL MERGE with COLUMN-LIST assignments (r10): matched target CONTENT comes through rowsForKeys (zone+bloom locate — only partitions that could hold a source key are read), joined source-left to classify the first-match-wins clause chain; assignments are one codegen CASE projection with ANSI casts; THIS plan is the post-merge head read over the live generation dirs including the NULL-filled column-list inserts",
        () => SparkEntry.queries("q_sql_merge_cols")(spark, sf)),
      ("q_sql_optimize",
        "SQL OPTIMIZE + ZORDER + VACUUM (r10): maintenance statements intercepted by the injected parser and routed to the engine's compaction/clustering/retention paths; THIS plan is the post-maintenance read — ONE FileScan over the folded, Z-ordered generation dirs (three appends' small-files sprawl collapsed), data bit-identical to the oracle",
        () => SparkEntry.queries("q_sql_optimize")(spark, sf)),
      ("q_rename_column",
        "ALTER TABLE RENAME COLUMN (r10): O(1) schema-only commit with column mapping — the FileScan reads the PHYSICAL column name (o_totalprice) from every untouched generation and projects it to the new logical name (price); the WHERE on the renamed column still zone/file-prunes (stats re-key logical at read time); post-rename writes land under the physical name so one ReadSchema covers all generations",
        () => SparkEntry.queries("q_rename_column")(spark, sf)),
      ("q_bloom_widened",
        "bloom locate across a type widening (r10): the widening commit REBUILT every live sidecar at the new long key type, so the locate-delete's probes (xxhash64 over long) prune/find correctly through partitions whose data generations are still the original int-typed files; THIS plan is the post-delete read — merge-on-read DV anti-join over exactly the live generation dirs",
        () => SparkEntry.queries("q_bloom_widened")(spark, sf)),
      ("q_convert_inplace",
        "zero-copy convert (r10): version 1 merely REFERENCES the hive lake's leaf dirs, and after the nightly merge the manifest MIXES foreign (../lake) and native (parts/) generations — this post-merge read is ONE FileScan whose location list spans both, proving converted partitions cost no rewrite until a write actually touches them",
        () => SparkEntry.queries("q_convert_inplace")(spark, sf)),
      ("q_gen_partition",
        "GENERATED partition columns / hidden partitioning (r10): the table declared graft.generated.p_day = days(ts); the writer never computed p_day (derived at staging) and this query's predicate names only the RAW timestamp — yet the FileScan lists ONLY the three matching day partitions, because the read path derived the implied p_day range and pruned on its single-valued per-partition zone stats; the raw-ts predicate rides as the verbatim residual Filter",
        () => SparkEntry.queries("q_gen_partition")(spark, sf)),
      ("q_sql_clone",
        "SQL SHALLOW CLONE (r10): the branch's v1 REFERENCES the source's generation dirs (../cust_clsrc.mv/...) and the post-divergence UPDATE localized only the touched partition — this join of source and branch reads TWO FileScans whose location lists overlap on untouched generations (zero-copy sharing) and differ exactly on the diverged one",
        () => SparkEntry.queries("q_sql_clone")(spark, sf)),
      ("q_sql_widen",
        "read-back after the SQL-issued widening (r11): the scan serves PRE-widening int-written generations and post-widening long rows under ONE recorded schema (`ReadSchema: o_orderkey:bigint` — parquet reads the int files up natively), and the pruning predicate on the widened column pushes into the scan (`PushedFilters: GreaterThanOrEqual(o_orderkey,1000)`); upstream, zone tokens recorded at int bound the long-typed probes (value-exact lattice), so partition pruning crosses the widening too. One codegen span, no Exchange — the widening itself was an O(1) metadata commit (no bloom policy here; the policied-rebuild variant is pinned in GraftDdlSpec)",
        () => SparkEntry.queries("q_sql_widen")(spark, sf)),
      ("q_sql_replace_where",
        "REPLACE WHERE backfill (r10): the statement's zone-pruned candidate set touched ONLY the predicate's partition — every other partition's generation dir carried over VERBATIM in the manifest (no rewrite, no listing; the spec pins dir identity) — and THIS post-backfill read is one FileScan over the live generation dirs, the replaced partition's new generation among them",
        () => SparkEntry.queries("q_sql_replace_where")(spark, sf)))
    // HAND-AUTHORED evidence that must SURVIVE regeneration (this main
    // overwrites PLANS.md wholesale — before r12, notes edited into the
    // file by hand silently died on the next regenerate): prose-only
    // sections appended after the generated plans.
    val proseSections: Seq[(String, String)] = Seq(
      ("q_canonical_docs — live vs stored cost note (r11, VERDICT-r10 item 7)",
        """`q_canonical_docs` is among the most expensive bench queries (7.09 s min at sf0.1, r10) because it is the LIVE, from-scratch composition: MinHash → banded LSH pair derivation → fixpoint CC → per-component argmax, every run, over the whole corpus. That is the declared BASELINE form — the shape a user runs once on a new corpus — not the nightly path. The nightly path is the stored twins, benched separately:
          |
          || form | measured query (r10) | what the measured part reads |
          ||---|---|---|
          || live baseline | `q_canonical_docs` 7.09 s | whole corpus (LSH + CC + argmax per run) |
          || stored CC serve | `q_cc_stored` 2.78 s query / 2.70 s setup | the label delta log ONLY — one `max_by` fold over the `cc_cclab` FileScan; the pair graph appears only in the appends |
          || stored canonical serve | `q_canonical_stored` 1.01 s query / 3.97 s setup | stored labels + stats; zero corpus re-shingling |
          |
          |At 100 TB the live form is a one-time bootstrap; nightly batches append edges into the stored quotient-graph state (`ext/CcState`) at O(batch), and canonical serving is the 1 s-shaped read, not the 7 s-shaped recompute. The bench keeps the live form as the honest upper bound and regression canary for the whole composition.""".stripMargin))
    val sb = new StringBuilder
    sb.append("# Physical plans (sf0.001, local[8]) — evidence the declared queries plan the way the scale notes claim\n")
    sb.append("\nRegenerate: `sbt \"runMain graft.PlanDump\"`. See SURVEY.md §8 for the full operator inventory. Hand-authored cost notes live in PlanDump's `proseSections` so regeneration preserves them.\n")
    picks.foreach { case (name, why, mk) =>
      // snapshot/restore any conf a thunk mutates AFTER its plan string is
      // captured (executedPlan is lazily planned at first access, so the
      // thunk's conf must stay active through the append below) — entry
      // order is not load-bearing.
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val df = mk()
      df.count() // force AQE final plan
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      // truncate per LINE, not per dump: a single wide Project expression
      // list must not push the structural nodes (scans, exchanges, joins)
      // past the cap — the node tree IS the evidence.
      val plan = df.queryExecution.executedPlan.toString.linesIterator
        .map(l => if (l.length > 220) l.take(220) + " …" else l)
        .mkString("\n")
      sb.append(plan.take(8000))
      sb.append("\n```\n")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
    proseSections.foreach { case (title, body) =>
      sb.append(s"\n## $title\n\n$body\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    spark.stop()
  }
}
