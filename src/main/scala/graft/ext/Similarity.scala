package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (cross join + per-query
  * heap); the IVF variant is the 100 TB path: assign every vector to its
  * nearest of C centroids (map-only after a centroid broadcast), then search
  * only within the query's cluster — candidate set shrinks ~C× for one extra
  * broadcast join.
  *
  * Hot-path arithmetic uses the engine's native codegen expressions
  * ([[graft.functions.VectorExpressions]]): vectors are l2-normalized ONCE
  * per row (`vec_normalize`), so every pairwise cosine inside a join is a
  * single `vec_dot` primitive loop inside whole-stage codegen — the
  * interpreted `zip_with`/`aggregate` higher-order form was 40× slower at
  * sf0.1. The HOF forms remain below for contexts without registry access.
  */
object Similarity {

  /** Sequential-fold dot product (interpreted HOF form — oracle-identical
    * accumulation order; prefer `vec_dot` on hot paths).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** (id, unit-norm double vector) projection — the shared prologue of
    * every similarity operator. Registers the native functions idempotently.
    */
  private def normalized(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    df.select(col(idCol).as(idAs),
      call_function("vec_normalize", col(vecCol)).as(vecAs))
  }

  /** Per-vector scalar int8 quantization: code_i = round((x_i − min) ·
    * 255 / (max − min)) with the vector's own min/max as the range — 4×
    * storage shrink for embedding warehouses (the raw float column is
    * usually the dominant table byte-weight). Returns (codes array<int>,
    * qmin, qmax); [[dequantize]] reconstructs with ≤ range/510 per-dim
    * error. Pure per-row expressions in a FIXED operation order, so the
    * SQL oracle reproduces the codes bit-for-bit (no cross-engine
    * summation-order drift — every op is per-element).
    */
  def quantize(vec: Column): Column = {
    val d = transform(vec, x => x.cast("double"))
    val mn = array_min(d)
    val mx = array_max(d)
    val scale = when(mx > mn, mx - mn).otherwise(lit(1.0))
    struct(
      transform(d, x => round((x - mn) * 255.0 / scale).cast("int")).as("codes"),
      mn.as("qmin"),
      mx.as("qmax"))
  }

  /** Quantized sparse random projection: int8 [[quantize]] codes down to
    * `outDim` integer components via deterministic {−1,0,1} signs
    * ([[graft.functions.VectorExpressions.IntProject]]). Distance-
    * preserving in expectation (JL), bit-exact in any engine (pure integer
    * arithmetic), one codegen map pass with zero shuffle — the
    * dimensionality-reduction step before ANN indexing at corpus scale
    * (int8 gives 4×, the projection dim/outDim on top).
    */
  def projectQuantized(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    // the raw vector goes straight in: vec_project_int fuses the quantize
    // pass (one min/max scan + one code loop) — composing the declarative
    // quantize() here re-evaluates array_min/array_max per ELEMENT inside
    // the interpreted HOF lambda, O(dim²) per row (measured 3.5 s → 0.1 s
    // at sf0.1 for q_embed_project after fusing)
    df.select(col(idCol),
      call_function("vec_project_int", col(vecCol), lit(outDim)).as("proj"))
  }

  /** Inverse of [[quantize]]: x̂_i = qmin + code_i · (qmax − qmin) / 255. */
  def dequantize(q: Column): Column = {
    val scale = when(q.getField("qmax") > q.getField("qmin"),
      q.getField("qmax") - q.getField("qmin")).otherwise(lit(1.0))
    transform(q.getField("codes"),
      c => q.getField("qmin") + c.cast("double") * scale / 255.0)
  }

  /** Exact top-k neighbors for each query vector, brute force.
    * `WindowGroupLimit` keeps only k rows per query below the rank, so the
    * shuffle after the cross join carries candidates, not the full product.
    * Deterministic tiebreak: (similarity desc, neighbor id asc).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val c = normalized(corpus, idCol, vecCol, "neighbor_id", "cv")
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", call_function("vec_dot", col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** vectors × broadcast(centroids) as a constant-key BroadcastHashJoin —
    * semantically a cross product against the (small, ≤ thousands) centroid
    * relation, but planned as a hash join so the physical plan carries no
    * `BroadcastNestedLoopJoin`/`Cross` node (the n² cross is the scale
    * red-flag; a k-way per-row fanout against broadcast centroids is the
    * intended linear pattern). The key must be column-DERIVED: a bare
    * `lit(1)` folds away and Catalyst degrades the join to a keyless
    * nested loop, so each side keys on `pmod(xxhash64(<own first col>), 1)`
    * — always 0, never null, not constant-foldable.
    */
  private def centroidFanout(v: DataFrame, c: DataFrame): DataFrame = {
    val vk = v.withColumn("__one", pmod(xxhash64(col(v.columns.head)), lit(1)))
    val ck = c.withColumn("__one", pmod(xxhash64(col(c.columns.head)), lit(1)))
    vk.join(broadcast(ck), Seq("__one")).drop("__one")
  }

  /** Cluster assignment: the `nProbe` nearest centroids by cosine per
    * vector (ties → lowest centroid id), `probe_rank` 1..nProbe. Centroids
    * are broadcast; assignment is map-only. Storage assignment uses rank 1;
    * query-side probing widens to nProbe.
    */
  def assignClusters(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nProbe: Int = 1): DataFrame = {
    val v = normalized(vectors, idCol, vecCol, idCol, "nv")
    val c = normalized(centroids, idCol, vecCol, "centroid_id", "centv")
    val scored = centroidFanout(v, c)
      .withColumn("sim", call_function("vec_dot", col("nv"), col("centv")))
    if (nProbe == 1) {
      // storage assignment (the common path): a max_by hash aggregate —
      // map-side partial agg collapses the k× fanout back to n rows BEFORE
      // the shuffle, vs. the window form shuffling all n×k scored rows.
      scored.groupBy(col(idCol))
        .agg(
          max_by(col("centroid_id"), struct(col("sim"), -col("centroid_id")))
            .as("centroid_id"),
          first(col("nv")).as("nv"))
        .select(col(idCol), col("nv"), col("centroid_id"),
          lit(1).as("probe_rank"))
    } else {
      val w = Window.partitionBy(idCol)
        .orderBy(col("sim").desc, col("centroid_id").asc)
      scored
        .withColumn("probe_rank", row_number().over(w))
        .filter(col("probe_rank") <= nProbe)
        .select(col(idCol), col("nv"), col("centroid_id"), col("probe_rank"))
    }
  }

  /** Deterministic spherical k-means (Lloyd's) over unit vectors — the
    * missing trainer behind [[ivfTopK]]: without it IVF is an inverted file
    * over arbitrary pivots.
    *
    * Init is a hash-ordered sample: the k vectors with the smallest
    * md5(id) — deterministic, data-independent of insertion order, and
    * exactly reproducible in the SQL oracle (no RNG). Each iteration:
    *  - assign: fan out against broadcast centroids, keep the max-cosine
    *    centroid per vector via `max_by` in ONE hash aggregate — no window
    *    over the k× fanout, so the shuffle carries n rows, not n×k;
    *  - update: per-dimension mean of each cluster's members (posexplode →
    *    groupBy(cid, dim) with map-side partial agg → shuffle is k×dim
    *    rows per partition, not the data), reassembled in dim order and
    *    re-normalized. Empty clusters drop out (GROUP BY emits only
    *    nonempty groups — same semantics in the oracle).
    *
    * Returns (`idCol` = centroid id 0..k-1, `vecCol` = unit array<double>),
    * directly consumable by [[assignClusters]]/[[ivfTopK]]. Ties in the
    * argmax break toward the lowest centroid id (oracle-identical).
    */
  def kmeansCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    // The corpus projection feeds every assignment pass (Lloyd's is
    // inherently `iters` passes over the data); persist it once instead
    // of re-deriving from source each round. Spill-safe MEMORY_AND_DISK;
    // unpersisted below once training has materialized.
    val v = normalized(vectors, idCol, vecCol, idCol, "nv")
    if (iters > 0) v.cache()
    val seed = v
      .withColumn("__r", graft.functions.Hashing.md5Long(col(idCol).cast("string")))
      .orderBy(col("__r"), col(idCol)).limit(k)
    val wk = Window.orderBy(col("__r"), col(idCol))
    var cent = seed.withColumn("cid", row_number().over(wk) - 1)
      .select(col("cid"), col("nv").as("cv"))
    for (_ <- 0 until iters) {
      val assigned = centroidFanout(v, cent)
        .withColumn("sim", call_function("vec_dot", col("nv"), col("cv")))
        .groupBy(col(idCol))
        .agg(
          max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"),
          first(col("nv")).as("nv"))
      cent = assigned
        .select(col("cid"), posexplode(col("nv")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mv"))
        .select(col("cid"),
          call_function("vec_normalize", col("mv")).as("cv"))
        // Iterative lineage MUST be truncated (the connectedComponents
        // pattern): each round's plan references the previous centroids
        // inside a broadcast fanout, so without materialization the plan
        // nests once per iteration and deep training (iters ≳ 5) pays
        // recompute + planning blowup. The relation is k rows × dim —
        // the eager checkpoint job is negligible next to the assignment
        // pass — and KmeansSpec pins flat plan depth at iters=8.
        .localCheckpoint(true)
    }
    if (iters > 0) v.unpersist()
    cent.select(col("cid").as(idCol), col("cv").as(vecCol))
  }

  /** IVF (inverted-file) approximate top-k: each vector is stored in its
    * single nearest cluster; each query searches its `nProbe` nearest
    * clusters. Candidate set ≈ nProbe/C of the corpus per query — recall
    * rises monotonically with nProbe (AnnRecallSpec pins this).
    */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame,
      queryFilter: Column, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 1): DataFrame = {
    val stored = assignClusters(vectors, centroids, idCol, vecCol, nProbe = 1)
    val q = assignClusters(vectors.filter(queryFilter), centroids, idCol,
        vecCol, nProbe)
      .select(col(idCol).as("query_id"), col("nv").as("qv"),
        col("centroid_id").as("qc"))
    val c = stored.select(col(idCol).as("neighbor_id"), col("nv").as("cv"),
      col("centroid_id").as("nc"))
    searchPostings(q, c, k)
  }

  /** Cross-corpus ANN JOIN (entity/record linkage on embeddings): for
    * each vector of `queries`, its approximate top-k among `corpus` —
    * two DIFFERENT relations, the "link every new record to the catalog"
    * shape that [[ivfTopK]]'s single-relation form can't express. Both
    * sides assign to the same shared centroids; candidates meet on the
    * centroid key (nProbe clusters per query), so the join is keyed and
    * candidate volume is ≈ nProbe/C of the corpus per query — never
    * all-pairs. Rows with equal ids on both sides are excluded (the
    * self-match guard; disjoint id spaces are unaffected).
    */
  def ivfTopKBetween(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 1): DataFrame = {
    val stored = assignClusters(corpus, centroids, idCol, vecCol, nProbe = 1)
    val q = assignClusters(queries, centroids, idCol, vecCol, nProbe)
      .select(col(idCol).as("query_id"), col("nv").as("qv"),
        col("centroid_id").as("qc"))
    val c = stored.select(col(idCol).as("neighbor_id"), col("nv").as("cv"),
      col("centroid_id").as("nc"))
    searchPostings(q, c, k)
  }

  /** Seed for [[clusterBalancedSample]]'s lottery — independent of the
    * text-side lottery family ([[Sampling.MixtureSeed]] et al.).
    */
  val CoresetSeed = 1006

  /** CLUSTER-BALANCED (coreset-style) sampling: ~`perCluster` vectors
    * drawn from EACH IVF cluster by a seeded hash lottery — the
    * diversity-preserving downsample (equal per-mode quotas instead of
    * density-proportional draws, so rare modes survive; the sampling
    * side of SemDeDup-style semantic curation). Deterministic and
    * partition-invariant like every lottery here.
    *
    * Scale: assignment is the [[assignClusters]] map; per-cluster counts
    * are a k-row aggregate; the k-row cut relation broadcasts by
    * construction; the lottery filter is map work. Nothing collects.
    */
  def clusterBalancedSample(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, perCluster: Long): DataFrame = {
    require(perCluster > 0, "perCluster > 0")
    val assigned = assignClusters(vectors, centroids, idCol, vecCol, nProbe = 1)
      .select(col(idCol), col("centroid_id"))
    val cuts = assigned.groupBy("centroid_id")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__cut",
        expr(s"(${perCluster}L * ${Sampling.HashBuckets}L) div __n"))
      .select(col("centroid_id"), col("__cut"))
    assigned.join(broadcast(cuts), "centroid_id")
      .filter(
        graft.functions.Hashing.md5LongSeeded(col(idCol).cast("string"), CoresetSeed)
          % Sampling.HashBuckets < col("__cut"))
      .select(col(idCol), col("centroid_id"))
  }

  /** HARD-NEGATIVE mining for contrastive/embedding training: for each
    * query, the neighbors ranked just BELOW the presumed-positive zone —
    * rank ∈ (skipTop, skipTop + negK] of the [[ivfTopK]] ANN ranking,
    * re-ranked 1..negK. The top `skipTop` neighbors are skipped as
    * positives/near-duplicates; what follows is "close but not the same
    * thing" — exactly the negatives that teach an embedding model the
    * fine distinctions (easy random negatives are already far away and
    * carry no gradient signal).
    *
    * Scale: identical to the ANN search it wraps — the rank filter is a
    * map over the per-query top-(skipTop+negK) relation, which
    * TakeOrdered already bounded to queries × (skipTop+negK) rows.
    */
  def hardNegatives(vectors: DataFrame, centroids: DataFrame,
      queryFilter: Column, idCol: String, vecCol: String,
      skipTop: Int, negK: Int, nProbe: Int = 1): DataFrame = {
    require(skipTop >= 0 && negK >= 1, "skipTop >= 0, negK >= 1")
    ivfTopK(vectors, centroids, queryFilter, idCol, vecCol,
        k = skipTop + negK, nProbe = nProbe)
      .filter(col("rank") > skipTop)
      .select(col("query_id"), col("neighbor_id").as("negative_id"),
        (col("rank") - skipTop).cast("int").as("neg_rank"))
  }

  /** Persist a trained IVF index as warehouse state — the similarity-search
    * twin of the stored dedup signatures ([[Dedup.writeDedupState]]): train
    * once, assign once, store. Two relations: `<name>_centroids` (k unit
    * vectors) and `<name>_postings` ((id, unit vector, centroid_id),
    * BUCKETED on `centroid_id` so every future search joins the postings
    * side with zero shuffle on it). At corpus scale this turns each search
    * run from O(retrain + reassign corpus) into O(queries × corpus/C);
    * index maintenance for new vectors is a map-only [[assignClusters]] +
    * append.
    *
    * Assignments are computed from the WRITTEN centroid relation (doubles
    * round-trip parquet exactly), so the stored index is the single source
    * of truth and [[ivfTopKStored]] is bit-identical to an [[ivfTopK]] run
    * with the same training parameters — IvfStoredSpec and the
    * q_ann_ivf_stored oracle both pin that equivalence.
    */
  def writeIvfIndex(vectors: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, kmeansIters: Int,
      warehouseDir: String, name: String, numBuckets: Int): Unit = {
    val spark = vectors.sparkSession
    // a rebuild's input defines the index content — stale tombstones from
    // the previous generation must not shadow re-ingested vectors
    spark.sql(s"DROP TABLE IF EXISTS ${deletedName(name)}")
    val cents = kmeansCentroids(vectors, idCol, vecCol, numCentroids, kmeansIters)
    graft.io.Tables.writeWarehouseBucketed(cents, warehouseDir,
      s"${name}_centroids", idCol, 1)
    val storedCents = graft.io.Tables
      .readWarehouseBucketed(spark, s"${name}_centroids")
    val stored = assignClusters(vectors, storedCents, idCol, vecCol, nProbe = 1)
      .select(col(idCol), col("nv"), col("centroid_id"))
    graft.io.Tables.writeWarehouseBucketed(stored, warehouseDir,
      s"${name}_postings", "centroid_id", numBuckets)
    graft.io.Tables.writeWarehouseBucketed(
      centroidBatchStats(vectors, storedCents, idCol, vecCol, "base"),
      warehouseDir, s"${name}_stats", "centroid_id", 1)
  }

  /** Index maintenance: assign NEW vectors against the stored centroids
    * (map-only after the centroid broadcast) and append their postings.
    * With centroids held fixed this is exactly what a full rebuild would
    * produce for those rows — IvfStoredSpec pins append ≡ rebuild — so
    * nightly ingest costs O(batch), the [[Dedup.incrementalDedupStored]]
    * shape. Retraining (centroid drift) is a deliberate, separate
    * [[writeIvfIndex]] run. Appends proliferate small files; compact with
    * [[graft.io.Tables.compactWarehouseBucketed]] (bucket-layout-
    * preserving, durable staging) — NOT
    * [[graft.io.Tables.compactWarehouse]], whose plain parquet rewrite
    * destroys the bucket file layout the catalog still declares.
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, name: String,
      newVectors: DataFrame, idCol: String, vecCol: String,
      numBuckets: Int): Unit = {
    val cents = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_centroids")
    val assigned = assignClusters(newVectors, cents, idCol, vecCol, nProbe = 1)
      .select(col(idCol), col("nv"), col("centroid_id"))
    // append-mode saveAsTable keeps bucket metadata (the spec must match
    // the catalog's, so the caller passes the index's numBuckets)
    assigned.write.mode("append")
      .bucketBy(numBuckets, "centroid_id")
      .sortBy("centroid_id")
      .saveAsTable(s"${name}_postings")
    appendStats(newVectors, cents, idCol, vecCol, s"${name}_stats")
  }

  /** Per-centroid occupancy/residual stats of one assignment batch:
    * (centroid_id, n, sum_sim, phase) where `sim` is each vector's cosine
    * to its assigned centroid (unit vectors, so mean cosine RESIDUAL
    * = 1 − sum_sim/n). The k-row relation every stored index writes at
    * build time (phase `base`) and every append extends (phase `append`)
    * — the operational other half of a frozen-quantizer index, feeding
    * [[ivfDriftStats]]/[[needsRetrain]].
    */
  private def centroidBatchStats(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, phase: String): DataFrame = {
    VectorExpressions.register(vectors.sparkSession)
    val v = normalized(vectors, idCol, vecCol, idCol, "nv")
    val c = normalized(centroids, idCol, vecCol, "centroid_id", "centv")
    centroidFanout(v, c)
      .withColumn("sim", call_function("vec_dot", col("nv"), col("centv")))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("centroid_id"), col("sim")),
        struct(col("sim"), -col("centroid_id"))).as("b"))
      .select(col("b.centroid_id").as("centroid_id"), col("b.sim").as("sim"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sum(col("sim")).as("sum_sim"))
      .withColumn("phase", lit(phase))
  }

  private def appendStats(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, statsTable: String): Unit =
    centroidBatchStats(vectors, centroids, idCol, vecCol, "append")
      .write.mode("append")
      .bucketBy(1, "centroid_id").sortBy("centroid_id")
      .saveAsTable(statsTable)

  /** Distribution-drift report for a stored IVF/IVFPQ index: per centroid,
    * base vs appended vector counts and mean cosine residuals
    * (1 − mean cosine to the assigned centroid). Appends assign against
    * FROZEN centroids, so as the input distribution drifts two things
    * decay silently: occupancy skews (hot centroids → oversized posting
    * lists → bigger candidate sets) and residuals grow (vectors sit
    * farther from every centroid → coarse quantization separates true
    * neighbors → recall drops). This k-row relation makes both visible —
    * the monitoring a production vector index ships with.
    */
  def ivfDriftStats(spark: org.apache.spark.sql.SparkSession, name: String)
      : DataFrame = {
    val st = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_stats")
    def phaseSum(p: String, c: Column) =
      sum(when(col("phase") === p, c).otherwise(lit(0)))
    st.groupBy("centroid_id")
      .agg(
        phaseSum("base", col("n")).as("n_base"),
        phaseSum("append", col("n")).as("n_appended"),
        phaseSum("base", col("sum_sim")).as("ss_base"),
        phaseSum("append", col("sum_sim")).as("ss_append"))
      .select(col("centroid_id"), col("n_base"), col("n_appended"),
        when(col("n_base") > 0,
          lit(1.0) - col("ss_base") / col("n_base"))
          .as("mean_res_base"),
        when(col("n_appended") > 0,
          lit(1.0) - col("ss_append") / col("n_appended"))
          .as("mean_res_appended"))
  }

  /** Retrain trigger over [[ivfDriftStats]] — the documented threshold
    * policy for frozen-quantizer maintenance. Retrain (a fresh
    * [[writeIvfIndex]]/[[writeIvfPqIndex]] run) when either:
    *  - GROWTH: appended vectors exceed `maxGrowth` × the base corpus —
    *    even drift-free appends eventually dwarf the sample the centroids
    *    were trained on (posting lists 2× oversized at the default);
    *  - DRIFT: the appended population's overall mean residual exceeds
    *    `maxResidualRatio` × the base mean residual — new vectors sit
    *    materially farther from the frozen centroids than the training
    *    data did, the direct signature of distribution shift.
    * Driver-side over the k-row stats relation (index metadata, like the
    * catalog lookup every search already does).
    */
  def needsRetrain(spark: org.apache.spark.sql.SparkSession, name: String,
      maxGrowth: Double = 1.0, maxResidualRatio: Double = 1.25): Boolean = {
    val t = ivfDriftStats(spark, name)
      .agg(
        sum(col("n_base")).as("nb"),
        sum(col("n_appended")).as("na"),
        sum(col("mean_res_base") * col("n_base")).as("rb"),
        sum(col("mean_res_appended") * col("n_appended")).as("ra"))
      .head()
    val (nb, na) = (t.getLong(0), t.getLong(1))
    if (na == 0L || nb == 0L) return false
    val (resBase, resApp) = (t.getDouble(2) / nb, t.getDouble(3) / na)
    na > maxGrowth * nb ||
      (resBase > 0.0 && resApp > maxResidualRatio * resBase)
  }

  /** IVF top-k over a STORED index ([[writeIvfIndex]]): probe the persisted
    * centroids, search only the probed clusters of the bucketed postings.
    * The corpus embedding column is read zero times — only query vectors
    * and the index relations enter the plan.
    */
  def ivfTopKStored(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 1): DataFrame = {
    val cents = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_centroids")
    val q = assignClusters(queries, cents, idCol, vecCol, nProbe)
      .select(col(idCol).as("query_id"), col("nv").as("qv"),
        col("centroid_id").as("qc"))
    val c = dropDeleted(spark, name, idCol,
        graft.io.Tables.readWarehouseBucketed(spark, s"${name}_postings"))
      .select(col(idCol).as("neighbor_id"), col("nv").as("cv"),
        col("centroid_id").as("nc"))
    searchPostings(q, c, k)
  }

  // ---------------------------------------------------------------------
  // DELETION for stored indexes: tombstones + compaction
  // ---------------------------------------------------------------------

  /** Name of the tombstone relation kept beside a stored index. */
  def deletedName(name: String): String = s"${name}_deleted"

  /** TOMBSTONE-delete vectors from a stored IVF/IVFPQ index: the ids land
    * in `{name}_deleted` and every stored search path anti-joins its
    * candidates against them BEFORE ranking (a post-rank filter would let
    * ghosts displace live neighbors from the top-k). This is the index
    * side of the warehouse delete story — the postings/codes relations
    * stay append-only (a physical delete from bucketed parquet is a full
    * rewrite), the dedup survivors and `Merge` tombstones get a
    * same-night ANN counterpart, and [[compactIndexDeletes]] folds the
    * tombstones into a physical rewrite when their mass warrants it.
    * Idempotent: re-deleting an id is a no-op at read (anti-join
    * semantics), so CDC replay needs no ledger here.
    */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession, name: String,
      ids: DataFrame, idCol: String): Unit =
    ids.select(col(idCol)).distinct()
      .write.mode("append").bucketBy(1, idCol).sortBy(idCol)
      .saveAsTable(deletedName(name))

  /** Anti-join a candidate relation against the index's tombstones (no-op
    * when none exist). `candIdCol` names the candidate relation's id
    * column; the tombstone relation's single column matches the idCol the
    * deletes were issued with.
    */
  private def dropDeleted(spark: org.apache.spark.sql.SparkSession,
      name: String, candIdCol: String, cands: DataFrame): DataFrame =
    if (!spark.catalog.tableExists(deletedName(name))) cands
    else {
      val del = graft.io.Tables.readWarehouseBucketed(spark, deletedName(name))
      cands.join(del, cands(candIdCol) === del(del.columns.head), "left_anti")
    }

  /** Fold accumulated tombstones into a PHYSICAL rewrite of the posting /
    * code relations, then drop the tombstone table — search cost returns
    * to the tombstone-free shape. Durable: each filtered relation is
    * fully staged (plain parquet, `_SUCCESS`-marked) before its bucketed
    * rewrite, and a crash between the rewrite and the tombstone drop is
    * harmless (anti-joining already-absent ids is a no-op — re-run to
    * finish). Run in the same maintenance window as index compaction.
    */
  def compactIndexDeletes(spark: org.apache.spark.sql.SparkSession,
      warehouseDir: String, name: String, idCol: String,
      numBuckets: Int): Unit = {
    if (!spark.catalog.tableExists(deletedName(name))) return
    val del = graft.io.Tables.readWarehouseBucketed(spark, deletedName(name))
    def rewrite(rel: String, candId: String): Unit =
      if (spark.catalog.tableExists(rel)) {
        val kept = graft.io.Tables.readWarehouseBucketed(spark, rel)
        val filtered = kept.join(del, kept(candId) === del(idCol), "left_anti")
        val stage = new org.apache.hadoop.fs.Path(s"$warehouseDir/$rel._fold")
        filtered.write.mode("overwrite").parquet(stage.toString)
        graft.io.Tables.writeWarehouseBucketed(
          spark.read.parquet(stage.toString), warehouseDir, rel,
          "centroid_id", numBuckets)
        stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(stage, true)
      }
    rewrite(s"${name}_postings", idCol)
    rewrite(s"${name}_codes", "neighbor_id")
    spark.sql(s"DROP TABLE IF EXISTS ${deletedName(name)}")
  }

  // ---------------------------------------------------------------------
  // Product quantization (PQ) + asymmetric-distance (ADC) search.
  //
  // The vector is split into M subspaces; each subvector is replaced by the
  // index of its nearest entry in a per-subspace codebook of K entries —
  // M small ints per vector instead of `dim` floats (with K ≤ 256 that is
  // M bytes: 32× smaller than float32 at dim=64/M=8). Search never
  // reconstructs: a query precomputes its M×K table of subspace distances
  // once, and each candidate's distance is M table lookups summed (ADC,
  // Jégou et al., "Product Quantization for Nearest Neighbor Search",
  // IEEE TPAMI 2011).
  //
  // Determinism/oracle contract: everything runs on FIXED-POINT vectors
  // (round(x·1000) per dimension, exact in both engines) so every distance
  // is pure integer arithmetic — no summation-order ULP anywhere, and the
  // DuckDB oracle replays codebook, codes, and ADC distances bit-for-bit.
  // The declared-query codebook is the k-means-init-style deterministic
  // sample (K smallest-md5 rows); production would train it with per-
  // subspace Lloyd's ([[kmeansCentroids]] on subvectors — PqSpec runs that
  // composition), and every operator below accepts any codebook relation.
  // ---------------------------------------------------------------------

  /** Fixed-point projection of a float/double vector: round(x·1000) per
    * dimension as bigint. Cross-engine exact (both engines round half away
    * from zero) and coarse enough that squared distances stay far from
    * long overflow (|x| ≤ 2e3 fixed → d² ≤ 1.6e7 per dim).
    */
  def fixedPoint(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000.0).cast("long"))

  /** (id, subspace, subvector) exploded view: subspace s covers dims
    * [s·dim/M, (s+1)·dim/M). Map-only (posexplode of per-row slices).
    * Dimensions must tile exactly — a dim % M remainder would be silently
    * dropped from every distance (FAISS rejects d % M ≠ 0 for the same
    * reason), so the row errors instead.
    */
  private def subspaces(df: DataFrame, idCol: String, vecCol: String,
      m: Int): DataFrame = {
    val raw = fixedPoint(col(vecCol))
    val fx = when(pmod(size(raw), lit(m)) === 0, raw)
      .otherwise(raise_error(concat(
        lit(s"pq: vector dim must be divisible by numSubspaces=$m, got dim="),
        size(raw).cast("string"))))
    val width = (size(fx) / m).cast("int")
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(fx, s * width + 1, width))))
      .select(col(idCol), col("pos").as("subspace"), col("col").as("sv"))
  }

  /** Size-gated broadcast for query-batch-proportional relations (the ADC
    * distance table is |queries|×M×K rows): below the gate it broadcasts,
    * above it the join falls back to a shuffled equi-join on its keys —
    * the jaccardPairs convention. `knownQueryCount` keeps the builder
    * lazy when the caller has statistics.
    */
  private def queryGate(queries: DataFrame, idCol: String,
      maxBroadcastQueries: Long, knownQueryCount: Option[Long])
      : DataFrame => DataFrame =
    if (knownQueryCount.getOrElse(queries.select(col(idCol)).count())
        <= maxBroadcastQueries) broadcast
    else identity

  /** Per-query ADC distance table: (query_id, subspace, code, d) — the
    * query's exact subvectors scored against every codebook entry.
    */
  private def adcTable(queries: DataFrame, cb: DataFrame, idCol: String,
      vecCol: String, m: Int): DataFrame =
    subspaces(queries, idCol, vecCol, m)
      .select(col(idCol).as("query_id"), col("subspace"), col("sv"))
      .join(broadcast(cb), "subspace")
      .withColumn("d", call_function("vec_l2sq_long", col("sv"), col("cb")))
      .select(col("query_id"), col("subspace"), col("code"), col("d"))

  /** Shared ADC search tail: join codes × distance table, sum the M
    * lookups per (query, neighbor) in a partial-agg hash aggregate, rank
    * by (adist asc, neighbor asc), keep top k.
    */
  private def adcTopK(codes: DataFrame, dtab: DataFrame, joinCond: Column,
      k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    codes.join(dtab, joinCond)
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adist", "rank")
  }

  /** Deterministic sample codebook: the K rows with the smallest md5(id)
    * donate their subvectors as the K entries of EVERY subspace's codebook
    * (entry j of subspace s = seed-rank-j's dims of subspace s). Returns
    * (subspace, code, cb) — M×K rows, broadcast-sized by construction
    * (K ≤ 256 × M ≤ dim). The sampling trick is exactly [[kmeansCentroids]]'
    * init step, so the oracle replays it with the same md5 ordering.
    */
  def pqCodebook(vectors: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int, codebookSize: Int): DataFrame = {
    val seeds = vectors
      .select(col(idCol), col(vecCol))
      .withColumn("__r", graft.functions.Hashing.md5Long(col(idCol).cast("string")))
      .orderBy(col("__r"), col(idCol)).limit(codebookSize)
    val wk = Window.orderBy(col("__r"), col(idCol))
    val ranked = seeds.withColumn("code", row_number().over(wk) - 1)
    subspaces(ranked, "code", vecCol, numSubspaces)
      .select(col("subspace"), col("code"), col("sv").as("cb"))
  }

  /** PQ encode: each (vector, subspace) takes the codebook entry with the
    * minimum squared L2 distance (tie → lowest code). One map-only fanout
    * against the broadcast codebook (K× per subspace row, a constant-key
    * BHJ — never a nested loop) collapsed by a `min_by` hash aggregate
    * with map-side partial agg, so the shuffle carries n×M code rows, not
    * the n×M×K fanout. Distances via the codegen `vec_l2sq_long` kernel.
    * Returns (id, subspace, code).
    */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, numSubspaces: Int): DataFrame = {
    VectorExpressions.register(vectors.sparkSession)
    subspaces(vectors, idCol, vecCol, numSubspaces)
      .join(broadcast(codebook), "subspace")
      .withColumn("d", call_function("vec_l2sq_long", col("sv"), col("cb")))
      .groupBy(col(idCol), col("subspace"))
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
  }

  /** ADC top-k: approximate L2 nearest neighbors of each query over the
    * PQ-encoded corpus. The query side stays EXACT (its fixed-point
    * subvectors score against the codebook → an M×K distance table per
    * query); each encoded corpus row then costs M integer lookups summed —
    * the distance table join is a broadcast hash join keyed on
    * (subspace, code), and the per-candidate sum is a hash aggregate with
    * map-side combine, so the only shuffle carries n×|queries| partial
    * sums. The distance-table broadcast is SIZE-GATED (it grows with the
    * query batch: |queries|×M×K rows) — above `maxBroadcastQueries` the
    * join falls back to a shuffled equi-join on (subspace, code), and
    * `knownQueryCount` keeps the builder lazy. Composes with IVF blocking
    * for corpus-scale query batches (block first, ADC within the probed
    * clusters); the table-lookup scan is the classic single-machine ADC
    * layout expressed relationally.
    *
    * Returns (query_id, neighbor_id, adist, rank), rank by (adist asc,
    * neighbor_id asc) — integers end to end, so the oracle matches exactly.
    */
  def pqTopK(vectors: DataFrame, queryFilter: Column, idCol: String,
      vecCol: String, numSubspaces: Int, codebookSize: Int, k: Int,
      maxBroadcastQueries: Long = 100000L,
      knownQueryCount: Option[Long] = None): DataFrame = {
    VectorExpressions.register(vectors.sparkSession)
    val queries = vectors.filter(queryFilter)
    val gate = queryGate(queries, idCol, maxBroadcastQueries, knownQueryCount)
    val cb = pqCodebook(vectors, idCol, vecCol, numSubspaces, codebookSize)
    val codes = pqEncode(vectors, idCol, vecCol, cb, numSubspaces)
      .select(col(idCol).as("neighbor_id"), col("subspace"), col("code"))
    val dtab = gate(adcTable(queries, cb, idCol, vecCol, numSubspaces))
    adcTopK(codes, dtab,
      codes("subspace") === dtab("subspace") && codes("code") === dtab("code"),
      k)
  }

  /** IVFADC — the standard billion-scale ANN layout (Jégou et al. §V):
    * IVF cluster blocking restricts WHICH candidates are scored, PQ/ADC
    * decides HOW each candidate is scored. Storage side: every vector gets
    * its nearest centroid (nProbe=1) and its M PQ codes. Query side: probe
    * `nProbe` nearest centroids and precompute the M×K ADC table. The
    * candidate join keys on (centroid, subspace, code) — an equi-join, so
    * the per-query scored set shrinks ~C/nProbe× vs flat ADC while each
    * candidate still costs M integer lookups. Compose with
    * [[pqTopKRefined]]'s re-rank join for recall-critical paths.
    */
  def ivfPqTopK(vectors: DataFrame, centroids: DataFrame,
      queryFilter: Column, idCol: String, vecCol: String,
      numSubspaces: Int, codebookSize: Int, k: Int,
      nProbe: Int = 1,
      maxBroadcastQueries: Long = 100000L,
      knownQueryCount: Option[Long] = None): DataFrame = {
    VectorExpressions.register(vectors.sparkSession)
    val queries = vectors.filter(queryFilter)
    val gate = queryGate(queries, idCol, maxBroadcastQueries, knownQueryCount)
    val cb = pqCodebook(vectors, idCol, vecCol, numSubspaces, codebookSize)
    val stored = assignClusters(vectors, centroids, idCol, vecCol, nProbe = 1)
      .select(col(idCol).as("neighbor_id"), col("centroid_id").as("nc"))
    val codes = pqEncode(vectors, idCol, vecCol, cb, numSubspaces)
      .select(col(idCol).as("neighbor_id"), col("subspace"), col("code"))
      .join(stored, "neighbor_id")
    val qass = assignClusters(queries, centroids, idCol, vecCol, nProbe)
      .select(col(idCol).as("query_id"), col("centroid_id").as("qc"))
    val dtab = gate(adcTable(queries, cb, idCol, vecCol, numSubspaces)
      .join(qass, "query_id"))
    adcTopK(codes, dtab,
      codes("nc") === dtab("qc") && codes("subspace") === dtab("subspace")
        && codes("code") === dtab("code"),
      k)
  }

  /** Persist an IVFPQ index (the FAISS `IndexIVFPQ` layout as warehouse
    * tables): `<name>_centroids` (the coarse quantizer — here the caller's
    * centroid relation, e.g. [[kmeansCentroids]] output or fixed pivots),
    * `<name>_pqcodebook` (subspace, code, cb), and `<name>_codes`
    * ((neighbor_id, centroid_id, subspace, code), BUCKETED on
    * `centroid_id` so the search-time candidate join needs no shuffle on
    * the corpus-sized side). Index maintenance for new vectors is map-only
    * assign + encode + append, the [[writeIvfIndex]] shape.
    */
  def writeIvfPqIndex(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, numSubspaces: Int, codebookSize: Int,
      warehouseDir: String, name: String, numBuckets: Int): Unit = {
    val spark = vectors.sparkSession
    // see writeIvfIndex: a rebuild clears the previous generation's tombstones
    spark.sql(s"DROP TABLE IF EXISTS ${deletedName(name)}")
    graft.io.Tables.writeWarehouseBucketed(
      centroids.select(col(idCol), col(vecCol)), warehouseDir,
      s"${name}_centroids", idCol, 1)
    val cb = pqCodebook(vectors, idCol, vecCol, numSubspaces, codebookSize)
    graft.io.Tables.writeWarehouseBucketed(cb, warehouseDir,
      s"${name}_pqcodebook", "subspace", 1)
    val storedCents = graft.io.Tables
      .readWarehouseBucketed(spark, s"${name}_centroids")
    val storedCb = graft.io.Tables
      .readWarehouseBucketed(spark, s"${name}_pqcodebook")
    val assigned = assignClusters(vectors, storedCents, idCol, vecCol, nProbe = 1)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"))
    val codes = pqEncode(vectors, idCol, vecCol, storedCb, numSubspaces)
      .select(col(idCol).as("neighbor_id"), col("subspace"), col("code"))
      .join(assigned, "neighbor_id")
    graft.io.Tables.writeWarehouseBucketed(codes, warehouseDir,
      s"${name}_codes", "centroid_id", numBuckets)
    graft.io.Tables.writeWarehouseBucketed(
      centroidBatchStats(vectors, storedCents, idCol, vecCol, "base"),
      warehouseDir, s"${name}_stats", "centroid_id", 1)
  }

  /** IVFPQ index maintenance: assign + encode NEW vectors against the
    * STORED centroids and codebook (both fixed — retraining is a
    * deliberate separate [[writeIvfPqIndex]] run) and append their code
    * rows. With quantizers held fixed this is exactly what a rebuild
    * would produce for those rows — PqSpec pins append ≡ rebuild — so
    * nightly vector ingest costs O(batch): map-only assign, map-only
    * encode, bucketed append.
    */
  def appendIvfPqIndex(spark: org.apache.spark.sql.SparkSession, name: String,
      newVectors: DataFrame, idCol: String, vecCol: String,
      numBuckets: Int): Unit = {
    val cents = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_centroids")
    val cb = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_pqcodebook")
    val assigned = assignClusters(newVectors, cents, idCol, vecCol, nProbe = 1)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"))
    pqEncode(newVectors, idCol, vecCol, cb, numSubspacesOf(cb))
      .select(col(idCol).as("neighbor_id"), col("subspace"), col("code"))
      .join(assigned, "neighbor_id")
      .write.mode("append")
      .bucketBy(numBuckets, "centroid_id").sortBy("centroid_id")
      .saveAsTable(s"${name}_codes")
    appendStats(newVectors, cents, idCol, vecCol, s"${name}_stats")
  }

  /** IVFADC over a STORED index ([[writeIvfPqIndex]]): probe the persisted
    * coarse centroids, build the ADC table against the persisted codebook,
    * and scan only the probed clusters of the bucketed code relation. The
    * corpus embedding column enters the plan exactly once — for the query
    * rows — and no training/encode stage appears anywhere (IvfPqStored
    * assertions in PqSpec). Bit-identical to [[ivfPqTopK]] with the same
    * centroids/codebook parameters: stored ≡ live IS the oracle check.
    */
  def ivfPqTopKStored(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 1,
      maxBroadcastQueries: Long = 100000L,
      knownQueryCount: Option[Long] = None): DataFrame = {
    VectorExpressions.register(spark)
    val cents = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_centroids")
    val cb = graft.io.Tables.readWarehouseBucketed(spark, s"${name}_pqcodebook")
    val codes = dropDeleted(spark, name, "neighbor_id",
      graft.io.Tables.readWarehouseBucketed(spark, s"${name}_codes"))
    val gate = queryGate(queries, idCol, maxBroadcastQueries, knownQueryCount)
    val qass = assignClusters(queries, cents, idCol, vecCol, nProbe)
      .select(col(idCol).as("query_id"), col("centroid_id").as("qc"))
    val dtab = gate(adcTable(queries, cb, idCol, vecCol, numSubspacesOf(cb))
      .join(qass, "query_id"))
    adcTopK(codes, dtab,
      codes("centroid_id") === dtab("qc")
        && codes("subspace") === dtab("subspace")
        && codes("code") === dtab("code"),
      k)
  }

  /** Subspace count of a stored codebook relation — index metadata (one
    * tiny aggregate on a 1-bucket table, driver-read like any catalog
    * lookup). Fails loudly on an empty/corrupt index rather than NPE-ing.
    */
  private def numSubspacesOf(cb: DataFrame): Int = {
    val row = cb.agg(max(col("subspace"))).head()
    require(!row.isNullAt(0),
      "stored PQ codebook is empty — was writeIvfPqIndex run on an empty corpus?")
    row.getInt(0) + 1
  }

  /** ADC + exact re-rank (the "+R" of IVFADC+R, Jégou et al. §V): take an
    * ADC shortlist of `shortlist` candidates per query, re-score ONLY those
    * with the exact fixed-point squared L2 (one equi-join on neighbor_id to
    * re-attach vectors — shortlist-sized, never corpus-sized), and emit the
    * exact top-k of the shortlist. PQ quantization error makes pure-ADC
    * rank order noisy WITHIN a quantization cell (candidates sharing codes
    * tie); the refinement step restores near-exact recall for
    * shortlist ≈ 4-10× k while still scoring only shortlist rows per query.
    * Integer end to end like [[pqTopK]].
    */
  def pqTopKRefined(vectors: DataFrame, queryFilter: Column, idCol: String,
      vecCol: String, numSubspaces: Int, codebookSize: Int, k: Int,
      shortlist: Int): DataFrame = {
    val fx = vectors.select(col(idCol), fixedPoint(col(vecCol)).as("fx"))
    val cand = pqTopK(vectors, queryFilter, idCol, vecCol, numSubspaces,
      codebookSize, shortlist)
    val w = Window.partitionBy("query_id")
      .orderBy(col("edist").asc, col("neighbor_id").asc)
    cand
      .join(fx.select(col(idCol).as("query_id"), col("fx").as("qfx")), "query_id")
      .join(fx.select(col(idCol).as("neighbor_id"), col("fx").as("nfx")), "neighbor_id")
      .withColumn("edist", call_function("vec_l2sq_long", col("qfx"), col("nfx")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "edist", "rank")
  }

  /** Shared probe→postings search tail: equi-join on the cluster id,
    * `vec_dot` scoring, per-query top-k via WindowGroupLimit. No pair
    * dedup needed: storage is nProbe=1, so a neighbor's single cluster
    * matches at most one of the query's probed clusters.
    */
  private def searchPostings(q: DataFrame, c: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c, col("qc") === col("nc") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", call_function("vec_dot", col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
