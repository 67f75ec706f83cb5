package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomExpressions

/** Bloom-filtered anti/semi joins — semi-join reduction for the
  * batch-vs-huge-key-set joins in the ingestion path (the exact-dedup
  * anti-join of [[Dedup.incrementalDedupFrom]], decontamination's
  * shingle semi-join, tombstone filtering at warehouse scale).
  *
  * Shape: the key set collapses to ONE binary bitset row (built by partial
  * aggregation — [[graft.functions.BloomExpressions.BloomBuildAgg]]), which
  * attaches to every batch row through a constant-key broadcast hash join
  * (1-row build side; never a BroadcastNestedLoopJoin). Rows the bloom
  * reports as definite misses bypass the exact join entirely — for an
  * anti-join they are emitted directly, for a semi-join dropped directly —
  * and only possible-hits (true matches + ~0.8% false positives at 10
  * bits/key) pay the shuffled confirm join. Output is bit-identical to the
  * direct join: the bloom is a conservative prefilter, never the decision.
  *
  * At 100 TB: a 1-billion-key corpus relation that would shuffle ~60 GB
  * into every nightly anti-join reduces to a ~1.2 GB bitset built once
  * (and persisted alongside the dedup state), while the nightly batch —
  * mostly fresh content — flows through as a map-only filter. Practical
  * bound: the bitset must fit a broadcast (~8 GB ceiling) and the final
  * merge reducer, i.e. key sets up to the low billions at 10 bits/key;
  * beyond that, range-partition the key space and keep one bloom per
  * partition (the per-partition blooms OR-compose exactly like
  * [[Dedup.appendDedupBloom]]'s append path).
  */
object BloomJoin {

  /** One-row (bloom BINARY) relation over the distinct keys of `keys`.
    * `numBits` sizes the filter (use [[BloomExpressions.bitsFor]] on the
    * expected distinct-key count; statistics or a prior night's count —
    * passing it keeps this builder lazy).
    */
  def keySetBloom(keys: DataFrame, key: Column, numBits: Long): DataFrame = {
    BloomExpressions.register(keys.sparkSession)
    keys.agg(
      call_function("bloom_build", xxhash64(key), lit(numBits)).as("_bloom"))
  }

  /** Rows of `big` whose `bigKey` matches no `keysKey` in `keys` —
    * bit-identical to `big.join(keys, bigKey === keysKey, "left_anti")`,
    * with definite bloom misses skipping the join. `expectedKeys` sizes the
    * bloom without an extra counting job when the caller knows it.
    */
  def bloomAntiJoin(big: DataFrame, bigKey: Column,
      keys: DataFrame, keysKey: Column,
      expectedKeys: Option[Long] = None,
      prebuiltBloom: Option[DataFrame] = None): DataFrame =
    bloomJoin(big, bigKey, keys, keysKey, expectedKeys, prebuiltBloom,
      anti = true)

  /** Semi twin: rows of `big` with at least one key match — definite bloom
    * misses are dropped before the shuffle.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: Column,
      keys: DataFrame, keysKey: Column,
      expectedKeys: Option[Long] = None,
      prebuiltBloom: Option[DataFrame] = None): DataFrame =
    bloomJoin(big, bigKey, keys, keysKey, expectedKeys, prebuiltBloom,
      anti = false)

  private def bloomJoin(big: DataFrame, bigKey: Column,
      keys: DataFrame, keysKey: Column,
      expectedKeys: Option[Long], prebuiltBloom: Option[DataFrame],
      anti: Boolean): DataFrame = {
    BloomExpressions.register(big.sparkSession)
    val distinctKeys = keys.select(keysKey.as("_bloom_k")).distinct()
    // a persisted bitset (e.g. the dedup-state bloom, built once alongside
    // the hash relation) skips both the sizing count and the build scan
    val bloom = prebuiltBloom
      .map(_.toDF("_bloom")) // 1 row × 1 binary column, whatever its name
      .getOrElse {
        val numBits = BloomExpressions.bitsFor(
          expectedKeys.getOrElse(distinctKeys.count()))
        keySetBloom(distinctKeys, col("_bloom_k"), numBits)
      }
    // constant-key BHJ fanout of the 1-row bloom relation. The key must be
    // column-DERIVED on each side: a bare lit(1) constant-folds away and
    // Catalyst degrades the join to a keyless BroadcastNestedLoopJoin
    // (house pattern, see Similarity.assignClusters).
    val probed = big
      .withColumn("_one", pmod(xxhash64(col(big.columns.head)), lit(1)))
      .join(broadcast(bloom
        .withColumn("_one", pmod(xxhash64(col("_bloom")), lit(1)))), Seq("_one"))
      .withColumn("_maybe",
        call_function("bloom_might_contain", col("_bloom"), xxhash64(bigKey)))
      .drop("_one", "_bloom")
    // the anti form consumes the probed relation twice (miss branch +
    // confirm branch); cached so the second arm does not recompute the
    // whole batch-side lineage (callers own cleanup, house convention)
    val tagged = if (anti) probed.cache() else probed
    val cols = big.columns.map(col)
    val possible = tagged.filter(col("_maybe")).drop("_maybe")
    val confirmed = possible.join(distinctKeys,
      bigKey === col("_bloom_k"), if (anti) "left_anti" else "left_semi")
      .select(cols: _*)
    if (anti)
      tagged.filter(!col("_maybe")).drop("_maybe").select(cols: _*)
        .unionAll(confirmed)
    else confirmed
  }
}
