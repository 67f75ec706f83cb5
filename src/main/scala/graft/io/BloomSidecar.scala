package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.Path

/** Per-partition BLOOM-FILTER sidecars for [[ManifestVersioned]]
  * tables — membership pruning for SCATTERED keys, the complement of
  * the zone maps' range pruning (reference behavior generalized:
  * `incremental_etl_v1.py:78-118` always locates change keys with a
  * full-table scan; zone maps fixed that for clustered keys, this
  * layer fixes it for hashed/UUID-shaped keys whose per-partition
  * [min, max] ranges all overlap).
  *
  * Shape (the Iceberg-puffin / Delta-bloom-index idea, manifest-native):
  *  - staging a partition ALSO writes a tiny parquet "bloom dir"
  *    (`blooms/<key>/<gen>`, same generation id as the data dir) with
  *    one row per bloomed column: (part, col, nbits, k, nkeys,
  *    bits: array<bigint>). The dir is immutable, committed by the
  *    manifest entry that references it (field 6), and swept by vacuum
  *    exactly like data/delete dirs.
  *  - the policy is a table header (`#bloomcols`), set by a full
  *    rewrite and inherited by every delta — so within one layout
  *    epoch, every live generation has sidecars and probes prune.
  *  - probing loads ONLY the candidate entries' bloom rows (one
  *    manifest-pruned parquet scan over kilobyte files) and tests the
  *    probe keys' bit patterns distributed, per bloom row.
  *
  * SOUNDNESS is structural, not statistical: a Bloom filter has no
  * false negatives, so pruning a partition requires every probe key to
  * provably miss it; false positives only KEEP partitions (the same
  * one-way conservatism as the zone maps). On top of that the usual
  * honesty rules: a missing sidecar, a column without a bloom row
  * (e.g. all-NULL in that partition's build — nothing a non-null probe
  * could equal, but we only prune on the POSITIVE evidence of a row),
  * a probe type that does not exactly match the recorded column type,
  * or a probe set over the size gate ⇒ keep everything.
  *
  * HASH PARITY by construction: both build and probe hash through the
  * SAME Catalyst `xxhash64` expressions (executed as Spark jobs), so
  * the per-type hash semantics can never diverge between the writer
  * and a driver-side reimplementation — there is none.
  *
  * Sizing: ~10 bits/key (k=7 ⇒ ~0.8% fpp) from the staged row count
  * the stats pass already measures, clamped to [1 Ki, 8 Mi] bits
  * (1 MiB) per partition. A partition past ~6.7 M keys saturates
  * toward "always keep" — graceful degradation, never wrong.
  */
object BloomSidecar {

  /** Bits set per key (k): ~optimal for 10 bits/key (m/n·ln2 ≈ 6.9). */
  val K = 7

  /** Probe-set size gate: beyond this many keys a change batch is no
    * longer point-lookup-shaped (it touches most partitions anyway)
    * and the collected hash pairs would strain the driver. 2^21 pairs
    * = 32 MiB broadcast.
    */
  val MaxProbeKeys: Long = 1L << 21

  private val MinBits = 1 << 10
  private val MaxBits = 1 << 23

  /** Filter size in bits for `n` staged keys: ceil(n*10) rounded up to
    * a whole number of longs, clamped. `n < 0` (unrecorded) gets the
    * max — oversized never lies.
    */
  def sizeFor(n: Long): Int = {
    if (n < 0) return MaxBits
    val want = math.min(MaxBits.toLong, math.max(MinBits.toLong, n * 10))
    (((want + 63) / 64) * 64).toInt
  }

  /** Second-hash seed carrier: `xxhash64(lit(Gold), c)` hashes the
    * constant first, so the column value is hashed under a DIFFERENT
    * effective seed than plain `xxhash64(c)` — two genuinely
    * independent hash streams for Kirsch–Mitzenmacher double hashing,
    * both pure Catalyst.
    */
  private val Gold = 0x9E3779B97F4A7C15L

  /** The two hash columns of a key column — the ONLY hash definition;
    * build and probe both call this.
    */
  def hashCols(c: Column): (Column, Column) =
    (xxhash64(c), xxhash64(lit(Gold), c))

  /** Bit index i of a (h1, h2) pair in an m-bit filter (double
    * hashing). floorMod keeps it total over negative hashes.
    */
  @inline def bitIdx(h1: Long, h2: Long, i: Int, nbits: Int): Int =
    java.lang.Math.floorMod(h1 + i.toLong * h2, nbits.toLong).toInt

  @inline private def setBit(bits: Array[Long], idx: Int): Unit =
    bits(idx >>> 6) |= (1L << (idx & 63))

  @inline private def testBit(bits: Array[Long], idx: Int): Boolean =
    (bits(idx >>> 6) & (1L << (idx & 63))) != 0L

  /** True iff ANY (h1, h2) probe pair has all K bits set — the
    * partition then MAY contain one of the probe keys and must be
    * kept.
    */
  def mightContainAny(bits: Array[Long], nbits: Int,
      h1s: Array[Long], h2s: Array[Long]): Boolean = {
    if (bits.isEmpty || nbits <= 0 || (bits.length << 6) < nbits)
      return true // malformed sidecar: never prune on it
    var p = 0
    while (p < h1s.length) {
      var i = 0
      var all = true
      while (all && i < K) {
        all = testBit(bits, bitIdx(h1s(p), h2s(p), i, nbits))
        i += 1
      }
      if (all) return true
      p += 1
    }
    false
  }

  /** Grouped bloom build: rows (nbits, h1, h2) of ONE group (same
    * nbits throughout — it derives from the group's key) fold into one
    * bitset. ObjectHashAggregate, one pass over the staged delta only.
    */
  private val bloomAggUdf = {
    val agg = new Aggregator[(Int, Long, Long), Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.emptyLongArray
      def reduce(b: Array[Long], in: (Int, Long, Long)): Array[Long] = {
        val buf = if (b.isEmpty) new Array[Long](in._1 >>> 6) else b
        var i = 0
        while (i < K) {
          setBit(buf, bitIdx(in._2, in._3, i, buf.length << 6))
          i += 1
        }
        buf
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] =
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a }
      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
    udaf(agg)
  }

  /** Stage bloom sidecars for the already-staged partition write at
    * `stagePath` (its parquet carries the helper `__pv` partition
    * column): ONE distributed aggregation over the staged delta builds
    * every (partition, column) filter, written partitioned by `__pv`
    * to `bloomStagePath`. Returns the staged keys that actually got a
    * bloom dir (a partition all-NULL in every bloomed column yields
    * none).
    *
    * Only columns present in `schema` participate (an evolving delta
    * may predate a bloomed column); NULLs are excluded from the build —
    * a row a non-null probe key could never equal contributes nothing.
    */
  def stageBlooms(spark: SparkSession, stagePath: String,
      bloomStagePath: String, bloomCols: Seq[String], schema: StructType,
      nbitsByKey: Map[String, Int]): Set[String] = {
    import spark.implicits._
    val present = bloomCols.filter(schema.fieldNames.contains)
    if (present.isEmpty || nbitsByKey.isEmpty) return Set.empty
    val src = spark.read.parquet(stagePath)
    val nbitsDf = nbitsByKey.toSeq.toDF("__pv", "__nbits")
    val hashed = present.map { c =>
      val (h1, h2) = hashCols(col(c))
      src.filter(col(c).isNotNull)
        .select(col("__pv").cast("string").as("__pv"),
          lit(c).as("col"), h1.as("h1"), h2.as("h2"))
    }.reduce(_ unionAll _)
    val built = hashed.join(broadcast(nbitsDf), "__pv")
      .groupBy(col("__pv"), col("col"))
      .agg(bloomAggUdf(col("__nbits"), col("h1"), col("h2")).as("bits"),
        first(col("__nbits")).as("nbits"), count(lit(1)).as("nkeys"))
      // `part` duplicates the key INTO the rows (partitionBy consumes
      // `__pv`), same trick as the delete-vector stage
      .withColumn("part", col("__pv"))
      .withColumn("k", lit(K))
      .select("__pv", "part", "col", "nbits", "k", "nkeys", "bits")
    built.write.mode("overwrite").partitionBy("__pv")
      .parquet(bloomStagePath)
    val fs = new Path(bloomStagePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(bloomStagePath)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("__pv="))
      .map(_.stripPrefix("__pv=")).toSet
  }

  /** REBUILD one partition's bloom sidecar from its live rows — the
    * type-widening maintenance unit: when a bloom-policied column
    * widens (int→long), every pre-widening sidecar hashed the OLD
    * physical type and would wrongly prune probes hashed at the new
    * recorded type, so the widening commit rebuilds each live
    * partition's sidecar from its (cast-up) rows into a NEW generation
    * dir — old manifests keep referencing the old sidecars, so time
    * travel stays sound. `df` must already carry the policy columns at
    * the NEW recorded types. Returns true when a sidecar was written
    * (false = every policy column all-NULL/absent — entry keeps no
    * sidecar reference, pruning degrades conservatively).
    */
  def rebuildFor(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
      bloomCols: Seq[String], partKey: String, nbits: Int,
      dest: Path): Boolean = {
    val present = bloomCols.filter(df.schema.fieldNames.contains)
    if (present.isEmpty) return false
    val hashed = present.map { c =>
      val (h1, h2) = hashCols(col(c))
      df.filter(col(c).isNotNull)
        .select(lit(c).as("col"), h1.as("h1"), h2.as("h2"))
    }.reduce(_ unionAll _)
    val built = hashed.groupBy(col("col"))
      .agg(bloomAggUdf(lit(nbits), col("h1"), col("h2")).as("bits"),
        count(lit(1)).as("nkeys"))
      .select(lit(partKey).as("part"), col("col"),
        lit(nbits).as("nbits"), lit(K).as("k"), col("nkeys"), col("bits"))
    if (built.isEmpty) false
    else { built.write.mode("overwrite").parquet(dest.toString); true }
  }

  /** The subset of `candidates` a probe on `colName` cannot rule out.
    *
    * `probe` is a single-column DataFrame of the probe keys whose type
    * must EXACTLY equal the recorded column type (the caller checks —
    * hashing a coerced twin of the stored value would be a different
    * bit pattern). Entries without a sidecar, or whose sidecar has no
    * row for `colName`, are kept. One parquet scan over the candidate
    * bloom dirs + one distributed probe pass; the probe hash pairs are
    * collected (gated by [[MaxProbeKeys]] — the CALLER gates, this
    * method trusts) and broadcast.
    */
  def prune(spark: SparkSession, base: Path,
      candidates: Seq[(String, ManifestVersioned.Entry)], colName: String,
      probe: DataFrame): Seq[String] = {
    import spark.implicits._
    require(probe.columns.length == 1, "probe must be a single key column")
    val withBloom = candidates.collect {
      case (k, e) if e.bloom.isDefined => k -> e.bloom.get
    }
    if (withBloom.isEmpty) return candidates.map(_._1)
    val (h1, h2) = hashCols(col(probe.columns.head))
    val pairs = probe.na.drop().distinct()
      .select(h1.as("h1"), h2.as("h2")).as[(Long, Long)].collect()
    if (pairs.isEmpty)
      // no non-null probe key ⇒ nothing a bloomed partition could
      // match; every side-carried candidate prunes, the rest keep
      return candidates.collect { case (k, e) if e.bloom.isEmpty => k }
    val bh1 = spark.sparkContext.broadcast(pairs.map(_._1))
    val bh2 = spark.sparkContext.broadcast(pairs.map(_._2))
    val dirs = withBloom.map { case (_, rel) => new Path(base, rel).toString }
    // one scan over the candidates' kilobyte bloom dirs; each row
    // reports (part, any-probe-survives). A candidate prunes only on
    // POSITIVE evidence: its sidecar HAS a row for this column and no
    // probe key survived it — a sidecar without the column's row (all
    // NULL at build, or the column post-dates the generation) keeps.
    val verdicts =
      try {
        spark.read.parquet(dirs.sorted: _*)
          .filter(col("col") === colName && col("k") === K)
          .select(col("part"), col("nbits"), col("bits"))
          .as[(String, Int, Array[Long])]
          .mapPartitions { it =>
            val a = bh1.value
            val b = bh2.value
            it.map { case (part, nbits, bits) =>
              part -> mightContainAny(bits, nbits, a, b)
            }
          }
          .collect()
      } finally {
        bh1.destroy()
        bh2.destroy()
      }
    val pruned = verdicts.collect { case (part, false) => part }.toSet
    candidates.map(_._1).filterNot(pruned.contains)
  }

  /** True iff the driver-side literal `v`'s natural Spark type is
    * EXACTLY `dt` — the gate under which hashing `lit(v)` is
    * guaranteed to hash the same bytes the build side hashed. Any
    * mismatch (or a type outside this closed set) skips bloom pruning
    * for that predicate.
    */
  def literalMatches(v: Any, dt: DataType): Boolean = (v, dt) match {
    case (null, _) => false
    case (_: java.lang.Integer, IntegerType) => true
    case (_: java.lang.Long, LongType) => true
    case (_: java.lang.Short, ShortType) => true
    case (_: java.lang.Byte, ByteType) => true
    case (_: String, StringType) => true
    case (_: java.lang.Boolean, BooleanType) => true
    case (_: java.lang.Double, DoubleType) => true
    case (_: java.lang.Float, FloatType) => true
    case (_: java.sql.Date, DateType) => true
    case _ => false
  }
}
