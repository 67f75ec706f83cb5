package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.functions.Hashing

/** Per-partition DISTINCT-COUNT sketches (`_ndv` sidecars) for
  * [[ManifestVersioned]] tables — the zero-read answer to "how many
  * distinct X does this table hold", the stats input every planner
  * and data-quality check wants (join-side selection, dimension
  * sanity, enum drift detection) and the one a 100 TB scan must not
  * be the price of.
  *
  * Sketch = KMV bottom-k (`graft.functions.KmvExpressions`, the same
  * memory-bounded udaf the corpus-overlap analytics use): the k
  * smallest distinct 60-bit hashes of the column's values. Two
  * properties make it the right manifest citizen:
  *  - MERGEABLE by construction — the bottom-k of a union of bottom-k
  *    sets IS the union's bottom-k, so per-partition sketches fold
  *    driver-side into a table-wide answer with zero data reads;
  *  - EXACT when small — a sketch holding fewer than k hashes holds
  *    EVERY distinct hash of its partition, so when every live
  *    partition's sketch is complete the fold is the exact distinct
  *    count (modulo 60-bit hash collisions, the same basis the
  *    overlap analytics hash-verify on), and `is_exact` says so
  *    honestly. Past k it degrades to the Beyer et al. (k−1)·M/d
  *    estimator (~1/√(k−2) standard error).
  *
  * Layout: a `_ndv` TSV INSIDE the generation dir (one line per
  * policied column: hex name, sketch size, csv of hex hashes) — like
  * `_filestats`, it is `_`-hidden from parquet scans, immutable, and
  * travels with the dir through restore/compaction/vacuum for free.
  * The policy is the `#ndvcols` table header (a full rewrite defines
  * it, every delta/merge/compaction inherits it, like `#bloomcols`).
  *
  * Honesty ledger (the [[ManifestVersioned.columnRanges]] discipline):
  * any live entry missing the sidecar or the column line ⇒ NULL (a
  * fold over a subset bounds nothing); outstanding delete vectors ⇒
  * the fold is still a valid UPPER bound (deletes only shrink) but
  * `is_exact` goes false; an all-NULL column folds to 0 — SQL's
  * `count(DISTINCT c)` ignores NULLs and so does the hash (null in ⇒
  * null hash ⇒ skipped by the udaf).
  */
object NdvSidecar {

  /** Sketch capacity: 1024 hashes ≈ 8 KiB per column per partition in
    * the sidecar; exact up to 1023 distinct values, ~3% standard error
    * beyond.
    */
  val K = 1024

  /** md5Long hash domain (60 bits — exactly representable in a double,
    * the [[graft.ext.Sketch.KmvDomainStr]] convention).
    */
  val Domain: Double = (1L << 60).toDouble

  /** Per-partition-key KMV sketches of `cols` over a staged dir — ONE
    * delta-sized aggregation (k longs per column per aggregation
    * buffer; |touched partitions| result rows).
    */
  def stage(spark: SparkSession, stageDir: String, cols: Seq[String])
      : Map[String, Seq[(String, Seq[Long])]] = {
    graft.functions.KmvExpressions.register(spark)
    val df = spark.read.parquet(stageDir)
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) return Map.empty
    val hashed = df.select(col("__pv") +: present.zipWithIndex.map {
      case (c, i) =>
        // the "ndv:" tag domain-separates from every other md5Long use;
        // a NULL value hashes to NULL and the udaf skips it (count
        // distinct semantics)
        Hashing.md5Long(concat(lit("ndv:"), col(c).cast("string")))
          .as(s"__hv_$i")
    }: _*)
    val rows = hashed.groupBy(col("__pv")).agg(
      expr(s"kmv_sketch(__hv_0, $K)").as("__s_0"),
      present.indices.tail.map(i =>
        expr(s"kmv_sketch(__hv_$i, $K)").as(s"__s_$i")): _*)
      .collect()
    rows.map { row =>
      row.getString(0) -> present.zipWithIndex.map { case (c, i) =>
        c -> row.getSeq[Long](1 + i)
      }
    }.toMap
  }

  private def hx(s: String): String =
    "x" + s.getBytes("UTF-8").map("%02X".format(_)).mkString

  private def unhx(tok: String): String =
    new String(tok.stripPrefix("x").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")

  def render(perCol: Seq[(String, Seq[Long])]): String =
    perCol.sortBy(_._1).map { case (c, hs) =>
      s"${hx(c)}\t${hs.size}\t${hs.sorted.map(java.lang.Long.toHexString).mkString(",")}"
    }.mkString("", "\n", "\n")

  /** Parse a `_ndv` sidecar; None when absent/unreadable (pre-policy
    * generations — the column folds to NULL).
    */
  def read(fs: FileSystem, genDir: Path)
      : Option[Map[String, Seq[Long]]] =
    try {
      val p = new Path(genDir, "_ndv")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val content =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(content.split("\n").toSeq.filter(_.nonEmpty).map { line =>
          val Array(c, _, hs) = line.split("\t", 3)
          unhx(c) -> (if (hs.isEmpty) Nil
            else hs.split(",").toSeq
              .map(java.lang.Long.parseUnsignedLong(_, 16)))
        }.toMap)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fold per-partition sketches into (ndv, allComplete): when every
    * sketch is complete (size < k) the union IS the distinct hash set
    * and the count is exact; otherwise the bottom-k of the union feeds
    * the (k−1)·M/d estimator. Deterministic either way.
    */
  def fold(sketches: Seq[Seq[Long]]): (Long, Boolean) = {
    val complete = sketches.forall(_.size < K)
    val union = sketches.flatten.distinct.sorted
    if (complete) (union.size.toLong, true)
    else {
      val bottom = union.take(K)
      val d = bottom.last.toDouble
      (math.round((K - 1).toDouble * Domain / d), false)
    }
  }
}
