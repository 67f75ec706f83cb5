package graft.io

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.ManifestVersioned.ColRange

/** A manifest-prunable predicate for [[ManifestVersioned.readWhere]] —
  * the closed set of shapes a per-partition (min, max) range can
  * DISPROVE. Arbitrary `Column` predicates stay available on the read
  * result; only these shapes participate in manifest-level pruning
  * (the Iceberg manifest-stats contract: stats can only ever prove a
  * predicate matches NO row of a file, never that it matches one).
  *
  * `value` is a driver-side literal of (or coercible to) the column's
  * type: numbers, String, Boolean, java.sql.Date, java.sql.Timestamp,
  * java.time.LocalDateTime. All shapes are null-rejecting (SQL 3VL:
  * `c = v` is never true on null), so an all-null partition range
  * disproves every one of them.
  */
sealed trait ZonePred { def column: String }
final case class ZoneEq(column: String, value: Any) extends ZonePred
final case class ZoneGt(column: String, value: Any) extends ZonePred
final case class ZoneGe(column: String, value: Any) extends ZonePred
final case class ZoneLt(column: String, value: Any) extends ZonePred
final case class ZoneLe(column: String, value: Any) extends ZonePred
/** IN-list: the partition survives if ANY member may live in its range
  * (the disjunction zone maps can decide; general OR is out of scope —
  * filter the read result for that).
  */
final case class ZoneIn(column: String, values: Seq[Any]) extends ZonePred
/** IS NULL — the one NON-null-rejecting shape, decided by the recorded
  * NULL COUNT (prunes partitions/files that hold zero nulls of the
  * column; unknown counts — pre-null-stats manifests — keep).
  */
final case class ZoneIsNull(column: String) extends ZonePred
/** IS NOT NULL — decided by the range alone: an all-NULL range
  * disproves it, any recorded bound proves a satisfying row exists.
  */
final case class ZoneNotNull(column: String) extends ZonePred

/** Per-partition column RANGE statistics ("zone maps") for
  * [[ManifestVersioned]] manifests: collected in one delta-sized
  * aggregation at stage time, rendered as a hex-token field of the
  * manifest entry, and consulted by `readWhere` to prune partitions at
  * the MANIFEST level (no listing, no footers, no tasks for pruned
  * partitions).
  *
  * Honesty rules (all conservatism flows one way — NEVER prune on
  * doubt):
  *  - stats are recorded only for types whose ordering we can replay
  *    driver-side exactly as Spark orders them (numerics via BigDecimal;
  *    strings, booleans, dates, timestamps via their canonical token's
  *    lexicographic order — see [[renderValue]]);
  *  - a column ABSENT from a partition's stats map ⇒ unknown ⇒ keep;
  *  - `ColRange(None, None)` ⇒ the column is ALL NULL in the partition
  *    ⇒ every (null-rejecting) [[ZonePred]] is disproved ⇒ prunable;
  *  - a pred value that fails to render, or a column type we cannot
  *    resolve from the recorded schema ⇒ keep;
  *  - the caller ALWAYS applies the residual row filter, so pruning
  *    is a pure optimization, never a semantics change.
  */
object ZoneMaps {

  /** Spark types whose min/max we record and can compare faithfully
    * driver-side. Binary, arrays, maps, structs are excluded (no
    * meaningful or replayable range).
    */
  private def supported(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case StringType | BooleanType | DateType => true
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Canonical stat token of a driver-side value. Tokens of one column
    * compare consistently with Spark's ordering of the underlying type:
    * numerics compare as BigDecimal (the token is just a carrier);
    * strings compare lexicographically (Spark's UTF8String order agrees
    * on the BMP; supplementary planes order differently under UTF-8
    * byte order, which is why [[cmp]] falls back conservatively — see
    * there); Date.toString (`yyyy-MM-dd`) and Timestamp.toString
    * (`yyyy-MM-dd HH:mm:ss.f+`) are fixed-width up to the fraction,
    * whose digit-wise comparison is order-faithful; `false` < `true`
    * lexicographically. None ⇒ unrenderable ⇒ the caller must keep the
    * partition.
    */
  private[io] def renderValue(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(s)
    case b: Boolean => Some(if (b) "true" else "false")
    case n: java.math.BigDecimal => Some(n.toPlainString)
    case n: scala.math.BigDecimal => Some(n.bigDecimal.toPlainString)
    case n: Number => Some(n.toString)
    case d: java.sql.Date => Some(d.toString)
    case t: java.sql.Timestamp => Some(TsFmt.format(t.toInstant))
    case t: java.time.Instant => Some(TsFmt.format(t))
    case t: java.time.LocalDateTime => Some(t.format(NtzFmt))
    case d: java.time.LocalDate => Some(java.sql.Date.valueOf(d).toString)
    case _ => None
  }

  /** Timestamps render FIXED-WIDTH in UTC (9-digit nanos): lexicographic
    * order equals instant order with no dependence on the JVM default
    * timezone — `Timestamp.toString` would render wall-clock in the
    * default zone, whose DST fold breaks monotonicity one hour a year
    * (a wrongly-pruned matching partition, the one sin the layer must
    * never commit). NTZ values render the same shape without a zone.
    */
  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.nnnnnnnnn")
    .withZone(java.time.ZoneOffset.UTC)
  private val NtzFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.nnnnnnnnn")

  /** Compare two stat tokens under the column's type; None = cannot
    * compare faithfully (⇒ caller keeps the partition). Strings with
    * characters outside the basic multilingual plane are declined:
    * Java's String.compareTo orders by UTF-16 code unit while Spark's
    * UTF8String orders by UTF-8 byte, and the two disagree exactly
    * there — a wrong comparison would prune a matching partition.
    */
  private[io] def cmp(a: String, b: String, dt: DataType): Option[Int] = dt match {
    case _: NumericType =>
      try Some(new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)))
      catch { case _: NumberFormatException => None }
    case StringType =>
      def bmp(s: String) = s.codePoints().allMatch(_ <= 0xFFFF)
      if (bmp(a) && bmp(b)) Some(a.compareTo(b)) else None
    case BooleanType => Some(a.compareTo(b))
    case DateType | TimestampType | TimestampNTZType =>
      // lexicographic order equals chronological order ONLY while the
      // year field is exactly 4 digits: the yyyy pattern renders year
      // 10000+ as '+10000-…' (Date.toString as '10000-…') and negative
      // years signed — all WIDER or sign-prefixed, breaking digit-wise
      // monotonicity. One junk far-future row in a partition would then
      // make its recorded max compare BELOW a query bound and wrongly
      // prune a matching partition — the one sin this layer must never
      // commit. Decline (⇒ caller keeps the partition) unless both
      // tokens are in the fixed-width regime.
      def fixedYear(s: String): Boolean =
        s.length > 4 && s.charAt(4) == '-' &&
          s.substring(0, 4).forall(c => c >= '0' && c <= '9')
      if (fixedYear(a) && fixedYear(b)) Some(a.compareTo(b)) else None
    case _ => None
  }

  // ── manifest (de)serialization ─────────────────────────────────────

  private def hx(s: String): String =
    if (s == null) "xNULL"
    else "x" + s.getBytes("UTF-8").map("%02X".format(_)).mkString

  private def unhx(tok: String): Option[String] = {
    val h = tok.stripPrefix("x")
    if (h == "NULL") None
    else Some(new String(
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8"))
  }

  /** Render a stats map as one manifest field: `;`-separated columns,
    * each `hexName,loTok,hiTok[,nullCount]` with hex-encoded tokens
    * (`xNULL` for a missing bound) — the token alphabet `[x0-9A-F]`
    * cannot collide with the `,`/`;`/TAB separators, so any column name
    * or value is safe. The decimal null count (4th field, r8-late) is
    * omitted when unrecorded; [[parseStats]] accepts both widths, so
    * pre-null-count manifests read as `nulls = -1` (unknown — keeps).
    * Deterministic (name-sorted) so manifest bytes are stable.
    */
  def renderStats(stats: Map[String, ColRange]): String =
    stats.toSeq.sortBy(_._1).map { case (c, r) =>
      (Seq(hx(c), r.lo.map(hx).getOrElse("xNULL"),
        r.hi.map(hx).getOrElse("xNULL")) ++
        (if (r.nulls >= 0) Seq(r.nulls.toString) else Nil)).mkString(",")
    }.mkString(";")

  /** Inverse of [[renderStats]]. */
  def parseStats(field: String): Map[String, ColRange] =
    if (field.isEmpty) Map.empty
    else field.split(";").toSeq.map { part =>
      val toks = part.split(",", 4)
      val Array(c, lo, hi) = toks.take(3)
      val nulls = if (toks.length > 3) toks(3).toLong else -1L
      unhx(c).getOrElse(
        throw new IllegalArgumentException(s"null column name in zone map"))
        .-> (ColRange(unhx(lo), unhx(hi), nulls))
    }.toMap

  // ── collection (stage-time) ────────────────────────────────────────

  /** Per-partition-key (min/max of every supported column, row count),
    * in ONE aggregation job over the staged delta (partition count ≪
    * data: the collect is metadata-scale — |touched partitions| rows of
    * 2·|columns|+1 scalars). Columns of unsupported types are simply
    * not recorded (⇒ never pruned on).
    */
  def collectStats(staged: DataFrame, partKeyCol: String,
      fields: Seq[StructField])
      : Map[String, (Map[String, ColRange], Long)] = {
    val eligible = fields.filter(f => supported(f.dataType))
    val aggs = count(lit(1)).as("__nrows") +: eligible.flatMap(f => Seq(
      min(col(f.name)).as(s"__lo_${f.name}"),
      max(col(f.name)).as(s"__hi_${f.name}"),
      count(col(f.name)).as(s"__nn_${f.name}")))
    val rows = staged.groupBy(col(partKeyCol)).agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.map { row =>
      val key = row.getString(0)
      val n = row.getLong(1)
      val stats = eligible.zipWithIndex.flatMap { case (f, i) =>
        val lo = renderAt(row, 2 + 3 * i)
        val hi = renderAt(row, 3 + 3 * i)
        // a non-null bound that fails to render would poison pruning;
        // drop the column (absent = unknown = never pruned) instead of
        // recording a half-range
        if ((row.isNullAt(2 + 3 * i) || lo.isDefined) &&
            (row.isNullAt(3 + 3 * i) || hi.isDefined))
          Some(f.name -> ColRange(lo, hi, n - row.getLong(4 + 3 * i)))
        else None
      }.toMap
      key -> (stats, n)
    }.toMap
  }

  private def renderAt(row: Row, i: Int): Option[String] =
    if (row.isNullAt(i)) None else renderValue(row.get(i))

  /** Per-partition-key, per-FILE (min/max of every supported column, row
    * count) — the same single aggregation as [[collectStats]] one level
    * finer (`input_file_name()` joins the grouping key), still
    * metadata-scale (|staged files| rows). File names are basenames: the
    * staging rename moves whole partition dirs, so the basename is the
    * stable identity a `_filestats` sidecar can key on.
    */
  def collectFileStats(staged: DataFrame, partKeyCol: String,
      fields: Seq[StructField])
      : Map[String, Seq[(String, Map[String, ColRange], Long)]] = {
    val eligible = fields.filter(f => supported(f.dataType))
    val aggs = count(lit(1)).as("__nrows") +: eligible.flatMap(f => Seq(
      min(col(f.name)).as(s"__lo_${f.name}"),
      max(col(f.name)).as(s"__hi_${f.name}"),
      count(col(f.name)).as(s"__nn_${f.name}")))
    val rows = staged
      .groupBy(col(partKeyCol), input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.toSeq.map { row =>
      val key = row.getString(0)
      val file = row.getString(1).split('/').last
      val n = row.getLong(2)
      val stats = eligible.zipWithIndex.flatMap { case (f, i) =>
        val lo = renderAt(row, 3 + 3 * i)
        val hi = renderAt(row, 4 + 3 * i)
        if ((row.isNullAt(3 + 3 * i) || lo.isDefined) &&
            (row.isNullAt(4 + 3 * i) || hi.isDefined))
          Some(f.name -> ColRange(lo, hi, n - row.getLong(5 + 3 * i)))
        else None
      }.toMap
      (key, file, stats, n)
    }.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(r => (r._2, r._3, r._4)).sortBy(_._1)
    }
  }

  /** [[collectFileStats]] from the PARQUET FOOTERS Spark already wrote,
    * instead of a second Spark job re-scanning the staged delta: one
    * driver-side footer read per staged file (metadata bytes, no tasks).
    * At warehouse scale this removes a full delta-sized data pass from
    * every manifest commit; at bench scale it removes one scheduler
    * round-trip per write.
    *
    * Fidelity: parquet-mr 1.16 chunk statistics use the SAME orderings
    * Spark's min/max aggregates use — unsigned-byte (UTF8String) order
    * for BINARY/UTF8, total order with NaN greatest (PrimitiveComparator
    * over Double.compare semantics) for FLOAT/DOUBLE — so the recorded
    * tokens are identical to the aggregation path's, including the
    * never-prunes "NaN" token when a file holds NaNs. Statistics
    * truncation (long strings) keeps min a prefix-truncated LOWER bound
    * and max an incremented UPPER bound — looser, still sound. Honesty
    * rules unchanged: any chunk without usable stats, any unsupported
    * physical/logical mapping, and any type this map does not cover
    * drops the column from that file's entry (absent = unknown = never
    * pruned); DecimalType is deliberately not mapped (scale/physical
    * variants), as are nested types.
    *
    * Row counts come from block metadata (exact). Null counts from chunk
    * `getNumNulls` when set on every block, else −1 (unknown — keeps,
    * matching pre-null-count manifests).
    */
  def fileStatsFromFooters(spark: org.apache.spark.sql.SparkSession,
      stageDir: org.apache.hadoop.fs.Path, fields: Seq[StructField])
      : Map[String, Seq[(String, Map[String, ColRange], Long)]] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = stageDir.getFileSystem(conf)
    val eligible = fields.filter(f => supported(f.dataType))
    def renderTyped(dt: DataType,
        col: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
        v: Any): Option[String] = {
      val prim = col.getPrimitiveType
      val logical = Option(prim.getLogicalTypeAnnotation)
      (dt, prim.getPrimitiveTypeName, v) match {
        case (ByteType | ShortType | IntegerType, INT32, i: java.lang.Integer) =>
          renderValue(i)
        case (LongType, INT64, l: java.lang.Long) => renderValue(l)
        case (FloatType, FLOAT, f: java.lang.Float) => renderValue(f)
        case (DoubleType, DOUBLE, d: java.lang.Double) => renderValue(d)
        case (BooleanType, BOOLEAN, b: java.lang.Boolean) => renderValue(b)
        case (StringType, BINARY, b: org.apache.parquet.io.api.Binary)
            if logical.exists(
              _.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]) =>
          // a truncated/incremented stat could be invalid UTF-8; a
          // replacement-char decode would record a WRONG bound — accept
          // only bytes that round-trip exactly
          val s = b.toStringUsingUTF8
          if (java.util.Arrays.equals(s.getBytes("UTF-8"), b.getBytes))
            renderValue(s)
          else None
        case (DateType, INT32, i: java.lang.Integer)
            if logical.exists(
              _.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]) =>
          renderValue(java.time.LocalDate.ofEpochDay(i.longValue()))
        case (TimestampType | TimestampNTZType, INT64, l: java.lang.Long) =>
          logical match {
            case Some(t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
              val micros = t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MICROS => Some(l.longValue())
                case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                  Some(Math.multiplyExact(l.longValue(), 1000L))
                case _ => None // NANOS and future units: decline
              }
              micros.flatMap { us =>
                val secs = Math.floorDiv(us, 1000000L)
                val nanos = Math.floorMod(us, 1000000L) * 1000L
                val inst = java.time.Instant.ofEpochSecond(secs, nanos)
                if (dt == TimestampType) renderValue(inst)
                else renderValue(
                  java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC))
              }
            case _ => None
          }
        case _ => None
      }
    }
    val parts = fs.listStatus(stageDir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("__pv="))
    parts.map { partDir =>
      val key = partDir.getName.stripPrefix("__pv=")
      val files = fs.listStatus(partDir).toSeq.map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_")
          && !p.getName.startsWith("."))
      val perFile = files.map { fp =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(fp, conf))
        val blocks =
          try reader.getFooter.getBlocks
          finally reader.close()
        import scala.jdk.CollectionConverters._
        val bs = blocks.asScala.toSeq
        val rows = bs.map(_.getRowCount).sum
        // per field: fold each block's chunk stats; any unusable chunk
        // drops the column for the whole file
        val stats = eligible.flatMap { f =>
          val perBlock = bs.map { b =>
            b.getColumns.asScala.find { c =>
              val p = c.getPath.toArray
              p.length == 1 && p(0) == f.name
            }.flatMap { c =>
              val st = c.getStatistics
              if (st == null || st.isEmpty) None
              else if (!st.hasNonNullValue) {
                // bound-less chunk: it is ALL NULL only when the recorded
                // null count accounts for every row — a NaN-bearing double
                // chunk also reports no bounds but nulls < rows, and
                // recording it as all-null would wrongly prune IS NOT NULL
                // (the aggregation path records a never-prunes "NaN" bound
                // there). Anything unaccounted: drop the column (keep).
                if (st.isNumNullsSet && st.getNumNulls == b.getRowCount)
                  Some(ColRange(None, None, st.getNumNulls))
                else None
              } else {
                val lo = renderTyped(f.dataType, c, st.genericGetMin)
                val hi = renderTyped(f.dataType, c, st.genericGetMax)
                val n = if (st.isNumNullsSet) st.getNumNulls else -1L
                if (lo.isDefined && hi.isDefined)
                  Some(ColRange(lo, hi, n))
                else None // unrenderable bound: drop, never guess
              }
            }
          }
          if (perBlock.exists(_.isEmpty)) None // some chunk unusable
          else {
            val rs = perBlock.flatten
            // fold starts from the head and compares only against the
            // REST: a single-block file must keep its recorded bound even
            // when cmp declines the token's type (non-BMP strings) — only
            // a genuine cross-block comparison may bail to "unknown"
            def fold(bounds: Seq[String], takeLess: Boolean): Option[Option[String]] =
              if (bounds.isEmpty) Some(None)
              else bounds.tail.foldLeft(Option(bounds.head)) { (acc, b) =>
                acc.flatMap(a => cmp(a, b, f.dataType).map(c =>
                  if ((c <= 0) == takeLess) a else b))
              }.map(Some(_))
            val nulls =
              if (rs.exists(_.nulls < 0)) -1L else rs.map(_.nulls).sum
            (fold(rs.flatMap(_.lo), takeLess = true),
                fold(rs.flatMap(_.hi), takeLess = false)) match {
              case (Some(lo), Some(hi)) => Some(f.name -> ColRange(lo, hi, nulls))
              case _ => None // incomparable across blocks: drop
            }
          }
        }.toMap
        (fp.getName, stats, rows)
      }.sortBy(_._1)
      key -> perFile
    }.toMap
  }

  /** Fold one partition's per-file stats up to the partition-level entry
    * ([[collectStats]]'s shape) — min of file minima / max of file maxima
    * under the column's typed comparison. Conservatism unchanged: a
    * column any file failed to record, or whose tokens this layer cannot
    * compare faithfully ([[cmp]] None — e.g. non-BMP strings, NaN), is
    * DROPPED from the partition entry (absent = unknown = never pruned);
    * the per-file stats keep their recorded values regardless (read-time
    * evaluation applies the same conservative [[mayMatch]] per file).
    * All-NULL files contribute no bounds; all files all-NULL folds to
    * the all-NULL range (prunable under null-rejecting preds).
    */
  def foldFileStats(files: Seq[(String, Map[String, ColRange], Long)],
      fields: Seq[StructField]): (Map[String, ColRange], Long) = {
    val n = files.map(_._3).sum
    val stats = fields.flatMap { f =>
      val ranges = files.map(_._2.get(f.name))
      if (ranges.exists(_.isEmpty)) None // unrecorded somewhere: unknown
      else {
        val rs = ranges.flatten
        def fold(bounds: Seq[String], takeLess: Boolean): Option[Option[String]] =
          if (bounds.isEmpty) Some(None) // every file all-NULL on this side
          else bounds.foldLeft(Option(bounds.head)) { (acc, b) =>
            acc.flatMap(a => cmp(a, b, f.dataType).map(c =>
              if ((c <= 0) == takeLess) a else b))
          }.map(Some(_))
        val nulls =
          if (rs.exists(_.nulls < 0)) -1L else rs.map(_.nulls).sum
        (fold(rs.flatMap(_.lo), takeLess = true),
            fold(rs.flatMap(_.hi), takeLess = false)) match {
          case (Some(lo), Some(hi)) => Some(f.name -> ColRange(lo, hi, nulls))
          case _ => None // incomparable tokens: drop, never guess
        }
      }
    }.toMap
    (stats, n)
  }

  // ── Column → ZonePred extraction ───────────────────────────────────

  /** Extract the prunable [[ZonePred]] conjuncts IMPLIED by a native
    * `Column` predicate — the bridge that lets callers write ordinary
    * Spark expressions (`col("k") === 5 && col("ts") >= lit(t)`) and
    * still get manifest/file-level pruning ([[ManifestVersioned
    * .readFiltered]]). Soundness rule: only shapes the whole predicate
    * IMPLIES are extracted — top-level AND conjuncts of
    * attribute-vs-literal comparisons, IN lists, IS [NOT] NULL, and
    * null-safe equality; anything else (ORs, casts, function calls,
    * attr-vs-attr) simply yields nothing for that conjunct. The caller
    * always applies the ORIGINAL Column as the row filter, so an
    * extraction miss costs pruning opportunity, never correctness.
    */
  def fromColumn(cond: Column): Seq[ZonePred] =
    // Spark 4's Column wraps a ColumnNode tree whose node types are
    // private[sql]; the walk lives in the graftbridge subpackage (see
    // PredExtract for the extraction rules and the soundness contract)
    org.apache.spark.sql.graftbridge.PredExtract.fromColumn(cond)

  /** OR-aware twin of [[fromColumn]]: a bounded DNF of the prunable
    * skeleton — branches whose disjunction the predicate implies; the
    * caller prunes with the UNION of per-branch survivors
    * ([[ManifestVersioned.readPrunedOr]]). A `Nil` branch = an
    * unprunable arm (survives everything). See
    * [[org.apache.spark.sql.graftbridge.PredExtract.fromColumnOr]].
    */
  def fromColumnOr(cond: Column): Seq[Seq[ZonePred]] =
    org.apache.spark.sql.graftbridge.PredExtract.fromColumnOr(cond)

  /** OR-aware twin of [[fromExpression]] for the SQL surface — same
    * bounded-DNF contract as [[fromColumnOr]].
    */
  def fromExpressionOr(
      cond: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[Seq[ZonePred]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, Or}
    val MaxBranches = 32
    def walkOr(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[Seq[ZonePred]] = e match {
      case And(l, r) =>
        val (bl, br) = (walkOr(l), walkOr(r))
        if (bl.size * br.size > MaxBranches)
          (if (bl.size <= br.size) bl else br)
        else for { a <- bl; b <- br } yield a ++ b
      case Or(l, r) =>
        val both = walkOr(l) ++ walkOr(r)
        if (both.size > MaxBranches) Seq(Nil) else both
      case other => Seq(fromExpression(other))
    }
    walkOr(cond)
  }

  /** [[fromColumn]] for RESOLVED Catalyst expressions — what the SQL
    * surface sees after analysis + optimization
    * ([[graft.plans.PruneGraftScans]] matches `Filter(cond,
    * GraftManifestRelation)` in the optimizer, where attributes are
    * `AttributeReference`s and literals carry INTERNAL values that
    * convert back through `CatalystTypeConverters`). Same soundness
    * contract: only implied conjuncts, misses cost pruning only (the
    * Filter node itself stays in the plan as the residual). The
    * optimizer has already folded `Cast(Literal)` and unwrapped casts
    * in binary comparisons by the time the user batch runs, so
    * attr-vs-literal shapes are the common case; anything cast-wrapped
    * or computed extracts nothing.
    */
  def fromExpression(cond: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[ZonePred] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    def name(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def value(l: Literal): Any =
      CatalystTypeConverters.createToScalaConverter(l.dataType)(l.value)
    def cmp(a: Expression, b: Expression,
        direct: (String, Any) => ZonePred,
        flipped: (String, Any) => ZonePred): Seq[ZonePred] = (a, b) match {
      case (attr, l: Literal) => name(attr).map(direct(_, value(l))).toSeq
      case (l: Literal, attr) => name(attr).map(flipped(_, value(l))).toSeq
      case _ => Nil
    }
    def walk(e: Expression): Seq[ZonePred] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, b) => cmp(a, b, ZoneEq(_, _), ZoneEq(_, _))
      case EqualNullSafe(a, Literal(null, _)) =>
        name(a).map(ZoneIsNull(_)).toSeq
      case EqualNullSafe(Literal(null, _), a) =>
        name(a).map(ZoneIsNull(_)).toSeq
      case EqualNullSafe(a, b) => cmp(a, b, ZoneEq(_, _), ZoneEq(_, _))
      case GreaterThan(a, b) => cmp(a, b, ZoneGt(_, _), ZoneLt(_, _))
      case GreaterThanOrEqual(a, b) => cmp(a, b, ZoneGe(_, _), ZoneLe(_, _))
      case LessThan(a, b) => cmp(a, b, ZoneLt(_, _), ZoneGt(_, _))
      case LessThanOrEqual(a, b) => cmp(a, b, ZoneLe(_, _), ZoneGe(_, _))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        name(a).map(n =>
          ZoneIn(n, vs.map(v => value(v.asInstanceOf[Literal])))).toSeq
      case InSet(a, hset) if hset.size <= 10000 =>
        // the optimizer's large-IN form: internal values convert under
        // the (resolved) child's type
        name(a).map { n =>
          val conv = CatalystTypeConverters.createToScalaConverter(a.dataType)
          ZoneIn(n, hset.toSeq.map(conv))
        }.toSeq
      case IsNull(a) => name(a).map(ZoneIsNull(_)).toSeq
      case IsNotNull(a) => name(a).map(ZoneNotNull(_)).toSeq
      case _ => Nil
    }
    walk(cond)
  }

  // ── evaluation (read-time) ─────────────────────────────────────────

  /** The row-level `Column` equivalent of a pred — the residual filter
    * `readWhere` always applies (pruning is an optimization on top of
    * this, never a substitute). When the column's recorded type is
    * known the literal CASTS to it, so e.g. a Timestamp pred against a
    * TIMESTAMP_NTZ column resolves instead of failing analysis (the
    * cast uses the session timezone; manifest-level pruning for such
    * cross-family preds conservatively keeps everything — see
    * [[familyMatch]]).
    */
  def toColumn(p: ZonePred, dt: Option[DataType] = None): Column = {
    def l(v: Any) = dt.map(t => lit(v).cast(t)).getOrElse(lit(v))
    p match {
      case ZoneEq(c, v) => col(c) === l(v)
      case ZoneGt(c, v) => col(c) > l(v)
      case ZoneGe(c, v) => col(c) >= l(v)
      case ZoneLt(c, v) => col(c) < l(v)
      case ZoneLe(c, v) => col(c) <= l(v)
      case ZoneIn(c, vs) =>
        // ONE flat In expression, not an OR chain: a thousand-member
        // id list must not build a thousand-deep Column tree (the
        // conversion recursion overflows the stack around ~700) — and
        // In compiles to a hash-set probe instead of n comparisons.
        // 3VL is identical (a NULL member yields NULL when nothing
        // matches, exactly like the OR chain).
        if (vs.isEmpty) lit(false) else col(c).isin(vs.map(l): _*)
      case ZoneIsNull(c) => col(c).isNull
      case ZoneNotNull(c) => col(c).isNotNull
    }
  }

  /** Is the pred value's rendered token DIRECTLY comparable with the
    * column's stat tokens? Pruning demands exact family agreement —
    * e.g. a java.sql.Timestamp (an instant, rendered in UTC) against a
    * TIMESTAMP_NTZ column (wall-clock, no zone) would need the session
    * timezone to compare, which this layer does not see; the residual
    * filter casts with the session zone, so a family-mismatched prune
    * could contradict it. Mismatches keep the partition.
    */
  private def familyMatch(v: Any, dt: DataType): Boolean = (v, dt) match {
    case (_: Number, _: NumericType) => true
    case (_: scala.math.BigDecimal, _: NumericType) => true
    case (_: String, StringType) => true
    case (_: Boolean, BooleanType) => true
    case (_: java.sql.Date | _: java.time.LocalDate, DateType) => true
    case (_: java.sql.Timestamp | _: java.time.Instant, TimestampType) => true
    case (_: java.time.LocalDateTime, TimestampNTZType) => true
    case _ => false
  }

  /** Can any row of a partition with `stats` satisfy `p`? False ONLY
    * when the recorded range disproves it outright; every doubtful path
    * (no stats for the column, unknown type, unrenderable value,
    * incomparable tokens) answers true.
    */
  def mayMatch(stats: Map[String, ColRange], p: ZonePred,
      schema: Option[StructType]): Boolean =
    stats.get(p.column) match {
      case None => true
      case Some(r) if p.isInstanceOf[ZoneIsNull] =>
        // decided by the NULL COUNT alone (the one non-null-rejecting
        // shape): zero recorded nulls disproves; unrecorded (-1, a
        // pre-null-count manifest) or positive keeps — including the
        // all-null range, where the count IS the row count
        r.nulls != 0L
      case Some(r) if p.isInstanceOf[ZoneNotNull] =>
        // any recorded bound proves a non-null row exists; the
        // all-null range (no bounds) disproves
        r.lo.isDefined || r.hi.isDefined
      case Some(ColRange(None, None, _)) =>
        false // all null: no null-rejecting pred can match
      case Some(ColRange(lo, hi, _)) =>
        val dt0 = schema.flatMap(_.fields.find(_.name == p.column))
          .map(_.dataType)
        // per-value range test: (cmp(lo, v), cmp(hi, v)) → survives?
        // Doubt (family mismatch, unrenderable, incomparable) → true.
        def may(value: Any)(
            test: (Option[Int], Option[Int]) => Boolean): Boolean = {
          val dt = dt0.filter(familyMatch(value, _))
          (dt, renderValue(value)) match {
            case (Some(t), Some(v)) =>
              test(lo.flatMap(cmp(_, v, t)), hi.flatMap(cmp(_, v, t)))
            case _ => true
          }
        }
        p match {
          case ZoneEq(_, v) =>
            may(v)((cl, ch) => cl.forall(_ <= 0) && ch.forall(_ >= 0))
          case ZoneIn(_, vs) => vs.exists(v =>
            may(v)((cl, ch) => cl.forall(_ <= 0) && ch.forall(_ >= 0)))
          case ZoneGt(_, v) => may(v)((_, ch) => ch.forall(_ > 0))
          case ZoneGe(_, v) => may(v)((_, ch) => ch.forall(_ >= 0))
          case ZoneLt(_, v) => may(v)((cl, _) => cl.forall(_ < 0))
          case ZoneLe(_, v) => may(v)((cl, _) => cl.forall(_ <= 0))
        }
    }
}
