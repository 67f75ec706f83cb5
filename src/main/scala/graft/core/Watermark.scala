package graft.core

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max, max_by, struct}
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

/** File-arrival high-water-mark state (SURVEY.md §2.1 S3/S5/K1, §2.4 A1/A2).
  *
  * The reference persists, per source folder, the max object-creation time seen,
  * and on the next run processes only files strictly newer
  * (`helper_functions.py:66-105`, `incremental_etl_v1.py:48-49,73-74`). The
  * stored column is named `latest_blob_name` but actually holds the FOLDER name
  * (`helper_functions.py:99`) — downstream depends on the folder semantics, so we
  * keep the behavior under an honest name (SURVEY.md §2.12).
  *
  * This is driver-side METADATA state (a handful of rows) — the only place the
  * engine is allowed to `collect()`. Structured Streaming's file source is the
  * native upgrade path (see `graft.streaming`).
  */
case class Watermark(folder: String, maxCreatedAt: Timestamp)

object WatermarkStore {

  /** The reference's 2-column state schema (`helper_functions.py:70-73`),
    * with the honest column name.
    */
  val schema: StructType = StructType(Seq(
    StructField("folder", StringType, nullable = true),
    StructField("max_created_at", TimestampType, nullable = true)))

  /** S3+A2 — load the state file into a driver map. Explicit schema (no
    * inference scan); empty map if the state does not exist yet.
    */
  def load(spark: SparkSession, path: String): Map[String, Timestamp] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) Map.empty
    else
      spark.read.schema(schema).option("header", "true").csv(path)
        .collect()
        .map(r => r.getString(0) -> r.getTimestamp(1))
        .toMap
  }

  /** K1 — overwrite the state file as ONE csv with header
    * (`helper_functions.py:104-105`). Built from a single `Seq` in one shot —
    * the reference grows the plan with a per-folder `union` loop
    * (`helper_functions.py:102`).
    */
  def save(spark: SparkSession, watermarks: Seq[Watermark], path: String): Unit = {
    val rows = watermarks.map(w => org.apache.spark.sql.Row(w.folder, w.maxCreatedAt))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S5 — list files under a directory with modification times (the local
    * stand-in for the reference's object-store blob listing,
    * `incremental_etl_v1.py:73`, via the Hadoop FS API).
    */
  def listFiles(spark: SparkSession, dir: String): Seq[(String, Timestamp)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).toSeq.filter(_.isFile).map { st =>
        st.getPath.toString -> new Timestamp(st.getModificationTime)
      }
  }

  /** A1 (driver-side, faithful) — max-by creation time over a folder's files
    * (`helper_functions.py:92-96`), with a deterministic name tiebreaker.
    */
  def maxByCreated(folder: String, files: Seq[(String, Timestamp)]): Option[Watermark] =
    files.sortBy { case (name, ts) => (ts.getTime, name) }.lastOption
      .map { case (_, ts) => Watermark(folder, ts) }

  /** The strict `>` arrival filter (`incremental_etl_v1.py:74`): equal-to-mark
    * files were already processed.
    */
  def newFiles(
      files: Seq[(String, Timestamp)],
      watermark: Option[Timestamp]): Seq[String] =
    watermark match {
      case None => files.map(_._1)
      case Some(wm) => files.collect { case (name, ts) if ts.after(wm) => name }
    }

  /** A1 (distributed form) — latest member per group as a single hash
    * aggregation (`max_by` keyed by a (ts, name) struct for a total order), no
    * window/sort needed. This is the shape the driver-side max-by takes when the
    * listing itself is table-sized.
    */
  def latestPerGroup(
      df: DataFrame,
      groupCol: String,
      nameCol: String,
      tsCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        max_by(col(nameCol), struct(col(tsCol), col(nameCol))).as("latest_name"),
        max(col(tsCol)).as("max_created_at"))
}
