package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The REAL BigQuery binding of the [[WarehouseAdapter]] boundary — the
  * leaf implementation the trait was extracted for (VERDICT-r11 item 7;
  * the reference's load path is `helper_functions.py:192-196`: a
  * WRITE_TRUNCATE save through `format("bigquery")` staged via a
  * temporary GCS bucket; its scan path is `incremental_etl_v1.py:85`).
  *
  * SANDBOX CONTRACT — code + documentation only, NO test claims: this
  * build environment has no network, no GCP project and no
  * spark-bigquery connector jar, so nothing here can execute. The
  * class still compiles everywhere because the connector is addressed
  * by its DATA SOURCE NAME (`format("bigquery")`) — Spark resolves
  * that string at RUNTIME via `DataSource.lookupDataSource`, not at
  * compile time. Every verb therefore gates on [[connectorPresent]]
  * and fails with an actionable message instead of a bare
  * `ClassNotFoundException` when invoked without the connector.
  *
  * Deployment (when a live project exists):
  *  1. submit with `--packages com.google.cloud.spark:spark-bigquery-
  *     with-dependencies_2.13:<version>` (or the Dataproc built-in —
  *     the reference runs on Dataproc, `dataproc.tf`, where the
  *     connector is preinstalled);
  *  2. `new BigQueryWarehouseAdapter(projectId, datasetId, tempBucket)`
  *     — the same three coordinates the reference's env contract
  *     carries (`incremental_etl_v1.py:21-27`);
  *  3. run `WarehouseContractKit` against it (subclass with this
  *     factory) BEFORE trusting it under `Pipeline` — the kit is the
  *     boundary's definition of done, and nothing in this sandbox can
  *     discharge it for a live service;
  *  4. point `EtlMain` at it (a `GRAFT_ADAPTER=bigquery` arm is left
  *     OUT until step 3 can run somewhere — an adapter the kit has
  *     never passed must not be reachable from the production CLI).
  *
  * Verb mapping, from the reference's own calls:
  *  - [[read]]/[[exists]]: `spark.read.format("bigquery")` on
  *    `project.dataset.table` (`incremental_etl_v1.py:85`); existence
  *    is probed by attempting the read — the connector's metadata GET —
  *    because the boundary has no cheaper portable probe.
  *  - [[overwrite]]: `mode("overwrite")` = WRITE_TRUNCATE with
  *    `temporaryGcsBucket` staging (`helper_functions.py:192-196`).
  *  - [[append]]: same writer, `mode("append")` = WRITE_APPEND.
  *  - [[replace]]: IDENTICAL to [[overwrite]] — BigQuery's load jobs
  *    are atomic server-side (the staged load materializes fully
  *    before the truncate-swap), which is exactly the materialization
  *    barrier the file substrates re-implement with stage-then-swap.
  *  - [[recoverAll]]: a no-op — an interrupted load job leaves the
  *    target table untouched (server-side atomicity); staging debris
  *    in the temp bucket is reclaimed by the bucket's lifecycle rule,
  *    not by the engine (the reference relies on the same).
  *
  * `warehouseDir` is UNUSED by this substrate (coordinates live in the
  * constructor, mirroring how the reference passes project/dataset as
  * env config while the pipeline addresses tables by name) — asserted
  * blank-or-ignored rather than silently reinterpreted.
  */
final class BigQueryWarehouseAdapter(projectId: String, datasetId: String,
    temporaryGcsBucket: String) extends WarehouseAdapter {
  require(projectId.nonEmpty && datasetId.nonEmpty &&
    temporaryGcsBucket.nonEmpty,
    "BigQuery adapter needs projectId, datasetId and a temporary GCS " +
      "bucket — the reference's own three coordinates")

  private def ref(table: String) = s"$projectId.$datasetId.$table"

  /** Is the spark-bigquery connector on THIS session's classpath?
    * Resolved the same way Spark itself will (service-loader /
    * class-name lookup), so the guard cannot disagree with execution.
    */
  private[io] def connectorPresent: Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("bigquery",
          org.apache.spark.sql.internal.SQLConf.get)
      true
    } catch { case _: Throwable => false }

  private def requireConnector(): Unit =
    if (!connectorPresent) throw new IllegalStateException(
      "the spark-bigquery connector is not on the classpath — this " +
        "adapter is a documented skeleton in sandbox builds; deploy " +
        "with --packages com.google.cloud.spark:spark-bigquery-with-" +
        "dependencies_2.13:<version> (preinstalled on Dataproc) and " +
        "run WarehouseContractKit against the live project first")

  /** Probed by attempting the metadata read. Only a clearly
    * TABLE-SCOPED NOT-FOUND failure maps to `false` — anything else
    * (auth, quota, transient 5xx, a 404 on a DIFFERENT resource like
    * the dataset or the temp bucket, or an unrelated message that
    * merely embeds "404") RETHROWS: swallowing it would make a PRESENT
    * table look absent, and the pipeline's existence branch would then
    * pick a first-sight WRITE_TRUNCATE full load over the incremental
    * path, truncating the table to one night's batch. The match is on
    * the connector's message shape (`Not found: Table …` is BigQuery's
    * stable phrasing) because the connector's exception classes are
    * not on this compile path — and it additionally requires the
    * phrase to be table-scoped: either BigQuery's own
    * `Not found: Table` prefix or a not-found wording that names THIS
    * table's reference.
    */
  def exists(spark: SparkSession, warehouseDir: String,
      table: String): Boolean = {
    requireConnector()
    try {
      spark.read.format("bigquery").load(ref(table)).schema
      true
    } catch {
      case scala.util.control.NonFatal(e) if tableNotFound(e, table) =>
        false
    }
  }

  /** The exists() failure classifier, factored out so the
    * absent-vs-rethrow contract is testable without a live service:
    * walks up to 8 causes and answers "is this clearly THIS TABLE
    * being absent?". Absent requires BOTH a not-found marker AND the
    * message naming this table (the dataset-qualified forms BigQuery
    * emits — `proj.ds.t` / `ds.t` — or the `Not found: Table …`
    * phrasing carrying the bare name). A not-found on another resource
    * (dataset, bucket, a DIFFERENT table) or a bare "404" embedded in
    * an unrelated message says false — the caller rethrows those.
    */
  private[io] def tableNotFound(e: Throwable, table: String): Boolean = {
    val r = ref(table)
    Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(8).exists(t =>
        Option(t.getMessage).exists { m =>
          val notFound = m.contains("Not found") ||
            m.contains("notFound") || m.contains("404")
          notFound && (m.contains(r) || m.contains(s"$datasetId.$table") ||
            (m.contains("Not found: Table") && m.contains(table)))
        })
  }

  def read(spark: SparkSession, warehouseDir: String,
      table: String): DataFrame = {
    requireConnector()
    spark.read.format("bigquery").load(ref(table))
  }

  def overwrite(df: DataFrame, warehouseDir: String, table: String): Unit = {
    requireConnector()
    df.write.format("bigquery")
      .option("temporaryGcsBucket", temporaryGcsBucket)
      .mode("overwrite")
      .save(ref(table))
  }

  def append(df: DataFrame, warehouseDir: String, table: String): Unit = {
    requireConnector()
    df.write.format("bigquery")
      .option("temporaryGcsBucket", temporaryGcsBucket)
      .mode("append")
      .save(ref(table))
  }

  def replace(spark: SparkSession, warehouseDir: String, table: String,
      df: DataFrame): Unit =
    // BigQuery load jobs are atomic: the GCS-staged content
    // materializes fully server-side before the truncate swap, so
    // replace-from-self needs no engine-side staging protocol
    overwrite(df, warehouseDir, table)

  def recoverAll(spark: SparkSession, warehouseDir: String): Unit = ()
}
