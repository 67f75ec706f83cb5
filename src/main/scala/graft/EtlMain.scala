package graft

import org.apache.spark.sql.SparkSession

import graft.core.Pipeline

/** The runnable ETL entry point — the engine's spelling of the
  * reference driver contract (`run_etl.sh:5` submitting
  * `incremental_etl_v1.py`, whose config is env vars at
  * `incremental_etl_v1.py:21-27` and whose argv lists explicit source
  * folders at `:37-46`):
  *
  * Environment (each env var falls back to a same-named JVM system
  * property, the test seam):
  *  - `GRAFT_SOURCE_ROOT`  — the bc2adls-shaped source root (the
  *    reference's `bc2adls` bucket): one subfolder per table, CSV
  *    files inside. REQUIRED.
  *  - `GRAFT_WAREHOUSE_DIR` — the warehouse location (the reference's
  *    `project_id`/`dataset_id` BigQuery coordinates). REQUIRED.
  *  - `GRAFT_STATE_PATH`   — the watermark state file (the reference's
  *    `latest_csv_path`). REQUIRED.
  *  - `GRAFT_KEY_COL`      — merge key (default `systemid`).
  *  - `GRAFT_TIMEZONE`     — `extracted_at` display timezone (default
  *    `Africa/Nairobi`, the reference's).
  *  - `GRAFT_ADAPTER`      — warehouse substrate: `parquet` (default),
  *    `csv` ([[graft.io.CsvWarehouseAdapter]]), or `manifest`
  *    ([[graft.io.ManifestWarehouseAdapter]] — the engine's MVCC
  *    layer: every nightly load is a committed version, so DESCRIBE
  *    HISTORY / time travel / RESTORE work on the warehouse tables).
  *  - `GRAFT_SHARDS`       — manifest substrate only: parallel shard
  *    count per write batch (default 8).
  *  - `GRAFT_MODE`         — `overwrite` (default): the reference's
  *    read-merge-replace nightly (`incremental_etl_v1.py:187`), full
  *    table rewritten per night. `merge` (manifest adapter only): the
  *    change batch commits through the engine's versioned keyed merge
  *    — only partitions holding changed keys are touched, the nightly
  *    write is O(batch) not O(table), and the final table is
  *    bit-identical to overwrite mode (spec-pinned). This retires the
  *    reference's write-amplification scale ceiling. `stream` (parquet
  *    adapter only): the same nightly drain through Structured
  *    Streaming's file source (`Trigger.AvailableNow`) — the
  *    checkpoint's file log replaces the watermark state file with
  *    exactly-once semantics (checkpoints live at
  *    `<GRAFT_STATE_PATH>.checkpoints/<table>`); the golden table is
  *    the batch pipeline's (spec-pinned).
  *  - `GRAFT_RECOVERY_GRACE_MS` — manifest substrate only: how long
  *    startup recovery leaves recent staging debris alone (default 0,
  *    correct for the single-writer pipeline-startup window; raise it
  *    if anything else can be writing the warehouse while this CLI
  *    starts).
  *
  * Argv: zero or more folder names. Empty = discover every subfolder
  * of the source root and COMMIT the advanced watermark state after
  * the run; non-empty = process exactly those folders and SKIP the
  * state commit (the reference's explicit-folder semantics — a manual
  * backfill must not advance the nightly watermark). Per-table fault
  * isolation: one bad folder never kills the run; failures print per
  * table and set a non-zero exit code after every folder has had its
  * chance.
  */
object EtlMain {
  private def cfgVar(name: String): Option[String] =
    sys.env.get(name).orElse(sys.props.get(name)).filter(_.nonEmpty)

  private def required(name: String): String =
    cfgVar(name).getOrElse(throw new IllegalArgumentException(
      s"$name is not set — required (see EtlMain scaladoc for the " +
        "config contract)"))

  def main(args: Array[String]): Unit = {
    val adapter: graft.io.WarehouseAdapter =
      cfgVar("GRAFT_ADAPTER").getOrElse("parquet") match {
        case "parquet" => graft.io.ParquetWarehouseAdapter
        case "csv" => graft.io.CsvWarehouseAdapter
        case "manifest" => new graft.io.ManifestWarehouseAdapter(
          shards = cfgVar("GRAFT_SHARDS").map(s =>
            s.trim.toIntOption.filter(_ >= 1).getOrElse(
              throw new IllegalArgumentException(
                s"GRAFT_SHARDS must be a positive integer, got '$s'")))
            .getOrElse(8),
          // recorded as the durable graft.mergeKey property, so
          // registerAll() after a run yields MERGE-capable SQL tables
          mergeKey = Some(cfgVar("GRAFT_KEY_COL").getOrElse("systemid")),
          recoveryGraceMs = cfgVar("GRAFT_RECOVERY_GRACE_MS").map(s =>
            s.trim.toLongOption.filter(_ >= 0L).getOrElse(
              throw new IllegalArgumentException(
                s"GRAFT_RECOVERY_GRACE_MS must be a non-negative long, " +
                  s"got '$s'"))).getOrElse(0L))
        case other => throw new IllegalArgumentException(
          s"GRAFT_ADAPTER must be parquet, csv or manifest, got '$other'")
      }
    val modeName = cfgVar("GRAFT_MODE").getOrElse("overwrite")
    val mode = modeName match {
      case "overwrite" | "stream" => Pipeline.OverwriteMode
      case "merge" =>
        if (!adapter.isInstanceOf[graft.io.MergeCapableWarehouse])
          throw new IllegalArgumentException(
            "GRAFT_MODE=merge needs GRAFT_ADAPTER=manifest — the " +
              "parquet/CSV substrates have no keyed-merge verb")
        Pipeline.MergeMode
      case other => throw new IllegalArgumentException(
        s"GRAFT_MODE must be overwrite, merge or stream, got '$other'")
    }
    if (modeName == "stream" &&
        adapter != graft.io.ParquetWarehouseAdapter)
      throw new IllegalArgumentException(
        "GRAFT_MODE=stream runs on GRAFT_ADAPTER=parquet (the streaming " +
          "sink's staged-swap path)")
    val cfg = Pipeline.Config(
      sourceRoot = required("GRAFT_SOURCE_ROOT"),
      warehouseDir = required("GRAFT_WAREHOUSE_DIR"),
      statePath = required("GRAFT_STATE_PATH"),
      keyCol = cfgVar("GRAFT_KEY_COL").getOrElse("systemid"),
      timezone = cfgVar("GRAFT_TIMEZONE").getOrElse("Africa/Nairobi"),
      adapter = adapter,
      mode = mode)
    val spark = SparkSession.builder()
      .appName("graft-incremental-etl")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val report =
      if (modeName == "stream")
        // the checkpoint's file-source log IS the watermark state:
        // nothing else to commit, and nothing a crash can half-commit
        Pipeline.RunReport(
          graft.streaming.StreamingIngest.runNightly(spark,
            cfg.sourceRoot, cfg.warehouseDir,
            checkpointRoot = s"${cfg.statePath}.checkpoints",
            keyCol = cfg.keyCol, timezone = cfg.timezone,
            explicit = args.toSeq),
          stateCommitted = false)
      else Pipeline.run(spark, cfg, explicit = args.toSeq)
    val results = report.tables
    results.foreach { r =>
      r.rows match {
        case scala.util.Success(n) =>
          println(s"ETL OK   ${r.folder} -> ${r.table}: $n rows")
        case scala.util.Failure(e) =>
          println(s"ETL FAIL ${r.folder} -> ${r.table}: $e")
      }
    }
    val failed = results.count(_.rows.isFailure)
    // stateCommitted is the pipeline's OWN report of what it durably
    // did, never an inference from the inputs — an operator debugging
    // a missing state file must be told the truth
    println(s"ETL DONE folders=${results.size} failed=$failed " +
      s"state_committed=${report.stateCommitted}")
    if (failed > 0) throw new RuntimeException(
      s"$failed of ${results.size} folders failed — see ETL FAIL lines")
  }
}
