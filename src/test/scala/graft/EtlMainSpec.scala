package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** The CLI entry point end-to-end: `EtlMain.main` driven exactly as an
  * operator would (config via the documented variables — here the
  * system-property fallback seam — argv folder overrides), against a
  * 3-round bc2adls fixture (initial / update+new / deletes), asserting
  * the golden final table, the explicit-folder state-commit skip, and
  * the per-folder fault isolation exit contract.
  */
class EtlMainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val zero = core.Pipeline.ZeroGuid

  private def write(path: String, mtime: Long, lines: String*): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), lines.mkString("\n").getBytes)
    assert(new File(path).setLastModified(mtime))
  }

  private def withCfg[A](root: String)(body: => A): A = {
    val props = Map(
      "GRAFT_SOURCE_ROOT" -> s"$root/src",
      "GRAFT_WAREHOUSE_DIR" -> s"$root/warehouse",
      "GRAFT_STATE_PATH" -> s"$root/state/latest.csv")
    props.foreach { case (k, v) => sys.props(k) = v }
    try body finally props.keys.foreach(sys.props.remove)
  }

  test("EtlMain 3-round run reaches the golden table; explicit-folder " +
      "runs skip the watermark commit; a bad folder fails the run " +
      "loudly AFTER processing the good ones") {
    spark // force the session up so EtlMain's getOrCreate adopts it
    val root = Files.createTempDirectory("graft-etlmain").toString
    val folder = "Customer-Ledger"
    val header = "systemid,systemcreatedat-2000000001," +
      "systemcreatedby-2000000002,systemmodifiedat-2000000003," +
      "systemmodifiedby-2000000004,$company,No-1,Amount-3"
    val t1 = 1700000000000L
    withCfg(root) {
      // round 1: initial full load
      write(s"$root/src/$folder/f1.csv", t1,
        header,
        s"A,2024-01-01 08:00:00,{u1},2024-01-01 08:00:00,{u1},CRONUS,10000,100.5",
        s"A,2024-01-01 08:00:00,{u1},2024-01-05 09:30:00,{u1},CRONUS,10001,150.5",
        s"B,2024-01-02 08:00:00,{u1},2024-01-02 08:00:00,{u1},CRONUS,10002,200.0",
        s"C,2024-01-03 08:00:00,{u1},2024-01-03 08:00:00,{u1},CRONUS,10003,300.0")
      EtlMain.main(Array.empty)
      val wh = s"$root/warehouse"
      assert(Tables.readWarehouse(spark, wh, "customerledger").count() === 3)
      assert(new File(s"$root/state/latest.csv").exists(),
        "discovery runs commit the watermark state")
      // round 2: update B + new D
      write(s"$root/src/$folder/f2.csv", t1 + 60000,
        header,
        s"B,2024-01-02 08:00:00,{u1},2024-02-01 08:00:00,{u2},CRONUS,10002,999.0",
        s"D,2024-02-01 08:00:00,{u1},2024-02-01 08:00:00,{u1},CRONUS,10004,400.0")
      EtlMain.main(Array.empty)
      val after2 = Tables.readWarehouse(spark, wh, "customerledger")
      assert(after2.count() === 4)
      assert(after2.filter(col("systemid") === "B")
        .select("amount").collect().head.getDouble(0) === 999.0)
      // round 3: tombstone C — via an EXPLICIT folder argv; the state
      // must NOT advance (the reference's manual-backfill semantics)
      def state() = core.WatermarkStore.load(spark, s"$root/state/latest.csv")
      val stateBefore = state()
      write(s"$root/src/$folder/f3.csv", t1 + 120000,
        header,
        s"C,,$zero,,$zero,CRONUS,,")
      EtlMain.main(Array(folder))
      val after3 = Tables.readWarehouse(spark, wh, "customerledger")
      assert(after3.count() === 3)
      assert(after3.filter(col("systemid") === "C").count() === 0,
        "tombstone deletes")
      assert(state() === stateBefore,
        "explicit-folder runs skip the state commit")
      // ... so a discovery run still sees f3 as fresh and re-applies it
      // (idempotent merge), THEN commits the advanced state
      EtlMain.main(Array.empty)
      assert(Tables.readWarehouse(spark, wh, "customerledger")
        .count() === 3)
      assert(state() !== stateBefore)
      // fault isolation: a folder with an unreadable file fails ITS
      // table; the good folder still processes; the run exits non-zero
      write(s"$root/src/Broken-Table/bad.csv", t1 + 200000,
        "no_systemid_header", "x")
      write(s"$root/src/$folder/f4.csv", t1 + 200000,
        header,
        s"E,2024-03-01 08:00:00,{u1},2024-03-01 08:00:00,{u1},CRONUS,10005,500.0")
      val e = intercept[RuntimeException] { EtlMain.main(Array.empty) }
      assert(e.getMessage.contains("1 of 2 folders failed"))
      assert(Tables.readWarehouse(spark, wh, "customerledger")
        .filter(col("systemid") === "E").count() === 1,
        "the good folder processed despite the bad one")
    }
  }

  test("EtlMain GRAFT_ADAPTER=manifest drives the MVCC engine: the " +
      "3-round nightly cadence reaches the golden table, every run is " +
      "a committed version (DESCRIBE HISTORY), and time travel reads " +
      "any past night") {
    spark
    val root = Files.createTempDirectory("graft-etlmv").toString
    val folder = "Customer-Ledger"
    val header = "systemid,systemcreatedat-2000000001," +
      "systemcreatedby-2000000002,systemmodifiedat-2000000003," +
      "systemmodifiedby-2000000004,$company,No-1,Amount-3"
    val t1 = 1700000000000L
    val wh = s"$root/warehouse"
    val adapter = new graft.io.ManifestWarehouseAdapter()
    withCfg(root) {
      sys.props("GRAFT_ADAPTER") = "manifest"
      try {
        // night 1: initial full load (latest-wins dedups A's two versions)
        write(s"$root/src/$folder/f1.csv", t1,
          header,
          s"A,2024-01-01 08:00:00,{u1},2024-01-01 08:00:00,{u1},CRONUS,10000,100.5",
          s"A,2024-01-01 08:00:00,{u1},2024-01-05 09:30:00,{u1},CRONUS,10001,150.5",
          s"B,2024-01-02 08:00:00,{u1},2024-01-02 08:00:00,{u1},CRONUS,10002,200.0",
          s"C,2024-01-03 08:00:00,{u1},2024-01-03 08:00:00,{u1},CRONUS,10003,300.0")
        EtlMain.main(Array.empty)
        assert(adapter.read(spark, wh, "customerledger").count() === 3)
        // night 2: update B + new D (incremental merge through the
        // MVCC replace — no delete-then-rename window exists at all)
        write(s"$root/src/$folder/f2.csv", t1 + 60000,
          header,
          s"B,2024-01-02 08:00:00,{u1},2024-02-01 08:00:00,{u2},CRONUS,10002,999.0",
          s"D,2024-02-01 08:00:00,{u1},2024-02-01 08:00:00,{u1},CRONUS,10004,400.0")
        EtlMain.main(Array.empty)
        // night 3: tombstone C
        write(s"$root/src/$folder/f3.csv", t1 + 120000,
          header,
          s"C,,$zero,,$zero,CRONUS,,")
        EtlMain.main(Array.empty)
        val after = adapter.read(spark, wh, "customerledger")
        assert(after.count() === 3)
        assert(after.filter(col("systemid") === "C").count() === 0,
          "tombstone deletes")
        assert(after.filter(col("systemid") === "B")
          .select("amount").collect().head.getDouble(0) === 999.0)
        assert(!after.columns.contains("_graft_shard"),
          "the synthetic shard column never reaches the operator")
        // the MVCC dividend: one committed version per nightly run,
        // queryable as history and readable as-of any night
        val versions = graft.io.ManifestVersioned
          .listVersions(spark, wh, "customerledger")
        assert(versions.size === 3, "three nights = three versions")
        // registerAll wires the WHOLE warehouse into SQL in one call,
        // recovering each table's merge key from the durable
        // graft.mergeKey property the adapter recorded — so the ETL's
        // tables are immediately DML-capable, not just readable
        assert(graft.io.ManifestVersioned
          .tableProperties(spark, wh, "customerledger")
          .get("graft.mergeKey") === Some("systemid"))
        val registered = graft.plans.GraftSqlTables.registerAll(spark, wh)
        assert(registered === Seq("customerledger"))
        try {
          assert(spark.sql("DESCRIBE HISTORY customerledger").count() === 3)
          assert(spark.sql(
            "SELECT count(*) FROM customerledger").head().getLong(0) === 3L)
          // the recovered merge key makes SQL DELETE work out of the box
          spark.sql("DELETE FROM customerledger WHERE systemid = 'D'")
          assert(spark.sql(
            "SELECT count(*) FROM customerledger").head().getLong(0) === 2L)
          // night 1 still has C and B at its original amount
          val night1 = graft.io.ManifestVersioned
            .read(spark, wh, "customerledger", Some(versions.head))
          assert(night1.filter(col("systemid") === "C").count() === 1)
          assert(night1.filter(col("systemid") === "B")
            .select("amount").collect().head.getDouble(0) === 200.0)
        } finally graft.plans.GraftSqlTables
          .unregister(spark, "customerledger")
      } finally sys.props.remove("GRAFT_ADAPTER")
    }
  }

  test("EtlMain GRAFT_MODE=merge on the manifest adapter: the 3-night " +
      "cadence reaches the same golden table through O(batch) keyed " +
      "merges; merge mode on a truncate-only adapter rejects loudly") {
    spark
    val root = Files.createTempDirectory("graft-etlmerge").toString
    val folder = "Customer-Ledger"
    val header = "systemid,systemcreatedat-2000000001," +
      "systemcreatedby-2000000002,systemmodifiedat-2000000003," +
      "systemmodifiedby-2000000004,$company,No-1,Amount-3"
    val t1 = 1700000000000L
    val wh = s"$root/warehouse"
    val adapter = new graft.io.ManifestWarehouseAdapter()
    withCfg(root) {
      sys.props("GRAFT_ADAPTER") = "manifest"
      sys.props("GRAFT_MODE") = "merge"
      try {
        write(s"$root/src/$folder/f1.csv", t1,
          header,
          s"A,2024-01-01 08:00:00,{u1},2024-01-01 08:00:00,{u1},CRONUS,10000,100.5",
          s"B,2024-01-02 08:00:00,{u1},2024-01-02 08:00:00,{u1},CRONUS,10002,200.0",
          s"C,2024-01-03 08:00:00,{u1},2024-01-03 08:00:00,{u1},CRONUS,10003,300.0")
        EtlMain.main(Array.empty)
        assert(adapter.read(spark, wh, "customerledger").count() === 3)
        // the bootstrap records the key for SQL DML AND a bloom policy
        // over it (the merge locate path's pruning structure)
        assert(graft.io.ManifestVersioned
          .tableProperties(spark, wh, "customerledger")
          .get("graft.mergeKey") === Some("systemid"))
        write(s"$root/src/$folder/f2.csv", t1 + 60000,
          header,
          s"B,2024-01-02 08:00:00,{u1},2024-02-01 08:00:00,{u2},CRONUS,10002,999.0",
          s"D,2024-02-01 08:00:00,{u1},2024-02-01 08:00:00,{u1},CRONUS,10004,400.0")
        EtlMain.main(Array.empty)
        write(s"$root/src/$folder/f3.csv", t1 + 120000,
          header,
          s"C,,$zero,,$zero,CRONUS,,")
        EtlMain.main(Array.empty)
        val after = adapter.read(spark, wh, "customerledger")
        assert(after.count() === 3)
        assert(after.filter(col("systemid") === "C").count() === 0)
        assert(after.filter(col("systemid") === "B")
          .select("amount").collect().head.getDouble(0) === 999.0)
        assert(graft.io.ManifestVersioned
          .listVersions(spark, wh, "customerledger").size === 3,
          "three nights = three versions in merge mode too")
        // merge mode demands a merge-capable substrate
        sys.props("GRAFT_ADAPTER") = "parquet"
        assert(intercept[IllegalArgumentException] {
          EtlMain.main(Array.empty)
        }.getMessage.contains("GRAFT_ADAPTER=manifest"))
        sys.props("GRAFT_ADAPTER") = "manifest"
        sys.props("GRAFT_MODE") = "sideways"
        assert(intercept[IllegalArgumentException] {
          EtlMain.main(Array.empty)
        }.getMessage.contains("GRAFT_MODE"))
      } finally {
        sys.props.remove("GRAFT_ADAPTER")
        sys.props.remove("GRAFT_MODE")
      }
    }
  }

  test("EtlMain GRAFT_MODE=stream drains the 3-night fixture through " +
      "Structured Streaming and lands the batch pipeline's golden " +
      "table; the checkpoint log replaces the watermark state") {
    spark
    val root = Files.createTempDirectory("graft-etlstream").toString
    val folder = "Customer-Ledger"
    val header = "systemid,systemcreatedat-2000000001," +
      "systemcreatedby-2000000002,systemmodifiedat-2000000003," +
      "systemmodifiedby-2000000004,$company,No-1,Amount-3"
    val t1 = 1700000000000L
    def night(n: Int): Unit = n match {
      case 1 => write(s"$root/src/$folder/f1.csv", t1,
        header,
        s"A,2024-01-01 08:00:00,{u1},2024-01-01 08:00:00,{u1},CRONUS,10000,100.5",
        s"A,2024-01-01 08:00:00,{u1},2024-01-05 09:30:00,{u1},CRONUS,10001,150.5",
        s"B,2024-01-02 08:00:00,{u1},2024-01-02 08:00:00,{u1},CRONUS,10002,200.0",
        s"C,2024-01-03 08:00:00,{u1},2024-01-03 08:00:00,{u1},CRONUS,10003,300.0")
      case 2 => write(s"$root/src/$folder/f2.csv", t1 + 60000,
        header,
        s"B,2024-01-02 08:00:00,{u1},2024-02-01 08:00:00,{u2},CRONUS,10002,999.0",
        s"D,2024-02-01 08:00:00,{u1},2024-02-01 08:00:00,{u1},CRONUS,10004,400.0")
      case 3 => write(s"$root/src/$folder/f3.csv", t1 + 120000,
        header,
        s"C,,$zero,,$zero,CRONUS,,")
    }
    // the STREAM warehouse, driven through the CLI three times
    withCfg(root) {
      sys.props("GRAFT_MODE") = "stream"
      try {
        (1 to 3).foreach { n => night(n); EtlMain.main(Array.empty) }
        // the watermark state file was never written — the checkpoint
        // log IS the state (and it exists)
        assert(!new File(s"$root/state/latest.csv").exists())
        assert(new File(
          s"$root/state/latest.csv.checkpoints/customerledger").exists())
        // stream mode on a non-parquet substrate rejects loudly
        sys.props("GRAFT_ADAPTER") = "manifest"
        assert(intercept[IllegalArgumentException] {
          EtlMain.main(Array.empty)
        }.getMessage.contains("GRAFT_ADAPTER=parquet"))
      } finally {
        sys.props.remove("GRAFT_MODE")
        sys.props.remove("GRAFT_ADAPTER")
      }
    }
    // the BATCH twin on the same source, fresh warehouse
    val rootB = Files.createTempDirectory("graft-etlstreamB").toString
    val props = Map(
      "GRAFT_SOURCE_ROOT" -> s"$root/src",
      "GRAFT_WAREHOUSE_DIR" -> s"$rootB/warehouse",
      "GRAFT_STATE_PATH" -> s"$rootB/state/latest.csv")
    props.foreach { case (k, v) => sys.props(k) = v }
    try EtlMain.main(Array.empty)
    finally props.keys.foreach(sys.props.remove)
    // same golden table (extracted_at differs by wall clock — the one
    // column whose value is the processing time itself)
    def canon(wh: String): (Seq[String], Seq[String]) = {
      val df = Tables.readWarehouse(spark, wh, "customerledger")
        .drop("extracted_at")
      val cols = df.columns.sorted.toSeq
      (cols, df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq)
    }
    val (colsS, rowsS) = canon(s"$root/warehouse")
    val (colsB, rowsB) = canon(s"$rootB/warehouse")
    assert(colsS === colsB, "stream and batch schemas diverged")
    assert(rowsS === rowsB, "stream and batch golden tables diverged")
    assert(rowsS.size === 3)
    // idempotent re-run: nothing new, table unchanged
    withCfg(root) {
      sys.props("GRAFT_MODE") = "stream"
      try EtlMain.main(Array.empty)
      finally sys.props.remove("GRAFT_MODE")
    }
    assert(canon(s"$root/warehouse")._2 === rowsS)
  }

  test("EtlMain rejects missing required config loudly, naming the " +
      "variable") {
    val e = intercept[IllegalArgumentException] {
      EtlMain.main(Array.empty)
    }
    assert(e.getMessage.contains("GRAFT_SOURCE_ROOT"))
  }

  test("EtlMain GRAFT_ADAPTER=csv runs the pipeline on the CSV " +
      "substrate; an unknown adapter rejects loudly") {
    spark
    val root = Files.createTempDirectory("graft-etlcsv").toString
    withCfg(root) {
      sys.props("GRAFT_ADAPTER") = "csv"
      try {
        write(s"$root/src/Items/i1.csv", 1700000000000L,
          "systemid,systemcreatedat-2000000001," +
            "systemcreatedby-2000000002,systemmodifiedat-2000000003," +
            "systemmodifiedby-2000000004,$company,No-1,Amount-3",
          s"A,2024-01-01 08:00:00,{u1},2024-01-01 08:00:00,{u1},CRONUS,1,1.5")
        EtlMain.main(Array.empty)
        assert(graft.io.CsvWarehouseAdapter
          .read(spark, s"$root/warehouse", "items").count() === 1)
        assert(new File(s"$root/warehouse").listFiles()
          .map(_.getName).forall(_.endsWith(".csvwh")))
        sys.props("GRAFT_ADAPTER") = "bigtable"
        assert(intercept[IllegalArgumentException] {
          EtlMain.main(Array.empty)
        }.getMessage.contains("GRAFT_ADAPTER"))
      } finally sys.props.remove("GRAFT_ADAPTER")
    }
  }
}
