package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forensic timing main for the stored-CDC join queries (the top-2
  * most expensive bench entries): splits `q_join_stored_cdc` /
  * `q_join_cdc_asof` into their components — base-state setup, the two
  * in-query CDC ingests (signed-multiplicity state appends), and the
  * serve reads — so PLANS.md's cost attribution is measured, not
  * asserted. Run:
  *
  *   sbt "Test/runMain graft.CdcJoinSplit [sfDir]"
  */
object CdcJoinSplit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.IncrementalJoin
    import graft.io.Tables
    def t(name: String) = Tables.testTable(spark, dir, name)
    def jo(i: Int) = t("orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        col("o_totalprice"))
      .filter(col("o_orderkey") % 3 === i)
    def jc(i: Int) = t("customer")
      .select(col("c_custkey").as("custkey"), col("c_name"),
        col("c_mktsegment"))
      .filter(col("custkey") % 2 === i)
    val wh = "/tmp/graft_cdcsplit_wh"
    val nm = "cdcsplit"
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SPLIT $label%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    tm("setup_base")(IncrementalJoin.createStoredCounted(
      spark, wh, nm, jo(0), jc(0), "custkey", 4))
    val orders = t("orders").select(col("o_custkey").as("custkey"),
      col("o_orderkey"), col("o_totalprice"))
    val cust = t("customer").select(col("c_custkey").as("custkey"),
      col("c_name"), col("c_mktsegment"))
    val delOrders = IncrementalJoin.deletes(orders.filter(
      col("o_orderkey") % 3 =!= 2 && col("o_orderkey") % 5 === 0))
    val delCust = IncrementalJoin.deletes(cust.filter(
      col("custkey") % 7 === 0))
    tm("ingest_n2")(IncrementalJoin.appendStoredCounted(spark, wh, nm,
      IncrementalJoin.inserts(jo(1)), IncrementalJoin.inserts(jc(1)),
      "custkey", batchTag = "n2"))
    tm("ingest_n3")(IncrementalJoin.appendStoredCounted(spark, wh, nm,
      IncrementalJoin.inserts(jo(2)).unionByName(delOrders), delCust,
      "custkey", batchTag = "n3"))
    tm("read_counted")(IncrementalJoin.readStoredCounted(spark, nm).count())
    tm("read_asof_n2")(IncrementalJoin
      .readStoredCountedAsOf(spark, nm, Seq("base", "n2")).count())
    // second samples (state warm in the OS cache, plans fresh)
    tm("read_counted2")(IncrementalJoin.readStoredCounted(spark, nm).count())
    tm("read_asof_n2b")(IncrementalJoin
      .readStoredCountedAsOf(spark, nm, Seq("base", "n2")).count())
    println("=== ASOF EXECUTED PLAN (head) ===")
    println(IncrementalJoin.readStoredCountedAsOf(spark, nm,
        Seq("base", "n2")).queryExecution.executedPlan.toString
      .linesIterator.take(24).mkString("\n"))
    spark.stop()
  }
}
