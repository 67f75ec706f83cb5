package graft.io

/** One-off instrument check for the crash-point sweep: counts the
  * gated mutations each verb performs, so the sweep's "swept N points"
  * numbers can be sanity-checked against the substrate's actual
  * protocol (a bypassing write path would silently shrink the sweep).
  * Run: sbt "Test/runMain graft.io.FaultProbe"
  */
object FaultProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration.setClass(
      "fs.fault.impl", classOf[FaultFs], classOf[org.apache.hadoop.fs.FileSystem])
    val w = "fault:/tmp/graft-faultprobe"
    val fs = new org.apache.hadoop.fs.Path(w)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(w), true)
    def df3 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
    def count(label: String)(f: => Unit): Unit = {
      FaultFs.arm(Long.MaxValue - 1) // count without tripping
      f
      println(s"PROBE $label ops=${FaultFs.ops.get}")
      FaultFs.disarm()
    }
    FaultFs.trace = args.contains("trace")
    count("parquet overwrite-new")(
      ParquetWarehouseAdapter.overwrite(df3, w, "pq"))
    count("parquet append")(
      ParquetWarehouseAdapter.append(df3.withColumn("k",
        org.apache.spark.sql.functions.col("k") + 10), w, "pq"))
    FaultFs.trace = false
    count("csv overwrite-new")(
      CsvWarehouseAdapter.overwrite(df3, w, "cs"))
    val mv = new ManifestWarehouseAdapter(shards = 2)
    count("manifest overwrite-new")(mv.overwrite(df3, w, "mv"))
    count("manifest append")(mv.append(df3.withColumn("k",
      org.apache.spark.sql.functions.col("k") + 10), w, "mv"))
    spark.stop()
  }
}
