package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole test JVM (suites share it; `Test / fork := true`
  * gives the JVM the JDK17 add-opens flags). Mirrors the driver harness config:
  * UTC session timezone, small shuffle partition count, UI off.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
