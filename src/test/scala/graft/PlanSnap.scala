package graft
import org.apache.spark.sql.SparkSession
/** Dump .explain("formatted") for named declared queries to files:
  * Test/runMain graft.PlanSnap <sfDir> <outDir> <tag> q1 q2 ...
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, rest @ _*) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    rest.foreach { name =>
      try {
        val q = SparkEntry.declared(name)
        q.setup.foreach(st => st(spark, sfDir))
        val df = q.fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"PLAN OK $name")
      } catch { case e: Throwable =>
        println(s"PLAN FAIL $name: ${e.getMessage}")
      } finally spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
