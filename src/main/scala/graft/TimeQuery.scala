package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: `runMain graft.TimeQuery <sfDir> q1 [q2 ...]`
  * times each named declared query in isolation (fresh run, shared session)
  * and prints seconds + row count; `-explain` additionally dumps the
  * formatted physical plan.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-explain")
    val rest = args.filterNot(_ == "-explain")
    val sfDir = rest.head
    val names = rest.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name%-24s $sec%8.2f s  $n%10d rows")
    }
    spark.stop()
  }
}
