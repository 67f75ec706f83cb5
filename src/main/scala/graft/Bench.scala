package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query on SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout.
  *
  * Timing policy (this container shows noisy-neighbor spikes — load>10
  * with no local processes — that can misreport a sub-second query by
  * 10×, and round-1's min-of-2 still let a 10-row query report 14 s):
  * each query is sampled until the two fastest samples agree within 20%
  * (then the min measures the engine, not the neighbors), with ≥3 samples
  * for normal queries, 2 for queries whose first sample exceeds 60 s
  * (spikes are multi-second, not multi-ten-second, so long queries need
  * less protection and cost the most to resample), and a hard cap of 5.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def bench(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Int) = {
      val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
      var done = false
      while (!done) {
        val t = timeOnce(fn)
        if (t < 0) return (-1.0, samples.size + 1)
        samples += t
        val sorted = samples.sorted
        val stableMin = samples.size >= 3 && sorted(1) <= sorted(0) * 1.2
        val longQuery = samples.size >= 2 && sorted(0) > 60.0
        done = stableMin || longQuery || samples.size >= 5
      }
      (samples.min, samples.size)
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val (best, n) = bench(SparkEntry.queries(name))
      (name, best, n)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ns = results.map { case (k, _, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$ns,"sf":"$sfDir","runs_policy":"adaptive: min until 2 fastest within 20%, >=3 (2 if >60s), cap 5"}""")
    spark.stop()
  }
}
