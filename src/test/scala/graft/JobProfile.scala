package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: `sbt "Test/runMain graft.JobProfile <sfDir> q1 [q2 ...]"`
  * runs each declared query (setup then fn, timed separately, same split as
  * [[Bench]]) with a listener attached, and prints per-phase
  *   - wall seconds,
  *   - Spark JOB count (each job carries fixed scheduler/commit overhead —
  *     on tiny bench inputs the job COUNT is often the cost, guide §1),
  *   - summed executor task time (the actual compute), and
  *   - the top stages by duration with their callsite,
  * so a slow query attributes to "too many jobs" vs "one expensive stage"
  * before any code is touched.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var taskMs = 0L
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Int)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        taskMs += info.taskMetrics.executorRunTime
        val dur = (for (a <- info.completionTime; b <- info.submissionTime)
          yield a - b).getOrElse(0L)
        stages += ((info.name.linesIterator.next(), dur, info.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def phase(label: String)(body: => Unit): Unit = {
      // listener delivery is async with no public drain API: a short sleep
      // bounds the cross-phase bleed well enough for attribution
      Thread.sleep(300)
      jobs = 0; taskMs = 0L; stages.clear()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROF $label%-34s wall=$wall%7.2fs jobs=$jobs%4d taskTime=${taskMs / 1000.0}%8.2fs")
      stages.sortBy(-_._2).take(8).foreach { case (n, d, t) =>
        println(f"      stage ${d / 1000.0}%7.2fs tasks=$t%4d  $n")
      }
    }

    names.foreach { name =>
      val q = SparkEntry.declared(name)
      q.setup.foreach(st => phase(s"$name [setup]") { st(spark, sfDir) })
      phase(s"$name [query]") { q.fn(spark, sfDir).count() }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
