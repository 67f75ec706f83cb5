package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan prober for ITERATION-INTERNAL shapes that no declared
  * query's final plan exposes (eager localCheckpoint rounds swallow
  * their own plans): `runMain graft.PlanProbe <probe>` prints the
  * formatted physical plan of one representative round. Used to source
  * PLANS.md evidence; not part of the driver contract.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    args.headOption.getOrElse("cc_round") match {
      case "cc_round" =>
        // one fixpoint round of Dedup.connectedComponents, exactly as
        // built in the loop: edges cached, labels checkpointed
        val edges = (1L to 1000L).map(i => (i, i + 1)).toDF("src", "dst")
          .cache()
        val labels = edges.select(col("src").as("id")).distinct()
          .withColumn("comp", col("id"))
          .localCheckpoint(true)
        val prop = edges
          .join(labels.withColumnRenamed("id", "dst"), "dst")
          .select(col("src").as("id"), col("comp"))
          .unionAll(labels)
          .groupBy("id").agg(min("comp").as("comp"))
        println("=== propagate step ===")
        prop.explain("formatted")
        val propC = prop.localCheckpoint(true)
        val next = propC
          .join(propC.select(col("id").as("comp"), col("comp").as("__c2")),
            Seq("comp"), "left")
          .select(col("id"), coalesce(col("__c2"), col("comp")).as("comp"))
        println("=== pointer-double step ===")
        next.explain("formatted")
      case other =>
        System.err.println(s"unknown probe: $other")
    }
    spark.stop()
  }
}
