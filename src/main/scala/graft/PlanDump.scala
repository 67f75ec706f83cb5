package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val picks = Seq(
      "q_scan_project" -> "filter + projection pushdown into the parquet scan",
      "q_star_revenue" -> "star join: every dimension broadcast, fact table never shuffles before the aggregation",
      "q_merge_full" -> "flagship merge: aligned union -> null-safe anti join -> single-shuffle window dedup",
      "q_minhash_lsh" -> "MinHash+LSH: signature agg + band bucket join, no all-pairs stage",
      "q_range_join" -> "bucketized range join plans as a hash join on (key, bucket) with the range predicate residual",
      "q_embed_neardup" -> "IVF-blocked near-dup: k-means fanout is a constant-key BroadcastHashJoin, candidates equi-join on centroid_id, vec_dot verify — no BroadcastNestedLoopJoin/Cross anywhere",
      "q_ann_ivf_trained" -> "trained-centroid IVF: Lloyd's iterations as max_by argmax + posexplode mean aggs, search joins on centroid_id")
    val sb = new StringBuilder
    sb.append("# Physical plans (sf0.001, local[8]) — evidence the declared queries plan the way the scale notes claim\n")
    sb.append("\nRegenerate: `sbt \"runMain graft.PlanDump\"`. See SURVEY.md §8 for the full operator inventory.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.count() // force AQE final plan
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    spark.stop()
  }
}
