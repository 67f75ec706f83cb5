package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the training-shard export contract: partitioned layout, lossless
  * content, and shard membership invariant to input partitioning.
  */
class TrainingShardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shards partition the corpus losslessly and deterministically") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    Tables.writeTrainingShards(docs, "doc_id", dir, nShards = 4)

    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq == (0 until 4).map(i => s"shard=$i"),
      s"one directory per shard, got ${dirs.toSeq}")

    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long].collect().toSet ==
      docs.select("doc_id").as[Long].collect().toSet)

    // shard membership is a pure function of the id: a second write from
    // differently-partitioned input yields identical assignments
    val dir2 = Files.createTempDirectory("graft_shards2").toString
    Tables.writeTrainingShards(docs.repartition(13), "doc_id", dir2, nShards = 4)
    val a = spark.read.parquet(dir).select("doc_id", "shard")
      .as[(Long, Int)].collect().toSet
    val b = spark.read.parquet(dir2).select("doc_id", "shard")
      .as[(Long, Int)].collect().toSet
    assert(a == b)
  }

  test("shard manifest verifies an intact export; damage is localized and named") {
    val dir = Files.createTempDirectory("graft_shardman").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    Tables.writeTrainingShards(docs, "doc_id", dir, nShards = 4)
    val manifest = Tables.shardManifest(spark.read.parquet(dir), "doc_id")
      .localCheckpoint(true)
    assert(manifest.count() === 4L)
    // intact export verifies clean
    assert(Tables.verifyShards(spark.read.parquet(dir), "doc_id", manifest)
      .isEmpty)
    // drop one row from one shard: exactly that shard is flagged
    val damagedShard = manifest.select("shard").as[Long].head()
    val victim = spark.read.parquet(dir)
      .filter(col("shard") === damagedShard)
      .select("doc_id").as[Long].head()
    val damaged = spark.read.parquet(dir).filter(col("doc_id") =!= victim)
    val flagged = Tables.verifyShards(damaged, "doc_id", manifest)
      .select("shard").as[Long].collect().toSeq
    assert(flagged === Seq(damagedShard),
      s"only the damaged shard may be flagged: $flagged")
    // a swapped id (count preserved) is still caught by the checksums
    val swapped = spark.read.parquet(dir)
      .withColumn("doc_id",
        when(col("doc_id") === victim, lit(victim + 999999L))
          .otherwise(col("doc_id")))
    assert(Tables.verifyShards(swapped, "doc_id", manifest)
      .select("shard").as[Long].collect().toSeq === Seq(damagedShard))
  }

  test("evolved read: widened table reads whole, old rows NULL the new column") {
    val root = Files.createTempDirectory("graft_evo").toString
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val v2 = Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "s", "extra")
    v1.write.mode("append").parquet(s"$root/t")
    v2.write.mode("append").parquet(s"$root/t")
    val evolved = Tables.readWarehouseEvolved(spark, root, "t")
    assert(evolved.columns.toSet === Set("id", "s", "extra"))
    val rows = evolved.select("id", "extra").as[(Long, Option[Long])]
      .collect().toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))
  }
}
