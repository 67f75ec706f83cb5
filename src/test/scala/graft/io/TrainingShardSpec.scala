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
}
