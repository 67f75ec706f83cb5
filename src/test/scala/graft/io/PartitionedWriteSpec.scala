package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PartitionedWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned overwrite prunes partitions on read and rewrites only touched partitions") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val v1 = Seq(
      ("A", 1L, 10.0), ("A", 2L, 20.0),
      ("B", 3L, 30.0), ("C", 4L, 40.0))
      .toDF("region", "id", "amount")
    Tables.writeWarehousePartitioned(v1, wh, "sales", Seq("region"))

    // read-side: a filter on the partition column must prune, not scan-all
    val pruned = Tables.readWarehouse(spark, wh, "sales").filter($"region" === "B")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("region"), s"expected partition pruning in:\n$planStr")
    assert(pruned.select("id").as[Long].collect().toSeq === Seq(3L))

    // dynamic overwrite: rewriting only region A must leave B and C intact
    val v2 = Seq(("A", 9L, 90.0)).toDF("region", "id", "amount")
    Tables.writeWarehousePartitioned(v2, wh, "sales", Seq("region"))
    val after = Tables.readWarehouse(spark, wh, "sales")
      .select("region", "id").as[(String, Long)].collect().toSet
    assert(after === Set(("A", 9L), ("B", 3L), ("C", 4L)))
  }
}
