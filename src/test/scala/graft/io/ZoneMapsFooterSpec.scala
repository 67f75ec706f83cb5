package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the r13 footer-based stats collection
  * ([[ZoneMaps.fileStatsFromFooters]]) to the aggregation path it
  * replaced ([[ZoneMaps.collectFileStats]]): on a staged delta covering
  * every supported type — including the adversarial values (NaN, nulls,
  * all-null columns, non-BMP strings, negative timestamps) — both
  * collectors must record the same per-file ranges, row counts and null
  * counts for every column the footer path records, and the footer path
  * must record every column whose honesty rules allow it.
  */
class ZoneMapsFooterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("footer-derived file stats equal the aggregation-derived stats") {
    val dir = Files.createTempDirectory("graft-zmf").toString
    val stage = new Path(s"$dir/._stage.test")
    val df = Seq(
      (1L, "pA", 10, 1.5, "alpha", true,
        java.sql.Date.valueOf("2024-01-02"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")),
      (2L, "pA", -3, Double.NaN, "Ωmega", false,
        java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.0")),
      (3L, "pB", 7, -0.0, "😀 nonbmp", true,
        java.sql.Date.valueOf("2024-06-01"),
        java.sql.Timestamp.valueOf("2030-05-06 07:08:09.0")),
      (4L, "pB", 0, 2.25, null.asInstanceOf[String], false,
        null.asInstanceOf[java.sql.Date],
        java.sql.Timestamp.valueOf("2030-05-06 07:08:09.0")))
      .toDF("id", "__pv", "i", "d", "s", "b", "dt", "ts")
      .withColumn("allnull", lit(null).cast("string"))
    // mirror stagePartitions' staged-write conf: the manifest layer stamps
    // timestamps as INT64 micros (INT96 carries no usable chunk stats)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.write.mode("overwrite").partitionBy("__pv").parquet(stage.toString)
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")

    val fields = df.schema.fields.filterNot(_.name == "__pv").toSeq
    val fromAgg = ZoneMaps.collectFileStats(
      spark.read.parquet(stage.toString), "__pv", fields)
    val fromFooters = ZoneMaps.fileStatsFromFooters(spark, stage, fields)

    assert(fromFooters.keySet === fromAgg.keySet) // same partitions
    for (key <- fromAgg.keySet) {
      val aggFiles = fromAgg(key).map(f => f._1 -> ((f._2, f._3))).toMap
      val ftrFiles = fromFooters(key).map(f => f._1 -> ((f._2, f._3))).toMap
      assert(ftrFiles.keySet === aggFiles.keySet, s"files of $key")
      for ((file, (fstats, frows)) <- ftrFiles) {
        val (astats, arows) = aggFiles(file)
        assert(frows === arows, s"$key/$file row count")
        // every column the footer path records must match the agg path:
        // token-identical except numeric bounds, which compare by VALUE —
        // parquet normalizes zero bounds to (-0.0, +0.0) (wider, sound,
        // and ordering-equivalent under the BigDecimal compare the prune
        // layer uses)
        def boundEq(c: String, a: Option[String], b: Option[String]): Boolean =
          (a, b) match {
            case (None, None) => true
            case (Some(x), Some(y)) =>
              x == y || (fields.find(_.name == c).exists(
                _.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
                && (try BigDecimal(x) == BigDecimal(y)
                    catch { case _: NumberFormatException => false }))
            case _ => false
          }
        for ((c, fr) <- fstats) {
          val ar = astats.get(c)
          assert(ar.exists(a => boundEq(c, fr.lo, a.lo) &&
            boundEq(c, fr.hi, a.hi) && fr.nulls == a.nulls),
            s"$key/$file column $c: footer=$fr agg=$ar")
        }
        // and the footer path must not silently lose columns the agg
        // path records — EXCEPT columns whose agg bounds are themselves
        // unorderable (NaN): the footer path conservatively drops those
        // (absent = keep), the agg path records a bound that never
        // prunes; both are sound, neither ever prunes on them
        val unprunable = astats.filter { case (_, r) =>
          r.lo.contains("NaN") || r.hi.contains("NaN") }.keySet
        assert(fstats.keySet === astats.keySet -- unprunable ||
          fstats.keySet === astats.keySet,
          s"$key/$file column set: footer=${fstats.keySet} agg=${astats.keySet}")
      }
    }
    // sanity: the adversarial columns actually exercised the edge cases
    val all = fromAgg.values.flatten.flatMap(_._2).toMap
    assert(all.contains("d") && all.contains("s") && all.contains("allnull"))
  }
}
