package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Tables

/** Pins [[IncrementalJoin]]'s two contracts:
  *  - maintained state ≡ from-scratch join after any append chain
  *    (including empty and one-sided deltas);
  *  - the delta terms read the stored side as co-located buckets (no
  *    state-side Exchange) and the materialized output stays bucketed
  *    through appends.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lBatch(i: Int) =
    (1L to 60L).filter(_ % 3 == i).map(k => (k % 11, k, s"l$k"))
      .toDF("k", "lid", "lval")
  private def rBatch(i: Int) =
    (0L until 11L).filter(_ % 2 == i).map(k => (k, s"r$k"))
      .toDF("k", "rval")

  private def dropAll(name: String): Unit =
    for (s <- Seq("left", "right", "out", "applied"))
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s")

  test("append chain ≡ from-scratch join, incl. empty and one-sided deltas") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijchain"
    dropAll(name)
    try {
      IncrementalJoin.createStored(spark, wh, name, lBatch(0), rBatch(0), "k", 4)
      IncrementalJoin.appendStored(spark, wh, name, lBatch(1), rBatch(1), "k")
      IncrementalJoin.appendStored(spark, wh, name, lBatch(2), rBatch(0).limit(0), "k")
      IncrementalJoin.appendStored(spark, wh, name,
        lBatch(0).limit(0), rBatch(1).limit(0), "k") // full no-op

      val got = IncrementalJoin.readStored(spark, name)
        .as[(Long, Long, String, String)].collect().toSet
      val allL = lBatch(0).unionByName(lBatch(1)).unionByName(lBatch(2))
      val allR = rBatch(0).unionByName(rBatch(1))
      val want = allL.join(allR, Seq("k"))
        .as[(Long, Long, String, String)].collect().toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally dropAll(name)
  }

  test("delta join reads the stored side bucketed — Exchange only on the delta") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijplan"
    dropAll(name)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      IncrementalJoin.createStored(spark, wh, name, lBatch(0), rBatch(0), "k", 4)
      val r0 = Tables.readWarehouseBucketed(spark, s"${name}_right")
      val deltaTerm = lBatch(1).join(r0, Seq("k"))
      deltaTerm.count()
      val plan = deltaTerm.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"stored side must scan as buckets:\n$plan")
      assert("Exchange".r.findAllIn(plan).size <= 1,
        s"only the delta side may shuffle:\n$plan")

      // the materialized output keeps its bucket layout through appends
      IncrementalJoin.appendStored(spark, wh, name, lBatch(1), rBatch(1), "k")
      val agg = IncrementalJoin.readStored(spark, name)
        .groupBy("k").agg(count(lit(1)).as("n"))
      agg.count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed output must aggregate on the key without a shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      dropAll(name)
    }
  }

  test("schema-drifted deltas are rejected at the gate; align=true coerces") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijdrift"
    dropAll(name)
    try {
      IncrementalJoin.createStored(spark, wh, name, lBatch(0), rBatch(0), "k", 4)
      // k=2 exists in rBatch(0) so the coerced append yields a join row
      val drifted = Seq((2L, 7L, 1)).toDF("k", "lid", "lval") // lval retyped
      val e = intercept[IllegalArgumentException] {
        IncrementalJoin.appendStored(spark, wh, name, drifted,
          rBatch(0).limit(0), "k")
      }
      assert(e.getMessage.contains(s"${name}_left"))
      assert(e.getMessage.contains("lval"))
      // opt-in coercion: the int casts to the stored string type
      IncrementalJoin.appendStored(spark, wh, name, drifted,
        rBatch(0).limit(0), "k", align = true)
      assert(IncrementalJoin.readStored(spark, name)
        .filter($"lid" === 7L).count() === 1)
    } finally dropAll(name)
  }

  test("counted chain with retractions ≡ from-scratch join of the survivors") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijcnt"
    dropAll(name)
    try {
      IncrementalJoin.createStoredCounted(spark, wh, name,
        lBatch(0), rBatch(0), "k", 4)
      IncrementalJoin.appendStoredCounted(spark, wh, name,
        IncrementalJoin.inserts(lBatch(1)), IncrementalJoin.inserts(rBatch(1)),
        "k", batchTag = "n2")
      // night 3: insert the last left batch, delete earlier rows on BOTH
      // sides in the same batch (incl. a customer whose orders stay)
      val delL = IncrementalJoin.deletes(
        lBatch(0).filter($"lid" % 2 === 0))
      val delR = IncrementalJoin.deletes(rBatch(0).filter($"k" === 4L))
      IncrementalJoin.appendStoredCounted(spark, wh, name,
        IncrementalJoin.inserts(lBatch(2)).unionByName(delL), delR, "k",
        batchTag = "n3")

      def view(): Set[(Long, Long, String, String)] =
        IncrementalJoin.readStoredCounted(spark, name)
          .as[(Long, Long, String, String)].collect().toSet
      val got = view()
      val allL = lBatch(0).filter(!($"lid" % 2 === 0))
        .unionByName(lBatch(1)).unionByName(lBatch(2))
      val allR = rBatch(0).filter($"k" =!= 4L).unionByName(rBatch(1))
      val want = allL.join(allR, Seq("k"))
        .as[(Long, Long, String, String)].collect().toSet
      assert(got === want)
      assert(got.nonEmpty)

      // FULL replay of a completed batch: the phase ledger short-circuits
      IncrementalJoin.appendStoredCounted(spark, wh, name,
        IncrementalJoin.inserts(lBatch(2)).unionByName(delL), delR, "k",
        batchTag = "n3")
      assert(view() === want, "replayed completed batch must be a no-op")

      // TIME TRAVEL: as of n2 the view is the pre-delete join — n3's
      // inserts absent, n3's deletes not yet cancelling
      val asN2 = IncrementalJoin.readStoredCountedAsOf(spark, name,
          Seq("base", "n2"))
        .as[(Long, Long, String, String)].collect().toSet
      val wantN2 = lBatch(0).unionByName(lBatch(1))
        .join(rBatch(0).unionByName(rBatch(1)), Seq("k"))
        .as[(Long, Long, String, String)].collect().toSet
      assert(asN2 === wantN2)
      assert(asN2 !== want, "the deletes must be visible only after n3")
      // full-history as-of ≡ the serving read
      assert(IncrementalJoin.readStoredCountedAsOf(spark, name,
          Seq("base", "n2", "n3"))
        .as[(Long, Long, String, String)].collect().toSet === want)
    } finally dropAll(name)
  }

  test("counted append crash-window replay: duplicated contribution rows collapse at read") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijcrash"
    dropAll(name)
    try {
      IncrementalJoin.createStoredCounted(spark, wh, name,
        lBatch(0), rBatch(0), "k", 4)
      val want = IncrementalJoin.readStoredCounted(spark, name).count()
      // crashed first attempt: the out phase's rows landed but nothing was
      // ledgered — emulate by hand-appending the exact delta the phase
      // would write (tag n2, pre-folded), then run the full append
      val dl = IncrementalJoin.inserts(lBatch(1))
      val r0 = Tables.readWarehouseBucketed(spark, s"${name}_right")
      val out0 = Tables.readWarehouseBucketed(spark, s"${name}_out")
      val half = dl.withColumnRenamed(IncrementalJoin.MultCol, "__ml")
        .join(r0.drop(IncrementalJoin.BatchCol)
          .withColumnRenamed(IncrementalJoin.MultCol, "__mr"), Seq("k"))
        .withColumn(IncrementalJoin.MultCol, $"__ml" * $"__mr")
        .drop("__ml", "__mr")
        .withColumn(IncrementalJoin.BatchCol, lit("n2"))
        .selectExpr(out0.columns.map(c => s"`$c`"): _*)
      half.write.mode("append").insertInto(s"${name}_out")
      spark.catalog.refreshTable(s"${name}_out")

      IncrementalJoin.appendStoredCounted(spark, wh, name, dl,
        IncrementalJoin.inserts(rBatch(0).limit(0)), "k", batchTag = "n2")
      val got = IncrementalJoin.readStoredCounted(spark, name)
        .as[(Long, Long, String, String)].collect().toSet
      val expect = lBatch(0).unionByName(lBatch(1)).join(rBatch(0), Seq("k"))
        .as[(Long, Long, String, String)].collect().toSet
      assert(got === expect,
        "the crashed attempt's duplicate (batch, row, mult) copies must collapse")
      assert(got.size > want, "the batch's rows must still land exactly once")
    } finally dropAll(name)
  }

  test("counted state keeps exact MULTISET semantics (duplicate rows, partial delete)") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijmulti"
    dropAll(name)
    try {
      val l = Seq((1L, 10L, "a")).toDF("k", "lid", "lval")
      val r = Seq((1L, "x")).toDF("k", "rval")
      IncrementalJoin.createStoredCounted(spark, wh, name, l, r, "k", 2)
      // insert the SAME left row twice more, then delete one copy
      IncrementalJoin.appendStoredCounted(spark, wh, name,
        IncrementalJoin.inserts(l.unionByName(l)),
        IncrementalJoin.inserts(r.limit(0)), "k", batchTag = "n2")
      IncrementalJoin.appendStoredCounted(spark, wh, name,
        IncrementalJoin.deletes(l), IncrementalJoin.inserts(r.limit(0)), "k",
        batchTag = "n3")
      val rows = IncrementalJoin.readStoredCounted(spark, name)
        .as[(Long, Long, String, String)].collect().toSeq
      assert(rows.size === 2, "3 inserted copies - 1 delete = 2 surviving copies")
      assert(rows.toSet === Set((1L, 10L, "a", "x")))
    } finally dropAll(name)
  }

  test("counted fold aggregates on the bucket layout — no Exchange in the view read") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijfold"
    dropAll(name)
    try {
      IncrementalJoin.createStoredCounted(spark, wh, name,
        lBatch(0), rBatch(0), "k", 4)
      val view = IncrementalJoin.readStoredCounted(spark, name)
      view.count()
      val plan = view.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"grouping keys contain the bucket key — the fold must not shuffle:\n$plan")
    } finally dropAll(name)
  }

  test("compaction folds cancelled pairs away without changing the view") {
    val wh = Files.createTempDirectory("graft-ij").toString
    val name = "ijcompact"
    dropAll(name)
    try {
      IncrementalJoin.createStoredCounted(spark, wh, name,
        lBatch(0), rBatch(0), "k", 4)
      IncrementalJoin.appendStoredCounted(spark, wh, name,
        IncrementalJoin.deletes(lBatch(0).filter($"lid" % 2 === 0)),
        IncrementalJoin.inserts(rBatch(0).limit(0)), "k", batchTag = "n2")
      val before = IncrementalJoin.readStoredCounted(spark, name)
        .as[(Long, Long, String, String)].collect().toSet
      val rawBefore = Tables.readWarehouseBucketed(spark, s"${name}_out").count()
      IncrementalJoin.compactStoredCounted(spark, wh, name, "k", 4)
      val after = IncrementalJoin.readStoredCounted(spark, name)
        .as[(Long, Long, String, String)].collect().toSet
      val rawAfter = Tables.readWarehouseBucketed(spark, s"${name}_out").count()
      assert(after === before, "compaction is a pure representation change")
      assert(rawAfter < rawBefore, "cancelled contribution pairs must be dropped")
    } finally dropAll(name)
  }
}
