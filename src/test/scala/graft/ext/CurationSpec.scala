package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Curation contracts: decontamination drops exactly the n-gram-sharing
  * docs; packing bins respect the capacity relaxation and are stable
  * under repartitioning.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate drops docs sharing any n-gram with the benchmark") {
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",   // shares 8-gram with bench
      2L -> "completely unrelated content with zero benchmark overlap here",
      3L -> "prefix words then the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    val bench = Seq(
      100L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    val kept = Curation.decontaminate(corpus, bench, $"text", "doc_id", n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L), "docs 1 and 3 share the benchmark 8-gram")
  }

  test("short benchmark docs (< n tokens) contaminate via whole-doc shingle only") {
    val corpus = Seq(1L -> "tiny doc", 2L -> "other words").toDF("doc_id", "text")
    val bench = Seq(100L -> "tiny doc").toDF("doc_id", "text")
    val kept = Curation.decontaminate(corpus, bench, $"text", "doc_id", n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L))
  }

  test("rareTokenProfile counts corpus-rare occurrences exactly") {
    // corpus frequencies: "common" ×4, "shared" ×2, each other token ×1
    val df = Seq(
      1L -> "common shared unique1 unique2",
      2L -> "common shared",
      3L -> "common common gibberish1 gibberish2 gibberish3")
      .toDF("doc_id", "text")
    val got = Curation.rareTokenProfile(df, "text", "doc_id", rareBelow = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // rareBelow=2 → rare means corpus freq 1 (the unique/gibberish tokens)
    assert(got(1L) === ((4L, 2L, 4L + 2L + 1L + 1L, 0.5)))
    assert(got(2L) === ((2L, 0L, 4L + 2L, 0.0)))
    assert(got(3L) === ((5L, 3L, 4L + 4L + 1L + 1L + 1L, 0.6)))
    // partition-layout invariance (vocab counts are global, not per-task)
    val re = Curation.rareTokenProfile(df.repartition(7), "text", "doc_id", 2L)
      .collect().map(_.toSeq).toSet
    assert(re === Curation.rareTokenProfile(df, "text", "doc_id", 2L)
      .collect().map(_.toSeq).toSet)
  }

  test("packSequences: bins respect capacity + one-row overshoot; assignment exact") {
    val rows = (1L to 100L).map(i => (i, 40 + (i % 7).toInt * 10))
      .toDF("doc_id", "n_tokens")
    val packed = Curation.packSequences(rows, "doc_id", Seq($"doc_id"),
        "n_tokens", capacity = 128, nShards = 4)
      .select("doc_id", "shard", "n_tokens", "bin_id")
      .as[(Long, Long, Int, Long)].collect()
    // replay the prefix-sum definition per shard
    packed.groupBy(_._2).foreach { case (_, g) =>
      var prior = 0L
      g.sortBy(_._1).foreach { case (id, _, n, bin) =>
        assert(bin === prior / 128, s"doc $id")
        prior += n
      }
    }
    // capacity relaxation: tokens in a bin ≤ capacity + max single row
    val maxRow = packed.map(_._3).max
    packed.groupBy(p => (p._2, p._4)).foreach { case ((sh, bin), g) =>
      val tot = g.map(_._3.toLong).sum
      assert(tot <= 128L + maxRow, s"shard $sh bin $bin holds $tot tokens")
    }
  }

  test("packSequences is invariant to input partitioning") {
    val rows = (1L to 60L).map(i => (i, 30 + (i % 5).toInt * 7))
      .toDF("doc_id", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.packSequences(df, "doc_id", Seq($"doc_id"), "n_tokens", 100, 4)
        .select("doc_id", "shard", "bin_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(rows.repartition(1)) === run(rows.repartition(7, $"n_tokens")))
  }

  test("qualityGate keeps ~the top fraction per group, high scores whole") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    val n = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.qualityGate(docs, "text", "doc_id", "lang", 3L, 5L)
    val keptN = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (lang, total) =>
      val quota = total * 3 / 5
      val got = keptN.getOrElse(lang, 0L)
      // whole-score tiers are exact; only the boundary tier is a lottery,
      // so the kept count sits within that tier's binomial noise of quota
      assert(got <= total, s"$lang overflow")
      assert(math.abs(got - quota) <= math.max(6L, quota / 3),
        s"$lang kept $got of $total (quota $quota)")
    }
    // no kept row may score below a dropped row of the same group
    val scored = Curation.qualityGate(docs, "text", "doc_id", "lang", 3L, 5L)
      .select("doc_id", "lang", "quality_score")
      .as[(Long, String, Int)].collect()
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = Curation.qualityGate(dropped, "text", "doc_id", "lang", 1L, 1L)
      .select("lang", "quality_score").as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    scored.groupBy(_._2).foreach { case (lang, g) =>
      maxDropped.get(lang).foreach { md =>
        assert(g.map(_._3).min >= md,
          s"$lang kept a score ${g.map(_._3).min} below dropped tier $md")
      }
    }
  }

  test("qualityGate is invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.qualityGate(df, "text", "doc_id", "lang", 1L, 2L)
        .select("doc_id").as[Long].collect().toSet
    assert(run(docs.repartition(1)) === run(docs.repartition(13)))
  }

  test("full export path: curate -> split -> shard is lossless and reproducible") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    def curated = {
      val gated = Curation.qualityGate(
        Dedup.exactDedup(docs, $"text", "doc_id"),
        "text", "doc_id", "lang", 3L, 5L).select("doc_id", "lang", "text")
      Sampling.splitAssign(gated, "doc_id",
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    graft.io.Tables.writeTrainingShards(
      curated.filter($"split" === "train"), "doc_id", dir, nShards = 4)
    val back = spark.read.parquet(dir)
    val expected = curated.filter($"split" === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(back.select("doc_id").as[Long].collect().toSet === expected)
    assert(expected.nonEmpty)
    // a second run writes the identical shard membership
    val dir2 = java.nio.file.Files.createTempDirectory("graft_export2").toString
    graft.io.Tables.writeTrainingShards(
      curated.filter($"split" === "train").repartition(7), "doc_id", dir2, 4)
    assert(
      spark.read.parquet(dir).select("doc_id", "shard").as[(Long, Int)].collect().toSet
        === spark.read.parquet(dir2).select("doc_id", "shard").as[(Long, Int)].collect().toSet)
  }

  test("domainCap keeps at most K per domain, deterministically and partition-invariantly") {
    val docs = (1L to 40L).map(i => (i, s"dom${i % 3}")).toDF("doc_id", "source")
    val capped = Curation.domainCap(docs, "source", "doc_id", 5)
      .as[(Long, String)].collect().toSet
    val perDomain = capped.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perDomain.values.forall(_ === 5), s"each domain capped at 5: $perDomain")
    val again = Curation.domainCap(docs.repartition(7), "source", "doc_id", 5)
      .as[(Long, String)].collect().toSet
    assert(again === capped)
    // a generous cap passes everything through
    assert(Curation.domainCap(docs, "source", "doc_id", 100).count() === 40)
  }

  test("importanceWeights rank target-like documents above off-distribution ones") {
    val target = Seq(
      (100L, "the cat sat on the mat with the hat"),
      (101L, "a cat and a hat on a mat"),
      (102L, "the hat sat on the cat")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the cat sat on the mat"),             // target-like
      (2L, "zzz qqq xxx www vvv uuu"),            // off-distribution
      (3L, "the cat sat on the mat"))             // identical to 1
      .toDF("doc_id", "text")
    val w = Curation.importanceWeights(raw, target, col("text"), "doc_id", 64)
      .as[(Long, Long)].collect().toMap
    assert(w(1L) > w(2L), s"target-like must outrank junk: $w")
    assert(w(1L) === w(3L), "identical docs must weigh identically")
    // partition-invariance: the weights are pure relational arithmetic
    val w2 = Curation.importanceWeights(raw.repartition(5), target.repartition(3),
        col("text"), "doc_id", 64)
      .as[(Long, Long)].collect().toMap
    assert(w2 === w)
  }
}
