package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE vocabulary induction: merge order vs a hand-computed reference,
  * canonical run merging (the wrapped-symbol representation), early stop,
  * and subword counting under the learned vocabulary.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainMerges reproduces the hand-computed merge sequence") {
    // corpus word frequencies: low ×5, lower ×2, newest ×6, widest ×3
    val docs = Seq(
      1L -> (("low " * 5) + ("lower " * 2)).trim,
      2L -> (("newest " * 6) + ("widest " * 3)).trim)
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", iters = 4)
      .orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // Hand computation (weighted pair counts, ties → (lhs, rhs) asc):
    //  iter1: (e,s)=9 (newest+widest), (s,t)=9, (l,o)=7, (o,w)=7, (e,w)=6 …
    //         tie (e,s)/(s,t) → 'e'<'s' ⇒ merge (e,s)
    //  iter2: (es,t)=9 wins
    //  iter3: (l,o)=7, (o,w)=7 tie → (l,o)
    //  iter4: (lo,w)=7 wins
    assert(merges(0) === ((1, "e", "s", 9L)))
    assert(merges(1) === ((2, "es", "t", 9L)))
    assert(merges(2) === ((3, "l", "o", 7L)))
    assert(merges(3) === ((4, "lo", "w", 7L)))
  }

  test("merge application is canonical on runs: 'aaaa' collapses to [aa, aa] in ONE merge step") {
    val docs = Seq(1L -> "aaaa aaaa").toDF("doc_id", "text")
    val (merges, words) = Bpe.train(docs, "text", iters = 1)
    assert(merges.collect().map(r => (r.getString(1), r.getString(2))).toSeq ===
      Seq(("a", "a")))
    val syms = words.filter($"word" === "aaaa").select("syms").as[String].head()
    assert(syms === " aa  aa ",
      "both adjacent (a,a) occurrences must merge in a single pass — " +
        "a shared-delimiter representation would leave ' aa  a  a '")
  }

  test("training stops early when no pair repeats") {
    val docs = Seq(1L -> "ab cd ef").toDF("doc_id", "text") // every pair freq 1
    val merges = Bpe.trainMerges(docs, "text", iters = 5)
    assert(merges.count() === 0L, "freq<2 pairs must not be merged")
    // and a corpus that dries up after one merge
    val docs2 = Seq(1L -> "ab ab xy").toDF("doc_id", "text")
    val m2 = Bpe.trainMerges(docs2, "text", iters = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(m2.toSeq === Seq((1, "a", "b")),
      "after merging (a,b) every remaining pair is unique → stop at iter 1")
  }

  test("subwordCounts: learned merges shrink subword counts toward word counts") {
    val docs = Seq(
      1L -> "low low lower",
      2L -> "newest newest newest widest")
      .toDF("doc_id", "text")
    val byDoc = Bpe.subwordCounts(docs, "text", "doc_id", iters = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val (n1, s1) = byDoc(1L)
    val (n2, s2) = byDoc(2L)
    assert(n1 === 3L && n2 === 4L)
    // chars-per-word upper bound and words-per-word lower bound
    assert(s1 < 3L * 5L && s1 >= n1)
    assert(s2 < 4L * 6L && s2 >= n2)
    // with zero merges, subwords = characters
    val raw = Bpe.subwordCounts(docs, "text", "doc_id", iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(raw(1L) === (3 + 3 + 5).toLong)
    assert(raw(2L) === (6 * 3 + 6).toLong)
  }

  test("applyMerges replays training segmentation exactly; OOV words segment by prefix of merges") {
    val docs = Seq(
      1L -> (("low " * 5) + ("lower " * 2)).trim,
      2L -> (("newest " * 6) + ("widest " * 3)).trim)
      .toDF("doc_id", "text")
    val (mergesDf, trained) = Bpe.train(docs, "text", iters = 4)
    val merges = mergesDf.orderBy("iter")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // replaying the merge list on the training vocabulary reproduces the
    // stored segmentation bit-for-bit — apply ≡ train for known words
    val replayed = Bpe.applyMerges(trained.select("word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    trained.select("word", "syms").collect().foreach { r =>
      assert(replayed(r.getString(0)) === r.getString(1), s"word ${r.getString(0)}")
    }
    // an unseen word picks up every learned merge that applies: merges
    // (e,s),(es,t),(l,o),(lo,w) compose on "lowest" → low + est
    val oov = Bpe.applyMerges(Seq("lowest").toDF("word"), "word", merges)
      .select("syms").as[String].head()
    assert(oov === " low  est ")
  }

  test("subwordCountsStored (persisted tokenizer) matches the retrain path on the training corpus") {
    val docs = Seq(
      1L -> "low low lower newest newest widest",
      2L -> "newest widest low lower").toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_wh").toString
    Bpe.writeVocab(docs, "text", iters = 4, dir, "bpetest", numBuckets = 2)
    val stored = Bpe.subwordCountsStored(spark, "bpetest", docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val live = Bpe.subwordCounts(docs, "text", "doc_id", iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored === live, "stored replay must equal retraining on the same corpus")
    spark.sql("DROP TABLE IF EXISTS bpetest_merges")
    spark.sql("DROP TABLE IF EXISTS bpetest_vocab")
  }

  test("train is partition-layout invariant") {
    val docs = Seq(
      1L -> "low low lower newest newest widest",
      2L -> "newest widest low lower").toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.trainMerges(df, "text", iters = 4).collect().map(_.toSeq).toSet
    assert(run(docs) === run(docs.repartition(7)))
  }

  /** Reference BPE trainer: full pair recount every iteration, driver-side
    * — the algorithm [[Bpe.train]]'s incremental pair-count maintenance
    * must reproduce bit-for-bit. Same semantics end to end: tokenizer
    * regex, frequency weighting, (freq DESC, lhs ASC, rhs ASC) argmax,
    * leftmost non-overlapping merge, freq<2 early stop.
    */
  private def naiveBpe(texts: Seq[String], iters: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    val wfreq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for (t <- texts;
         w <- t.toLowerCase.split(TextAnalysis.TokenSplitRegex)
           if w.nonEmpty)
      wfreq(w) += 1L
    var syms: Map[String, Vector[String]] =
      wfreq.keys.map(w => w -> w.split("").filter(_.nonEmpty).toVector).toMap
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var done = false
    while (i <= iters && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, s) <- syms; j <- 0 until s.length - 1)
        pc((s(j), s(j + 1))) += wfreq(w)
      if (pc.isEmpty) done = true
      else {
        val ((l, r), f) = pc.minBy { case ((l, r), f) => (-f, l, r) }
        if (f < 2L) done = true
        else {
          out += ((i, l, r, f))
          syms = syms.map { case (w, s) =>
            val b = Vector.newBuilder[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
                b += (l + r); j += 2
              } else { b += s(j); j += 1 }
            }
            w -> b.result()
          }
          i += 1
        }
      }
    }
    (out.result(), syms)
  }

  test("property: delta-recount train ≡ full-recount reference on random corpora") {
    val rnd = new scala.util.Random(20260813)
    for (round <- 1 to 4) {
      val alphabet = "abcd"
      def word() = (1 to (1 + rnd.nextInt(5)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val vocabPool = Vector.fill(8 + rnd.nextInt(10))(word())
      val texts = Vector.fill(12) {
        Vector.fill(5 + rnd.nextInt(20))(
          vocabPool(rnd.nextInt(vocabPool.size))).mkString(" ")
      }
      val (expMerges, expSyms) = naiveBpe(texts, iters = 10)
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      // BOTH pair-count strategies must reproduce the reference exactly —
      // the auto threshold may only ever change speed, never output
      for (incremental <- Seq(false, true)) {
        val (mergesDf, wordsDf) =
          Bpe.train(docs, "text", iters = 10, Some(incremental))
        val gotMerges = mergesDf.orderBy("iter").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
        assert(gotMerges === expMerges,
          s"merge table diverged (round $round, incremental=$incremental)")
        val gotSyms = wordsDf.collect()
          .map(r => r.getString(0) ->
            r.getString(2).trim.split("  ").toVector).toMap
        assert(gotSyms === expSyms,
          s"segmentations diverged (round $round, incremental=$incremental)")
      }
    }
  }
}
