package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Evidence harness for the BPE pair-count strategies (round 5): times
  * [[Bpe.train]] with `incremental = Some(false)` (full recount per merge,
  * the pre-round-5 algorithm) against `Some(true)` (delta maintenance) at
  * tokenizer-ish depth, on either the real sf corpus or a SYNTHETIC
  * large-vocab corpus (the sf documents have only 31 distinct words — far
  * below any scale where delta maintenance can pay; the synthetic mode is
  * the regime [[Bpe.IncrementalVocabThreshold]] routes to delta).
  *
  *   sbt "Test/runMain graft.BpeTiming [sfDir|synth:N] [iters]"
  *
  * Not a ScalaTest (wall-clock asserts are flaky in CI); BpeSpec pins the
  * bit-for-bit output equivalence of the two strategies.
  */
object BpeTiming {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = TestSpark.spark
    val docs =
      if (src.startsWith("synth:")) {
        // one md5-hex word per row: N distinct 33-char words over a
        // 17-symbol alphabet — large word vocab, bounded pair vocab, the
        // web-corpus shape (every full recount explodes N×32 pair rows)
        val n = src.stripPrefix("synth:").toLong
        spark.range(n).select(col("id").as("doc_id"),
          concat(lit("w"), md5(col("id").cast("string"))).as("text"))
          .localCheckpoint(true)
      } else {
        graft.io.Tables.testTable(spark, src, "documents")
          .select("doc_id", "text")
      }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(incremental: Boolean): Long = {
      val (m, w) = Bpe.train(docs, "text", iters, Some(incremental))
      w.count(); m.count()
    }
    // warm both paths once at tiny depth so JIT/scan caches don't skew
    run(false)
    run(true)
    val (_, tFull) = time(run(false))
    val (_, tDelta) = time(run(true))
    println(f"BPE timing src=$src iters=$iters: " +
      f"full-recount $tFull%.1f s, delta $tDelta%.1f s, " +
      f"speedup ${tFull / tDelta}%.2fx")
    spark.stop()
  }
}
