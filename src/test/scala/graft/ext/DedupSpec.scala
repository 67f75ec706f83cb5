package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("text_shingles matches the declarative tokens+shingles+distinct twin") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",                       // repeated tokens → distinct shingles
      "Mixed CASE and punct!! marks, everywhere...",
      "short",                           // fewer tokens than n → whole-doc
      "two words",
      "",                                // empty → [""]
      "don't stop believin'",            // apostrophes stay inside tokens
      "tabs\tand\nnewlines  collapse").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs(samples: _*)
    graft.functions.TextExpressions.register(spark)
    val native = df.select($"doc_id",
      call_function("text_shingles", $"text", lit(3)).as("sh"))
    val declarative = df.select($"doc_id",
      array_distinct(Dedup.shingles(TextAnalysis.tokens($"text"), 3)).as("sh"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val d = declarative.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n.keySet === d.keySet)
    n.keySet.foreach(k => assert(n(k) === d(k), s"doc $k"))
  }

  test("text_shingle_hashes matches md5Long over the positional declarative shingles") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",                       // repeats KEPT (positional, no distinct)
      "Mixed CASE and punct!! marks, everywhere...",
      "short",
      "",
      "don't stop believin'").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs(samples: _*)
    graft.functions.TextExpressions.register(spark)
    val native = df.select($"doc_id",
      call_function("text_shingle_hashes", $"text", lit(3)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val declarative = df.select($"doc_id",
      transform(Dedup.shingles(TextAnalysis.tokens($"text"), 3),
        g => graft.functions.Hashing.md5Long(g)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === declarative.keySet)
    native.keySet.foreach(k => assert(native(k) === declarative(k), s"doc $k"))
  }

  test("text_shingles_all matches the positional declarative shingles (repeats kept)") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",
      "short",
      "").zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs(samples: _*)
    graft.functions.TextExpressions.register(spark)
    val native = df.select($"doc_id",
      call_function("text_shingles_all", $"text", lit(3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val declarative = df.select($"doc_id",
      Dedup.shingles(TextAnalysis.tokens($"text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === declarative)
  }

  test("exactDedup keeps exactly the min-id row per distinct content") {
    val df = docs(
      1L -> "alpha beta", 2L -> "alpha beta", 5L -> "alpha beta",
      3L -> "gamma", 4L -> "delta")
    val out = Dedup.exactDedup(df, $"text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 3L, 4L))
  }

  test("minhash signatures are identical for identical texts and mostly agree for near-dups") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val near = base.split(" ").dropRight(1).mkString(" ")
    val df = docs(1L -> base, 2L -> base, 3L -> near, 4L -> "completely different words entirely here now")
    val sig = Dedup.minhashSignatures(df, $"text", "doc_id", 8, 3)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sig(1L) === sig(2L), "identical text ⇒ identical signature")
    val agreeNear = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    val agreeFar = sig(1L).zip(sig(4L)).count { case (a, b) => a == b }
    assert(agreeNear >= 5, s"near-dup should agree on most hashes, got $agreeNear/8")
    assert(agreeFar <= 2, s"unrelated docs should rarely agree, got $agreeFar/8")
  }

  test("lshCandidatePairs surfaces planted near-dups with high est_jaccard") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val df = docs(
      1L -> base, 2L -> base,
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val sig = Dedup.minhashSignatures(df, $"text", "doc_id", 8, 3)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.get((1L, 2L)).contains(1.0))
    assert(!pairs.contains((1L, 3L)) || pairs((1L, 3L)) < 0.5)
  }

  test("jaccardPairs (prefix-filtered) equals the naive all-pairs jaccard") {
    // 40 docs with overlapping token windows over a small vocab — dense
    // enough that prefix filtering actually prunes.
    val vocab = Vector("red", "blue", "green", "gold", "iron", "wood",
      "sand", "rain", "snow", "wind")
    val rows = (0 until 40).map { i =>
      val toks = (0 until 12).map(j => vocab((i + j * (1 + i % 3)) % vocab.size))
      (i.toLong, toks.mkString(" "))
    }
    val df = docs(rows: _*)
    val fast = Dedup.jaccardPairs(df, $"text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive reference computed in Scala
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.split(graft.ext.TextAnalysis.TokenSplitRegex).filter(_.nonEmpty)
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val m = rows.map { case (id, t) => id -> sh(t) }.toMap
    val naive = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      c = (m(a) intersect m(b)).size
      j = c.toDouble / (m(a).size + m(b).size - c) if j >= 0.5
    } yield (a, b, j)).toSet
    assert(fast === naive)
  }

  test("jaccardPairs shuffled verify path (above broadcast gate) matches the broadcast path") {
    val vocab = Vector("red", "blue", "green", "gold", "iron", "wood",
      "sand", "rain", "snow", "wind")
    val rows = (0 until 40).map { i =>
      val toks = (0 until 12).map(j => vocab((i + j * (1 + i % 3)) % vocab.size))
      (i.toLong, toks.mkString(" "))
    }
    val df = docs(rows: _*)
    def run(maxBroadcastDocs: Long) =
      Dedup.jaccardPairs(df, $"text", "doc_id", 3, 0.5, maxBroadcastDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(0L) === run(1000000L))
  }

  test("containmentPairs equals naive directed containment and catches subsets Jaccard misses") {
    // doc 1 = a 6-token excerpt embedded verbatim inside the much longer
    // doc 2 → c(1→2) = 1.0 while Jaccard(1,2) is far below any dedup
    // threshold; doc 3 unrelated; docs 4/5 exact copies (both directions).
    val excerpt = "the treaty was signed at dawn by both delegations"
    val long = ("history records many turning points and " + excerpt +
      " which historians still debate in countless volumes of analysis today")
    val df = docs(
      1L -> excerpt, 2L -> long, 3L -> "completely unrelated words here now",
      4L -> "twin copy of a document body", 5L -> "twin copy of a document body")
    val got = Dedup.containmentPairs(df, $"text", "doc_id", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive reference
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.split(graft.ext.TextAnalysis.TokenSplitRegex).filter(_.nonEmpty)
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = df.collect().map(r => r.getLong(0) -> sh(r.getString(1))).toMap
    val naive = (for {
      a <- all.keys; b <- all.keys if a != b
      c = (all(a) intersect all(b)).size
      cont = c.toDouble / all(a).size if cont >= 0.9
    } yield (a, b, cont)).toSet
    assert(got === naive)
    assert(got.exists { case (a, b, c) => a == 1L && b == 2L && c == 1.0 },
      "the embedded excerpt must be flagged as contained in the long doc")
    assert(!got.exists { case (a, b, _) => a == 2L && b == 1L },
      "containment is directed: the long doc is not contained in the excerpt")
    // the pair Jaccard actually IS below threshold — the case for containment
    val j = (all(1L) intersect all(2L)).size.toDouble /
      (all(1L) union all(2L)).size
    assert(j < 0.5, s"fixture must keep Jaccard low (got $j)")
  }

  test("containmentPairs shuffled path (above broadcast gate) matches the broadcast path") {
    val vocab = Vector("red", "blue", "green", "gold", "iron", "wood",
      "sand", "rain", "snow", "wind")
    val rows = (0 until 40).map { i =>
      val toks = (0 until 12).map(j => vocab((i + j * (1 + i % 3)) % vocab.size))
      (i.toLong, toks.mkString(" "))
    }
    val df = docs(rows: _*)
    def run(maxBroadcastDocs: Long) =
      Dedup.containmentPairs(df, $"text", "doc_id", 3, 0.6, maxBroadcastDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(0L) === run(1000000L))
    assert(run(0L).nonEmpty)
  }

  test("simhash: identical texts hamming 0; near-dups within band recall") {
    val base = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    val near = base.split(" ").dropRight(1).mkString(" ")
    val df = docs(1L -> base, 2L -> base, 3L -> near,
      4L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
    val sig = Dedup.simhashSignatures(df, $"text", "doc_id")
    val m = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    val pairs = Dedup.simhashNearDupPairs(sig, "doc_id", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(java.lang.Long.bitCount(m(1L) ^ m(4L)) > 6,
      "unrelated docs should be far apart")
  }

  test("incrementalDedup: exact copies and near-dups of the corpus drop, fresh docs survive") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog every day",
      2L -> "spark executes declarative plans with whole stage code generation")
    val batch = docs(
      10L -> "the quick brown fox jumps over the lazy dog every day",          // exact copy → drop
      11L -> "the quick brown fox jumps over the lazy dog every",              // near-dup of 1 → drop
      12L -> "completely unrelated fresh content about distributed training",  // fresh → keep
      13L -> "completely unrelated fresh content about distributed training",  // in-batch exact of 12 → drop
      14L -> "completely unrelated fresh content about distributed")           // in-batch near of 12 → drop
    val out = Dedup.incrementalDedup(corpus, batch, $"text", "doc_id",
        numHashes = 8, bands = 4, shingleSize = 3, estJaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(12L))
  }

  test("connectedComponents collapses chains to the min label") {
    val pairs = Seq(
      (2L, 5L), (5L, 9L),           // chain 2-5-9 (no direct 2-9 edge)
      (20L, 21L),                   // separate 2-node component
      (30L, 31L), (31L, 32L), (32L, 33L)) // 4-node chain
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      2L -> 2L, 5L -> 2L, 9L -> 2L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L))
  }

  test("nearDedupCC drops every non-min member of each LSH component in one run") {
    val c = graft.queries.DedupQueries.corpusWithDups(spark, "/root/testdata/sf0.001")
    val exact = Dedup.exactDedup(c, $"text", "doc_id")
    val sig = Dedup.minhashSignatures(exact, $"text", "doc_id", 8, 3)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 8, 4)
      .filter($"est_jaccard" >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // reference closure in Scala (union-find)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val losers = parent.keys.filter(x => find(x) != x).toSet
    val expected = exact.select("doc_id").as[Long].collect().toSet -- losers
    val got = Dedup.nearDedupCC(c, $"text", "doc_id", 8, 4, 3, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected)
    // and the closure semantics differ from (or refine) the greedy pass:
    // CC survivors must be a subset of greedy survivors
    val greedy = Dedup.nearDedup(c, $"text", "doc_id", 8, 4, 3, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got.subsetOf(greedy))
  }

  test("hot-bucket cap bounds the candidate blowup on a degenerate corpus") {
    // 200 byte-identical docs (one monster bucket per band) + 3 near-dup
    // docs in small buckets. Production order is exactDedup FIRST — this
    // corpus simulates skipping it, the worst case for LSH.
    val boiler = "terms of service apply all rights reserved contact us for details"
    val rows = (0L until 200L).map(i => i -> boiler) ++ Seq(
      500L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      501L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      502L -> "totally different words here nothing shared with others at all")
    val df = docs(rows: _*)
    val sig = Dedup.minhashSignatures(df, $"text", "doc_id", 8, 3)
    val uncapped = Dedup.lshCandidatePairs(sig, "doc_id", 8, 4).count()
    val capped = Dedup.lshCandidatePairs(sig, "doc_id", 8, 4, maxBucketSize = 10)
    val cappedPairs = capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped >= 200L * 199 / 2, s"degenerate corpus should blow up uncapped ($uncapped)")
    // every surviving candidate comes from a bucket of ≤10 docs → bounded
    assert(cappedPairs.size <= 4 * 10 * 9 / 2,
      s"capped pair count ${cappedPairs.size} exceeds bands*cap² bound")
    // the cap must not sacrifice pairs OUTSIDE hot buckets
    assert(cappedPairs.contains((500L, 501L)))
    // and the audit relation reports exactly the dropped buckets
    val hot = Dedup.lshHotBuckets(sig, "doc_id", 8, 4, maxBucketSize = 10)
      .select("bucket_size").as[Long].collect()
    assert(hot.nonEmpty && hot.forall(_ == 200L))
  }

  test("simhash hot-bucket cap keeps small-bucket pairs and drops monster buckets") {
    val boiler = "terms of service apply all rights reserved contact us for details"
    val rows = (0L until 100L).map(i => i -> boiler) ++ Seq(
      500L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      501L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val sig = Dedup.simhashSignatures(docs(rows: _*), $"text", "doc_id")
    val uncapped = Dedup.simhashNearDupPairs(sig, "doc_id", maxDist = 6).count()
    val capped = Dedup.simhashNearDupPairs(sig, "doc_id", maxDist = 6,
        maxBucketSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped >= 100L * 99 / 2)
    assert(capped.size <= 7 * 10 * 9 / 2)
    assert(capped.contains((500L, 501L)))
  }

  test("embeddingSimhash: identical vectors collide, near vectors are close, far vectors far") {
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => math.sin(i + 1).toFloat)),
      (2L, Array.tabulate(64)(i => math.sin(i + 1).toFloat)),            // identical
      (3L, Array.tabulate(64)(i => (math.sin(i + 1) + 0.02).toFloat)),   // tiny angle
      (4L, Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)))        // unrelated
      .toDF("vec_id", "embedding")
    val m = Dedup.embeddingSimhash(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    val near = java.lang.Long.bitCount(m(1L) ^ m(3L))
    val far = java.lang.Long.bitCount(m(1L) ^ m(4L))
    assert(near < far, s"near-dup hamming $near should beat unrelated $far")
    assert(far >= 12, s"unrelated vectors should disagree on many bits ($far)")
    // interpreted and codegen paths agree (eval vs doGenCode)
    val planes = graft.functions.VectorExpressions.HyperplaneSig.planes(48, 64)
    val v1 = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    var expected = 0L
    for (j <- 0 until 48) {
      val d = (0 until 64).map(i => v1(i).toDouble * planes(j)(i)).sum
      if (d > 0) expected |= 1L << j
    }
    assert(m(1L) == expected)
  }

  test("embeddingNearDupPairs finds exactly the pairs above threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.04f, 0.0f)),  // ~cos 0.999 with 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.98f, 0.2f)))    // ~cos 0.98 with 3
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))
  }

  test("duplicateSpans finds cross-doc k-gram repeats at the right offsets") {
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d z w",
      3L -> "nothing shared here at all today")
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, $"text", "doc_id", k = 4)
      .select("doc_id", "start")
      .as[(Long, Int)].collect().toSet
    assert(spans === Set(1L -> 0, 2L -> 2), "only the shared 'a b c d' gram")
  }

  test("stripDuplicateSpans removes covered tokens, keeps order, empties short dups") {
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d z w",
      3L -> "untouched text stays put here",
      4L -> "p q",                       // short doc duplicated whole
      5L -> "p q")
      .toDF("doc_id", "text")
    val got = Dedup.stripDuplicateSpans(docs, $"text", "doc_id", k = 4)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "e f g h")
    assert(got(2L) == "x y z w")
    assert(got(3L) == "untouched text stays put here")
    assert(got(4L) == "" && got(5L) == "",
      "whole-doc grams of short duplicated docs must empty both copies")
  }

  test("stripDuplicateSpans keepFirst preserves the canonical occurrence") {
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d z w",
      4L -> "p q",
      5L -> "p q")
      .toDF("doc_id", "text")
    val got = Dedup.stripDuplicateSpans(docs, $"text", "doc_id", k = 4,
        keepFirst = true)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "a b c d e f g h",
      "doc 1 holds the canonical 'a b c d' span and must keep it")
    assert(got(2L) == "x y z w", "the repeat occurrence is stripped")
    assert(got(4L) == "p q" && got(5L) == "",
      "whole-doc dup: lowest id keeps the content, the copy empties")
  }

  test("duplicateSpans counts DISTINCT docs: within-doc repetition alone is not a dup") {
    val docs = Seq(
      1L -> "m n o p m n o p",           // gram repeats only inside doc 1
      2L -> "completely different words here")
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, $"text", "doc_id", k = 4)
    assert(spans.count() == 0L)
  }

  test("semanticDedup collapses a transitive embedding chain to its min id") {
    // A~B and B~C clear cosine 0.85 (both ≈0.900); A~C ≈0.62 lands below it:
    // only the closure keeps exactly one survivor for {A, B, C}.
    val a = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Array(0.9f, 0.436f, 0.0f, 0.0f)
    val c = Array(0.62f, 0.785f, 0.0f, 0.0f)
    val far = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val vecs = Seq((1L, a), (2L, b), (3L, c), (9L, far))
      .toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairsExact(vecs, "vec_id", "embedding", 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L), (2L, 3L)), s"fixture must be a chain: $exact")
    val kept = Dedup.semanticDedup(vecs, "vec_id", "embedding", 0.85,
        numCentroids = 2, kmeansIters = 2, nProbe = 2)
      .select("vec_id").as[Long].collect().sorted
    assert(kept === Array(1L, 9L))
  }

  test("editVerifiedPairs confirms LSH candidates by exact edit distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again tonight"
    val df = docs(
      1L -> base,
      2L -> base,                        // exact copy: dist 0
      3L -> base.replace("tonight", "tonite"),  // small edit, shares most shingles
      4L -> (base + " " + base + " unrelated trailing content of much greater length"),
      5L -> "completely different words about other topics entirely here now")
    val out = Dedup.editVerifiedPairs(df, col("text"), "doc_id",
        numHashes = 8, bands = 4, shingleSize = 3, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) === 0L)
    assert(out((1L, 3L)) === 3L && out((2L, 3L)) === 3L) // tonight->tonite
    // doc 4 shares doc 1's shingles (LSH candidate) but fails BOTH the
    // length lower bound and the threshold DP; doc 5 is never a candidate.
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("nearDedupComponents labels clusters by min id and singletons by self") {
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val df = docs(
      1L -> base,
      2L -> base,                               // exact copy → collapsed pre-CC
      3L -> (base + " extra"),                  // near-dup of 1
      9L -> "совершенно другой текст ни о чём здесь совсем")
    val out = Dedup.nearDedupComponents(df, col("text"), "doc_id",
        numHashes = 8, bands = 4, shingleSize = 3,
        estJaccardThreshold = 0.5)
      .select("doc_id", "comp").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 3L -> 1L, 9L -> 9L)) // 2 lost exact dedup
  }

  test("canonicalPerComponent keeps the best-ranked member with member count") {
    val members = Seq(
      (1L, 10L, 3), (2L, 10L, 5), (3L, 10L, 5), // comp 10: quality tie 5 → min id 2
      (7L, 7L, 1))                              // singleton
      .toDF("doc_id", "comp", "q")
    val out = Dedup.canonicalPerComponent(members, "comp",
        Seq(col("q").desc, col("doc_id").asc))
      .select("comp", "doc_id", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((10L, 2L, 3L), (7L, 7L, 1L)))
  }
}
