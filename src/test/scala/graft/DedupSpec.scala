package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "quick the fox brown jumps"),       // same word set as 1
    (3L, "the quick brown fox jumps high"),  // near-dup of 1
    (4L, "completely unrelated text body"),
    (5L, "the quick brown fox jumps")        // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactDedup groups by word-set key, min id survives") {
    val out = Dedup.exactDedup(
      docs.withColumn("k", Dedup.wordSetKey(col("text"))), "doc_id", "k")
      .filter(col("dup_count") > 1).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("keep_id") == 1L)
    assert(out(0).getAs[Long]("dup_count") == 3L) // docs 1, 2, 5
  }

  test("fingerprintDedup finds the same groups as exactDedup") {
    val keyed = docs.withColumn("k", Dedup.wordSetKey(col("text")))
    val exact = Dedup.exactDedup(keyed, "doc_id", "k")
      .select("keep_id", "dup_count").orderBy("keep_id").collect().toSeq
    val fp = Dedup.fingerprintDedup(keyed, "doc_id", "k")
      .select("keep_id", "dup_count").orderBy("keep_id").collect().toSeq
    assert(exact == fp)
  }

  test("jaccardPairs computes exact word-set jaccard") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", n = 1,
      threshold = 0.5)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    // {1,2,5} mutually 1.0; {1,3},{2,3},{5,3} = 5/6 ≈ 0.8333
    assert(out == Seq((1L, 2L, 1.0), (1L, 3L, 0.8333), (1L, 5L, 1.0),
      (2L, 3L, 0.8333), (2L, 5L, 1.0), (3L, 5L, 0.8333)))
  }

  test("jaccardPairs with n=2 uses bigram shingles") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2,
      threshold = 0.9).as[(Long, Long, Double)].collect().toSeq
    // only the exact duplicate pair shares all bigrams
    assert(out == Seq((1L, 5L, 1.0)))
  }

  test("minhashPairs recalls the identical word-set clique") {
    val out = Dedup.minhashPairs(docs, "doc_id", "text",
      numHashTables = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // jaccard-1.0 pairs are always recalled by minhash banding
    assert(Set((1L, 2L), (1L, 5L), (2L, 5L)).subsetOf(out))
  }

  test("simhashPairs finds duplicate and near-duplicate texts") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8,
        bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 5L))) // identical text → hamming 0
    assert(!out.exists { case (a, b) => b == 4L || a == 4L }) // unrelated
  }

  test("jaccardPairs n=2 tolerates docs shorter than n") {
    val short = Seq((1L, "hello"), (2L, "a b c d"), (3L, "a b c d"), (4L, ""))
      .toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(short, "doc_id", "text", n = 2,
      threshold = 0.5).collect()
    // the one-token and blank docs are simply absent; 2~3 still pair
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 3L)))
  }

  test("simhashPairs rejects band configs that break the pigeonhole bound") {
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8, bands = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("minhashPairs keeps a pair at exactly the threshold") {
    // token sets {a,b,c} vs {a,b,d}: exact Jaccard 2/4 = 0.5
    val pair = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = Dedup.minhashPairs(pair, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  // ---- the capped trigram scale path (d_jaccard_capped / d_minhash_capped
  // shape): boilerplate shared by EVERY document must be dropped by the
  // df cap, leaving only genuine near-duplicates as candidates.

  private lazy val boilerDocs = {
    val boiler = "subscribe to our newsletter for updates"
    val filler = (1 to 40).map(i =>
      (i.toLong, s"unique piece $i with words alpha$i beta$i gamma$i $boiler"))
    val mirrors = Seq(
      (100L, s"copied article text shared verbatim across mirrors one $boiler"),
      (101L, s"copied article text shared verbatim across mirrors two $boiler"))
    (filler ++ mirrors).toDF("doc_id", "text")
  }

  test("capped trigram jaccard: boilerplate dropped, only true near-dups pair") {
    val out = Dedup.jaccardPairs(boilerDocs, "doc_id", "text",
      n = 3, threshold = 0.4, maxDf = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Only the mirrored pair survives: its non-boilerplate trigrams are
    // 5 shared + 3 unique each → jaccard 5/11. The boilerplate-internal
    // trigrams (df = 42/42 > 0.9) are dropped, so the 40 filler docs
    // never become candidates despite all sharing the boiler phrase.
    assert(out.toSeq == Seq((100L, 101L, math.floor(5.0 / 11 * 1e4 + 0.5) / 1e4)))
  }

  test("capped trigram minhash recalls the same near-dup pair") {
    val out = Dedup.minhashPairs(boilerDocs, "doc_id", "text",
      numHashTables = 8, threshold = 0.4, maxDf = 0.9, n = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((100L, 101L)))
  }

  // ---- winnowing fingerprints (Kernels.winnowFingerprints /
  // Dedup.winnowPairs): the kernel is pinned against an INDEPENDENT
  // reference — direct (non-rolling) polynomial hashing and a plain
  // per-window rightmost-min scan — so the rolling recurrence and the
  // single-pass window tracker are both checked, then the selection
  // guarantee and the operator's end-to-end behavior.

  /** Direct re-implementation of the winnowing spec: no rolling
    * recurrence (each gram hashed by its own k-step loop), no
    * incremental window minimum (each window scanned in full).
    */
  private def refWinnow(s: String, k: Int, w: Int): Set[Long] = {
    val cs = s.toLowerCase.filter(Character.isLetterOrDigit)
    val m = cs.length - k + 1
    if (m <= 0) return Set.empty
    val hs = Array.tabulate(m) { i =>
      var h = 0L
      (0 until k).foreach(j => h = h * 1000003L + cs.charAt(i + j))
      h
    }
    def rightmostMin(from: Int, until: Int): Long = {
      var best = from
      ((from + 1) until until).foreach(j => if (hs(j) <= hs(best)) best = j)
      hs(best)
    }
    if (m <= w) Set(rightmostMin(0, m))
    else (0 to m - w).map(from => rightmostMin(from, from + w)).toSet
  }

  private def kernelWinnow(s: String, k: Int, w: Int): Set[Long] = {
    val arr = graft.expressions.Kernels.winnowFingerprints(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
    arr.toLongArray().toSet
  }

  test("winnow kernel equals the direct-hash reference on random strings") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefg 0123,.!?é中  XYZ"
    for (_ <- 1 to 300) {
      val s = Seq.fill(rnd.nextInt(80))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      for (k <- Seq(3, 8, 16); w <- Seq(1, 4, 8))
        assert(kernelWinnow(s, k, w) == refWinnow(s, k, w),
          s"mismatch for k=$k w=$w input '$s'")
    }
  }

  test("winnow fingerprints are pinned (hash derivation stability)") {
    assert(kernelWinnow("The quick brown fox jumps over the lazy dog", 8, 4)
      == Set(-9148359948334691133L, -8375827361468489596L,
        -7488512253319978533L, -7459112692732145813L, -7300971018476229631L,
        -7142481838308805865L, -5884600588240189370L, -2289695433554132876L,
        -2262027067515106565L))
    assert(kernelWinnow("hello, World! 123", 4, 3)
      == Set(-6679427438735305547L, -2679392438692305683L,
        -2679384438582305356L, -2679381438556305313L, 320648561531694751L))
    // normalization: case, whitespace, and punctuation never move a
    // fingerprint
    assert(kernelWinnow("HELLO world123", 4, 3)
      == kernelWinnow("  hello, WORLD !! 1-2-3 ", 4, 3))
    // fewer than k normalized chars → no fingerprints
    assert(kernelWinnow("ab, c!", 4, 2) == Set.empty)
    // fewer grams than one window → the global minimum alone
    assert(kernelWinnow("abcde", 4, 8).size == 1)
  }

  test("winnow guarantee: shared substring of length k+w-1 always matches") {
    val rnd = new scala.util.Random(11)
    def randStr(n: Int) =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val k = 8; val w = 4
    for (_ <- 1 to 50) {
      val shared = randStr(k + w - 1)
      val a = randStr(rnd.nextInt(40)) + shared + randStr(rnd.nextInt(40))
      val b = randStr(rnd.nextInt(40)) + shared + randStr(rnd.nextInt(40))
      assert(kernelWinnow(a, k, w).intersect(kernelWinnow(b, k, w)).nonEmpty,
        s"no shared fingerprint for planted match '$shared'")
    }
  }

  test("winnowPairs: char-level identity and extension pair; reorder does not") {
    val out = Dedup.winnowPairs(docs, "doc_id", "text",
      k = 16, w = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 1 and 5 are byte-identical → containment 1.0; 3 extends 1 by a
    // suffix, so every fingerprint of 1 appears in 3 → containment 1.0.
    assert(out.contains((1L, 5L, 1.0)))
    assert(out.contains((1L, 3L, 1.0)))
    // 2 is a word-level permutation of 1 — same word set (jaccard 1.0)
    // but no shared 16-char substring: char-level correctly silent.
    assert(!out.exists { case (a, b, _) => (a, b) == ((1L, 2L)) })
  }

  test("incrementalDedup classifies dup_corpus / dup_batch / new " +
      "against a key index, corpus untouched") {
    val index = Seq("k1", "k2").toDF("k")
    val batch = Seq(
      (10L, "k1"),  // already ingested
      (11L, "k9"),  // fresh key, first in batch
      (12L, "k9"),  // same key, later id → dup_batch
      (13L, "k2"),  // already ingested (even though also repeated...)
      (14L, "k2"),  // ...corpus wins over batch-first labeling
      (15L, "k7")).toDF("doc_id", "k")
    val got = graft.operators.Dedup
      .incrementalDedup(batch, "doc_id", "k", index)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "dup_corpus", 11L -> "new",
      12L -> "dup_batch", 13L -> "dup_corpus", 14L -> "dup_corpus",
      15L -> "new"))
  }

  // ---- PPJoin prefix filtering: exactness law ----

  test("ppjoinPairs ≡ jaccardPairs — the prefix filter loses no pair " +
      "and invents none") {
    // generated corpus with heavy vocabulary overlap (the adversarial
    // regime for candidate generation) and varied sizes, incl. lengths
    // where t·|s| lands a few ULPs above an integer (|s|=15, t=0.6 —
    // the ceil-overshoot trap the α nudge guards)
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val gen = (0 until 60).map { i =>
      val n = 3 + rnd.nextInt(18) // sizes 3..20, hits 15 often
      (i.toLong, rnd.shuffle(vocab).take(n).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.6, 0.75); n <- Seq(1, 2)) {
      val naive = Dedup.jaccardPairs(gen, "doc_id", "text",
        n = n, threshold = t)
        .orderBy("id_a", "id_b").collect().toSeq
      val pp = Dedup.ppjoinPairs(gen, "doc_id", "text",
        n = n, threshold = t)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(pp == naive,
        s"ppjoin(t=$t, n=$n) diverged: ${pp.size} vs ${naive.size} pairs")
    }
  }

  test("ppjoinPairs prefix excludes the hottest shingles from the " +
      "candidate join") {
    // every doc shares the boilerplate phrase; with rare-first ranking
    // the boiler shingles sort LAST, so the pair relation must still be
    // exactly the uncapped jaccard relation while candidates stay small
    val naive = Dedup.jaccardPairs(boilerDocs, "doc_id", "text",
      n = 3, threshold = 0.6).orderBy("id_a", "id_b").collect().toSeq
    val pp = Dedup.ppjoinPairs(boilerDocs, "doc_id", "text",
      n = 3, threshold = 0.6).orderBy("id_a", "id_b").collect().toSeq
    assert(pp == naive)
  }

  test("incremental minhash index: frozen stop list governs the batch, " +
      "planted near-dup found, boilerplate collision suppressed") {
    // corpus: 20 docs sharing a boilerplate trigram run; batch: one
    // true near-dup of corpus doc 3 and one doc made ONLY of
    // boilerplate. With the stop list frozen from the full universe,
    // the boiler-only batch doc caps to an empty shingle set (no
    // candidates at all) instead of colliding with every corpus doc.
    val boiler = "terms of service apply to all pages here"
    val corpus = (0L until 20L).map(i =>
      (i, s"$boiler unique$i alpha$i beta$i gamma$i delta$i"))
    val uni = corpus ++ Seq(
      (100L, corpus(3)._2 + " tail"), // near-dup of doc 3
      (101L, boiler))                 // boilerplate-only
    val all = uni.toDF("doc_id", "text")
    val hot = Dedup.hotShingleArray(all, "doc_id", "text",
      n = 3, maxDf = 0.5, nDocsDenominator = uni.size.toLong)
    val corpusToks = Dedup.cappedGrams(
      all.filter(col("doc_id") < 100), "doc_id", "text", n = 3, hot = hot)
    val batchToks = Dedup.cappedGrams(
      all.filter(col("doc_id") >= 100), "doc_id", "text", n = 3, hot = hot)
    // the boiler-only doc has nothing left after the frozen cap
    assert(batchToks.filter(col("id") === 101L).count() == 0)
    val bands = Dedup.minhashBands(corpusToks, 8, 42L)
    val batchBands = Dedup.minhashBands(batchToks, 8, 42L)
    val cand = batchBands.select(col("id").as("b"), col("t"), col("sig"))
      .join(bands.select(col("id").as("c"), col("t"), col("sig")),
        Seq("t", "sig"))
      .select("b", "c").distinct()
      .as[(Long, Long)].collect().toSet
    // the planted near-dup collides with its source
    assert(cand.contains((100L, 3L)), s"missing planted pair in $cand")
  }

  test("winnowPairs maxDf cap drops boilerplate fingerprints") {
    val out = Dedup.winnowPairs(boilerDocs, "doc_id", "text",
      k = 16, w = 4, threshold = 0.5, maxDf = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the shared boiler phrase's fingerprints have df = 42/42 > 0.9 and
    // are capped out; only the mirrored article pair survives
    assert(out.toSeq == Seq((100L, 101L)))
  }
}
