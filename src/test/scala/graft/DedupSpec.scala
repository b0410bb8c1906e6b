package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.functions.Text

/** Near-dup semantics that have no SQL oracle (minhash/simhash are
  * xxhash64-based): invariants pinned here instead. */
class DedupSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("exact dedup keeps the smallest id per fingerprint, formatting-insensitive") {
    val d = docs(
      1L -> "Hello,   World!",
      2L -> "hello world",   // same fingerprint after canonicalization
      3L -> "something else")
    val kept = Dedup.exact(d, "id", "text").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("minhash LSH always pairs identical documents") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "completely different words appear in this other document here")
    val pairs = Dedup.minhashLshPairs(d, "id", "text",
      shingleN = 2, numHashes = 16, bands = 4, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash banding finds all pairs within the Hamming bound") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota", // 1 token differs
      3L -> "totally unrelated text with other vocabulary entirely")
    val pairs = Dedup.simhashPairs(d, "id", "text", maxBits = 20)
      .select("id_a", "id_b", "hamming").collect()
    // the near-identical pair must be found; its hamming must respect the bound
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(pairs.forall(_.getAs[Number]("hamming").intValue <= 20))
  }

  test("simhash pigeonhole holds for arbitrary maxBits (chunk widths cover 64 bits)") {
    // construct ids whose simhashes we compare exhaustively vs banding
    val d = docs(
      1L -> "one two three four five six",
      2L -> "one two three four five seven",
      3L -> "one two three four eight nine")
    val sigs = d.select(col("id"),
      Text.simhash(Text.wordTokens(col("text"))).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = for {
      a <- sigs.keys; b <- sigs.keys if a < b
      ham = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if ham <= 12
    } yield (a, b)
    val found = Dedup.simhashPairs(d, "id", "text", maxBits = 12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.toSet == found)
  }

  test("jaccardPairs respects threshold and buckets") {
    val d = docs(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i k",   // high 2-gram overlap, same length band
      3L -> "z y x w v u t s r q")
    val pairs = Dedup.jaccardPairs(d, "id", "text", shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("jaccardPairs finds near-dups whose lengths straddle a ÷10 word-count band") {
    // 9 vs 11 words — the old word-count÷10 bucket put these in different
    // bands (0 vs 1) and silently missed the pair; the MinHash band key is
    // length-independent, so high shingle overlap alone drives candidacy.
    val d = docs(
      1L -> "a b c d e f g h i",
      2L -> "a b c d e f g h i j k",
      3L -> "z y x w v u t s r q p")
    val pairs = Dedup.jaccardPairs(d, "id", "text", shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("embedding LSH near-dup finds the clustered pairs the brute baseline finds") {
    import spark.implicits._
    // two tight clusters (base vector + tiny per-member noise) + isolated
    // noise vectors: within-cluster cosine ≈ 1, cross-cluster far below
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float], eps: Float): Array[Float] =
      base.zipWithIndex.map { case (v, i) => v + eps * (rnd.nextFloat() - 0.5f) }
    val baseA = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val baseB = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val rows =
      (0L to 2L).map(i => (i, jitter(baseA, 0.01f))) ++
      (3L to 5L).map(i => (i, jitter(baseB, 0.01f))) ++
      (6L to 9L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val d = rows.toDF("id", "vec")
    val brute = graft.ops.Dedup.embeddingPairsBrute(d, "id", "vec", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.ops.Dedup.embeddingPairsLsh(d, "id", "vec", 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)))
    assert(lsh == brute) // exact verify ⇒ precision 1; clusters ⇒ full recall
  }

  test("embeddingPairsBrute refuses a corpus over its broadcast cap") {
    import spark.implicits._
    val d = (0L to 9L).map(i => (i, Array.fill(4)(i.toFloat + 1f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingPairsBrute(d, "id", "vec", 0.9, maxRows = 5L).collect()
    }
    assert(e.getMessage.contains("embeddingPairsLsh"))
    // the same corpus under the cap still computes (all parallel ⇒ cos 1 < 2)
    assert(Dedup.embeddingPairsBrute(d, "id", "vec", 2.0, maxRows = 10L).count() == 0)
  }

  test("zero-norm vectors (NaN cosine) never pass a near-dup threshold") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(0f, 0f, 0f)), (2L, Array(0f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f)), (4L, Array(1f, 0f, 0f))).toDF("id", "vec")
    val brute = Dedup.embeddingPairsBrute(d, "id", "vec", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute == Set((3L, 4L))) // without the isnan guard, (1,2) et al. leak in
    val lsh = Dedup.embeddingPairsLsh(d, "id", "vec", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(Set((3L, 4L))))
  }

  test("connectedComponents labels every cluster by its minimum member") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents raises rather than return partial labels at the round cap") {
    import spark.implicits._
    // 64-node path: pointer jumping reaches ~2^r nodes after r rounds, so
    // 2 rounds cannot label 64 — the cap must fire LOUDLY, never return
    // partial labels
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, "a", "b", maxRounds = 2)
    }
    // and the same graph converges with headroom
    assert(Dedup.connectedComponents(chain, "a", "b", maxRounds = 20)
      .collect().map(_.getLong(1)).forall(_ == 1L))
  }

  test("connectedComponents converges on a 10k-node path graph inside the default cap") {
    import spark.implicits._
    // Adversarial worst case for plain hash-min label propagation
    // (diameter 9,999 ≫ the default 20-round cap): the pointer-jumping
    // step must carry it — O(log d) rounds, label-reach doubling per
    // round — or fail loudly. Silent wrong labels are impossible by
    // construction (the require guards non-convergence), so green here
    // means the halving argument actually holds at depth 10k.
    val n = 10000L
    val path = spark.range(1L, n).select(col("id").as("a"), (col("id") + 1L).as("b"))
    val labels = Dedup.connectedComponents(path, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n.toInt)
    assert(labels.forall(_._2 == 1L))
  }

  test("dropNearDuplicates keeps cluster minima and untouched singletons") {
    import spark.implicits._
    val corpus = (1L to 8L).toDF("id")
    // clusters {1,2,3} and {5,6}; 4,7,8 are singletons
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(corpus, "id", pairs, "id_a", "id_b")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 7L, 8L))
  }

  test("md5 minhash variant is the oracle-anchored twin of the xxhash64 fast path") {
    // Different hash families give different band collisions at middling
    // jaccard, but BOTH must (a) pair identical docs with certainty,
    // (b) report the identical exact-jaccard value for every pair they
    // agree on, and (c) never report a pair below threshold.
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "the quick brown fox jumps over the lazy dog tomorrow",
      4L -> "completely different words appear in this other document here")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fast = asMap(Dedup.minhashLshPairs(d, "id", "text",
      shingleN = 2, numHashes = 16, bands = 4, threshold = 0.3))
    val md5v = asMap(Dedup.minhashLshPairsMd5(d, "id", "text",
      shingleN = 2, numHashes = 16, bands = 4, threshold = 0.3))
    assert(fast.contains((1L, 2L)) && md5v.contains((1L, 2L)))
    assert(fast((1L, 2L)) == 1.0 && md5v((1L, 2L)) == 1.0)
    for (k <- fast.keySet intersect md5v.keySet) assert(fast(k) == md5v(k))
    assert(fast.values.forall(_ >= 0.3) && md5v.values.forall(_ >= 0.3))
  }

  test("md5 simhash banding finds exactly the pairs within the Hamming bound") {
    // exhaustive Hamming over the md5 bit signatures vs the banded join —
    // the same pigeonhole-completeness pin the xxhash64 path has
    val d = docs(
      1L -> "one two three four five six",
      2L -> "one two three four five seven",
      3L -> "one two three four eight nine",
      4L -> "ten eleven twelve thirteen fourteen fifteen")
    val sigs = d.select(col("id"),
      Text.simhashBitsMd5(Text.wordTokens(col("text"))).as("bits")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val all = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      ham = sigs(a).zip(sigs(b)).count { case (x, y) => x != y } if ham <= 3
    } yield (a, b)).toSet
    val found = Dedup.simhashPairsMd5(d, "id", "text", maxBits = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == all)
    // and identical docs are hamming-0 pairs under BOTH hash families
    val dup = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma")
    assert(Dedup.simhashPairsMd5(dup, "id", "text", maxBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 2L, 0L)))
    assert(Dedup.simhashPairs(dup, "id", "text", maxBits = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 2L)))
  }

  test("fingerprint canonicalizes case and punctuation runs") {
    import spark.implicits._
    val out = Seq(("A!!B  c", "a b C")).toDF("x", "y")
      .select(Text.fingerprint(col("x")) === Text.fingerprint(col("y"))).head().getBoolean(0)
    assert(out)
  }

  test("semDedup keeps first per within-cluster dup set; cross-cluster twins both survive") {
    import spark.implicits._
    // centroids along +x and +y; ids 1/2/3 cluster on x, 4/5 on y
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)),   // near-dup of 2 (same cluster) -> keeps (first)
      (2L, Array(1.0f, 0.11f)),  // dropped (neighbor 1 has smaller id)
      (3L, Array(1.0f, -0.9f)),  // x-cluster but dissimilar -> kept
      (4L, Array(0.1f, 1.0f)),   // y cluster
      (5L, Array(0.1f, 1.0f)),   // exact twin of 4 in same cluster -> dropped
      (6L, Array(0.0f, 0.0f)))   // zero norm: NaN cosine never counts as dup
      .toDF("id", "vec")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val kept = Dedup.semDedup(emb, "id", "vec", cents, "cid", "cvec", 0.95)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 6L))
    // identical twins in DIFFERENT clusters are invisible to semDedup by
    // design (the cluster partition IS the candidate bound)
    val split = Seq((10L, Array(1.0f, 0.02f)), (11L, Array(0.02f, 1.0f)))
      .toDF("id", "vec")
    val kept2 = Dedup.semDedup(split, "id", "vec", cents, "cid", "cvec", 0.0)
      .count()
    assert(kept2 == 2)
  }

  test("semDedupScalable with full probing equals exact semDedup on the fixture") {
    val emb = table("embeddings").select(col("vec_id"), col("embedding"))
    val cents = graft.ops.Kmeans.train(emb, "vec_id", "embedding", k = 16, iters = 1)
    val exact = Dedup.semDedup(emb, "vec_id", "embedding",
      cents, "centroid_id", "cvec", 0.45).select("vec_id")
    val scalable = Dedup.semDedupScalable(emb, "vec_id", "embedding",
      cents, 0.45, coarseK = 4, nProbe = 4).select("vec_id")
    assertParity(scalable, exact)
  }

  test("planBands: S-curve planning tracks the threshold and miss weight") {
    import graft.ops.Dedup
    // higher threshold -> more rows per band (steeper curve, fires later)
    val (_, rLow) = Dedup.planBands(64, 0.3)
    val (_, rHigh) = Dedup.planBands(64, 0.9)
    assert(rLow < rHigh)
    // the factorization always multiplies back to numHashes
    val (b, r) = Dedup.planBands(16, 0.5)
    assert(b * r == 16)
    // weighting misses higher pushes toward MORE bands (catch-everything)
    val (bHeavy, _) = Dedup.planBands(64, 0.7, fnWeight = 10.0)
    val (bLight, _) = Dedup.planBands(64, 0.7, fnWeight = 0.1)
    assert(bHeavy >= bLight)
    // the curve at the chosen plan actually separates: P(threshold+0.15)
    // well above P(threshold-0.15)
    val (b2, r2) = Dedup.planBands(128, 0.8)
    def p(s: Double) = 1.0 - math.pow(1.0 - math.pow(s, r2), b2)
    assert(p(0.95) > 0.9 && p(0.65) < 0.5)
  }

  test("editDistancePairs verifies banded candidates with exact Levenshtein") {
    // near-identical twins (distance 2), an exact dup (0), and an
    // unrelated doc that shares no shingles
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy cat tonight",
      3L -> "the quick brown fox jumps over the lazy dog tonight",
      4L -> "completely different content with no shared shingles at all")
    val out = Dedup.editDistancePairs(d, "id", "text",
        shingleN = 3, numHashes = 16, bands = 4, maxDist = 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.contains((1L, 3L, 0L)), s"exact dup missing: ${out.toSeq}")
    assert(out.filter(p => Set(p._1, p._2) == Set(1L, 2L) || Set(p._1, p._2) == Set(2L, 3L))
      .forall(_._3 == 3L), s"twin distance wrong: ${out.toSeq}") // dog→cat = 3 subs
    assert(out.forall(p => p._1 != 4L && p._2 != 4L), "unrelated doc paired")
    assert(out.forall(_._3 <= 3L))
  }

  test("editDistancePairs maxDist cut rejects past-threshold candidates") {
    // Case-only difference: the lowercased shingle sets are IDENTICAL, so
    // the band keys collide deterministically in every band — but the raw
    // texts differ by 5 substitutions, past a maxDist=3 cut.
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "ALPHA beta gamma delta epsilon zeta")
    val strict = Dedup.editDistancePairs(d, "id", "text", maxDist = 3).collect()
    assert(strict.isEmpty)
    val loose = Dedup.editDistancePairs(d, "id", "text", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(loose.toSeq == Seq((1L, 2L, 5L)))
  }

  test("crossCorpusPairsMd5 equals the self-join pairs restricted across the split") {
    // Identity: banding is per-document (same md5 keys no matter which
    // table a doc lives in), so cross-corpus pairs over a partition of one
    // corpus must be EXACTLY the self-join pairs whose endpoints straddle
    // the partition — same candidates, same exact-Jaccard verify.
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "the quick brown fox jumps over the lazy cat today",
      4L -> "completely different words appear in this other document here",
      5L -> "completely different words appear in this other document here")
    val self = Dedup.minhashLshPairsMd5(d, "id", "text",
      shingleN = 2, numHashes = 16, bands = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, j) => if (a % 2 == 0) (a, b, j) else (b, a, j) }.toSet
    val cross = Dedup.crossCorpusPairsMd5(
      d.filter(col("id") % 2 === 0), "id", "text",
      d.filter(col("id") % 2 === 1), "id", "text",
      shingleN = 2, numHashes = 16, bands = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cross == self && cross.nonEmpty, s"cross=$cross self=$self")
  }

  test("linkAgainstIndex over a persisted band index equals the direct cross join") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "the quick brown fox jumps over the lazy cat today",
      4L -> "completely different words appear in this other document here",
      5L -> "completely different words appear in this other document here")
    val batch = d.filter(col("id") % 2 === 0)
    val corpus = d.filter(col("id") % 2 === 1)
    val direct = Dedup.crossCorpusPairsMd5(batch, "id", "text",
      corpus, "id", "text", shingleN = 2, numHashes = 16, bands = 4,
      threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val path = java.nio.file.Files.createTempDirectory("graft_bandidx")
      .resolve("idx").toString
    Dedup.writeBandIndex(corpus, "id", "text", path,
      shingleN = 2, numHashes = 16, bands = 4)
    val viaIndex = Dedup.linkAgainstIndex(batch, "id", "text", path,
      corpus, "id", "text", shingleN = 2, numHashes = 16, bands = 4,
      threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == direct && viaIndex.nonEmpty, s"index=$viaIndex direct=$direct")
  }
}
