package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE tokenizer training/encode semantics, pinned against the merge
  * sequence of the published algorithm (Sennrich et al. 2016 §3.2,
  * worked by hand on the classic low/lower/newest/widest corpus without
  * end-of-word markers). */
class BpeSpec extends SparkSuite {

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  /** low×5 lower×2 newest×6 widest×3 — hand-computed merges:
    * r0: (e,s) 9  (ties (e,s)/(s,t) at 9; lexicographic pick)
    * r1: (es,t) 9
    * r2: (l,o) 7  (ties (l,o)/(o,w) at 7)
    * r3: (lo,w) 7 */
  private def sennrich = corpus(
    1L -> ("low " * 5).trim,
    2L -> ("lower " * 2).trim,
    3L -> ("newest " * 6).trim,
    4L -> ("widest " * 3).trim)

  test("train reproduces the hand-computed merge sequence with ties broken lexicographically") {
    val merges = Bpe.train(sennrich, "text", numMerges = 4)
    assert(merges.map(m => (m.rank, m.left, m.right, m.count)) == Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "l", "o", 7L),
      (3, "lo", "w", 7L)))
  }

  test("train stops early when no pair reaches minCount") {
    // every word is a single character → zero adjacent pairs
    val merges = Bpe.train(corpus(1L -> "a b c"), "text", numMerges = 5)
    assert(merges.isEmpty)
    // one word with one repeatable pair at freq 1 < minCount=2 → stop
    val m2 = Bpe.train(corpus(1L -> "ab"), "text", numMerges = 5, minCount = 2L)
    assert(m2.isEmpty)
    // same pair allowed at minCount=1: "ab" merges once then a+b exhausts
    val m3 = Bpe.train(corpus(1L -> "ab"), "text", numMerges = 5, minCount = 1L)
    assert(m3.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("mergeAdjacent is left-to-right non-overlapping (aaa + (a,a) -> [aa, a])") {
    import spark.implicits._
    val out = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq[String]())
      .toDF("syms")
      .select(Bpe.mergeAdjacent(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("aa", "a"), List("aa", "aa"), Nil))
  }

  test("encode with the trained merges reproduces training's final symbolization") {
    val merges = Bpe.train(sennrich, "text", numMerges = 4)
    val enc = Bpe.encode(
        corpus(10L -> "newest", 11L -> "lowest", 12L -> "low"),
        "id", "text", merges)
      .orderBy("id").collect()
    // newest → n e w est (training's exact final state for this word)
    assert(enc(0).getSeq[String](1).toList == List("n", "e", "w", "est"))
    // lowest (unseen word): es→est wins over l+o at rank 0/1, then lo, low
    assert(enc(1).getSeq[String](1).toList == List("low", "est"))
    assert(enc(1).getInt(2) == 2)
    assert(enc(2).getSeq[String](1).toList == List("low"))
  }

  test("batched train (batchTopK=8) equals the one-merge-per-round greedy sequence") {
    // real text with heavy pair interactions (fixture docs): the batch
    // must accept only provably-greedy prefixes, so the merge sequences
    // are IDENTICAL, not merely same-set
    val docs = table("documents").select(col("doc_id").as("id"), col("text")).limit(120)
    val greedy = Bpe.train(docs, "text", numMerges = 24, batchTopK = 1)
    val batched = Bpe.train(docs, "text", numMerges = 24, batchTopK = 8)
    assert(batched == greedy)
  }

  test("greedyPrefix: strict dominance and interaction rules") {
    // interacting second row: only the head is provable -> batch of 1
    assert(Bpe.greedyPrefix(Array(("e", "s", 9L), ("s", "t", 9L)),
      exhausted = true, minCount = 2L) == Seq(("e", "s", 9L)))
    // disjoint rows but the last ties the first unseen tier -> truncated;
    // NOT exhausted means unseen pairs may tie row 2's count
    assert(Bpe.greedyPrefix(Array(("a", "b", 9L), ("c", "d", 7L)),
      exhausted = false, minCount = 2L) == Seq(("a", "b", 9L)))
    // exhausted list, all disjoint -> everything accepted
    assert(Bpe.greedyPrefix(Array(("a", "b", 9L), ("c", "d", 7L)),
      exhausted = true, minCount = 2L) == Seq(("a", "b", 9L), ("c", "d", 7L)))
    // a later pair whose symbol equals an earlier CONCAT interacts (new
    // "ab" symbols change its count)
    assert(Bpe.greedyPrefix(Array(("a", "b", 9L), ("ab", "c", 7L)),
      exhausted = true, minCount = 2L) == Seq(("a", "b", 9L)))
    // minCount gates acceptance
    assert(Bpe.greedyPrefix(Array(("a", "b", 1L)),
      exhausted = true, minCount = 2L).isEmpty)
  }

  test("encode flattens across the words of a document and counts tokens") {
    val merges = Bpe.train(sennrich, "text", numMerges = 4)
    val enc = Bpe.encode(corpus(1L -> "low newest low"), "id", "text", merges)
      .collect().head
    assert(enc.getSeq[String](1).toList ==
      List("low", "n", "e", "w", "est", "low"))
    assert(enc.getInt(2) == 6)
  }
}
