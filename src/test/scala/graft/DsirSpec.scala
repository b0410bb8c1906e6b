package graft

import org.apache.spark.sql.functions._
import graft.ops.Dsir

/** DSIR semantics: hashed-feature counts, smoothed log-ratio direction,
  * empty-document neutrality, and Gumbel-top-k determinism. */
class DsirSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("hashedFeatures emits unigrams + adjacent bigrams, blank docs none") {
    val d = docs(1L -> "a b c", 2L -> "solo", 3L -> "   ")
    val n = Dsir.hashedFeatures(d, "id", "text", 64)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 5L, 2L -> 1L)) // 3 unigrams + 2 bigrams; 1 + 0; none
  }

  test("weights pull toward the target distribution; blank docs stay neutral") {
    val raw = docs(
      1L -> "cat cat cat cat", 2L -> "dog dog dog dog",
      3L -> "cat dog cat dog", 4L -> "")
    val target = docs(10L -> "cat cat cat cat cat cat cat cat")
    val w = Dsir.importanceWeights(raw, target, "id", "text", 4096)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2) // all-cat > mixed > all-dog
    assert(w(4L) == (0L, 0.0))                         // no evidence → w = 1
    assert(w(1L)._1 == 7L)                             // 4 unigrams + 3 bigrams
  }

  test("resampleTopK is deterministic, ranks by logw + fixed Gumbel noise") {
    val raw = docs((1L to 40L).map(i =>
      i -> (if (i % 2 == 0) "cat cat cat" else "dog dog dog")): _*)
    val target = docs(100L -> "cat cat cat cat")
    val a = Dsir.resampleTopK(raw, target, "id", "text", 1024, 10, "s1")
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = Dsir.resampleTopK(raw, target, "id", "text", 1024, 10, "s1")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 10)
    // cat docs carry strictly higher logw; Gumbel noise is bounded enough
    // here that the selection must be cat-dominated
    assert(a.count(_ % 2 == 0) >= 7)
    val c = Dsir.resampleTopK(raw, target, "id", "text", 1024, 10, "s2")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(c != a) // a different salt redraws the noise
  }
}
