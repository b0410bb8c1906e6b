package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Embedding similarity invariants (ANN-LSH has no oracle — recall and
  * structural guarantees pinned here). */
class SimilaritySpec extends SparkSuite {

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: identical vectors score 1, orthogonal score 0") {
    import spark.implicits._
    val d = Seq((Seq(1f, 0f), Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b", "c")
    val r = d.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1)) < 1e-9)
  }

  test("cosine: a zero vector scores NaN (native parity), null propagates — no ANSI abort") {
    import spark.implicits._
    import graft.plans.GraftExtensions
    GraftExtensions.register(spark)
    val d = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("z", "v")
    val r = d.select(
      Similarity.cosine(col("z"), col("v")).as("composed"),
      call_function("graft_cosine", col("z"), col("v")).as("native"),
      Similarity.cosine(lit(null).cast("array<float>"), col("v")).as("nul")).head()
    assert(r.getDouble(0).isNaN && r.getDouble(1).isNaN)
    assert(r.isNullAt(2))
  }

  test("brute-force top-k ranks the query vector itself first") {
    val corpus = vecs(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f),
      3L -> Seq(0f, 1f, 0f), 4L -> Seq(0f, 0f, 1f))
    val queries = corpus.filter(col("vec_id") === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Similarity.topKBruteForce(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 2).orderBy("rank").collect()
    assert(top(0).getAs[Long]("vec_id") == 1L)
    assert(top(1).getAs[Long]("vec_id") == 2L)
  }

  test("LSH top-k achieves >=60% recall vs brute force on sf0.001 embeddings") {
    val emb = table("embeddings").select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val brute = ids(Similarity.topKBruteForce(emb, "vec_id", "embedding", queries, "qid", "qvec", 5))
    val lsh = ids(Similarity.topKLsh(emb, "vec_id", "embedding", queries, "qid", "qvec", 5, nPlanes = 4))
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall")
  }

  test("md5 LSH variant is the oracle-anchored twin of the xxhash64 fast path") {
    val emb = table("embeddings").select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val brute = ids(Similarity.topKBruteForce(emb, "vec_id", "embedding", queries, "qid", "qvec", 5))
    val md5v = ids(Similarity.topKLsh(emb, "vec_id", "embedding", queries, "qid", "qvec", 5,
      nPlanes = 4, bucketFn = Similarity.lshBucketMd5))
    // same recall floor as the fast path — the variants differ only in the
    // hash family drawing the hyperplanes
    val recall = (brute intersect md5v).size.toDouble / brute.size
    assert(recall >= 0.6, s"md5-LSH recall $recall")
    // a query always finds itself: it shares every table's bucket with
    // itself, and cosine(v, v) = 1 ranks first — under BOTH hash families
    for (q <- 0L until 5L) assert(md5v.contains((q, q)), s"query $q missing itself")
    // and identical vectors land in identical buckets under both
    val dup = vecs(1L -> Seq(1f, 2f, 3f), 2L -> Seq(1f, 2f, 3f))
    for (fn <- Seq(Similarity.lshBucket _, Similarity.lshBucketMd5 _)) {
      val b = dup.select(fn(col("embedding"), 8, 0).as("b")).collect().map(_.getLong(0))
      assert(b(0) == b(1))
    }
  }

  test("topKBruteForce refuses a query set over its broadcast cap") {
    val corpus = vecs(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val queries = vecs(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(1f, 1f))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.topKBruteForce(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 1, maxQueries = 2L).collect()
    }
    assert(e.getMessage.contains("topKLsh"))
    // under the cap the same call still computes
    assert(Similarity.topKBruteForce(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 1, maxQueries = 3L).count() == 3)
  }

  test("assignCentroid preserves duplicate input rows (no window collapse)") {
    val corpus = vecs(1L -> Seq(1f, 0f), 1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val centroids = vecs(10L -> Seq(1f, 0f), 11L -> Seq(0f, 1f))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val out = Similarity.assignCentroid(corpus, "embedding", centroids, "cid", "cvec")
    assert(out.count() == 3) // both duplicates survive
    val assigned = out.groupBy("centroid_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(10L -> 2L, 11L -> 1L))
  }
}
