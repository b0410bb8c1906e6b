package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.ops.Kmeans

/** k-means training + IVF search invariants on the embeddings fixture. */
class KmeansSpec extends SparkSuite {

  private def emb = table("embeddings").select(col("vec_id"), col("embedding"))

  test("trained centroids are unit-norm and k survive") {
    val cents = Kmeans.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    val rows = cents.collect()
    assert(rows.length == 4)
    val norms = cents.select(
      sqrt(aggregate(col("cvec"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("n"))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-6, s"norm $n"))
  }

  test("a cluster whose members cancel to the zero vector keeps its previous centroid") {
    import spark.implicits._
    // both vectors land on the single centroid; their mean is [0,0] whose
    // 0/0 normalization would ANSI-abort the iteration — the guard keeps
    // the previous (init) centroid instead, like an emptied cluster
    val d = Seq((1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val cents = Kmeans.train(d, "vec_id", "embedding", k = 1, iters = 2).collect()
    assert(cents.length == 1)
    assert(cents.head.getSeq[Float](1) == Seq(1f, 0f))
  }

  test("training tightens assignments: mean similarity does not decrease") {
    def meanSim(iters: Int): Double = {
      val cents = Kmeans.train(emb, "vec_id", "embedding", k = 8, iters = iters)
      Kmeans.assign(emb, "embedding", cents)
        .join(cents, "centroid_id")
        .select(avg(call_function("graft_cosine", col("embedding"), col("cvec"))))
        .head().getDouble(0)
    }
    val s0 = meanSim(0) // deterministic seed centroids, unnormalized path
    val s2 = meanSim(2)
    assert(s2 >= s0 - 1e-9, s"lloyd iterations regressed: $s0 -> $s2")
  }

  test("IVF top-k with full probing equals brute force exactly") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Kmeans.train(emb, "vec_id", "embedding", k = 4, iters = 1)
    val ivf = Kmeans.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", cents, k = 5, nprobe = 4) // all lists probed
    val brute = Similarity.topKBruteForce(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5)
    assertParity(ivf, brute)
  }

  test("IVF with partial probing keeps recall >= 60% at a fraction of the scan") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Kmeans.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val brute = ids(Similarity.topKBruteForce(emb, "vec_id", "embedding", queries, "qid", "qvec", 5))
    val ivf = ids(Kmeans.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", cents, k = 5, nprobe = 3))
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("two-level assignment with full probing reproduces the exact argmax") {
    val cents = Kmeans.train(emb, "vec_id", "embedding", k = 16, iters = 1)
    // nProbe >= coarseK probes every coarse group -> every centroid is a
    // candidate -> identical (sim desc, cid asc) argmax as assign()
    val exact = Kmeans.assign(emb, "embedding", cents)
      .select(col("vec_id"), col("centroid_id"))
    val two = Kmeans.assignTwoLevel(emb, "vec_id", "embedding", cents,
      coarseK = 4, nProbe = 4).select(col("vec_id"), col("centroid_id"))
    assertParity(two, exact)
  }

  test("two-level assignment with nProbe=2 keeps assignment agreement >= 80%") {
    val cents = Kmeans.train(emb, "vec_id", "embedding", k = 16, iters = 1)
    val exact = Kmeans.assign(emb, "embedding", cents)
      .select(col("vec_id"), col("centroid_id").as("e"))
    val two = Kmeans.assignTwoLevel(emb, "vec_id", "embedding", cents,
      coarseK = 4, nProbe = 2).select(col("vec_id"), col("centroid_id").as("t"))
    val joined = exact.join(two, "vec_id")
    val n = joined.count().toDouble
    val same = joined.filter(col("e") === col("t")).count()
    assert(n == emb.count(), "two-level must assign every defined vector")
    assert(same / n >= 0.8, s"two-level agreement ${same / n}")
  }
}
