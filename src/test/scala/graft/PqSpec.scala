package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Pq

/** Product-quantization invariants on the embeddings fixture: codebook
  * shape, encode determinism, ADC exactness on zero-quantization-error
  * rows, Lloyd monotonicity, recall vs an exact-L2 brute force, IVF-PQ
  * full-probe parity, and the zero-shuffle encode plan. */
class PqSpec extends SparkSuite {

  private def emb = table("embeddings").select(col("vec_id"), col("embedding"))

  private def bruteL2(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("dist", Pq.l2sq(col("embedding"), col("qvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist").asc, col("vec_id").asc)
    scored.withColumn("__rk__", row_number().over(w)).filter(col("__rk__") <= k)
      .select(col("query_id"), col("vec_id"))
  }

  test("codebooks: m*ksub rows, subvector length d/m, cids 0..ksub-1 per subspace") {
    val cb = Pq.codebooksFromRows(emb, "vec_id", "embedding", m = 4, ksub = 4)
    val rows = cb.collect()
    assert(rows.length == 16)
    assert(cb.select(size(col("cvec"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(16))
    val bySub = rows.groupBy(_.getAs[Int]("sub")).view.mapValues(_.map(_.getAs[Int]("cid")).sorted)
    assert(bySub.keys.toSeq.sorted == Seq(0, 1, 2, 3))
    bySub.values.foreach(cids => assert(cids.toSeq == Seq(0, 1, 2, 3)))
  }

  test("encode: codes are m bytes in [0, ksub); a codebook-source row encodes to itself") {
    val cb = Pq.codebooksFromRows(emb, "vec_id", "embedding", m = 4, ksub = 4)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    assert(codes.filter(size(col("codes")) =!= 4).count() == 0)
    assert(codes.filter(exists(col("codes"), c => c < 0 || c >= 4)).count() == 0)
    // vectors the codebooks were sliced from have zero quantization error,
    // so every subspace snaps to their own cid
    val self = codes.filter(col("vec_id") < 4).collect()
    self.foreach { r =>
      val id = r.getAs[Long]("vec_id").toInt
      assert(r.getAs[scala.collection.Seq[Byte]]("codes").forall(_ == id.toByte),
        s"vec $id: ${r.getAs[scala.collection.Seq[Byte]]("codes")}")
    }
  }

  test("ADC distance equals exact squared L2 when quantization error is zero") {
    val cb = Pq.codebooksFromRows(emb, "vec_id", "embedding", m = 4, ksub = 4)
    val sources = emb.filter(col("vec_id") < 4) // reconstruction == original
    val queries = emb.filter(col("vec_id").between(10, 12))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val adc = Pq.topK(sources, "vec_id", "embedding", queries, "query_id", "qvec", cb, k = 4)
    val exact = sources.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        Pq.l2sq(col("embedding"), col("qvec")).as("exact"))
    val joined = adc.join(exact, Seq("query_id", "vec_id")).collect()
    assert(joined.length == 12) // 3 queries x 4 corpus rows
    joined.foreach { r =>
      val (d, e) = (r.getAs[Double]("dist"), r.getAs[Double]("exact"))
      assert(math.abs(d - e) < 1e-9, s"adc $d vs exact $e")
    }
  }

  test("Lloyd iterations do not increase quantization error") {
    def mse(cb: DataFrame): Double = {
      // each row's error = ADC distance of the row against its own codes
      val codes = Pq.encode(emb, "vec_id", "embedding", cb)
      val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Pq.adcTopK(codes, "vec_id", "codes", queries, "query_id", "qvec", cb,
          k = Int.MaxValue)
        .filter(col("query_id") === col("vec_id"))
        .agg(avg(col("dist"))).head().getDouble(0)
    }
    val seeded = Pq.codebooksFromRows(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val trained = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8, iters = 2)
    val (e0, e2) = (mse(seeded), mse(trained))
    assert(e2 <= e0 + 1e-9, s"training regressed quantization error: $e0 -> $e2")
    assert(e2 < e0 * 0.9, s"training barely moved: $e0 -> $e2") // real improvement on random seeds
  }

  test("shortlist+rerank recall@5 vs exact-L2 brute force clears the floor at 16x compression") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // 64 floats = 256 B -> 16 codes = 16 B; random-Gaussian vectors are
    // PQ's worst case (no cluster structure), so this floor is the hard one
    val cb = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 16, ksub = 64, iters = 2)
    def ids(df: DataFrame) = df.select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ids(bruteL2(emb, queries, 5))
    val pq = ids(Pq.topKRerank(emb, "vec_id", "embedding", queries, "query_id", "qvec",
      cb, k = 5, shortlist = 25))
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ shortlist+rerank recall $recall") // measured 1.0
  }

  test("IVF-PQ with full probing equals whole-corpus ADC") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cb = Pq.codebooksFromRows(emb, "vec_id", "embedding", m = 4, ksub = 4)
    val cents = graft.ops.Kmeans.train(emb, "vec_id", "embedding", k = 4, iters = 1)
    val full = Pq.topK(emb, "vec_id", "embedding", queries, "query_id", "qvec", cb, k = 5)
    val ivf = Pq.ivfAdcTopK(emb, "vec_id", "embedding", queries, "query_id", "qvec",
      cents, cb, k = 5, nprobe = 4)
    assertParity(ivf, full)
  }

  test("encode plans zero data shuffles — one broadcast, no exchange on the corpus") {
    val cb = Pq.codebooksFromRows(emb, "vec_id", "embedding", m = 4, ksub = 4)
    val plan = Pq.encode(emb, "vec_id", "embedding", cb)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(plan).size
    assert(shuffles == 0, s"encode shuffled the corpus:\n$plan")
  }
}
