package graft

import org.apache.spark.sql.functions._
import graft.ops.Pca

/** PCA semantics: Jacobi eigensolver on known matrices, component
  * alignment on a synthetic anisotropic cloud, orthonormality, whitening
  * to unit variance, and the covariance stage's population formula. */
class PcaSpec extends SparkSuite {

  private def vecs(rows: Seq[Array[Double]]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("jacobiEigen solves a known symmetric 2x2 exactly") {
    val (evals, evecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12 && math.abs(evals(1) - 1.0) < 1e-12)
    // eigenvectors (up to sign): [1,1]/sqrt2 and [1,-1]/sqrt2
    val e0 = evecs(0).map(math.abs(_))
    assert(math.abs(e0(0) - math.sqrt(0.5)) < 1e-12 && math.abs(e0(1) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(evecs(1)(0) * evecs(1)(1) + 0.5) < 1e-12) // opposite signs
  }

  test("covarianceLong computes the population covariance") {
    val d = vecs(Seq(Array(1.0, 2.0), Array(3.0, 6.0), Array(5.0, 10.0)))
    val cov = Pca.covarianceLong(d, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // x: mean 3, pop var 8/3; y = 2x: cov(x,y)=16/3, var(y)=32/3
    assert(math.abs(cov((0, 0)) - 8.0 / 3) < 1e-12)
    assert(math.abs(cov((0, 1)) - 16.0 / 3) < 1e-12)
    assert(math.abs(cov((1, 0)) - 16.0 / 3) < 1e-12)
    assert(math.abs(cov((1, 1)) - 32.0 / 3) < 1e-12)
  }

  test("fit finds the dominant axis; components are orthonormal") {
    // deterministic anisotropic 3D cloud: spread 10x along u=(1,2,0)/sqrt5,
    // 1x along w=(0,0,1), tiny along the third axis
    val u = Array(1.0 / math.sqrt(5), 2.0 / math.sqrt(5), 0.0)
    val rows = for (i <- -10 to 10; j <- -2 to 2) yield
      Array(10.0 * i * u(0), 10.0 * i * u(1), j.toDouble)
    val m = Pca.fit(vecs(rows.toSeq), "embedding", k = 3)
    val c0 = m.components(0)
    val cos = math.abs(c0(0) * u(0) + c0(1) * u(1) + c0(2) * u(2))
    assert(cos > 0.9999, s"dominant component misaligned: cos=$cos")
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) > m.eigenvalues(2))
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until 3).map(i => m.components(a)(i) * m.components(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("whitened projection has identity covariance") {
    // full-rank mixing of THREE free parameters — a rank-deficient cloud
    // has a zero eigenvalue no whitening scale can inflate
    val rows = for (i <- -2 to 2; j <- -2 to 2; k <- -1 to 1) yield
      Array(3.0 * i + 0.5 * j + 0.2 * k,
        -1.0 * i + 0.7 * j + 0.3 * k,
        0.2 * i + 1.0 * j + 0.9 * k)
    val df = vecs(rows.toSeq)
    val m = Pca.fit(df, "embedding", k = 3)
    val projected = Pca.project(df, "embedding", "p", m, whiten = true)
      .select(col("p")).collect().map(_.getSeq[Double](0).toArray)
    val n = projected.length
    for (a <- 0 until 3; b <- 0 until 3) {
      val ma = projected.map(_(a)).sum / n
      val mb = projected.map(_(b)).sum / n
      val cov = projected.map(v => (v(a) - ma) * (v(b) - mb)).sum / n
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"cov($a,$b)=$cov want $want")
    }
  }

  test("full-k projection preserves pairwise distances (rotation only)") {
    val rows = Seq(Array(1.0, 0.0, 2.0), Array(-1.0, 3.0, 0.5),
      Array(2.0, 2.0, -1.0), Array(0.0, -2.0, 4.0))
    val df = vecs(rows)
    val m = Pca.fit(df, "embedding", k = 3)
    val p = Pca.project(df, "embedding", "p", m)
      .orderBy("vec_id").select(col("p")).collect().map(_.getSeq[Double](0).toArray)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- rows.indices; j <- i + 1 until rows.size)
      assert(math.abs(d2(rows(i), rows(j)) - d2(p(i), p(j))) < 1e-9,
        s"distance not preserved for ($i,$j)")
  }

  test("opqOrder balances eigenvalue products; blocks partition all dims") {
    val order = Pca.opqOrder(Array(16.0, 8.0, 4.0, 2.0), m = 2)
    assert(order.sorted.toSeq == Seq(0, 1, 2, 3))
    // products: best split pairs 16 with 2 and 8 with 4 (32 vs 32)
    val b0 = order.take(2).map(Array(16.0, 8.0, 4.0, 2.0)).product
    val b1 = order.drop(2).map(Array(16.0, 8.0, 4.0, 2.0)).product
    assert(math.abs(b0 - b1) < 1e-9, s"unbalanced: $b0 vs $b1")
  }

  test("OPQ rotation lowers PQ quantization error on correlated data") {
    import org.apache.spark.sql.functions.{col, lit}
    // deterministic correlated cloud: latent dims with geometric variance
    // decay, mixed across subspace boundaries by fixed Givens rotations
    val d = 8
    var seed = 12345L
    def next(): Double = { // LCG uniform in [-1, 1]
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val stds = Array(8.0, 5.6, 4.0, 2.8, 2.0, 1.4, 1.0, 0.7)
    def rot(v: Array[Double], p: Int, q: Int, a: Double): Unit = {
      val (c, s2) = (math.cos(a), math.sin(a))
      val (vp, vq) = (v(p), v(q))
      v(p) = c * vp - s2 * vq; v(q) = s2 * vp + c * vq
    }
    val rows = (0 until 256).map { _ =>
      val z = Array.tabulate(d)(i => stds(i) * next())
      // mix across the m=2 subspace boundary (dims 0-3 vs 4-7)
      rot(z, 0, 4, 0.7); rot(z, 1, 5, 1.1); rot(z, 2, 6, 0.5); rot(z, 3, 7, 0.9)
      z
    }
    import spark.implicits._
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
    val m = 2
    // spec-side PQ quantization error: train codebooks on the given
    // column, then sum min-centroid squared L2 per (row, subspace)
    def pqError(data: org.apache.spark.sql.DataFrame, vc: String): Double = {
      // cvec elements may be Float (Lloyd-updated) or Double (initial
      // slices of a double input) — normalize via Number
      val cb = graft.ops.Pq.trainCodebooks(data, "vec_id", vc, m = m, ksub = 16, iters = 3)
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          r.getSeq[Any](2).map(_.asInstanceOf[Number].doubleValue).toArray).toMap
      val vecs = data.select(col(vc)).collect().map(_.getSeq[Double](0).toArray)
      val ds = d / m
      vecs.map { v =>
        (0 until m).map { j =>
          val sub = v.slice(j * ds, (j + 1) * ds)
          cb.collect { case ((s, _), c) if s == j =>
            sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          }.min
        }.sum
      }.sum
    }
    val model = Pca.fit(df, "embedding", k = d)
    val opq = Pca.opqModel(model, m)
    val rotated = Pca.project(df, "embedding", "emb_opq", opq)
    val errRaw = pqError(df, "embedding")
    val errOpq = pqError(rotated, "emb_opq")
    assert(errOpq < errRaw * 0.95,
      s"OPQ rotation did not help: raw=$errRaw opq=$errOpq")
  }
}
