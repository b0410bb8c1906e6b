package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityModel

/** Trainable quality-classifier semantics: the fit is deterministic, the
  * model actually learns a planted signal, zero-token docs are excluded,
  * and the model state stays bounded at dim+1 rows. */
class QualityModelSpec extends SparkSuite {

  // Planted signal: positive docs carry marker tokens, negatives don't.
  private def corpus() = {
    import spark.implicits._
    (0 until 60).map { i =>
      val good = i % 2 == 0
      val base = s"filler_${i % 7} common words here"
      val text = if (good) s"$base quality signal marker" else s"$base noise junk"
      (i.toLong, text, if (good) 1.0 else 0.0)
    }.toDF("id", "text", "y")
  }

  private def fit(d: org.apache.spark.sql.DataFrame, dim: Int = 64) = {
    val feats = QualityModel.hashedFeatures(d, "id", "text", dim)
    QualityModel.trainLogReg(feats, d.select(col("id"), col("y")), "id",
      dim, iters = 25, lr = 2.0)
  }

  test("the classifier separates a planted marker-token signal") {
    val d = corpus()
    val w = fit(d)
    val scored = QualityModel.score(d, w, "id", "text", 64)
      .join(d.select(col("id"), col("y")), "id")
    val acc = scored
      .select(avg(when((col("score") >= 0.5) === (col("y") === 1.0), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"planted-signal training accuracy only $acc")
  }

  test("the fit is bit-deterministic across runs") {
    val d = corpus()
    val a = fit(d).orderBy("bucket").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = fit(d).orderBy("bucket").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("model state is exactly dim+1 rows; every weight rounded to 8dp") {
    val w = fit(corpus(), dim = 32).collect()
    assert(w.length == 33)
    assert(w.map(_.getLong(0)).min == -1L)
    w.foreach { r =>
      val v = r.getDouble(1)
      assert(v == Math.round(v * 1e8) / 1e8.toDouble, s"unrounded weight $v")
    }
  }

  test("zero-token docs get no features and no score row") {
    import spark.implicits._
    val d = Seq((1L, "some words", 1.0), (2L, "   ", 0.0), (3L, "", 0.0))
      .toDF("id", "text", "y")
    assert(QualityModel.hashedFeatures(d, "id", "text", 16)
      .select("id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
    val w = fit(d, dim = 16)
    assert(QualityModel.score(d, w, "id", "text", 16)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("presence features are 0/1 per distinct bucket; tf features sum to 1") {
    import spark.implicits._
    val d = Seq((1L, "a a b")).toDF("id", "text")
    val p = QualityModel.hashedFeatures(d, "id", "text", 8, presence = true)
      .collect()
    assert(p.forall(_.getDouble(2) == 1.0))
    val tf = QualityModel.hashedFeatures(d, "id", "text", 8, presence = false)
      .agg(sum("x")).head().getDouble(0)
    assert(math.abs(tf - 1.0) < 1e-12)
  }
}
