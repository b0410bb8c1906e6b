package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Measures Bpe.train's driver-action batching (r16): same corpus, same
  * numMerges, batchTopK=1 (the old one-merge-per-round greedy loop) vs
  * the default batch — wall seconds, scheduled Spark jobs, and merge
  * SEQUENCE equality (the batching is only legal because the sequence is
  * provably identical; this main re-asserts it on the measured corpus).
  *
  * Env: SPARK_GRAFT_SF_DIR (docs parquet dir), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BPE_MERGES (default 30), SPARK_GRAFT_BPE_DOCS (optional
  * row cap). Args: optional path to a documents.parquet override.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docsPath = args.headOption.getOrElse(s"$sfDir/documents.parquet")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "30").toInt
    val spark = graft.ScaleBench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    })

    var docs = spark.read.parquet(docsPath).select(col("doc_id"), col("text"))
    sys.env.get("SPARK_GRAFT_BPE_DOCS").foreach(n => docs = docs.limit(n.toInt))
    docs.queryExecution.toRdd.foreach(_ => ()) // warm the scan

    def run(k: Int): (Double, Int, Seq[Bpe.Merge]) = {
      jobs = 0
      val t0 = System.nanoTime()
      val m = Bpe.train(docs, "text", numMerges = merges, batchTopK = k)
      ((System.nanoTime() - t0) / 1e9, jobs, m)
    }
    // interleave the two sides so drift hits both equally
    val (g1, jg1, mg) = run(1)
    val (b1, jb1, mb) = run(8)
    val (g2, jg2, _) = run(1)
    val (b2, jb2, _) = run(8)
    require(mg == mb, "merge sequences diverged — batching bug")
    println(f"""{"metric":"bpe_train","merges":$merges,"seq_identical":true,"greedy_sec":[$g1%.3f,$g2%.3f],"batched_sec":[$b1%.3f,$b2%.3f],"greedy_jobs":[$jg1,$jg2],"batched_jobs":[$jb1,$jb2],"docs":"$docsPath"}""")
    spark.stop()
  }
}
