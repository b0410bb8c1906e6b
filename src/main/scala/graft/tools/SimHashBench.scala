package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.plans.GraftExtensions

/** Micro-bench: expression-tree simhash vs the native codegen'd
  * expression (graft.plans.SimHash64) on sf0.1 documents. */
object SimHashBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("toks", Text.wordTokens(col("text"))).cache()
    docs.count()
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.collect() // warm (codegen)
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => mk.collect())
      println(f"$name: ${(System.nanoTime() - t0) / 3e9}%.3f s/run")
    }
    time("simhash tree  ")(docs.agg(sum(pmod(Text.simhash(col("toks")), lit(1000000L)))))
    time("simhash native")(docs.agg(sum(pmod(call_function("graft_simhash", col("toks")), lit(1000000L)))))

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    emb.count()
    val q = emb.limit(20).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    import graft.functions.Similarity
    time("cosine tree   ")(emb.crossJoin(broadcast(q))
      .agg(sum(Similarity.cosine(col("embedding"), col("qvec")))))
    time("cosine native ")(emb.crossJoin(broadcast(q))
      .agg(sum(call_function("graft_cosine", col("embedding"), col("qvec")))))
    spark.stop()
  }
}
