package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.ops.Dedup

/** One-off diagnostic for the stage-1 size-ratio cull in the banded
  * near-dup verify (Dedup.sizeRatioBound): counts the band-join
  * candidate pairs BEFORE and AFTER the exact size-ratio bound at the
  * q106 operating point (shingleN=2, threshold=0.3, 4 single-hash md5
  * bands), over the ScaleDedupBench-amplified corpus at
  * SPARK_GRAFT_SCALE_FACTOR×. The "after" count is exactly the pair
  * volume the distinct exchange and the folded-set attach must carry —
  * the difference is what stage 1 saved the stage-2 sort. Prints one
  * JSON line; numbers recorded in SCALE_r12.json. */
object PrefilterProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "64").toInt
    val dupPct = sys.env.getOrElse("SPARK_GRAFT_DUP_PCT", "25").toInt
    val spark = graft.ScaleBench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.plans.GraftExtensions.register(spark)
    val dir = s"/tmp/graft_scale_dedup/x$factor"
    require(new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists(),
      s"run ScaleDedupBench at factor $factor first (amplified corpus missing)")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (shingleN, threshold, nBands) = (2, 0.3, 4)
    val banded = docs.select(col("doc_id"),
        array_distinct(Text.shingles(col("text"), shingleN)).as("__sh__"))
      .withColumn("__dg__", Dedup.shingleDigests(col("__sh__")))
      .select(col("doc_id"), size(col("__sh__")).as("__sz__"),
        posexplode(Dedup.md5BandKeysFromDigests(col("__dg__"), nBands, 1)))
      .withColumnRenamed("pos", "__band__").withColumnRenamed("col", "__key__")
    val a = banded.select(col("doc_id").as("id_a"), col("__sz__").as("sz_a"),
      col("__band__"), col("__key__"))
    val b = banded.select(col("doc_id").as("id_b"), col("__sz__").as("sz_b"),
      col("__band__"), col("__key__"))
    // the whole threshold curve in ONE pass over the band join: the cull
    // is threshold-monotone, so one ratio column feeds every cutoff
    val cuts = Seq(0.3, 0.5, 0.8)
    val ratio = least(col("sz_a"), col("sz_b")).cast("double") /
      greatest(col("sz_a"), col("sz_b")).cast("double")
    val joined = a.join(b, Seq("__band__", "__key__"))
      .filter(col("id_a") < col("id_b"))
      .select(ratio.as("r"))
      .agg(count(lit(1)).as("pre"),
        cuts.map(t => sum(when(col("r") >= t, 1L).otherwise(0L)).as(s"post_$t")): _*)
      .head()
    val pre = joined.getLong(0)
    val posts = cuts.indices.map(i => joined.getLong(i + 1))
    val perCut = cuts.zip(posts).map { case (t, p) =>
      f""""t$t":{"pairs_post":$p,"culled_frac":${1.0 - p.toDouble / pre}%.4f}"""
    }.mkString(",")
    println(s"""{"metric":"prefilter_selectivity","factor":$factor,"dup_pct":$dupPct,"shingle_n":$shingleN,"bands":$nBands,"pairs_pre":$pre,$perCut}""")
    spark.stop()
  }
}
