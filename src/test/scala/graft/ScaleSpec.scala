package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

/** Physical-layout tools: the assertions here are about PLANS (shuffle
  * elimination) and result parity, the two things that matter at 100 TB. */
class ScaleSpec extends SparkSuite {

  test("bucketed join on the bucket key plans zero exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      // the in-memory catalog forgets tables between JVMs but their
      // warehouse dirs persist — clear both before recreating
      Seq("orders_b", "lineitem_b").foreach { tbl =>
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val dir = new java.io.File(s"/tmp/graft_warehouse/$tbl")
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dir)
        }
      }
      Scale.writeBucketed(table("orders"), "orders_b", 4, Seq("o_orderkey"))
      Scale.writeBucketed(
        table("lineitem").select("l_orderkey", "l_quantity")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", 4, Seq("o_orderkey"))
      val joined = Scale.bucketedJoin(spark, "orders_b", "lineitem_b", Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // parity with the plain join
      val expected = table("orders").join(
        table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
          .select("o_orderkey", "l_quantity"), Seq("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // pathological skew: 90% of probe rows share one key
    val probe = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val build = Seq((1L, "hot"), (950L, "cold")).toDF("k", "tag")
    val salted = Scale.saltedJoin(probe, build, Seq("k"), saltFactor = 8)
    val plain = probe.join(build, Seq("k"))
    assertParity(salted, plain)
  }

  test("twoStageAgg equals direct groupBy for algebraic functions") {
    val direct = table("lineitem").groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
        max(col("l_extendedprice")).as("mx"))
    val staged = Scale.twoStageAgg(
      table("lineitem"), Seq("l_returnflag"), saltBuckets = 8,
      ("sum", "s", col("l_quantity")),
      ("count", "n", lit(1)),
      ("max", "mx", col("l_extendedprice")))
    assertParity(staged, direct)
  }

  test("writeZOrdered round-trips content exactly") {
    val src = table("lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val path = "/tmp/graft_zorder_roundtrip"
    Scale.writeZOrdered(src, path, Seq("l_orderkey", "l_partkey"),
      bitsPerDim = 6, numFiles = Some(4))
    assertParity(spark.read.parquet(path), src)
  }

  test("writeZOrdered clusters every z-dimension (narrow per-file spans)") {
    val src = table("lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val zPath = "/tmp/graft_zorder_layout"
    val sortPath = "/tmp/graft_singlesort_layout"
    Scale.writeZOrdered(src, zPath, Seq("l_orderkey", "l_partkey"),
      bitsPerDim = 8, numFiles = Some(16))
    // the single-column baseline: perfectly clustered on l_orderkey,
    // unclustered on l_partkey
    src.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(sortPath)

    // average per-file normalized span of a dimension = the fraction of
    // that dimension's value range a file's min/max stats cover — the
    // quantity parquet row-group pruning keys off
    def avgSpan(path: String, dim: String): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))
        .collect()
      val glo = stats.map(_.getAs[Long]("lo")).min.toDouble
      val ghi = stats.map(_.getAs[Long]("hi")).max.toDouble
      stats.map(r => (r.getAs[Long]("hi") - r.getAs[Long]("lo")) / (ghi - glo)).sum / stats.length
    }

    // 16 z-files fix the top 2 bucket bits of BOTH dims: each file spans
    // ~1/4 of each dimension (+ range-sampling slop)
    val zOrder = avgSpan(zPath, "l_orderkey")
    val zPart = avgSpan(zPath, "l_partkey")
    assert(zOrder < 0.5, s"z-order l_orderkey avg span $zOrder should be < 0.5")
    assert(zPart < 0.5, s"z-order l_partkey avg span $zPart should be < 0.5")
    // the baseline is clustered on l_orderkey only; its l_partkey spans
    // are ~the full range, and z-order must beat it decisively there
    val sortPart = avgSpan(sortPath, "l_partkey")
    assert(zPart < 0.6 * sortPart,
      s"z-order l_partkey span $zPart should be well under single-sort $sortPart")
  }

  test("q180's order contract: range partitioning + doc_id ordering survive the narrow map") {
    // q180 deliberately has NO trailing orderBy: its deterministic output
    // depends on RangePartitioning(doc_id) + in-partition sort surviving
    // the repetition-stats projection and the sink concatenating
    // partitions in index order. That is observed Spark behavior, not a
    // spec contract — pin it here so an AQE/Spark upgrade that stops
    // propagating the ordering fails THIS test loudly instead of
    // silently flipping the order-sensitive compare.
    import org.apache.spark.sql.catalyst.expressions.Ascending
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val df = graft.ops.Corpus.repetitionStats(
      queries.QueryKit.tSplitSorted(spark, sfDir, "documents", "doc_id"), "doc_id", "text")
    // the AQE wrapper reports no ordering/partitioning of its own —
    // assert on the current physical plan beneath it
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val ord = plan.outputOrdering
    assert(ord.nonEmpty && ord.head.direction == Ascending &&
        ord.head.child.references.exists(_.name == "doc_id"),
      s"doc_id ascending must survive to the sink; outputOrdering=$ord")
    plan.outputPartitioning match {
      case r: RangePartitioning =>
        assert(r.ordering.head.child.references.exists(_.name == "doc_id"),
          s"RangePartitioning key drifted off doc_id: ${r.ordering}")
      case p => fail(s"expected RangePartitioning(doc_id) to survive the narrow map; got $p")
    }
  }
}
