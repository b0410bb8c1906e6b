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
}
