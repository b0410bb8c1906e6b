package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.plans.GraftExtensions

/** The native codegen'd simhash must agree bit-for-bit with the
  * expression-tree version it accelerates. */
class SimHash64Spec extends SparkSuite {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("native graft_simhash equals Text.simhash on documents") {
    val d = table("documents")
      .withColumn("toks", Text.wordTokens(col("text")))
      .select(
        Text.simhash(col("toks")).as("tree"),
        call_function("graft_simhash", col("toks")).as("native"))
    assert(d.filter(col("tree") =!= col("native")).count() == 0)
    assert(d.count() > 0)
  }

  test("native simhash edge cases: empty array, empty string, duplicates") {
    import spark.implicits._
    val d = Seq(
      Seq.empty[String],
      Seq(""),
      Seq("a", "a", "b"),
      Seq("a", "b")).toDF("toks")
      .select(
        Text.simhash(col("toks")).as("tree"),
        call_function("graft_simhash", col("toks")).as("native"))
    d.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch: $r")
    }
  }

  test("graft_simhash is callable from SQL") {
    table("documents").createOrReplaceTempView("docs_v")
    val n = spark.sql(
      """SELECT graft_simhash(split(trim(lower(text)), '\\s+')) AS h
        |FROM docs_v""".stripMargin)
      .filter(col("h").isNotNull).count()
    assert(n == table("documents").count())
  }
}
