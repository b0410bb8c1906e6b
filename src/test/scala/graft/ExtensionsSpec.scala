package graft

import org.apache.spark.sql.functions._
import graft.api.Frame
import graft.api.extensions._
import graft.ops.Monotonic

/** §2.13 extension system + the scalable monotonic check. */
class ExtensionsSpec extends SparkSuite {

  test("Frame extension accessor: nullRatios") {
    import spark.implicits._
    val d = Seq[(java.lang.Long, java.lang.Double)]((1L, 1.0), (2L, null), (3L, null))
      .toDF("a", "b")
    val r = Frame(d).nullRatios("a", "b").df.head()
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - 2.0 / 3.0) < 1e-12)
  }

  test("Frame extension accessor: snakeCased") {
    import spark.implicits._
    val f = Frame(Seq((1, 2)).toDF("someCol", "OtherVal")).snakeCased
    assert(f.df.columns.toSeq == Seq("some_col", "other_val"))
  }

  test("Column extension accessors compose into plans") {
    import spark.implicits._
    val d = Seq(1.0, 100.0, -50.0).toDF("x")
    val out = d.select(col("x").winsorized(0.0, 10.0).as("w"),
      col("x").zscore(17.0, 2.0).as("z")).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(1.0, 10.0, 0.0))
    assert(out.map(_.getDouble(1)).toSeq == Seq(-8.0, 41.5, -33.5))
  }

  test("Monotonic.check detects sorted, unsorted, and decreasing series") {
    import spark.implicits._
    val inc = (1 to 100).map(_.toDouble).toDF("v").withColumn("k", col("v"))
    assert(Monotonic.check(inc, "k", "v") == ((true, false)))
    val dec = (1 to 100).map(i => (i.toDouble, (100 - i).toDouble)).toDF("k", "v")
    assert(Monotonic.check(dec, "k", "v") == ((false, true)))
    val mixed = Seq((1.0, 5.0), (2.0, 3.0), (3.0, 9.0)).toDF("k", "v")
    assert(Monotonic.check(mixed, "k", "v") == ((false, false)))
    // boundary case: violation only ACROSS partitions, sorted within
    val boundary = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 5.0), (4.0, 6.0)).toDF("k", "v")
    assert(Monotonic.check(boundary, "k", "v")._1 == false)
  }
}
