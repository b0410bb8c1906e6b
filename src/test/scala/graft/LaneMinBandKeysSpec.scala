package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.LaneMinBandKeys

/** The native band-key kernel must be value-identical to the declarative
  * substr/array_min/md5/concat_ws/unhex tree it replaced — on real
  * corpus digests and on the edges (null digest elements, empty arrays,
  * short strings), and identical between interpreted eval and the
  * codegen path. The DuckDB side of the same formula is pinned by the
  * oracle rows (q104b/q106/q254/q256/q259/q260/q232). */
class LaneMinBandKeysSpec extends SparkSuite {

  private def declarative(digArr: Column, nBands: Int, rowsPerBand: Int): Column =
    array((0 until nBands).map { bnd =>
      unhex(substring(md5(concat_ws("|", (0 until rowsPerBand).map { r =>
        val off = bnd * rowsPerBand + r
        array_min(transform(digArr, dg => substring(dg, off + 1, 16)))
      }: _*)), 1, 16))
    }: _*)

  private def assertSame(df: org.apache.spark.sql.DataFrame, digArr: Column,
      nBands: Int, rowsPerBand: Int): Unit = {
    graft.plans.GraftExtensions.register(spark)
    val rows = df.select(
      graft.ops.Dedup.md5BandKeysFromDigests(digArr, nBands, rowsPerBand).as("k"),
      declarative(digArr, nBands, rowsPerBand).as("e")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getSeq[Array[Byte]](0).map(_.toSeq)
      val e = r.getSeq[Array[Byte]](1).map(_.toSeq)
      assert(k == e, s"kernel $k != declarative $e")
    }
  }

  test("kernel == declarative tree on the documents fixture (4 bands x 4 rows)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val dg = graft.ops.Dedup.shingleDigests(
      array_distinct(graft.functions.Text.shingles(col("text"), 3)))
    assertSame(docs, dg, nBands = 4, rowsPerBand = 4)
    assertSame(docs, dg, nBands = 4, rowsPerBand = 1) // q106's shape
  }

  test("edges: null digest elements skipped, empty array, short strings") {
    import spark.implicits._
    val df = Seq(
      (1, Seq("0123456789abcdef0123456789abcdef", "fedcba9876543210fedcba9876543210")),
      (2, Seq[String](null, "00000000000000000000000000000001")),
      (3, Seq[String]()),
      (4, Seq("ab", "abc", "")), // shorter than any lane window
      (5, Seq[String](null, null))).toDF("id", "dgs")
    assertSame(df, col("dgs"), nBands = 4, rowsPerBand = 4)
  }

  test("interpreted eval matches the plan-computed result") {
    graft.plans.GraftExtensions.register(spark)
    val digests = Seq("0123456789abcdef0123456789abcdef",
      "fedcba9876543210fedcba9876543210", "aaaaaaaaaaaaaaaaffffffffffffffff")
    val expr = LaneMinBandKeys(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        digests, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 4, 4)
    val interp = expr.eval(null).asInstanceOf[GenericArrayData]
      .toObjectArray(org.apache.spark.sql.types.BinaryType)
      .map(_.asInstanceOf[Array[Byte]].toSeq).toSeq
    import spark.implicits._
    val fromPlan = Seq(Tuple1(digests)).toDF("dgs")
      .select(graft.ops.Dedup.md5BandKeysFromDigests(col("dgs"), 4, 4))
      .collect().head.getSeq[Array[Byte]](0).map(_.toSeq)
    assert(interp == fromPlan)
  }

  test("window compare is unsigned bytewise with substr take-what-exists lengths") {
    def u(s: String) = UTF8String.fromString(s)
    // equal prefixes, shorter sorts first
    assert(LaneMinBandKeys.cmpWindow(u("abc"), u("abcd"), 0, 16) < 0)
    // offset beyond one string: empty window sorts first
    assert(LaneMinBandKeys.cmpWindow(u("ab"), u("abcdef"), 3, 16) < 0)
    assert(LaneMinBandKeys.cmpWindow(u("abcdef"), u("ab"), 3, 16) > 0)
    // plain lexicographic inside the window
    assert(LaneMinBandKeys.cmpWindow(u("xay"), u("xby"), 1, 1) < 0)
    assert(LaneMinBandKeys.cmpWindow(u("xx"), u("xx"), 0, 16) == 0)
  }
}
