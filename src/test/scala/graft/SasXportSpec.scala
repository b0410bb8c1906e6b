package graft

import java.nio.file.Files

import graft.sources.SasXport

/** read_sas / to_sas (XPORT v5). pandas reads this format but cannot
  * write it, so cross-implementation evidence runs writer-first: the
  * committed fixture (src/test/resources/fixture_graft.xpt) was written
  * by SasXport.write, parsed by pandas.read_sas, and pandas' parse
  * committed alongside as fixture_pandas_read.csv — the spec pins our
  * reader to byte-for-byte agreement with what pandas extracted from
  * the same bytes. Plus IBM-float edge cases and round trips. */
class SasXportSpec extends SparkSuite {

  private val fixture = "src/test/resources/fixture_graft.xpt"
  private val pandasCsv = "src/test/resources/fixture_pandas_read.csv"

  test("IBM hex float conversion round-trips IEEE doubles exactly") {
    val vals = Seq(0.0, 1.0, -1.0, 0.5, -0.25, 1.5, 3.141592653589793,
      1e-10, -1e-10, 1e15, -1e15, 123456789.123456, 1e-75, -1e-75,
      1.7976931348623157e75, -1.7976931348623157e75)
    vals.foreach { v =>
      val ibm = SasXport.ieeeToIbm(v)
      val back = SasXport.ibmToIeee(ibm, 0, 8)
      assert(back == v, s"$v -> ${ibm.map(b => f"$b%02x").mkString} -> $back")
    }
    // below 16^-65 the format has no representation: flush to zero (SAS rule)
    assert(SasXport.ibmToIeee(SasXport.ieeeToIbm(1e-90), 0, 8) == 0.0)
    // above 16^63 nothing fits: fail loudly rather than corrupt
    assert(intercept[IllegalArgumentException](SasXport.ieeeToIbm(1e76))
      .getMessage.contains("overflows"))
  }

  test("IBM missing codes read as null; true zero reads as 0.0") {
    val dot = new Array[Byte](8); dot(0) = '.'.toByte
    assert(SasXport.ibmToIeee(dot, 0, 8) == null)
    val za = new Array[Byte](8); za(0) = 'A'.toByte
    assert(SasXport.ibmToIeee(za, 0, 8) == null)
    val us = new Array[Byte](8); us(0) = '_'.toByte
    assert(SasXport.ibmToIeee(us, 0, 8) == null)
    assert(SasXport.ibmToIeee(new Array[Byte](8), 0, 8) == 0.0)
  }

  test("truncated numerics (nlng < 8) decode with zero-extension") {
    val full = SasXport.ieeeToIbm(42.5)
    // SAS LENGTH 4 keeps the top 4 bytes; 42.5 = 0x2A.8 needs few bits
    assert(SasXport.ibmToIeee(full, 0, 4) == 42.5)
  }

  test("reads the committed fixture exactly as pandas.read_sas parsed the same bytes") {
    val ours = SasXport.read(spark, fixture).orderBy("ID").collect()
    val lines = Files.readAllLines(java.nio.file.Paths.get(pandasCsv))
    val header = lines.get(0).split(",", -1).toSeq
    assert(header == Seq("ID", "QTY", "PRICE", "FLAG", "NAME"))
    val expect = (1 until lines.size).map(i => lines.get(i).split(",", -1).toSeq)
    assert(ours.length == expect.size)
    // pandas' XPORT decoder does not special-case IBM true zero (all-zero
    // bytes): it runs the exponent arithmetic anyway and yields exactly
    // 2^-260 (= 16^(0-65)). Equate our 0.0 with that documented quirk.
    def sameNum(mine: Double, pandas: String): Boolean =
      mine == pandas.toDouble || (mine == 0.0 && pandas.toDouble == math.pow(2, -260))
    ours.zip(expect).foreach { case (r, e) =>
      assert(sameNum(r.getDouble(0), e(0)))
      if (e(1).isEmpty) assert(r.isNullAt(1)) else assert(sameNum(r.getDouble(1), e(1)))
      if (e(2).isEmpty) assert(r.isNullAt(2)) else assert(sameNum(r.getDouble(2), e(2)))
      assert(sameNum(r.getDouble(3), e(3)))
      assert(r.getString(4) == e(4))
    }
  }

  test("write -> read round-trips values, nulls, NaN-as-missing, and blank strings") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.5), "alpha", true),
      (2L, None, "", false),
      (3L, Some(Double.NaN), "gamma delta", true),
      (4L, Some(-2.75e10), "z", false)).toDF("ID", "X", "S", "FLAG")
    val d = Files.createTempDirectory("graft_xpt").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "t.xpt").getAbsolutePath
    SasXport.write(df, p)
    val back = SasXport.read(spark, p)
    // the format has exactly two types: everything numeric is double
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      ("ID", "double"), ("X", "double"), ("S", "string"), ("FLAG", "double")))
    val rows = back.orderBy("ID").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(rows(0).getDouble(1) == 1.5 && rows(1).isNullAt(1) &&
      rows(2).isNullAt(1) && rows(3).getDouble(1) == -2.75e10)
    assert(rows.map(_.getString(2)).toSeq == Seq("alpha", "", "gamma delta", "z"))
    assert(rows.map(_.getDouble(3)).toSeq == Seq(1.0, 0.0, 1.0, 0.0))
  }

  test("multi-file directory read aligns by name; type clash goes string") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_xpt_multi").toFile
    d.deleteOnExit()
    SasXport.write(Seq((1.0, "a")).toDF("K", "V"),
      new java.io.File(d, "a.xpt").getAbsolutePath)
    SasXport.write(Seq(("x", 9.0)).toDF("V", "W"),
      new java.io.File(d, "b.xpt").getAbsolutePath)
    val df = SasXport.read(spark, d.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq == Seq("K", "V", "W"))
    assert(df.schema("V").dataType.typeName == "string")
    val rows = df.orderBy("V").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "a" && rows(0).getDouble(0) == 1.0 && rows(0).isNullAt(2))
    assert(rows(1).getString(1) == "x" && rows(1).isNullAt(0) && rows(1).getDouble(2) == 9.0)
  }

  test("oversized names and non-XPORT bytes fail loudly") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_xpt_err").toFile
    d.deleteOnExit()
    val e = intercept[IllegalArgumentException](
      SasXport.write(Seq((1.0, 2.0)).toDF("TOOLONGNAME", "B"),
        new java.io.File(d, "w.xpt").getAbsolutePath))
    assert(e.getMessage.contains("8 ASCII"))
    val fake = new java.io.File(d, "f.xpt")
    Files.write(fake.toPath, Array.fill[Byte](160)('x'.toByte))
    val e2 = intercept[Exception](SasXport.read(spark, fake.getAbsolutePath).collect())
    assert(e2.getMessage.contains("XPORT"))
  }
}
