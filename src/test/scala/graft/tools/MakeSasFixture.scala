package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off generator for src/test/resources/fixture_graft.xpt — the
  * writer-side half of the SasXportSpec cross-validation loop (the
  * committed CSV twin is pandas.read_sas's parse of this exact file).
  * Values exercise the IBM-float paths: negatives, fractions that need
  * base-16 shifting, a large magnitude, missings, and blank strings. */
object MakeSasFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // Shaped so the data region is card-exact (6 rows x 40 bytes = 3
    // records, zero padding): pandas' trailing-pad heuristic counts any
    // 8-aligned all-blank word in the LAST card as padding, so a
    // blank-padded string field there would make it undercount rows.
    // The "" string sits mid-file for the same reason.
    val df = Seq(
      (1.0, Some(3.0), Some(19.99), 1.0, "alpha"),
      (2.0, None, Some(-0.125), 0.0, "betagamm"),
      (3.0, Some(250.0), None, 1.0, ""),
      (4.0, Some(7.0), Some(1.23456789e8), 0.0, "delta"),
      (5.0, Some(-42.0), Some(2.5e-7), 1.0, "e"),
      (6.0, Some(1e12), Some(-9.75e20), 0.0, "zz zz")
    ).toDF("ID", "QTY", "PRICE", "FLAG", "NAME")
    graft.sources.SasXport.write(df, args.headOption
      .getOrElse("src/test/resources/fixture_graft.xpt"))
    spark.stop()
  }
}
