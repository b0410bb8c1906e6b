package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Fixed-width file source (pandas `read_fwf`; the reference routes it
 * through its text dispatcher's byte-range splitting,
 * modin/core/io/text/text_file_dispatcher.py:988). Spark's text source
 * performs the identical newline-aligned byte split natively; each column
 * is then a codegen'd substring → trim → cast projection — no UDF, no
 * driver-side parsing, scales like any other text scan.
 */
object FixedWidth {

  /** Read `path` as fixed-width text. `colspecs` are
    * (name, start, end, sparkType) with pandas' 0-based half-open
    * [start, end) character intervals. Values are trimmed before the
    * cast, so both left- and right-aligned fields parse; a blank or
    * beyond-line-length field is NULL (pandas NaN) for every type —
    * without the guard string columns would keep "" while numeric ones
    * null out via the failed cast. */
  def read(spark: SparkSession, path: String,
      colspecs: Seq[(String, Int, Int, String)]): DataFrame =
    spark.read.text(path).select(colspecs.map { case (name, start, end, dt) =>
      val field = trim(substring(col("value"), start + 1, end - start))
      when(field =!= "", field).cast(dt).as(name)
    }: _*)
}
