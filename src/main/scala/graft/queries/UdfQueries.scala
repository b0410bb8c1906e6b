package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.Multimodal
import QueryKit._

/** Typed row for the axis=1 apply query (§2.13). */
final case class LiNet(l_orderkey: Long, l_returnflag: String,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double)

/** Custom Aggregator (§2.13 custom agg fns): RMS over exact integer
  * cents — the buffer is (Σc² hi, Σc² lo, n) so partial merges are exact
  * and order-independent; only the final sqrt touches floating point.
  * Σc² is carried base-10¹⁸ across TWO longs: one long overflows past
  * ~40k rows of 6-digit prices (c ≈ 1.5e7 cents → c² ≈ 2e14 → Σ passes
  * 2⁶³ near 4e4 rows per group — the sf0.1 gate caught exactly this),
  * while the split pair is exact to ~9e36, beyond any corpus. */
object RmsCentsAgg extends Aggregator[Long, (Long, Long, Long), Double] {
  private val Base = 1000000000000000000L // 1e18; c² ≤ ~4e15 keeps lo < 2⁶³
  def zero: (Long, Long, Long) = (0L, 0L, 0L)
  def reduce(b: (Long, Long, Long), c: Long): (Long, Long, Long) = {
    val lo = b._2 + c * c
    if (lo >= Base) (b._1 + lo / Base, lo % Base, b._3 + 1)
    else (b._1, lo, b._3 + 1)
  }
  def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) = {
    val lo = a._2 + b._2
    if (lo >= Base) (a._1 + b._1 + lo / Base, lo % Base, a._3 + b._3)
    else (a._1 + b._1, lo, a._3 + b._3)
  }
  def finish(r: (Long, Long, Long)): Double =
    if (r._3 == 0) Double.NaN
    else math.sqrt((r._1.toDouble * Base + r._2.toDouble) / r._3) / 100.0
  def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/**
 * §2.13 UDF / UDAF / UDTF surface (reference: QC:3469 df.apply axis=1;
 * QC:4260 groupby.apply via forced range shuffle; QC:4236 custom agg
 * dispatch; QC:1758 rolling.apply).
 *
 * Spark mapping demonstrated here: typed `Dataset.map` (row UDF),
 * `groupByKey.mapGroups` (group UDF — one hash shuffle, arbitrary Scala
 * per group), `Aggregator`-as-udaf (custom agg participating in partial
 * aggregation like any built-in), and the multimodal `mapPartitions`
 * batch stage. rolling.apply is the windowed-collect_list lambda shown
 * in q116 (roll_rank).
 */
object UdfQueries {

  val all: Seq[Q] = Seq(

    // df.apply(axis=1): typed per-row function computing the net price,
    // then an exact integer aggregate of the result. The row fn converts
    // to 1e-4 units with math.round — identical association order and
    // rounding as the oracle's expression.
    Q("q126_apply_rowwise",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ds = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .as[LiNet]
        val mapped = ds.map { r =>
          val net = r.l_quantity * r.l_extendedprice * (1 - r.l_discount) * (1 + r.l_tax)
          (r.l_returnflag, math.round(net * 10000))
        }.toDF("l_returnflag", "net4")
        Frame(mapped.groupBy(col("l_returnflag"))
          .agg(sum(col("net4")).as("sum_net4"), count(lit(1)).as("n")))
          .sortValues(Seq(SortKey.asc("l_returnflag"))).df
      },
      Some("""
        SELECT l_returnflag,
               CAST(sum(CAST(round(l_quantity * l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_net4,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // groupby.apply(f): arbitrary Scala per group via groupByKey.mapGroups
    // (the reference force-shuffles for .apply — same physics here).
    Q("q127_groupby_apply",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ds = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .as[(Long, Double)]
        val perGroup = ds.groupByKey(_._1).mapGroups { (k, it) =>
          var mn = Double.MaxValue; var mx = Double.MinValue; var n = 0L
          it.foreach { case (_, q) => if (q < mn) mn = q; if (q > mx) mx = q; n += 1 }
          (k, mx - mn, n)
        }.toDF("l_orderkey", "qty_range", "n")
        Frame(perGroup.withColumn("qty_range", round(col("qty_range"), 2)))
          .sortValues(Seq(SortKey.asc("l_orderkey"))).df
      },
      Some("""
        SELECT l_orderkey, round(max(l_quantity) - min(l_quantity), 2) AS qty_range,
               count(*) AS n
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // Custom Aggregator registered as a udaf: RMS of o_totalprice per
    // status. The (Σc², n) buffer merges exactly like a built-in partial
    // aggregate — no collect, no per-group materialization.
    Q("q128_custom_udaf",
      (s, dir) => {
        val rmsUdaf = udaf(RmsCentsAgg)
        val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        Frame(t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(round(rmsUdaf(cents), 4).as("rms_price")))
          .sortValues(Seq(SortKey.asc("o_orderstatus"))).df
      },
      Some("""
        SELECT o_orderstatus,
               round(sqrt(sum(c * c) / count(*)) / 100.0, 4) AS rms_price
        FROM (SELECT o_orderstatus,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Multimodal: binary payload + typed metadata + per-partition batch
    // feature extraction (stubbed codec — see ops.Multimodal). All
    // aggregates are exact integer sums, so the round-trip through the
    // binary representation is oracle-checked bit-for-bit.
    Q("q129_multimodal_features",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val packed = Multimodal.pack(docs, "doc_id", "text")
        val feats = Multimodal.extractFeatures(packed, "doc_id")
        Frame(feats.join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_bytes")).cast("long").as("sum_bytes"),
            sum(col("feat0")).as("sum_first_byte"),
            sum(col("feat1")).as("sum_byte_total")))
          .sortValues(Seq(SortKey.asc("lang"))).df
      },
      Some("""
        SELECT lang, count(*) AS n,
               CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
               CAST(sum(ascii(substr(text, 1, 1))) AS BIGINT) AS sum_first_byte,
               sum(list_sum(list_transform(regexp_extract_all(text, '.'),
                                            ch -> ascii(ch)))) :: BIGINT AS sum_byte_total
        FROM documents GROUP BY lang ORDER BY lang""")))
}
