package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed cardinality estimation via the bottom-k (KMV) sketch.
  *
  * The reference's `nunique` (modin `base.py` nunique → query-compiler
  * distinct count) is exact: at 100 TB that is a full shuffle of every
  * distinct (group, value) pair — the exchange grows with column
  * cardinality. The KMV sketch (Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD 2007 "On synopses for distinct-value estimation") bounds the
  * per-group exchange at k longs REGARDLESS of cardinality: each task
  * keeps the k smallest distinct 60-bit hashes, partial buffers merge
  * like any algebraic aggregate (Spark's partial-agg machinery applies
  * unchanged), and the estimator is (k−1)·2⁶⁰ / h₍ₖ₎ with relative
  * error ~1/√k. The sketch itself is the aggregate's OUTPUT, so
  * per-day / per-shard sketches can be persisted and unioned later —
  * `merge` of stored sketches equals the sketch of the union (pinned in
  * SketchSpec), which is what an incremental 100 TB catalog needs.
  *
  * Engine-portable and oracle-exact: the hash is the same md5 60-bit
  * fold used across the dedup family (`'0x'||substr(md5(v),1,15)` in
  * DuckDB ≡ `conv(substring(md5(v),1,15),16,10)` here), the estimator
  * is a closed-form double expression evaluated identically by both
  * engines, and below k distinct values the sketch IS the exact answer.
  */
object Sketch {

  /** Uniform 60-bit hash of a column's string form — the portable fold
    * shared with Dedup/Dsir (identical bytes in Spark and DuckDB). Null
    * in → null out (callers drop nulls: nunique excludes NA). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Bottom-k distinct-hash aggregator. Buffer and output are the same
    * shape: a sorted ascending array of ≤ k distinct hashes. Holding
    * the INVARIANT (sorted, distinct, bounded) in every buffer keeps
    * reduce O(log k) for the common miss (value above current max with
    * a full buffer — one branch, no copy) and merge a linear zip. */
  final class BottomK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"bottom-k sketch needs k >= 2, got $k")

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], v: Long): Array[Long] = {
      val n = b.length
      if (n == k && v >= b(n - 1)) return b // full and not smaller: drop
      val i = java.util.Arrays.binarySearch(b, v)
      if (i >= 0) return b // already present
      val at = -i - 1
      val m = math.min(n + 1, k)
      val out = new Array[Long](m)
      System.arraycopy(b, 0, out, 0, at)
      out(at) = v
      System.arraycopy(b, at, out, at + 1, m - at - 1)
      out
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      // each input is sorted+distinct, so a duplicate across the two can
      // only appear at equal heads — consume both and emit once
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length) { val x = a(i); i += 1; x }
          else if (i >= a.length) { val x = b(j); j += 1; x }
          else if (a(i) < b(j)) { val x = a(i); i += 1; x }
          else if (b(j) < a(i)) { val x = b(j); j += 1; x }
          else { val x = a(i); i += 1; j += 1; x }
        out(o) = v; o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** The sketch as an untyped aggregate column over a 60-bit hash col. */
  def bottomKAgg(hashCol: Column, k: Int): Column =
    udaf(new BottomK(k), Encoders.scalaLong).apply(hashCol)

  /** Closed-form estimate from a sketch array column. Exact when the
    * sketch holds fewer than k values (every distinct hash is present);
    * otherwise (k−1)·2⁶⁰ / h₍ₖ₎, truncated to one decimal with
    * floor(x·10)/10 — floor is bit-deterministic on the identical IEEE
    * double both engines compute, where a round() could in principle
    * disagree on an exact .5 tie. */
  def estimate(sketch: Column, k: Int): Column = {
    val kth = element_at(sketch, k)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(math.pow(2, 60)) / kth * 10) / 10.0)
  }

  /** Per-group NDV estimate of `valueCol` with bounded exchange:
    * map-side the buffer caps at k longs per group per task, so the
    * shuffle carries ≤ k·|groups|·tasks longs — independent of the
    * value column's cardinality. Nulls are excluded (pandas nunique
    * dropna=True). */
  def ndvByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val hashed = df
      .filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ hash60(col(valueCol)).as("__h60"): _*)
    hashed.groupBy(groupCols.map(col): _*)
      .agg(bottomKAgg(col("__h60"), k).as("__sk"))
      .select(groupCols.map(col) :+
        size(col("__sk")).cast("long").as("sketch_size") :+
        estimate(col("__sk"), k).as("ndv_est"): _*)
  }
}
