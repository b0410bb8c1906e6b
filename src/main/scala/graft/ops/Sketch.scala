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

  /** Exact φ-heavy-hitters (every value whose count ≥ φ·n, with its
    * EXACT count) without a cardinality-sized shuffle — the 100 TB path
    * for `value_counts` when only the frequent tail matters.
    *
    * The naive plan (`groupBy(value).count.filter`) shuffles every
    * distinct value; at corpus cardinality that exchange dwarfs the
    * answer. Here a per-partition Misra–Gries pass (FOCS '82 / the
    * "frequent" algorithm) keeps ⌈1/φ⌉ counters per task and emits only
    * its surviving CANDIDATE keys. Completeness is a pigeonhole
    * argument, not a heuristic: if count(v) ≥ φ·n = φ·Σnₚ then some
    * partition has countₚ(v) ≥ φ·nₚ, and Misra–Gries with c = ⌈1/φ⌉
    * counters retains every key whose partition count exceeds
    * nₚ/(c+1) < φ·nₚ — so every true heavy hitter survives in at least
    * one partition. The candidate set (≤ ⌈1/φ⌉ per task) broadcasts
    * back as a semi-join, and one partial-agg count over the filtered
    * rows yields EXACT counts; the final threshold compares integers
    * (cnt·phiDen ≥ n·phiNum), so false candidates drop out and the
    * result is deterministic regardless of partitioning — which is what
    * makes it hash-oracle-able against an engine that counted exactly.
    *
    * Exchanges: candidates (≤ tasks·⌈1/φ⌉ strings) + the semi-joined
    * count's partial rows (≤ tasks·⌈1/φ⌉) + one scalar. Per-task memory:
    * ⌈1/φ⌉ counters. Decrement-all events release c+1 count mass each,
    * so the MG pass is O(nₚ) amortized. Nulls excluded (pandas
    * value_counts dropna=True).
    *
    * Domain note: the 10M-counter guard (added round 11) is TIGHTER than
    * the old silent `.toInt` behavior, which was numerically correct for
    * any ⌈1/φ⌉ < 2³¹ and only overflowed above that. φ with ⌈1/φ⌉ in the
    * 10M–2³¹ band previously ran (memory-heavy: ~10⁸ map entries/task)
    * and now throws by design — that per-task state is the thing this
    * sketch exists to avoid; pre-aggregate or raise φ instead. */
  def heavyHitters(df: DataFrame, valueCol: String, phiNum: Long,
      phiDen: Long): DataFrame = {
    require(phiNum > 0 && phiDen > 0 && phiNum < phiDen,
      s"heavyHitters needs 0 < phi < 1, got $phiNum/$phiDen")
    val capL = (phiDen + phiNum - 1) / phiNum // ⌈1/φ⌉ counters
    require(capL <= 10000000L,
      s"heavyHitters counter cap ⌈1/φ⌉ = $capL exceeds the per-task memory "
        + "bound (10M counters) — raise phi or pre-aggregate")
    val cap = capL.toInt
    val spark = df.sparkSession
    import spark.implicits._
    val nonNull = df.filter(col(valueCol).isNotNull)
    val candidates = nonNull
      .select(col(valueCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counts = new scala.collection.mutable.HashMap[String, Long]
        it.foreach { v =>
          counts.get(v) match {
            case Some(c) => counts.update(v, c + 1L)
            case None if counts.size < cap => counts.update(v, 1L)
            case None =>
              // decrement-all: one occurrence of every tracked key plus
              // the arriving one die together (c+1 mass per event)
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              counts.foreach { case (k, c) =>
                if (c == 1L) dead += k else counts.update(k, c - 1L)
              }
              dead.foreach(counts.remove)
          }
        }
        counts.keysIterator
      }.toDF("__cand").distinct()
    val counted = nonNull
      .join(broadcast(candidates),
        col(valueCol).cast("string") === col("__cand"), "left_semi")
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
    val tot = nonNull.agg(count(lit(1)).as("__n"))
    counted.crossJoin(broadcast(tot))
      // decimal(38,0) keeps cnt·phiDen exact where long·long could
      // overflow (n ~ 10¹² rows × phiDen ~ 10⁹)
      .filter(col("cnt").cast("decimal(38,0)") * phiDen >=
        col("__n").cast("decimal(38,0)") * phiNum)
      .select(col(valueCol), col("cnt"))
  }

  /** Per-group [[heavyHitters]]: every (group, value) with value count
    * ≥ φ·n_group, exact counts — frequent tokens per language, top
    * domains per day, the group-relative frequent tail. The pigeonhole
    * completeness argument applies within each group unchanged: a
    * group-global φ-hitter is a local φ-hitter of that group's slice in
    * at least one partition, and each partition runs an independent
    * Misra–Gries per group (⌈1/φ⌉ counters each — per-task memory is
    * groups-seen-by-task × ⌈1/φ⌉, the documented bound; group counts are
    * usually dimension-sized). Group keys fold to a length-prefixed (collision-free) string
    * for the candidate pass; the verify aggregate keeps the original
    * typed columns. The per-group totals are one |groups|-row aggregate
    * broadcast back, and the threshold compare is exact decimal —
    * deterministic output regardless of candidate wobble. */
  def heavyHittersByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, phiNum: Long, phiDen: Long): DataFrame = {
    require(groupCols.nonEmpty, "use heavyHitters for the ungrouped form")
    require(phiNum > 0 && phiDen > 0 && phiNum < phiDen,
      s"heavyHittersByGroup needs 0 < phi < 1, got $phiNum/$phiDen")
    val capL = (phiDen + phiNum - 1) / phiNum
    require(capL <= 10000000L,
      s"heavyHittersByGroup counter cap ⌈1/φ⌉ = $capL exceeds the per-task "
        + "memory bound (10M counters per group) — raise phi or pre-aggregate")
    val cap = capL.toInt
    val spark = df.sparkSession
    import spark.implicits._
    val nonNull = df.filter(col(valueCol).isNotNull &&
      groupCols.map(col(_).isNotNull).reduce(_ && _))
    // Length-prefixed field encoding: "len:value" segments concatenate
    // prefix-free, so NO byte sequence inside a key value (incl. any
    // would-be delimiter) can make two distinct group tuples encode
    // equal — the pigeonhole completeness argument needs that.
    val gkey = concat(groupCols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(length(s).cast("string"), lit(":"), s)
    }: _*)
    val candidates = nonNull
      .select(gkey.as("g"), col(valueCol).cast("string").as("v"))
      .as[(String, String)]
      .mapPartitions { it =>
        val groups = new scala.collection.mutable.HashMap[
          String, scala.collection.mutable.HashMap[String, Long]]
        it.foreach { case (g, v) =>
          val counts = groups.getOrElseUpdate(g,
            new scala.collection.mutable.HashMap[String, Long])
          counts.get(v) match {
            case Some(c) => counts.update(v, c + 1L)
            case None if counts.size < cap => counts.update(v, 1L)
            case None =>
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              counts.foreach { case (k, c) =>
                if (c == 1L) dead += k else counts.update(k, c - 1L)
              }
              dead.foreach(counts.remove)
          }
        }
        groups.iterator.flatMap { case (g, m) => m.keysIterator.map(g -> _) }
      }.toDF("__cg", "__cand").distinct()
    val counted = nonNull
      .join(broadcast(candidates),
        gkey === col("__cg") && col(valueCol).cast("string") === col("__cand"),
        "left_semi")
      .groupBy(groupCols.map(col) :+ col(valueCol): _*)
      .agg(count(lit(1)).as("cnt"))
    val totals = nonNull.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    counted.join(broadcast(totals), groupCols)
      .filter(col("cnt").cast("decimal(38,0)") * phiDen >=
        col("__n").cast("decimal(38,0)") * phiNum)
      .select(groupCols.map(col) :+ col(valueCol) :+ col("cnt"): _*)
  }

  /** 10^e as an exact long (e ≤ 18). */
  private def pow10L(e: Int): Long = {
    require(e >= 0 && e <= 18, s"scale out of range: $e")
    var r = 1L; var i = 0; while (i < e) { r *= 10L; i += 1 }; r
  }

  /** Value quantized to round-half-up integer units of 10^−scale —
    * floor(x·10^s + 0.5) for s ≥ 0, floor(x/10^−s + 0.5) below (divide
    * by the EXACT integer power rather than multiplying by an inexact
    * 0.1…, so both engines evaluate the identical IEEE expression). */
  def quantize(c: Column, scale: Int): Column =
    if (scale >= 0) floor(c * lit(pow10L(scale)) + lit(0.5)).cast("long")
    else floor(c / lit(pow10L(-scale)) + lit(0.5)).cast("long")

  /** Weighted quantile over the quantized histogram — numpy 2.0's
    * `quantile(…, weights=…, method='inverted_cdf')`, the corpus-
    * budgeting primitive (token- or byte-weighted percentile cuts:
    * "the quality threshold below which 10 % of TOKENS fall"). Weights
    * must be positive integers (token counts, sizes — rows with null or
    * non-positive weight drop, numpy's non-negativity contract), so the
    * histogram accumulates EXACT long weight sums and the selection rule
    * — smallest value whose cumulative weight covers q·W, compared as
    * cum·den ≥ W·num in decimal(38,0) — is pure integer arithmetic:
    * deterministic in any partition order, hash-oracle-able. Inverted
    * CDF picks an actual data value (no interpolation), so the only
    * inexactness is the declared 10^−scale quantization. State and
    * exchanges are the span-bounded histogram, never the data. */
  def weightedQuantileQuantized(df: DataFrame, valueCol: String,
      weightCol: String, qs: Seq[(Long, Long)], scale: Int): DataFrame =
    weightedQuantileQuantizedBy(df, Nil, valueCol, weightCol, qs, scale)

  /** Per-group [[weightedQuantileQuantized]] — per-domain token-weighted
    * cuts ("each language's price-per-token p90"): the weighted
    * histogram carries the group key, the cumulative-weight window
    * partitions by group. */
  def weightedQuantileQuantizedBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String, qs: Seq[(Long, Long)],
      scale: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => n > 0 && d > 0 && n <= d },
      s"weighted quantiles must be rationals in (0,1], got $qs")
    import org.apache.spark.sql.expressions.Window
    val w = col(weightCol).cast("long")
    val hist = df
      .filter(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")) && w.isNotNull && w > 0)
      .groupBy((groupCols.map(col) :+ quantize(col(valueCol), scale).as("__qv")): _*)
      .agg(sum(w).as("__w"))
    def part = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("__w")).over(part.orderBy(col("__qv"))))
      .withColumn("__W", sum(col("__w")).over(part))
    val aggs = qs.zipWithIndex.map { case ((num, den), i) =>
      min(when(col("__cum").cast("decimal(38,0)") * den >=
        col("__W").cast("decimal(38,0)") * num, col("__qv"))).as(s"__v$i")
    }
    val picked =
      if (groupCols.isEmpty) cum.agg(aggs.head, aggs.tail: _*)
      else cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val rows = qs.zipWithIndex.map { case ((num, den), i) =>
      val value =
        if (scale >= 0) col(s"__v$i").cast("double") / lit(pow10L(scale))
        else (col(s"__v$i") * lit(pow10L(-scale))).cast("double")
      struct(lit(num).as("q_num"), lit(den).as("q_den"),
        lit(num.toDouble / den).as("q"), value.as("value"))
    }
    picked
      .select((groupCols.map(col) :+ explode(array(rows: _*)).as("__p")): _*)
      .select((groupCols.map(col) :+ col("__p.q_num").as("q_num") :+
        col("__p.q_den").as("q_den") :+ col("__p.q").as("q") :+
        col("__p.value").as("value")): _*)
  }

  /** `describe()` on the bounded-state path — the whole pandas summary
    * (count, mean, std, min, 25/50/75%, max) without buffering the
    * column: count/mean/std fold EXACT integer moments of the quantized
    * values (sums in decimal(38,0) — associative in any partition
    * order, so the one double conversion at the end is bit-identical
    * cross-engine; the q248 idiom applied to second moments), min/max
    * are exact on the raw values, and the quartiles ride
    * [[quantileQuantized]]'s span-bounded histogram. Two data passes
    * total (moments+extrema in one aggregate, the histogram in the
    * other), every exchange bounded. Output is the pandas long form:
    * one (stat, value) row each for count, mean, std, min, 25%, 50%,
    * 75%, max — mean/std/quartiles carry the deterministic 10^−scale
    * quantization error, the rest are exact. */
  def describeQuantized(df: DataFrame, valueCol: String, scale: Int): DataFrame =
    describeQuantizedBy(df, Nil, valueCol, scale)

  /** Per-group [[describeQuantized]]: moments and quartiles both carry
    * the group key (per-group state = one moment row + that group's
    * bounded histogram), joined on keys — output one (keys…, stat,
    * value) row per group × stat. */
  def describeQuantizedBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String, scale: Int): DataFrame = {
    val qcol = quantize(col(valueCol), scale).cast("decimal(38,0)")
    val momentAggs = Seq(
      count(lit(1)).as("__n"),
      sum(qcol).as("__s1"),
      sum(qcol * qcol).as("__s2"),
      min(col(valueCol).cast("double")).as("__mn"),
      max(col(valueCol).cast("double")).as("__mx"))
    val nonNull = df.filter(col(valueCol).isNotNull &&
      !isnan(col(valueCol).cast("double")))
    val moments =
      if (groupCols.isEmpty) nonNull.agg(momentAggs.head, momentAggs.tail: _*)
      else nonNull.groupBy(groupCols.map(col): _*)
        .agg(momentAggs.head, momentAggs.tail: _*)
    // pivot on the exact integer rational, never the double q — a float
    // equality match only works when num.toDouble/den reproduces the
    // literal bit-for-bit (true for dyadics, silently false for e.g. 1/3)
    val quartAggs = Seq(
      min(when(col("q_num") === 1L && col("q_den") === 4L, col("value"))).as("__q1"),
      min(when(col("q_num") === 1L && col("q_den") === 2L, col("value"))).as("__q2"),
      min(when(col("q_num") === 3L && col("q_den") === 4L, col("value"))).as("__q3"))
    val quartSrc = quantileQuantizedBy(df, groupCols, valueCol,
      Seq((1L, 4L), (1L, 2L), (3L, 4L)), scale)
    val quartiles =
      if (groupCols.isEmpty) quartSrc.agg(quartAggs.head, quartAggs.tail: _*)
      else quartSrc.groupBy(groupCols.map(col): _*)
        .agg(quartAggs.head, quartAggs.tail: _*)
    // one double division/conversion per stat, every operand an exact
    // integer (decimal) or an exact long power of ten
    val unit = if (scale >= 0) None else Some(pow10L(-scale))
    val nDec = col("__n").cast("decimal(38,0)")
    val mean = unit match {
      case None => (col("__s1").cast("double")) /
        (nDec * lit(pow10L(scale))).cast("double")
      case Some(u) => (col("__s1") * lit(u)).cast("double") / col("__n").cast("double")
    }
    // sample variance in quantized units²: (n·Σq² − (Σq)²) / (n(n−1)),
    // numerator and denominator both exact decimals; null when n < 2
    // (pandas std of a single row is NaN → null here)
    val varNum = (nDec * col("__s2") - col("__s1") * col("__s1")).cast("double")
    val varDen = (nDec * (nDec - lit(1))).cast("double")
    val stdUnits = sqrt(varNum / varDen)
    val std = when(col("__n") < 2, lit(null).cast("double")).otherwise(unit match {
      case None => stdUnits / lit(pow10L(scale).toDouble)
      case Some(u) => stdUnits * lit(u.toDouble)
    })
    val joined =
      if (groupCols.isEmpty) moments.crossJoin(broadcast(quartiles))
      else moments.join(quartiles, groupCols)
    joined
      .select(groupCols.map(col) :+ explode(array(
        struct(lit("count").as("stat"), col("__n").cast("double").as("value")),
        struct(lit("mean").as("stat"), mean.as("value")),
        struct(lit("std").as("stat"), std.as("value")),
        struct(lit("min").as("stat"), col("__mn").as("value")),
        struct(lit("25%").as("stat"), col("__q1").as("value")),
        struct(lit("50%").as("stat"), col("__q2").as("value")),
        struct(lit("75%").as("stat"), col("__q3").as("value")),
        struct(lit("max").as("stat"), col("__mx").as("value")))).as("__p"): _*)
      .select(groupCols.map(col) :+ col("__p.stat").as("stat") :+
        col("__p.value").as("value"): _*)
  }

  /** Quantile over a quantized-value histogram — the bounded-memory
    * 100 TB path for `quantile`, the rank sibling of the KMV NDV sketch.
    *
    * Spark's exact `percentile` buffers every value per group; at corpus
    * scale that aggregate state (and DuckDB's equivalent sort) grows
    * with n. Quantizing to integer units of 10^−scale first makes the
    * aggregate a HISTOGRAM whose size is bounded by the value SPAN ×
    * 10^scale — independent of row count — with a deterministic error
    * bound of half a unit (not probabilistic). The exchange is the
    * histogram (partial-agg combined); the cumulative-rank window runs
    * over the bounded histogram, never the data (the same bounded-side
    * rule as the d×d PCA moment matrix).
    *
    * Each quantile q is a RATIONAL num/den so the pandas linear-
    * interpolation rank r = (n−1)·q decomposes exactly: lo = value at
    * rank ⌊r⌋, hi = value at ⌈r⌉, and the interpolated result
    * ((den−rem)·lo + rem·hi) / (den·10^scale) stays in exact integer
    * arithmetic until ONE double division of two exact integers —
    * correctly rounded, hence bit-identical in any engine and
    * association order. Nulls excluded (pandas default).
    *
    * Output carries the EXACT rational (`q_num`, `q_den`) alongside the
    * display double `q` — downstream pivots must match on the integers
    * (a `q === 0.5` float equality is exact only for dyadic rationals;
    * q = 1/3 would silently match nothing). */
  def quantileQuantized(df: DataFrame, valueCol: String,
      qs: Seq[(Long, Long)], scale: Int): DataFrame =
    quantileQuantizedBy(df, Nil, valueCol, qs, scale)

  /** Per-group [[quantileQuantized]]: the histogram carries the group
    * key, the rank window partitions by group (per-partition state =
    * that group's bounded histogram), output one row per group × q. */
  def quantileQuantizedBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[(Long, Long)], scale: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 0 && d > 0 && n <= d },
      s"quantiles must be rationals in [0,1], got $qs")
    import org.apache.spark.sql.expressions.Window
    val hist = df.filter(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .groupBy((groupCols.map(col) :+ quantize(col(valueCol), scale).as("__qv")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*)).orderBy(col("__qv"))
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(
        if (groupCols.isEmpty) Window.partitionBy()
        else Window.partitionBy(groupCols.map(col): _*)))
    val aggs = qs.zipWithIndex.flatMap { case ((num, den), i) =>
      val rnum = (col("__n") - 1L) * num // rank·den, exact long
      val rem = pmod(rnum, lit(den))
      // rnum−rem is divisible by den, but Spark's `/` on longs is DOUBLE
      // division — inexact once rnum = (n−1)·num passes 2^53 (n ~ 10^12,
      // num ~ 10^6 is exactly the scale this sketch is sold for). Exact
      // decimal division instead: the quotient is an integer, so the
      // decimal result is exact and the long cast is lossless.
      val loRank = ((rnum - rem).cast("decimal(38,0)") / lit(den))
        .cast("long") + 1L
      val hiRank = loRank + when(rem > 0L, 1L).otherwise(0L)
      Seq(
        min(when(col("__cum") >= loRank, col("__qv"))).as(s"__lo$i"),
        min(when(col("__cum") >= hiRank, col("__qv"))).as(s"__hi$i"),
        max(rem).as(s"__rem$i")) // constant within a group; max reads it
    }
    val picked =
      if (groupCols.isEmpty) cum.agg(aggs.head, aggs.tail: _*)
      else cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val rows = qs.zipWithIndex.map { case ((num, den), i) =>
      val unscaled = (lit(den) - col(s"__rem$i")) * col(s"__lo$i") +
        col(s"__rem$i") * col(s"__hi$i")
      val value =
        if (scale >= 0) unscaled.cast("double") / lit(den * pow10L(scale))
        else (unscaled * lit(pow10L(-scale))).cast("double") / lit(den)
      struct(lit(num).as("q_num"), lit(den).as("q_den"),
        lit(num.toDouble / den).as("q"), value.as("value"))
    }
    picked
      .select((groupCols.map(col) :+ explode(array(rows: _*)).as("__p")): _*)
      .select((groupCols.map(col) :+ col("__p.q_num").as("q_num") :+
        col("__p.q_den").as("q_den") :+ col("__p.q").as("q") :+
        col("__p.value").as("value")): _*)
  }
}
