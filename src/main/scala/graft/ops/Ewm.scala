package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType, TimestampNTZType, TimestampType}

/**
 * Exponentially-weighted mean (pandas `ewm(alpha).mean()`, adjust=True;
 * reference: modin/pandas/window.py:34 — the one window family modin
 * itself defaults to pandas for, so this is surplus coverage).
 *
 * adjust=True semantics: mean_t = Σ_{i≤t} (1-α)^(t-i) x_i / Σ (1-α)^(t-i),
 * computed as the O(n) recurrence num_t = x_t + (1-α)·num_{t-1},
 * den_t = 1 + (1-α)·den_{t-1}.
 *
 * Distribution: `groupByKey(by).flatMapGroups` — one hash shuffle on the
 * group key, then a sequential in-memory recurrence per group. This is
 * the right trade when groups are bounded (a user's event history); an
 * unbounded single group would serialize, which is inherent to ewm's
 * chain dependency (a log-space parallel-prefix exists but overflows
 * (1-α)^-t beyond ~1000 rows, so we keep the recurrence).
 */
object Ewm {

  /** alpha from pandas' alternative decay parameterizations. */
  def alphaFromSpan(span: Double): Double = { require(span >= 1); 2.0 / (span + 1.0) }
  def alphaFromCom(com: Double): Double = { require(com >= 0); 1.0 / (1.0 + com) }
  def alphaFromHalflife(hl: Double): Double =
    { require(hl > 0); 1.0 - math.exp(-math.log(2.0) / hl) }

  /** Adds `out` = pandas `ewm(alpha).var(bias=False)` (and `<out>_std` =
    * its sqrt) per `keyCol` group, adjust=True semantics. Maintains the
    * four decayed power sums Σw, Σw², Σw·x, Σw·x² with the O(1)-per-row
    * update (each step scales old weights by (1-α) and adds weight 1),
    * then var = [Σw²/((Σw)²−Σw²)]⁻¹-style Bessel debias:
    * var = ((Σw)²/((Σw)²−Σw²)) · (Σwx²/Σw − (Σwx/Σw)²). Null until two
    * observations exist (the debias denominator is zero — pandas NaN).
    * Same distribution shape as [[meanByKey]]: one hash shuffle, then a
    * sequential per-group recurrence; `ignoreNa=false` decays weights
    * across null rows without adding an observation. */
  def varByKey(
      df: DataFrame, keyCol: String, orderCol: String, idCol: String,
      valueCol: String, alpha: Double, out: String,
      ignoreNa: Boolean = false): DataFrame = {

    // null group/order/id keys would NPE the primitive getLong reads;
    // pandas groupby drops null keys — do the same, explicitly
    val src = df
      .filter(col(keyCol).isNotNull && col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(
        col(keyCol).cast("long"),
        ewmOrderKey(df, orderCol).as(orderCol),
        col(idCol).cast("long"),
        col(valueCol).cast("double"))
    val outSchema = StructType(src.schema.fields :+
      StructField(out, DoubleType) :+ StructField(s"${out}_std", DoubleType))
    val enc = Encoders.row(outSchema)

    src.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getLong(2)))
        val d = 1.0 - alpha
        var sw = 0.0; var sw2 = 0.0; var swx = 0.0; var swx2 = 0.0
        var nObs = 0L
        rows.iterator.map { r =>
          // NaN is a MISSING observation (pandas): as a value it would
          // poison the decayed sums / reset the mean recurrence
          val isObs = !r.isNullAt(3) && !r.getDouble(3).isNaN
          if (isObs || (!ignoreNa && nObs > 0)) {
            sw *= d; sw2 *= d * d; swx *= d; swx2 *= d
          }
          if (isObs) {
            val x = r.getDouble(3)
            sw += 1.0; sw2 += 1.0; swx += x; swx2 += x * x
            nObs += 1
          }
          val denom = sw * sw - sw2
          val v: Any =
            if (nObs >= 2 && denom > 0) {
              val mean = swx / sw
              val vb = swx2 / sw - mean * mean
              // clamp fp residue on constant runs: variance is >= 0
              math.max((sw * sw / denom) * vb, 0.0)
            } else null
          val s: Any = v match { case d: Double => math.sqrt(d); case _ => null }
          Row.fromSeq(r.toSeq :+ v :+ s)
        }
      }(enc)
  }

  /** Bit-deterministic `ewm(alpha=0.5).var(bias=False)` — the
    * cross-engine-exact twin of [[varByKey]] for the dyadic decay
    * d = 1−α = 1/2, whose powers are exact binary fractions.
    *
    * [[varByKey]]'s O(n) double recurrence and an oracle's closed-form
    * weighted sums are the same real number but DIFFERENT doubles (fp
    * addition is order-dependent), so outputs straddling a half-ulp of
    * the caller's `round(·, 4)` flip between engines (~5/100k rows on
    * the events fixture at sf0.1). This path removes the float
    * dependence entirely instead of hoping the round masks it — the
    * same recipe as Pca.covarianceLong's integer moments:
    *
    *   1. quantize x to integer units of 2⁻³⁰ (`floor(x·2³⁰)`; the
    *      multiply-then-floor is the identical IEEE op sequence in any
    *      engine reading the same input bits);
    *   2. cap the window at the `capK`=40 most recent decay steps —
    *      dropped terms carry relative weight < 2⁻⁴⁰, and BOTH engines
    *      drop the same terms so the computed number is identical
    *      (this replaces the unbounded tail, which in float arithmetic
    *      is exactly where association order used to leak);
    *   3. the four decayed moment sums become exact integers under
    *      power-of-two scaling (Σw·2⁴⁰, Σw²·2⁸⁰, Σwx·2⁷⁰, Σwx²·2¹⁰⁰,
    *      max ~2¹²¹ at |x| ≲ 1024 < the 126-bit headroom of BigInt
    *      here / HUGEINT in the oracle) — integer addition is
    *      associative, so ANY partition/aggregation order gives the
    *      same bits;
    *   4. convert each sum through a fixed 3×40-bit chunk split (each
    *      chunk < 2⁵³ converts to double exactly for any 128-bit
    *      input; the reassembly tree is the only rounding and is the
    *      same IEEE sequence both sides — DuckDB's direct
    *      HUGEINT→DOUBLE cast is NOT correctly rounded, measured ~1%
    *      off-by-ulp, so the split is load-bearing) and evaluate one
    *      fixed expression tree:
    *      var = (sw²/(sw²−sw2))·(swx2/sw − (swx/sw)²), floored at 0.
    *
    * Deviation vs pandas: the 2⁻³⁰ input quantization and 2⁻⁴⁰ weight
    * floor — ≲2⁻⁴⁰·x_max² ABSOLUTE error in var (~1e-6 at the events
    * fixture's |x| ≲ 560; the dropped tail scales with the raw-moment
    * sums, i.e. with x², NOT with the variance — clustered groups see
    * the worst relative error). COVERAGE.md deviation 14 — now
    * deterministic and bounded, previously an engine-dependent
    * association-order tie. Null/NaN
    * semantics identical to [[varByKey]]: NaN is a missing observation;
    * `ignoreNa=false` decays weights across null rows; output null
    * until two observations. Distribution shape unchanged: one hash
    * shuffle on the group key, then a sequential O(capK)-per-row scan
    * of a bounded ring of quantized values — constant work per row at
    * any corpus size. */
  def varByKeyDyadic(
      df: DataFrame, keyCol: String, orderCol: String, idCol: String,
      valueCol: String, out: String,
      ignoreNa: Boolean = false, capK: Int = 40): DataFrame = {
    // capK=40 with 2^-30 quantization keeps the largest sum (Σwx²) under
    // ~2^125 for |x| < 4096 — inside HUGEINT's 128-bit headroom; past
    // that the oracle side would overflow LOUDLY (DuckDB raises), never
    // silently drift
    require(capK >= 1 && capK <= 40, "capK beyond 40 overflows the 128-bit oracle sums")

    val src = df
      .filter(col(keyCol).isNotNull && col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(
        col(keyCol).cast("long"),
        ewmOrderKey(df, orderCol).as(orderCol),
        col(idCol).cast("long"),
        col(valueCol).cast("double"))
    val outSchema = StructType(src.schema.fields :+
      StructField(out, DoubleType) :+ StructField(s"${out}_std", DoubleType))
    val enc = Encoders.row(outSchema)
    val K = capK

    src.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getLong(2)))
        // ring of the last K+1 decay slots; EMPTY marks a decayed-over
        // null row (consumes a weight step, contributes no term)
        val EMPTY = Long.MinValue
        val slots = scala.collection.mutable.ArrayDeque.empty[Long]
        var nObs = 0L
        val P40 = (1L << 40).toDouble
        val P80 = P40 * P40
        val M40 = (BigInt(1) << 40) - 1
        def toD(s: BigInt): Double =
          (s >> 80).toLong.toDouble * P80 +
            (((s >> 40) & M40).toLong.toDouble * P40 + (s & M40).toLong.toDouble)
        rows.iterator.map { r =>
          val isObs = !r.isNullAt(3) && !r.getDouble(3).isNaN
          if (isObs || (!ignoreNa && nObs > 0)) {
            slots.prepend(EMPTY)
            if (slots.length > K + 1) slots.remove(K + 1, slots.length - (K + 1))
          }
          if (isObs) {
            // multiply-then-floor: the same two IEEE ops the oracle runs
            slots(0) = math.floor(r.getDouble(3) * (1L << 30).toDouble).toLong
            nObs += 1
          }
          var swS = BigInt(0); var sw2S = BigInt(0)
          var swxS = BigInt(0); var swx2S = BigInt(0)
          var k = 0
          while (k < slots.length) {
            val xq = slots(k)
            if (xq != EMPTY) {
              val w = BigInt(1) << (K - k)
              swS += w; sw2S += w * w
              val xb = BigInt(xq)
              swxS += xb * w; swx2S += xb * xb * w
            }
            k += 1
          }
          // the fixed tree — mirrored literally in the oracle SQL
          // (scales 2^K, 2^2K, 2^(K+30), 2^(K+60): exact powers of two,
          // so each division is a single exact exponent shift)
          val swD = toD(swS) / math.pow(2.0, K)
          val sw2D = toD(sw2S) / math.pow(2.0, 2 * K)
          val swxD = toD(swxS) / math.pow(2.0, K + 30)
          val swx2D = toD(swx2S) / math.pow(2.0, K + 60)
          val denom = swD * swD - sw2D
          val v: Any =
            if (nObs >= 2 && denom > 0) {
              val mean = swxD / swD
              val vb = swx2D / swD - mean * mean
              math.max((swD * swD / denom) * vb, 0.0)
            } else null
          val s: Any = v match { case d: Double => math.sqrt(d); case _ => null }
          Row.fromSeq(r.toSeq :+ v :+ s)
        }
      }(enc)
  }

  /** Adds `out` = ewm-mean of `valueCol` per `keyCol` group ordered by
    * (`orderCol` asc, tie-break `idCol` asc). Input columns must be
    * (bigint, orderable, bigint, double). The full pandas option
    * surface: `adjust` switches between the normalized weighted average
    * and the recursive form; `ignoreNa=false` (the default) decays the
    * accumulated weight across null rows while `ignoreNa=true` treats
    * nulls as absent for weighting. Output at a null row is the running
    * mean so far (null before any value) — pandas emits NaN only at
    * leading positions. Semantics follow pandas' published ewma
    * aggregation contract (old-weight decay once per row unless
    * ignore_na skips the gap; adjust accumulates old_wt, non-adjust
    * renormalizes to 1), EwmSpec pins all four combinations. */
  def meanByKey(
      df: DataFrame, keyCol: String, orderCol: String, idCol: String,
      valueCol: String, alpha: Double, out: String,
      adjust: Boolean = true, ignoreNa: Boolean = false): DataFrame = {

    // same null-key drop as varByKey (pandas groupby contract; primitive
    // getLong reads would otherwise NPE)
    val src = df
      .filter(col(keyCol).isNotNull && col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(
        col(keyCol).cast("long"),
        ewmOrderKey(df, orderCol).as(orderCol),
        col(idCol).cast("long"),
        col(valueCol).cast("double"))
    val outSchema = StructType(src.schema.fields :+ StructField(out, DoubleType))
    val enc = Encoders.row(outSchema)
    val keyEnc = Encoders.scalaLong

    src.groupByKey(_.getLong(0))(keyEnc)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getLong(2)))
        val oldWtFactor = 1.0 - alpha
        val newWt = if (adjust) 1.0 else alpha
        var mean = Double.NaN
        var oldWt = 1.0
        rows.iterator.map { r =>
          // NaN is a MISSING observation (pandas): as a value it would
          // poison the decayed sums / reset the mean recurrence
          val isObs = !r.isNullAt(3) && !r.getDouble(3).isNaN
          if (!mean.isNaN) {
            if (isObs || !ignoreNa) {
              oldWt *= oldWtFactor
              if (isObs) {
                val cur = r.getDouble(3)
                if (mean != cur) mean = (oldWt * mean + newWt * cur) / (oldWt + newWt)
                if (adjust) oldWt += newWt else oldWt = 1.0
              }
            }
          } else if (isObs) mean = r.getDouble(3)
          Row.fromSeq(r.toSeq :+ (if (mean.isNaN) null else mean))
        }
      }(enc)
  }

  /** Adds `out` = pandas `ewm(alpha).cov(other, bias=False)` and
    * `<out>_corr` = `ewm(alpha).corr(other)` per `keyCol` group,
    * adjust=True. Seven decayed power sums (Σw, Σw², Σwx, Σwy, Σwxy,
    * Σwx², Σwy²) with the same O(1) update as [[varByKey]]; cov gets the
    * Bessel debias factor (Σw)²/((Σw)²−Σw²) while corr is computed from
    * the biased central moments directly — the debias factors cancel in
    * the ratio, exactly as in pandas. A pair is an observation only when
    * BOTH series are present (null/NaN in either = missing pair;
    * `ignoreNa=false` still decays weights across missing rows). corr is
    * clamped to [-1, 1] against fp residue and null when either variance
    * term is ~0 (constant series — pandas NaN). */
  def covByKey(
      df: DataFrame, keyCol: String, orderCol: String, idCol: String,
      xCol: String, yCol: String, alpha: Double, out: String,
      ignoreNa: Boolean = false): DataFrame = {

    val src = df
      .filter(col(keyCol).isNotNull && col(orderCol).isNotNull && col(idCol).isNotNull)
      .select(
        col(keyCol).cast("long"),
        ewmOrderKey(df, orderCol).as(orderCol),
        col(idCol).cast("long"),
        col(xCol).cast("double"),
        col(yCol).cast("double"))
    val outSchema = StructType(src.schema.fields :+
      StructField(out, DoubleType) :+ StructField(s"${out}_corr", DoubleType))
    val enc = Encoders.row(outSchema)

    src.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getLong(2)))
        val d = 1.0 - alpha
        var sw = 0.0; var sw2 = 0.0
        var swx = 0.0; var swy = 0.0; var swxy = 0.0
        var swx2 = 0.0; var swy2 = 0.0
        var nObs = 0L
        rows.iterator.map { r =>
          val isObs = !r.isNullAt(3) && !r.getDouble(3).isNaN &&
            !r.isNullAt(4) && !r.getDouble(4).isNaN
          if (isObs || (!ignoreNa && nObs > 0)) {
            sw *= d; sw2 *= d * d
            swx *= d; swy *= d; swxy *= d; swx2 *= d; swy2 *= d
          }
          if (isObs) {
            val x = r.getDouble(3); val y = r.getDouble(4)
            sw += 1.0; sw2 += 1.0
            swx += x; swy += y; swxy += x * y; swx2 += x * x; swy2 += y * y
            nObs += 1
          }
          val denom = sw * sw - sw2
          var cv: Any = null
          var cr: Any = null
          if (nObs >= 2 && denom > 0) {
            val mx = swx / sw; val my = swy / sw
            val covB = swxy / sw - mx * my
            val varxB = math.max(swx2 / sw - mx * mx, 0.0)
            val varyB = math.max(swy2 / sw - my * my, 0.0)
            cv = (sw * sw / denom) * covB
            if (varxB > 0 && varyB > 0)
              cr = math.max(-1.0, math.min(1.0, covB / math.sqrt(varxB * varyB)))
          }
          Row.fromSeq(r.toSeq :+ cv :+ cr)
        }
      }(enc)
  }

  /** Order key in exact long units: timestamps keep microsecond
    * resolution (a bare cast("long") truncates to whole SECONDS and
    * sub-second order would silently fall to the id tie-break — the
    * Resample.sessionize trap); everything else casts as before. */
  private def ewmOrderKey(df: DataFrame, orderCol: String) =
    df.schema(orderCol).dataType match {
      case _: TimestampType | _: TimestampNTZType =>
        unix_micros(col(orderCol).cast("timestamp"))
      case _ => col(orderCol).cast("long")
    }
}
