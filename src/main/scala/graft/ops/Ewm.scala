package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

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

  /** Adds `out` = ewm-mean of `valueCol` per `keyCol` group ordered by
    * (`orderCol` asc, tie-break `idCol` asc). Input columns must be
    * (bigint, orderable, bigint, double). Null values follow pandas
    * `ignore_na=False`: the weight still decays across a null row but
    * nothing is added, and the output at a null row is the ewm of the
    * values seen so far (NaN→null before any value). */
  def meanByKey(
      df: DataFrame, keyCol: String, orderCol: String, idCol: String,
      valueCol: String, alpha: Double, out: String): DataFrame = {

    val src = df.select(
      col(keyCol).cast("long"),
      col(orderCol).cast("long").as(orderCol),
      col(idCol).cast("long"),
      col(valueCol).cast("double"))
    val outSchema = StructType(src.schema.fields :+ StructField(out, DoubleType))
    val enc = Encoders.row(outSchema)
    val keyEnc = Encoders.scalaLong

    src.groupByKey(_.getLong(0))(keyEnc)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r.getLong(1), r.getLong(2)))
        val oneMinus = 1.0 - alpha
        var num = 0.0
        var den = 0.0
        rows.iterator.map { r =>
          if (r.isNullAt(3)) {
            // ignore_na=False: existing weights decay, nothing is added
            num = oneMinus * num
            den = oneMinus * den
            Row.fromSeq(r.toSeq :+ (if (den == 0.0) null else num / den))
          } else {
            num = r.getDouble(3) + oneMinus * num
            den = 1.0 + oneMinus * den
            Row.fromSeq(r.toSeq :+ num / den)
          }
        }
      }(enc)
  }
}
