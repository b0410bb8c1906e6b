package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: opaque `binary` payloads with a typed
 * metadata struct, plus a partition-batched feature-extraction stage.
 *
 * The real pattern at 100 TB: media bytes live in a binary column (or an
 * object-store URI column), metadata in a sibling struct; decode /
 * resize / embed run per-partition so each task amortizes codec or model
 * setup over its whole batch. The codec itself is STUBBED here (no
 * image/audio libs in this container — the stub derives deterministic
 * pseudo-features from the bytes) but the Spark-side contract is real:
 * binary schema in, fixed-width feature schema out, executed via
 * `mapPartitions` with per-partition (not per-row) initialization.
 */
object Multimodal {

  /** Wrap a text column as a media-like payload: binary bytes + typed
    * metadata (mime, byte length, content hash). */
  def pack(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol)).as("n_bytes"),
        xxhash64(col(textCol)).as("content_hash")).as("meta"))

  /** Feature extraction over binary payloads, batched per partition.
    * STUB decode: a real implementation would open a codec/model once
    * per partition and run it on each payload; this derives
    * deterministic features from the raw bytes so the plumbing (schema,
    * batching, null-safety) is fully testable. */
  def extractFeatures(packed: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_bytes", IntegerType),
      StructField("feat0", LongType),
      StructField("feat1", LongType)))
    val enc = Encoders.row(outSchema)
    val idIdx = packed.schema.fieldIndex(idCol)
    val payloadIdx = packed.schema.fieldIndex("payload")

    packed.mapPartitions { it =>
      // per-partition init happens HERE (codec handle, model session, …)
      it.map { r =>
        // null payload (e.g. null text through pack's encode) → null
        // features, not an NPE'd task
        if (r.isNullAt(payloadIdx)) Row(r.getLong(idIdx), 0, null, null)
        else {
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val n = bytes.length
        // stub features: first-byte value and simple byte sum
        val feat0 = if (n > 0) (bytes(0) & 0xFF).toLong else 0L
        var s = 0L
        var i = 0
        while (i < n) { s += (bytes(i) & 0xFF); i += 1 }
        Row(r.getLong(idIdx), n, feat0, s)
        }
      }
    }(enc)
  }
}
