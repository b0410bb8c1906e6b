package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.api.{Frame, SortKey}
import graft.streaming.EventStream
import QueryKit._

/**
 * §2.14 streaming surplus — ORACLE-gated out-of-order twins (the r6/r7
 * carry-over: sessionizeOoo / enrichLatestOoo were ScalaTest-pinned only).
 *
 * Each query replays the `events` fixture as a shuffled file-drop: three
 * parquet files split by event_id mod 3, so EVERY file spans the whole
 * time range and cross-micro-batch arrival order is maximally out of
 * order. The lateness horizon is computed from the data to cover the full
 * span (nothing is beyond-watermark-late), and two far-future sentinel
 * drops (user/key = -1, filtered from the result) push the watermark past
 * the real data so every buffered event folds. The folded result must
 * then equal the batch semantics bit-for-bit — which is exactly what the
 * DuckDB oracle computes. At real scale the same operators run with a
 * short horizon and bounded state; the full-span horizon here is the
 * replay harness, not the production shape.
 */
object StreamingQueries {

  /** Stage the shuffled replay + return (streamDir, maxTs, spanDays). */
  private def stageReplay(s: SparkSession, dir: String, tag: String): (String, java.sql.Timestamp, Long) = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(s"/tmp/graft_stream/${tag}_${System.nanoTime()}")
    val flat = root.resolve("stream")
    Files.createDirectories(flat)
    val ev = t(s, dir, "events").select(
      col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"),
      col("event_type"), coalesce(col("value"), lit(0.0)).as("value"))
    (0 until 3).foreach { i =>
      val part = root.resolve(s"drop$i")
      ev.filter(pmod(col("event_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(part.toString)
      val src = part.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(src.toPath, flat.resolve(f"replay$i%02d.parquet"))
    }
    val bounds = ev.agg(min(col("ts")), max(col("ts"))).head()
    val (minTs, maxTs) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val spanDays = (maxTs.getTime - minTs.getTime) / 86400000L + 2L
    (flat.toString, maxTs, spanDays)
  }

  /** Drop a single-row far-future sentinel file into the replay dir. */
  private def sentinel(s: SparkSession, flat: String, maxTs: java.sql.Timestamp,
      daysAhead: Long, name: String): Unit = {
    import java.nio.file.{Files, Paths}
    import s.implicits._
    val tmp = Paths.get(s"$flat/../$name")
    Seq((-daysAhead, -1L,
      new java.sql.Timestamp(maxTs.getTime + daysAhead * 86400000L), "click", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val src = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(src.toPath, Paths.get(flat).resolve(s"z_$name.parquet"))
  }

  private val replaySchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  val all: Seq[Q] = Seq(

    // Out-of-order gap-sessionization (30 min) over the shuffled replay:
    // per-user final session count must equal the batch two-stacked-window
    // computation no matter the arrival order. State folds strictly in
    // event-time order under the watermark — the streaming twin of q92.
    Q("q218_streaming_sessionize_ooo",
      (s, dir) => {
        val (flat, maxTs, spanDays) = stageReplay(s, dir, "q218")
        val stream = EventStream.read(s, flat, replaySchema)
        val query = EventStream.sessionizeOoo(stream, delay = s"$spanDays days")
          .writeStream.format("memory").queryName("q218_sink")
          .outputMode(OutputMode.Append()).start()
        try {
          query.processAllAvailable() // drain the three shuffled drops
          sentinel(s, flat, maxTs, spanDays + 10, "flush1")
          sentinel(s, flat, maxTs, 2 * spanDays + 20, "flush2")
          query.processAllAvailable() // watermark passes real data → folds
          s.table("q218_sink")
            .filter(col("userId") >= 0)
            .groupBy(col("userId").as("user_id"))
            .agg(max(col("sessions")).as("n_sessions"))
            .orderBy(col("user_id"))
        } finally query.stop()
      },
      Some("""
        SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions
        FROM (
          SELECT user_id,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events))
        GROUP BY user_id ORDER BY user_id""")),

    // Out-of-order latest-value enrichment (streaming merge_asof backward,
    // allow_exact_matches) over the shuffled replay: every non-purchase
    // event stamps the latest purchase value of its user at-or-before its
    // time. Folding is (time, right-before-left, id)-ordered under the
    // watermark, so the oracle replays the identical order as a window.
    Q("q219_streaming_enrich_ooo",
      (s, dir) => {
        val (flat, maxTs, spanDays) = stageReplay(s, dir, "q219")
        val stream = EventStream.read(s, flat, replaySchema)
          .select(col("user_id").as("key"), col("ts"),
            (col("event_type") === "purchase").as("isRight"),
            col("value"), col("event_id").as("id"))
        val query = EventStream.enrichLatestOoo(stream, delay = s"$spanDays days")
          .writeStream.format("memory").queryName("q219_sink")
          .outputMode(OutputMode.Append()).start()
        try {
          query.processAllAvailable()
          sentinel(s, flat, maxTs, spanDays + 10, "flush1")
          sentinel(s, flat, maxTs, 2 * spanDays + 20, "flush2")
          query.processAllAvailable()
          s.table("q219_sink")
            .filter(col("id") >= 0)
            .select(col("id"), col("value").as("v"))
            .orderBy(col("id"))
        } finally query.stop()
      },
      Some("""
        SELECT id, v FROM (
          SELECT event_id AS id, event_type,
                 last_value(CASE WHEN event_type = 'purchase' THEN coalesce(value, 0.0) END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
          FROM events)
        WHERE event_type <> 'purchase' ORDER BY id""")),

    // Streaming MinHash-LSH near-dup suppression over a documents
    // file-drop (the ingestion-side pipeline stage): every doc explodes
    // into its 4 engine-portable md5 band keys (Dedup.md5BandKeys — the
    // exact q104b banding), keyed state claims each band bucket for its
    // first arrival, and a doc survives iff it claimed all 4. Event time
    // is synthesized from doc_id, so arrival order == doc_id order and
    // the kept set equals the batch rule "dropped iff ANY band key is
    // shared with a smaller doc_id" — which is what the oracle computes
    // with the identical md5 fold.
    Q("q232_streaming_neardup",
      (s, dir) => {
        import java.nio.file.{Files, Paths, StandardCopyOption}
        val stage = Paths.get(QueryKit.scratch("/tmp/graft_stream", dir, "q232_docs"))
        Files.createDirectories(stage)
        Files.copy(Paths.get(s"$dir/documents.parquet"),
          stage.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          .withColumn("__ts__", timestamp_micros((col("doc_id") + 1) * 1000000L))
        val claims = EventStream.nearDupBandClaims(stream, "__ts__", "doc_id", "text",
          shingleN = 3, numHashes = 16, bands = 4)
        val query = EventStream.runToMemory(claims, "q232_claims_sink", OutputMode.Append())
        try {
          val kept = EventStream.keptFromClaims(s.table("q232_claims_sink"), bands = 4)
          t(s, dir, "documents").join(kept, col("doc_id") === col("docId"))
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).cast("long").as("id_sum"))
            .orderBy(col("lang"))
        } finally query.stop()
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3
                      THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                          for i in range(1, len(w) - 1)])
                      ELSE [array_to_string(w, ' ')] END AS sh
          FROM (SELECT doc_id, regexp_extract_all(trim(lower(text)), '\S+') AS w
                FROM documents)),
        e AS (
          SELECT doc_id, b,
                 unhex(substr(md5(array_to_string(
                   [list_min([substr(md5(s), b*4 + r + 1, 16)
                              for s in sh])
                    for r in range(0, 4)], '|')), 1, 16)) AS key
          FROM t CROSS JOIN (VALUES (0), (1), (2), (3)) AS bands(b)),
        collided AS (
          SELECT DISTINCT b.doc_id
          FROM e a JOIN e b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT lang, count(*) AS n_kept, sum(doc_id)::BIGINT AS id_sum
        FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM collided)
        GROUP BY lang ORDER BY lang""")),

    // Stream-static incremental linkage: the even-id half of `documents`
    // arrives as a file-drop stream and probes the PERSISTED band index
    // of the odd-id half (Dedup.writeBandIndex) via a STATELESS
    // stream-static equi-join; the batch finisher dedupes candidate hits
    // and verifies exact Jaccard. Same oracle as q256/q259 — streaming
    // arrival must not change the linked set.
    Q("q260_streaming_linkage",
      (s, dir) => {
        import java.nio.file.{Files, Paths, StandardCopyOption}
        val stage = Paths.get(QueryKit.scratch("/tmp/graft_stream", dir, "q260_docs"))
        Files.createDirectories(stage)
        Files.copy(Paths.get(s"$dir/documents.parquet"),
          stage.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
        val idxPath = QueryKit.scratch("/tmp/graft_io", dir, "band_index_q260")
        val docs = t(s, dir, "documents")
        graft.ops.Dedup.writeBandIndex(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", idxPath, shingleN = 3, numHashes = 16, bands = 4)
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          .filter(col("doc_id") % 2 === 0)
        val claims = EventStream.linkClaimsAgainstIndex(stream, "doc_id", "text",
          s.read.parquet(idxPath), shingleN = 3, numHashes = 16, bands = 4)
        val query = EventStream.runToMemory(claims, "q260_claims_sink", OutputMode.Append())
        try {
          Frame(EventStream.linksFromClaims(s.table("q260_claims_sink"),
            docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
            shingleN = 3, threshold = 0.2)
            .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard")))
            .sortValues(Seq(SortKey.asc("id_l"), SortKey.asc("id_r"))).df
        } finally query.stop()
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3
                      THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                          for i in range(1, len(w) - 1)])
                      ELSE [array_to_string(w, ' ')] END AS sh
          FROM (SELECT doc_id, regexp_extract_all(trim(lower(text)), '\S+') AS w
                FROM documents)),
        e AS (
          SELECT doc_id,
                 list_transform(sh, s ->
                   CAST(('0x' || substr(md5(s), 1, 15)) AS UBIGINT)) AS hs,
                 b,
                 unhex(substr(md5(array_to_string(
                   [list_min([substr(md5(s), b*4 + r + 1, 16)
                              for s in sh])
                    for r in range(0, 4)], '|')), 1, 16)) AS key
          FROM t CROSS JOIN (VALUES (0), (1), (2), (3)) AS bands(b))
        SELECT DISTINCT id_l, id_r, round(j, 6) AS jaccard FROM (
          SELECT a.doc_id AS id_l, b.doc_id AS id_r,
                 len(list_intersect(a.hs, b.hs))::DOUBLE
                   / len(list_distinct(list_concat(a.hs, b.hs))) AS j
          FROM e a JOIN e b ON a.b = b.b AND a.key = b.key
          WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1)
        WHERE j >= 0.2 ORDER BY id_l, id_r""")),

    // Streaming NDV per key via the KMV bottom-k sketch: the maximally
    // out-of-order shuffled replay (every drop spans the whole time
    // range) must fold to the IDENTICAL sketch as batch, because bottom-k
    // set-union is commutative and associative — arrival-order immunity
    // by algebra, not by watermark buffering (no watermark, Complete
    // mode, no sentinels). Streaming state per key = one ≤ k-long sorted
    // buffer, the same bytes a batch partial-agg task holds. The oracle
    // is the q262 construction on (event_type, user_id): hash-exact,
    // since both engines replay the identical md5 bottom-64 set and
    // closed-form estimate.
    Q("q266_streaming_ndv_sketch",
      (s, dir) => {
        val (flat, _, _) = stageReplay(s, dir, "q266")
        val stream = EventStream.read(s, flat, replaySchema)
        val query = EventStream.ndvSketch(stream, "event_type", "user_id", 64)
          .writeStream.format("memory").queryName("q266_sink")
          .outputMode(OutputMode.Complete()).start()
        try {
          query.processAllAvailable()
          s.table("q266_sink").orderBy("event_type")
        } finally query.stop()
      },
      Some("""
        WITH h AS (
          SELECT event_type AS g,
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS hv
          FROM events WHERE user_id IS NOT NULL),
        d AS (SELECT DISTINCT g, hv FROM h),
        r AS (SELECT g, hv,
                     row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
              FROM d)
        SELECT g AS event_type, CAST(count(*) AS BIGINT) AS sketch_size,
               CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                    ELSE floor((63.0 * 1152921504606846976.0
                                / max(CASE WHEN rn = 64 THEN hv END)) * 10) / 10
               END AS ndv_est
        FROM r WHERE rn <= 64 GROUP BY g
        ORDER BY g""")),

    // the production shape of q266: watermarked per-HOUR NDV sketches in
    // APPEND mode — state is one <= k-long buffer per open window, each
    // hour emits exactly once when the watermark passes. k=8 < the ~14
    // users/hour so the ESTIMATOR path must match per bucket, not sub-k
    // exactness. Sentinel drops push the watermark past the real data;
    // their own far-future buckets are filtered by bucket <= max(ts).
    Q("q271_streaming_hourly_ndv",
      (s, dir) => {
        val (flat, maxTs, spanDays) = stageReplay(s, dir, "q271")
        val stream = EventStream.read(s, flat, replaySchema)
        val query = EventStream
          .ndvSketchHourly(stream, "ts", "user_id", 8, s"$spanDays days")
          .writeStream.format("memory").queryName("q271_sink")
          .outputMode(OutputMode.Append()).start()
        try {
          query.processAllAvailable()
          sentinel(s, flat, maxTs, spanDays + 10, "flush1")
          sentinel(s, flat, maxTs, 2 * spanDays + 20, "flush2")
          query.processAllAvailable()
          s.table("q271_sink")
            .filter(col("bucket") <= lit(maxTs).cast("timestamp_ntz"))
            .orderBy("bucket")
        } finally query.stop()
      },
      Some("""
        WITH h AS (
          SELECT date_trunc('hour', ts) AS bucket,
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS hv
          FROM events WHERE user_id IS NOT NULL),
        d AS (SELECT DISTINCT bucket, hv FROM h),
        r AS (SELECT bucket, hv,
                     row_number() OVER (PARTITION BY bucket ORDER BY hv) AS rn
              FROM d)
        SELECT bucket, CAST(count(*) AS BIGINT) AS sketch_size,
               CASE WHEN count(*) < 8 THEN CAST(count(*) AS DOUBLE)
                    ELSE floor((7.0 * 1152921504606846976.0
                                / max(CASE WHEN rn = 8 THEN hv END)) * 10) / 10
               END AS ndv_est
        FROM r WHERE rn <= 8 GROUP BY bucket
        ORDER BY bucket""")))
}
