package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream

/** Streaming results must agree with their batch twins on the same data
  * (file-source stream over the sf0.001 events fixture). */
class StreamingSpec extends SparkSuite {

  /** File streams need a directory source: stage the fixture file into
    * a temp dir once (this is also the file-drop ingestion layout). */
  private lazy val eventsDir: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get("/tmp/graft_stream/events")
    Files.createDirectories(dir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  /** Stream with the file's own physical schema (ts has shipped both as
    * TIMESTAMP(NANOS)-as-long and as TIMESTAMP(MICROS) — see QueryKit),
    * then the same normalization the batch path does. */
  private def rawStream() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(eventsDir).schema
    // watermark requires TIMESTAMP (not NTZ); session TZ is UTC so the
    // instant values match the batch path's NTZ reading exactly
    queries.QueryKit.normalizeTs(EventStream.read(spark, eventsDir, raw))
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  test("streaming hourly agg equals the batch tumbling aggregate") {
    val batchDf = table("events")
    val stream = rawStream()
    val q = EventStream.runToMemory(
      EventStream.hourlyAgg(stream), "hourly_stream", OutputMode.Append())
    try {
      // Append mode only emits windows the watermark has closed; every
      // emitted row must match the batch computation exactly.
      val streamed = spark.table("hourly_stream")
        .select(col("bucket").cast("timestamp_ntz").as("bucket"), col("n"), col("sum_value"))
      val batch = batchDf
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      val joined = streamed.join(batch, Seq("bucket"), "inner")
      assert(streamed.count() > 0, "watermark should have closed at least one window")
      assert(joined.count() == streamed.count(), "every emitted window exists in batch")
      val mismatches = streamed.alias("s").join(batch.alias("b"), Seq("bucket"))
        .filter(col("s.n") =!= col("b.n")).count()
      assert(mismatches == 0)
    } finally q.stop()
  }

  test("streaming fingerprint dedup equals the batch distinct-fingerprint count") {
    // synthesize a doc stream with exact duplicates: event_type as the
    // "text" (small vocabulary → heavy duplication), ts as event time
    val stream = rawStream().select(col("ts"), col("event_type").as("text"))
    val q = EventStream.runToMemory(
      EventStream.dedupeByFingerprint(stream, "ts", "text"),
      "dedup_stream", OutputMode.Append())
    try {
      val streamed = spark.table("dedup_stream").count()
      val batch = table("events")
        .select(graft.functions.Text.fingerprint(col("event_type")))
        .distinct().count()
      assert(streamed == batch,
        s"stream kept $streamed docs, batch dedup keeps $batch")
    } finally q.stop()
  }

  test("streaming latest-value enrichment equals the batch merge_asof") {
    import spark.implicits._
    val stream = rawStream()
      .select(col("user_id").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("micros"),
        (col("event_type") === "purchase").as("isRight"),
        coalesce(col("value"), lit(0.0)).as("value"),
        col("event_id").as("id"))
      .as[EventStream.EnrichInput]
    val q = EventStream.runToMemory(
      EventStream.enrichLatest(stream), "enrich_stream", OutputMode.Append())
    try {
      // streaming emits ALL non-purchase rows; restrict both sides to clicks
      val ev = table("events")
      val clickIds = ev.filter(col("event_type") === "click").select(col("event_id"))
      val es = spark.table("enrich_stream")
      val streamed = es.join(clickIds, es("id") === clickIds("event_id"))
        .select(col("id"), round(col("value"), 6).as("v"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("value").as("pv"), col("event_id").as("p_id"))
      val batch = graft.ops.Joins.asof(clicks, purchases,
        leftOn = "ts", rightOn = "p_ts", leftBy = "user_id", rightBy = "p_user",
        payload = Seq("pv"), tieBreak = col("p_id"))
        .select(col("event_id").as("id"), round(col("pv"), 6).as("v"))
      assertParity(streamed, batch)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch range self-join") {
    val stream = rawStream()
    val q = EventStream.runToMemory(
      EventStream.joinRecent(stream, "click", "view", lookbackSeconds = 3600),
      "joined_stream", OutputMode.Append())
    try {
      val streamed = spark.table("joined_stream")
        .select(col("user_id"), col("l_id"), col("r_id"))
      val ev = table("events")
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      val r = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
          col("event_id").as("r_id"))
      val batch = l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") - expr("INTERVAL 3600 SECONDS") &&
          col("r_ts") < col("l_ts"))
        .select(col("user_id"), col("l_id"), col("r_id"))
      assert(batch.count() > 0, "fixture should produce at least one join pair")
      assertParity(streamed, batch)
    } finally q.stop()
  }

  /** Shuffled-drop replay: the fixture's events split into three files
    * by event_id hash — every file spans the whole time range, so
    * cross-batch arrival order is maximally out of order. `delay` covers
    * the full span so nothing is beyond-watermark-late; two far-future
    * sentinel drops push the watermark past the real data (first advances
    * it, second triggers the timeout-driven folds). */
  private def shuffledReplay(run: (String, org.apache.spark.sql.DataFrame) => Unit): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(s"/tmp/graft_stream/ooo_${System.nanoTime()}")
    Files.createDirectories(dir)
    val ev = table("events").select(
      col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"),
      col("event_type"), coalesce(col("value"), lit(0.0)).as("value"))
    (0 until 3).foreach { i =>
      ev.filter(pmod(col("event_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/drop$i")
    }
    // one flat dir of parquet files, replay parts first
    val flat = Paths.get(s"$dir/stream")
    Files.createDirectories(flat)
    (0 until 3).foreach { i =>
      val src = new java.io.File(s"$dir/drop$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(src.toPath, flat.resolve(f"replay$i%02d.parquet"))
    }
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    def sentinel(daysAhead: Int, name: String): Unit = {
      import spark.implicits._
      Seq((-daysAhead.toLong, -1L,
        new java.sql.Timestamp(maxTs.getTime + daysAhead * 86400000L),
        "click", 0.0))
        .toDF("event_id", "user_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
      val src = new java.io.File(s"$dir/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(src.toPath, flat.resolve(s"z_$name.parquet"))
    }
    run(flat.toString, ev)
    // sentinels land AFTER the caller starts the query and drains the
    // replay files — the caller calls processAllAvailable twice
    sentinel(40, "flush1")
    sentinel(80, "flush2")
  }

  test("out-of-order sessionization equals batch on a shuffled replay") {
    import org.apache.spark.sql.types._
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      shuffledReplay { (streamDir, ev) =>
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("ts", TimestampType), StructField("event_type", StringType),
          StructField("value", DoubleType)))
        val stream = EventStream.read(spark, streamDir, schema)
        query = EventStream.sessionizeOoo(stream, delay = "30 days").writeStream
          .format("memory").queryName("sessions_ooo")
          .outputMode(OutputMode.Append()).start()
        query.processAllAvailable() // drain the shuffled replay files
      }
      query.processAllAvailable() // pick up both sentinels → watermark folds
      val streamed = spark.table("sessions_ooo")
        .filter(col("userId") >= 0)
        .groupBy(col("userId")).agg(max(col("sessions")).as("sessions"))
      val batch = graft.ops.Resample.sessionize(
        queries.QueryKit.t(spark, sfDir, "events"), "user_id", "ts", 1800)
        .groupBy(col("user_id").as("userId"))
        .agg(max(col("session_id")).as("sessions"))
      assert(streamed.count() > 0, "watermark should have folded real users")
      assertParity(streamed, batch)
    } finally if (query != null) query.stop()
  }

  test("streaming KMV NDV sketch equals batch bit-for-bit on a shuffled replay") {
    import org.apache.spark.sql.types._
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      shuffledReplay { (streamDir, ev) =>
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("ts", TimestampType), StructField("event_type", StringType),
          StructField("value", DoubleType)))
        val stream = EventStream.read(spark, streamDir, schema)
        // k=32 < |users| so the estimator path (not sub-k exactness) is
        // what must match; bottom-k union is order-immune by algebra, so
        // the maximally shuffled arrival needs no watermark to agree
        query = EventStream.ndvSketch(stream, "event_type", "user_id", 32)
          .writeStream.format("memory").queryName("ndv_stream")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
        query.processAllAvailable()
        val streamed = spark.table("ndv_stream").orderBy("event_type").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        // ndvSketch is plan-generic: applied to the static frame it IS the
        // batch sketch
        val batch = EventStream.ndvSketch(ev, "event_type", "user_id", 32)
          .orderBy("event_type").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        assert(streamed.nonEmpty && streamed == batch)
      }
    } finally if (query != null) query.stop()
  }

  test("watermarked hourly NDV sketches emit once and equal batch per bucket") {
    import org.apache.spark.sql.types._
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      var maxTs: java.sql.Timestamp = null
      shuffledReplay { (streamDir, ev) =>
        maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("ts", TimestampType), StructField("event_type", StringType),
          StructField("value", DoubleType)))
        val stream = EventStream.read(spark, streamDir, schema)
        query = EventStream.ndvSketchHourly(stream, "ts", "user_id", 8, "40 days")
          .writeStream.format("memory").queryName("hourly_ndv")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
        query.processAllAvailable() // drain replay; sentinels land after
      }
      query.processAllAvailable() // both sentinels → watermark folds all real hours
      val streamed = spark.table("hourly_ndv")
        .filter(col("bucket") <= lit(maxTs).cast("timestamp_ntz"))
        .orderBy("bucket").collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSeq
      // appended exactly once per bucket
      assert(streamed.map(_._1).distinct.size == streamed.size)
      val batch = EventStream.ndvSketchHourly(
          queries.QueryKit.t(spark, sfDir, "events")
            .select(col("user_id"), col("ts").cast("timestamp").as("ts")),
          "ts", "user_id", 8, "40 days")
        .orderBy("bucket").collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally if (query != null) query.stop()
  }

  test("out-of-order enrichment equals the batch merge_asof on a shuffled replay") {
    import org.apache.spark.sql.types._
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      shuffledReplay { (streamDir, ev) =>
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("ts", TimestampType), StructField("event_type", StringType),
          StructField("value", DoubleType)))
        val stream = EventStream.read(spark, streamDir, schema)
          .select(col("user_id").as("key"), col("ts"),
            (col("event_type") === "purchase").as("isRight"),
            col("value"), col("event_id").as("id"))
        query = EventStream.enrichLatestOoo(stream, delay = "30 days").writeStream
          .format("memory").queryName("enrich_ooo")
          .outputMode(OutputMode.Append()).start()
        query.processAllAvailable()
      }
      query.processAllAvailable()
      val ev = table("events")
      val clickIds = ev.filter(col("event_type") === "click").select(col("event_id"))
      val es = spark.table("enrich_ooo").filter(col("id") >= 0)
      val streamed = es.join(clickIds, es("id") === clickIds("event_id"))
        .select(col("id"), round(col("value"), 6).as("v"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("value").as("pv"), col("event_id").as("p_id"))
      val batch = graft.ops.Joins.asof(clicks, purchases,
        leftOn = "ts", rightOn = "p_ts", leftBy = "user_id", rightBy = "p_user",
        payload = Seq("pv"), tieBreak = col("p_id"))
        .select(col("event_id").as("id"), round(col("pv"), 6).as("v"))
      assert(streamed.count() > 0)
      assertParity(streamed, batch)
    } finally if (query != null) query.stop()
  }

  test("stateful sessionization matches the batch gap-session count") {
    val stream = rawStream()
    val q = EventStream.runToMemory(
      EventStream.sessionize(stream), "sessions_stream", OutputMode.Update())
    try {
      // take the LAST update per user (memory sink keeps every update row)
      val streamed = spark.table("sessions_stream")
        .groupBy(col("userId")).agg(max(col("sessions")).as("sessions"))
      val batch = graft.ops.Resample.sessionize(
        queries.QueryKit.t(spark, sfDir, "events"), "user_id", "ts", 1800)
        .groupBy(col("user_id").as("userId"))
        .agg(max(col("session_id")).as("sessions"))
      assertParity(streamed, batch)
    } finally q.stop()
  }

  test("streaming LSH near-dup suppression equals the batch band-collision rule") {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(s"/tmp/graft_stream/neardup_${System.nanoTime()}")
    val flat = root.resolve("stream")
    Files.createDirectories(flat)
    val docs = table("documents").select(col("doc_id"), col("text"),
      timestamp_micros((col("doc_id") + 1) * 1000000L).cast("timestamp").as("ts"))
    // three drops split by doc_id RANGE and copied in sequence while the
    // query drains, so cross-batch arrival order == event-time order (the
    // replay contract under which stream == batch exactly)
    val cuts = Seq((0L, 170L), (170L, 340L), (340L, Long.MaxValue))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi).coalesce(1)
        .write.mode("overwrite").parquet(root.resolve(s"drop$i").toString)
    }
    val schema = spark.read.parquet(root.resolve("drop0").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(flat.toString)
    val claims = EventStream.nearDupBandClaims(stream, "ts", "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4)
    val q = claims.writeStream.format("memory").queryName("neardup_claims")
      .outputMode(OutputMode.Append()).start()
    try {
      cuts.indices.foreach { i =>
        val src = root.resolve(s"drop$i").toFile.listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(src.toPath, flat.resolve(f"drop$i%02d.parquet"))
        q.processAllAvailable()
      }
      val kept = EventStream.keptFromClaims(spark.table("neardup_claims"), bands = 4)
        .collect().map(_.getLong(0)).toSet
      // batch twin: dropped iff ANY band key is shared with a smaller doc_id
      val banded = table("documents").select(col("doc_id"),
        posexplode(graft.ops.Dedup.md5BandKeys(
          array_distinct(graft.functions.Text.shingles(col("text"), 3)), 4, 4)))
      val collided = banded.select(col("doc_id").as("id_a"), col("pos"), col("col"))
        .join(banded.select(col("doc_id").as("id_b"), col("pos"), col("col")),
          Seq("pos", "col"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
      val all = table("documents").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == (all -- collided),
        s"stream kept ${kept.size}, batch rule keeps ${(all -- collided).size}")
      assert(collided.nonEmpty, "fixture must contain near-dups for this test to bite")
    } finally q.stop()
  }

  test("stream-static linkage against a persisted band index equals the batch cross join") {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(s"/tmp/graft_stream/linkidx_${System.nanoTime()}")
    val flat = root.resolve("stream")
    Files.createDirectories(flat)
    val docs = table("documents").select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 1)
    val batch = docs.filter(col("doc_id") % 2 === 0)
    val idxPath = root.resolve("index").toString
    graft.ops.Dedup.writeBandIndex(corpus, "doc_id", "text", idxPath,
      shingleN = 3, numHashes = 16, bands = 4)
    // two arbitrary-order drops: the join is stateless, so arrival order
    // must not matter (unlike the keyed-state suppression test above)
    val cuts = Seq((0L, 250L), (250L, Long.MaxValue))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      batch.filter(col("doc_id") >= lo && col("doc_id") < hi).coalesce(1)
        .write.mode("overwrite").parquet(root.resolve(s"drop$i").toString)
    }
    val schema = spark.read.parquet(root.resolve("drop0").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(flat.toString)
    val claims = EventStream.linkClaimsAgainstIndex(stream, "doc_id", "text",
      spark.read.parquet(idxPath), shingleN = 3, numHashes = 16, bands = 4)
    val q = claims.writeStream.format("memory").queryName("linkidx_claims")
      .outputMode(OutputMode.Append()).start()
    try {
      // reverse drop order on purpose — stateless join, order-free result
      cuts.indices.reverse.foreach { i =>
        val src = root.resolve(s"drop$i").toFile.listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(src.toPath, flat.resolve(f"drop$i%02d.parquet"))
        q.processAllAvailable()
      }
      val streamed = EventStream.linksFromClaims(spark.table("linkidx_claims"),
        batch, "doc_id", "text", corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val direct = graft.ops.Dedup.crossCorpusPairsMd5(
        batch, "doc_id", "text", corpus, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, threshold = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == direct, s"streamed=${streamed.size} direct=${direct.size}")
      assert(direct.nonEmpty, "fixture must contain cross-parity near-dups")
    } finally q.stop()
  }

  test("near-dup suppression state evicts after the horizon: a late re-crawl re-claims") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val root = Paths.get(s"/tmp/graft_stream/neardup_evict_${System.nanoTime()}")
    val flat = root.resolve("stream")
    Files.createDirectories(flat)
    def drop(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val tmp = root.resolve(name)
      rows.toDF("doc_id", "text", "secs")
        .select(col("doc_id"), col("text"),
          timestamp_micros(col("secs") * 1000000L).cast("timestamp").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val src = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(src.toPath, flat.resolve(s"$name.parquet"))
    }
    val dup = "alpha beta gamma delta epsilon"
    drop("d0", Seq((0L, dup, 10L), (1L, dup, 20L))) // 1 suppressed by 0
    val schema = spark.read.parquet(root.resolve("d0").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(flat.toString)
    // short horizon (1h) against a short watermark delay (10s): state for
    // doc 0's buckets times out once the watermark passes ts(0) + horizon
    val claims = EventStream.nearDupBandClaims(stream, "ts", "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4,
      delay = "10 seconds", horizonSeconds = 3600L)
    val q = claims.writeStream.format("memory").queryName("neardup_evict_claims")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // two unrelated drops: the first pushes the watermark past the
      // horizon, the second's trigger FIRES the now-quiet buckets'
      // timeouts (timers only fire for keys without data in the batch)
      drop("d1", Seq((2L, "zeta eta theta iota kappa", 90000L)))
      q.processAllAvailable()
      drop("d2", Seq((3L, "lambda mu nu xi omicron", 90100L)))
      q.processAllAvailable()
      // the re-crawl of the duplicate text lands AFTER eviction: re-claims
      drop("d3", Seq((9L, dup, 90200L)))
      q.processAllAvailable()
      val kept = EventStream.keptFromClaims(spark.table("neardup_evict_claims"), bands = 4)
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(0L, 2L, 3L, 9L),
        s"expected re-claim after horizon eviction, got $kept")
    } finally q.stop()
  }

  test("stream-static LM scoring: a doc stream scored against a batch-trained model equals batch") {
    // the production serving shape: the perplexity model is trained once
    // in batch, documents score at ingestion time via a stream-static
    // join. Same Corpus.perplexity code path — its score side is a plain
    // join + agg, so feeding it a streaming `docs` frame must work with
    // Complete output and reproduce the batch scores exactly.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stage = Paths.get("/tmp/graft_stream/ppl_docs")
    Files.createDirectories(stage)
    val src = new java.io.File(s"$sfDir/documents.parquet")
    Files.copy(src.toPath, stage.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = spark.read.parquet(stage.toString)
    val schema = batchDocs.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val scored = graft.ops.Corpus.perplexity(
      stream, batchDocs, "doc_id", "text")
    val q = EventStream.runToMemory(scored, "ppl_stream",
      OutputMode.Complete())
    try {
      val streamed = spark.table("ppl_stream")
        .select(col("doc_id"), col("n_bigrams"), round(col("ppl"), 6).as("ppl"))
      val batch = graft.ops.Corpus.perplexity(batchDocs, batchDocs, "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), round(col("ppl"), 6).as("ppl"))
      assert(streamed.count() > 0)
      assertParity(streamed, batch)
    } finally q.stop()
  }

  test("stream-static quality scoring: a doc stream scored by a batch-trained classifier equals batch") {
    // the model-filter serving shape: the quality classifier is trained
    // once in batch (a static dim+1-row weights frame), documents score
    // at ingestion time. Same QualityModel.score code path — feature
    // hashing + broadcast weights join + per-doc margin agg — fed a
    // streaming frame with Complete output must reproduce batch exactly.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stage = Paths.get("/tmp/graft_stream/qc_docs")
    Files.createDirectories(stage)
    val src = new java.io.File(s"$sfDir/documents.parquet")
    Files.copy(src.toPath, stage.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = spark.read.parquet(stage.toString)
    val labels = batchDocs.select(col("doc_id"),
      when(col("n_chars") >= 300, 1.0).otherwise(0.0).as("y"))
    val feats = graft.ops.QualityModel.hashedFeatures(batchDocs, "doc_id", "text", 64)
    val w = graft.ops.QualityModel.trainLogReg(feats, labels, "doc_id",
      64, iters = 5, lr = 2.0)
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val scored = graft.ops.QualityModel.score(stream, w, "doc_id", "text", 64)
    val q = EventStream.runToMemory(scored, "qc_stream", OutputMode.Complete())
    try {
      val streamed = spark.table("qc_stream")
        .select(col("doc_id"), round(col("score"), 6).as("score"))
      val batch = graft.ops.QualityModel.score(batchDocs, w, "doc_id", "text", 64)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
      assert(streamed.count() > 0)
      assertParity(streamed, batch)
    } finally q.stop()
  }

  test("map-only corpus ops run unchanged under streaming: chunking parity") {
    // chunkDocuments is stateless/map-only, so the SAME code path must
    // work as a streaming transform with Append output and produce
    // exactly the batch result on the same file drop — the ingest-time
    // preprocessing shape (tokenize/chunk as documents land).
    val stream = rawStream().select(col("event_id").as("doc_id"),
      concat_ws(" ", col("event_type"), col("props"), col("event_type")).as("text"))
    val chunked = graft.ops.Corpus.chunkDocuments(stream, "doc_id", "text", 4, 2)
    val q = EventStream.runToMemory(chunked, "chunks_stream", OutputMode.Append())
    try {
      val streamed = spark.table("chunks_stream")
      val batch = graft.ops.Corpus.chunkDocuments(
        queries.QueryKit.t(spark, sfDir, "events")
          .select(col("event_id").as("doc_id"),
            concat_ws(" ", col("event_type"), col("props"), col("event_type")).as("text")),
        "doc_id", "text", 4, 2)
      assert(streamed.count() > 0)
      assertParity(streamed, batch)
    } finally q.stop()
  }
}
