package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Similarity, Text}

/**
 * Deduplication for training-data pipelines: exact, MinHash-LSH,
 * SimHash, and n-gram-Jaccard near-dup. All formulations are
 * shuffle-on-bucket joins/aggregations — no driver materialization, no
 * all-pairs cross product — so they hold at 100 TB (candidate volume is
 * governed by band/bucket width, and skewed buckets split under AQE).
 */
object Dedup {

  /** Exact dedup on a canonicalized content fingerprint: one hash shuffle on
    * the fingerprint, keep the smallest id per group (deterministic). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp__")).orderBy(col(idCol).asc)
    df.withColumn("__fp__", Text.fingerprint(col(textCol)))
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1)
      .drop("__fp__", "__rn__")
  }

  /** Per-fingerprint group stats (the audit view of exact dedup). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fingerprint", Text.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /**
   * LSH band planning (the MMDS S-curve rule, Leskovec/Rajaraman/Ullman
   * ch. 3): for `numHashes` minhashes split into b bands of r rows, the
   * candidate probability at Jaccard s is 1 − (1 − s^r)^b. Pick the
   * (bands, rowsPerBand) factorization whose S-curve best separates the
   * caller's `threshold`: minimize ∫₀ᵗ P(s) ds (false-candidate mass —
   * wasted verify joins) + ∫ᵗ¹ (1 − P(s)) ds (missed-duplicate mass),
   * with `fnWeight` scaling the miss term (dedup pipelines usually weight
   * misses ≥ candidates: a false candidate costs one exact-Jaccard
   * verify, a miss is a duplicate that ships to training).
   *
   * Driver-side arithmetic over the ≤ d(numHashes) factorizations — call
   * it once when configuring [[minhashLshPairs]], not per row.
   */
  def planBands(numHashes: Int, threshold: Double,
      fnWeight: Double = 2.0): (Int, Int) = {
    require(numHashes > 0, s"numHashes must be positive: $numHashes")
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    val grid = 1000
    def cost(b: Int, r: Int): Double = {
      var fp = 0.0; var fn = 0.0
      var i = 0
      while (i < grid) {
        val s = (i + 0.5) / grid
        val p = 1.0 - math.pow(1.0 - math.pow(s, r), b)
        if (s < threshold) fp += p else fn += (1.0 - p)
        i += 1
      }
      (fp + fnWeight * fn) / grid
    }
    (1 to numHashes).filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
      .minBy { case (b, r) => cost(b, r) }
  }

  /**
   * MinHash-LSH near-duplicate candidate pairs.
   *
   * shingle → minhash signature (numHashes) → split into `bands` bands →
   * hash each band → explode to (band, bandHash, id) → self-join on the
   * band bucket. The join is an equi-join on (band, bandHash): Spark hash-
   * partitions it, so candidate generation is linear in bucket sizes.
   * Pairs are then verified with the exact shingle-set Jaccard and filtered
   * by `threshold`.
   *
   * Exchange discipline: the band self-join and the candidate-pair
   * `distinct` carry ONLY (band, bucketHash, id) / (id_a, id_b) — never
   * the shingle arrays (easily KBs/doc, and the naive formulation shuffles
   * them 2×bands× plus once per matched pair). The verify payload
   * re-attaches via two id-equi-joins just before the exact-Jaccard
   * verify — as xxhash64-FOLDED shingle sets (8 B/shingle, not the raw
   * n-gram strings; hashed-set Jaccard ≡ string-set Jaccard up to 64-bit
   * in-pair collisions, see [[foldedShingleSet]]) — so each doc's set
   * crosses an exchange at most twice regardless of band count or
   * bucket skew, at ~5× fewer bytes than the raw arrays. Shingles are
   * recomputed on the re-attach branch (a codegen'd map over the scan) —
   * deliberate: CPU is cheap relative to exchange bytes at corpus scale,
   * and each pair is verified exactly once (post-dedup) instead of once
   * per matching band.
   */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val sh = df.select(
      col(idCol),
      array_distinct(Text.shingles(col(textCol), shingleN)).as("__sh__"))
    val sig = sh.withColumn("__sig__", Text.minhashSignature(col("__sh__"), numHashes))

    val banded = sig.select(
      col(idCol),
      size(col("__sh__")).as("__sz__"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws(",",
          slice(col("__sig__"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>")), b))))
      .withColumnRenamed("pos", "__band__")
      .withColumnRenamed("col", "__bucket__")

    val a = banded.select(col(idCol).as("id_a"), col("__sz__").as("sz_a"),
      col("__band__"), col("__bucket__"))
    val b = banded.select(col(idCol).as("id_b"), col("__sz__").as("sz_b"),
      col("__band__"), col("__bucket__"))
    val survivors = a.join(b, Seq("__band__", "__bucket__"))
      .filter(col("id_a") < col("id_b"))
      .filter(sizeRatioBound(col("sz_a"), col("sz_b")) >= threshold)
      .select("id_a", "id_b")
      .distinct()

    // Folded verify payload (xxhash64 per shingle on the fast path —
    // same exactness/spill-bytes argument as [[foldedShingleSet]]:
    // hashed-set Jaccard ≡ shingle-set Jaccard up to 64-bit collisions
    // within one pair, and the arrays crossing the verify exchange are
    // 8 B/shingle instead of the raw n-gram strings).
    val hashed = df.select(col(idCol),
      transform(array_distinct(Text.shingles(col(textCol), shingleN)),
        s => xxhash64(s)).as("__hs__"))
    survivors
      .join(hashed.select(col(idCol).as("id_a"), col("__hs__").as("hs_a")), Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col("__hs__").as("hs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup: pairs whose 64-bit simhashes differ in ≤ `maxBits`
    * bits. Candidates are generated by banding the simhash into
    * `maxBits + 1` chunks — by pigeonhole, any pair within Hamming
    * distance `maxBits` agrees on at least one full chunk, so the
    * guarantee holds for every `maxBits` in [0, 63], not just the
    * 4×16-bit special case. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxBits: Int = 3): DataFrame = {
    require(maxBits >= 0 && maxBits < 64, s"maxBits must be in [0, 64): $maxBits")
    val nChunks = maxBits + 1
    // Chunk i covers bits [bounds(i), bounds(i+1)) — widths differ by at
    // most one bit when nChunks does not divide 64.
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    // native codegen'd simhash (graft.plans.SimHash64) — identical bits
    // to Text.simhash, without the 64-wide lambda tree per token
    graft.plans.GraftExtensions.register(df.sparkSession)
    val hashed = df.select(col(idCol),
      call_function("graft_simhash", Text.wordTokens(col(textCol))).as("__sim__"))
    val chunked = hashed.select(col(idCol), col("__sim__"),
      posexplode(array((0 until nChunks).map { i =>
        val width = bounds(i + 1) - bounds(i)
        val mask = if (width == 64) -1L else (1L << width) - 1L
        shiftrightunsigned(col("__sim__"), bounds(i)).bitwiseAND(lit(mask))
      }: _*)))
      .withColumnRenamed("pos", "__chunk__").withColumnRenamed("col", "__key__")
    val a = chunked.select(col(idCol).as("id_a"), col("__sim__").as("sim_a"), col("__chunk__"), col("__key__"))
    val b = chunked.select(col(idCol).as("id_b"), col("__sim__").as("sim_b"), col("__chunk__"), col("__key__"))
    a.join(b, Seq("__chunk__", "__key__"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Text.hammingDistance(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxBits)
  }

  /** Exact n-gram Jaccard similarity over MinHash-banded candidate pairs —
    * the SQL-checkable near-dup.
    *
    * The candidate key for band b is a true MinHash under an
    * engine-portable random order: md5(b + ":" + shingle) minimized over
    * the doc's shingle set (md5 hex strings are a uniform total order both
    * Spark and DuckDB compute identically, unlike xxhash64). P(two docs
    * share band b's key) = their Jaccard, so candidate recall after
    * `nBands` bands is 1-(1-J)^nBands (≈0.94 at J=0.5 with 4 bands) and
    * keys are high-cardinality — bucket sizes track true near-dup cluster
    * sizes. This replaces the earlier word-count÷10 band, whose
    * low-cardinality length-clustered key degraded the self-join toward
    * quadratic on real corpora and silently missed near-dups straddling a
    * length-band edge. Pairs found by several bands dedupe before the
    * threshold filter; the reported jaccard is always the exact shingle-set
    * value.
    *
    * Exchanges carry id/hash columns only (band join + pair distinct); the
    * 60-bit-folded shingle sets ([[foldedShingleSet]], 8 B/shingle)
    * re-attach by id just before the exact verify — see
    * [[minhashLshPairs]] for the rationale. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double, nBands: Int = 4): DataFrame =
    md5BandedPairs(df, idCol, textCol, shingleN, threshold, nBands, rowsPerBand = 1)

  /** MinHash-LSH near-dup pairs under the ENGINE-PORTABLE md5 hash order —
    * the independently-checkable twin of [[minhashLshPairs]] (whose
    * xxhash64 signature no other engine reproduces). Band b's key is the
    * concatenation of `rowsPerBand` true MinHashes, row r drawing its
    * random order from md5((b·rowsPerBand+r) + ":" + shingle) — so
    * P(key collision) = J^rowsPerBand per band and the S-curve matches the
    * classic (bands, rows) trade-off. Same plan shape as the fast path
    * (banded bucket self-join, id-only exchanges, exact-Jaccard verify);
    * md5 costs ~3× xxhash64 per shingle, which is why the fast path stays
    * the default and this variant anchors it to a DuckDB oracle (q104b)
    * plus a parity spec. */
  def minhashLshPairsMd5(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    md5BandedPairs(df, idCol, textCol, shingleN, threshold, bands,
      rowsPerBand = numHashes / bands)
  }

  /** One md5 digest (32 hex chars) per shingle — the ONLY md5 work that
    * scales with shingle volume. Every MinHash order derives from this
    * digest via [[md5BandKeysFromDigests]] rotation lanes, so the
    * per-shingle hash cost is constant in numHashes (it used to be one
    * md5 per shingle PER HASH — numHashes× the work). Project this into a
    * column BEFORE banding so the digest array is provably computed once
    * (CollapseProject keeps a multi-referenced non-cheap alias
    * materialized). DuckDB twin: `md5(s)`. */
  def shingleDigests(shingleArr: Column): Column =
    transform(shingleArr, x => md5(x))

  /** The engine-portable md5 LSH band keys as one expression: an array of
    * `nBands` 8-byte binary keys over a [[shingleDigests]] column. Hash
    * h's random order over shingles is LEXICOGRAPHIC ON THE LANE
    * `substr(digest, h+1, 16)` — the 16-hex-char (64-bit) window at char
    * offset h of the 32-char digest — so one md5 serves all numHashes
    * hash functions. Each lane leads with a fresh digest char, so
    * per-lane argmins are ~independent and the classic (bands, rows)
    * S-curve is unchanged (measured: candidate volume identical to
    * per-index md5 within 0.1% on the 32× corpus); past 16 lanes the
    * window runs off the digest, hence the cap. Band b's raw key
    * concatenates its `rowsPerBand` lane-minima, folded to 8 bytes before
    * any exchange — see [[md5BandedPairs]] for the collision-safety
    * argument. The whole computation is ONE native kernel
    * ([[graft.plans.LaneMinBandKeys]]): a single pass over the digest
    * array holding lane minima as views — the `transform`/`array_min`
    * tree walked the array once per hash with two allocations per
    * element, and THAT (not the md5 count) measured as the banding
    * floor. Shared verbatim by the batch pair generator, the persisted
    * band index, and the streaming near-dup suppressor
    * ([[graft.streaming.EventStream.nearDupBandClaims]]); DuckDB
    * reproduces every step (`substr(md5(s), b*rpb+r+1, 16)` lanes,
    * `md5`-fold, 8-byte `unhex(substr(…))`), so batch, stream, index,
    * and oracle all band identically. */
  def md5BandKeysFromDigests(digArr: Column, nBands: Int, rowsPerBand: Int): Column =
    call_function("graft_band_keys", digArr, lit(nBands), lit(rowsPerBand))

  /** [[md5BandKeysFromDigests]] over a raw shingle array — for one-shot
    * callers; when the keys feed several expressions, project
    * [[shingleDigests]] first so the md5 pass runs once. */
  def md5BandKeys(shingleArr: Column, nBands: Int, rowsPerBand: Int): Column =
    md5BandKeysFromDigests(shingleDigests(shingleArr), nBands, rowsPerBand)

  /** The exact-verify payload: each shingle folded to its 60-bit md5
    * prefix (`conv(substr(md5(s),1,15),16,10)` — DuckDB mirrors it as
    * `CAST(('0x' || substr(md5(s),1,15)) AS UBIGINT)`). Jaccard over the
    * folded sets equals the raw shingle-set Jaccard unless two DISTINCT
    * shingles of the same PAIR collide at 60 bits — P ≈ m²/2^61 per pair
    * (m = shingles/doc), < 10⁻¹² even at m = 10³ — and both engines fold
    * identically, so the oracle gate is exact by construction. The point
    * is exchange/spill bytes: the verify join attaches 8 bytes/shingle
    * instead of the raw n-gram string (~20–40 B + offsets), which is the
    * stage that hit the single-node disk-spill wall at the 64× probe
    * (130M candidate pairs × ~4 KB attached arrays per side). */
  private[graft] def foldedShingleSet(text: Column, shingleN: Int): Column =
    transform(array_distinct(Text.shingles(text, shingleN)),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))

  /** EXACT candidate prefilter from distinct-shingle counts alone:
    * J = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|) (the intersection can't
    * exceed the smaller set; the union can't undercut the larger), so a
    * pair whose size ratio is already below the threshold can NEVER
    * verify — dropping it loses nothing, unlike a lane-minima estimate
    * (which has false negatives). The comparison is the same double
    * division the exact verify performs (correctly-rounded division is
    * monotone, so bound < threshold in doubles ⇒ jaccard < threshold in
    * doubles) — the survivor set provably contains every output pair.
    * The sizes ride the band join at 8 B/side, filtering BEFORE the
    * pair-distinct exchange and the folded-set attach — this is the
    * first stage of the two-stage verify that pulled the 64× probe's
    * per-task sort memory back toward the default-heap operating point
    * (see SCALE_r12.json). Empty-set docs (size 0) yield NaN here and
    * NaN in the verify — dropped by both, consistently. */
  private def sizeRatioBound(szA: Column, szB: Column): Column =
    least(szA, szB).cast("double") / greatest(szA, szB).cast("double")

  private def md5BandedPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double, nBands: Int, rowsPerBand: Int): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val prepped = df.select(
      col(idCol),
      array_distinct(Text.shingles(col(textCol), shingleN)).as("__sh__"))
    // The raw band key is rowsPerBand md5 hex strings joined with '|' —
    // up to 131 chars shuffled twice in the self-join. Fold it to 8 bytes
    // (unhex of the first 16 md5 hex chars — DuckDB reproduces the same
    // fold) before the exchange: a 64-bit collision can only MERGE two
    // buckets, adding spurious candidates the exact-Jaccard verify below
    // already filters — it can never drop a true candidate — so the fold
    // trades zero correctness for ~8× narrower band-join exchanges.
    val banded = prepped
      .withColumn("__dg__", shingleDigests(col("__sh__")))
      .select(col(idCol), size(col("__sh__")).as("__sz__"),
        posexplode(md5BandKeysFromDigests(col("__dg__"), nBands, rowsPerBand)))
      .withColumnRenamed("pos", "__band__")
      .withColumnRenamed("col", "__key__")
    val a = banded.select(col(idCol).as("id_a"), col("__sz__").as("sz_a"),
      col("__band__"), col("__key__"))
    val b = banded.select(col(idCol).as("id_b"), col("__sz__").as("sz_b"),
      col("__band__"), col("__key__"))
    val candidates = a.join(b, Seq("__band__", "__key__"))
      .filter(col("id_a") < col("id_b"))
      // stage-1 verify: the exact size-ratio bound ([[sizeRatioBound]])
      // culls provably-below-threshold pairs before they cost a distinct
      // exchange and a folded-set attach
      .filter(sizeRatioBound(col("sz_a"), col("sz_b")) >= threshold)
      .select("id_a", "id_b")
      .distinct()
    // Re-attach branch carries the FOLDED shingle sets (8 B/shingle),
    // not the raw arrays — see [[foldedShingleSet]] for the exactness
    // and spill-bytes argument.
    val hashed = df.select(col(idCol),
      foldedShingleSet(col(textCol), shingleN).as("__hs__"))
    candidates
      .join(hashed.select(col(idCol).as("id_a"), col("__hs__").as("hs_a")), Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col("__hs__").as("hs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Cross-corpus fuzzy join (record linkage / entity resolution): MinHash-
   * banded candidate pairs BETWEEN two tables, verified with the exact
   * shingle-set Jaccard. The two-table sibling of [[minhashLshPairsMd5]]
   * — same engine-portable md5 band keys ([[md5BandKeys]], so both sides
   * band identically no matter which table a document lives in), same
   * band-bucket equi-join discipline, but left ⋈ right instead of a
   * self-join and no id ordering filter (ids come from different key
   * spaces).
   *
   * This is the "which of these 10M new crawl docs already exist in the
   * 10B-doc corpus" / "link these two entity tables on fuzzy names" shape:
   * candidate volume is band-governed (linear in bucket sizes, never
   * |L|×|R|), exchanges carry only (band, 8-byte key, id) until the
   * verify, and the 60-bit-folded shingle sets ([[foldedShingleSet]])
   * re-attach by id once per side — the same exchange-bytes argument as
   * [[minhashLshPairs]]. When one side is dimension-sized its banded
   * form broadcasts under AQE automatically.
   */
  def crossCorpusPairsMd5(
      left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.plans.GraftExtensions.register(left.sparkSession)
    val rowsPerBand = numHashes / bands
    def prep(df: DataFrame, id: String, text: String, outId: String, outSh: String) =
      df.select(col(id).as(outId),
        array_distinct(Text.shingles(col(text), shingleN)).as(outSh))
    def banded(prepped: DataFrame, id: String, sh: String, sz: String) =
      prepped.withColumn("__dg__", shingleDigests(col(sh)))
        .select(col(id), size(col(sh)).as(sz),
          posexplode(md5BandKeysFromDigests(col("__dg__"), bands, rowsPerBand)))
        .withColumnRenamed("pos", "__band__")
        .withColumnRenamed("col", "__key__")
        .select(col(id), col(sz), col("__band__"), col("__key__"))
    val lp = prep(left, leftId, leftText, "id_l", "__shl__")
    val rp = prep(right, rightId, rightText, "id_r", "__shr__")
    val candidates = banded(lp, "id_l", "__shl__", "sz_l")
      .join(banded(rp, "id_r", "__shr__", "sz_r"), Seq("__band__", "__key__"))
      // stage-1 verify ([[sizeRatioBound]]): exact, recall-free cull
      // before the distinct exchange and the folded-set attach
      .filter(sizeRatioBound(col("sz_l"), col("sz_r")) >= threshold)
      .select("id_l", "id_r")
      .distinct()
    // Folded verify payload — [[foldedShingleSet]] for the argument.
    val lh = left.select(col(leftId).as("id_l"),
      foldedShingleSet(col(leftText), shingleN).as("__hl__"))
    val rh = right.select(col(rightId).as("id_r"),
      foldedShingleSet(col(rightText), shingleN).as("__hr__"))
    candidates
      .join(lh, Seq("id_l"))
      .join(rh, Seq("id_r"))
      .select(col("id_l"), col("id_r"),
        (size(array_intersect(col("__hl__"), col("__hr__"))).cast("double") /
          size(array_union(col("__hl__"), col("__hr__"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Persisted LSH band index — the incremental-ingestion half of
   * [[crossCorpusPairsMd5]]. At 100 TB the corpus's shingle/minhash pass
   * is the expensive stage; re-running it for every arriving batch is
   * O(corpus) per batch. Instead, materialize the banded keys ONCE
   * ((band, 8-byte key, id) — a few dozen bytes/doc, ~10⁻³ of the text)
   * and link each new batch against the stored index: per-batch cost
   * becomes O(batch + matched buckets).
   *
   * `writeBandIndex` computes and writes the index partitioned by
   * `__band__` (partition pruning applies when a probe targets specific
   * bands); [[linkAgainstIndex]] bands only the BATCH side, joins it to
   * the index on (band, key), and verifies candidates with the exact
   * shingle-set Jaccard — corpus text is touched only for the matched
   * candidate ids (one id-equi-join against the corpus scan, which at
   * scale prunes to the candidate set via DPP/broadcast).
   *
   * Identity pinned in DedupSpec: linkAgainstIndex(batch, index(corpus))
   * ≡ crossCorpusPairsMd5(batch, corpus) — the index is a pure
   * materialization, not an approximation.
   */
  def writeBandIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    corpus.select(col(idCol),
      array_distinct(Text.shingles(col(textCol), shingleN)).as("__sh__"))
      .withColumn("__dg__", shingleDigests(col("__sh__")))
      .select(col(idCol).as("id_r"),
        posexplode(md5BandKeysFromDigests(col("__dg__"), bands, numHashes / bands)))
      .withColumnRenamed("pos", "__band__")
      .withColumnRenamed("col", "__key__")
      .write.mode("overwrite").partitionBy("__band__").parquet(path)
  }

  /** Link a new batch against a [[writeBandIndex]] output. `corpus` must
    * be the table the index was built from (its text re-attaches by id
    * for the exact-Jaccard verify of matched candidates only). Same
    * (shingleN, numHashes, bands) as the index build — the caller owns
    * that contract, exactly as with any persisted index.
    *
    * Note: the stage-1 size-ratio cull ([[sizeRatioBound]]) does NOT run
    * here — the persisted index carries only (band, key, id), and adding
    * a size column is an index-format version bump we don't take for a
    * path whose verify is already candidate-driven (O(matched), not
    * O(corpus)); the exact verify below filters the same pairs one join
    * later. */
  def linkAgainstIndex(batch: DataFrame, batchId: String, batchText: String,
      indexPath: String, corpus: DataFrame, corpusId: String,
      corpusText: String, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.plans.GraftExtensions.register(batch.sparkSession)
    val spark = batch.sparkSession
    val lp = batch.select(col(batchId).as("id_l"),
      array_distinct(Text.shingles(col(batchText), shingleN)).as("__shl__"))
    val bandedL = lp.withColumn("__dg__", shingleDigests(col("__shl__")))
      .select(col("id_l"),
        posexplode(md5BandKeysFromDigests(col("__dg__"), bands, numHashes / bands)))
      .withColumnRenamed("pos", "__band__")
      .withColumnRenamed("col", "__key__")
    val index = spark.read.parquet(indexPath)
      // partitionBy wrote __band__ as a partition column (int), __key__
      // stays binary; select in join-key order
      .select(col("id_r"), col("__band__").cast("int"), col("__key__"))
    // localCheckpoint: candidates feed TWO branches (the id semi-join
    // below and the final verify join) — without it the narrow index
    // scan + band join would re-run per branch
    val candidates = bandedL.join(index, Seq("__band__", "__key__"))
      .select("id_l", "id_r")
      .distinct()
      .localCheckpoint()
    // Verify is candidate-driven: semi-join the corpus on the matched ids
    // FIRST (an O(matched)-row side AQE broadcasts), THEN shingle — the
    // per-row tokenize/shingle CPU, which dominates the text stage, runs
    // only for matched docs instead of the whole corpus (measured: the
    // full-corpus shingling made linking a constant batch cost 10× more
    // against a 32× index — O(corpus), exactly what this path exists to
    // avoid). The corpus SCAN still reads (id, text) bytes once; at
    // production scale an id-bucketed corpus layout (or a persisted
    // digest docstore) turns that into a bucket-pruned point lookup —
    // the scan is IO-bound and filter-pushed either way, never
    // shingle-CPU-bound.
    val candIds = candidates.select(col("id_r")).distinct()
    // Folded verify payloads on both sides ([[foldedShingleSet]]) — the
    // corpus side additionally shingles only the candidate-matched docs.
    val rp = corpus
      .join(candIds, corpus(corpusId) === candIds("id_r"), "left_semi")
      .select(col(corpusId).as("id_r"),
        foldedShingleSet(col(corpusText), shingleN).as("__hr__"))
    val lh = batch.select(col(batchId).as("id_l"),
      foldedShingleSet(col(batchText), shingleN).as("__hl__"))
    candidates
      .join(lh, Seq("id_l"))
      .join(rp, Seq("id_r"))
      .select(col("id_l"), col("id_r"),
        (size(array_intersect(col("__hl__"), col("__hr__"))).cast("double") /
          size(array_union(col("__hl__"), col("__hr__"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Edit-distance-verified near-dup pairs: MinHash-banded candidate
    * generation (engine-portable md5 path, NO jaccard cutoff — every
    * banded collision survives to the verify) followed by an exact
    * Levenshtein check on the raw text. The verify is the expensive step
    * at scale — three guards bound it: candidate volume is band-governed
    * (never all-pairs), a length prefilter skips pairs whose size gap
    * already exceeds `maxDist` (|len(a)−len(b)| is a Levenshtein lower
    * bound) without running the DP, and the DP itself is the banded
    * O(n·maxDist) threshold variant (`levenshtein(l, r, threshold)`),
    * not the full O(n·m) matrix. Returns (id_a, id_b, edit_dist ≤
    * maxDist). */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    val cand = minhashLshPairsMd5(df, idCol, textCol, shingleN, numHashes,
      bands, threshold = 0.0).select("id_a", "id_b")
    cand
      .join(df.select(col(idCol).as("id_a"), col(textCol).as("__ta__")), Seq("id_a"))
      .join(df.select(col(idCol).as("id_b"), col(textCol).as("__tb__")), Seq("id_b"))
      .filter(abs(length(col("__ta__")) - length(col("__tb__"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta__"), col("__tb__"), maxDist).cast("long").as("edit_dist"))
      .filter(col("edit_dist") >= 0) // threshold variant returns -1 past maxDist
  }

  /** SimHash near-dup pairs under the ENGINE-PORTABLE md5 token hash —
    * the independently-checkable twin of [[simhashPairs]] (q105b). The
    * simhash is kept as a 64-element ±bit array ([[Text.simhashBitsMd5]]):
    * chunk keys are bit-substrings (pigeonhole guarantee identical to the
    * fast path), the candidate join carries only (id, chunk, key), and the
    * bit arrays (64 ints ≈ 0.3 KB) re-attach by id for the exact Hamming
    * verify. */
  def simhashPairsMd5(df: DataFrame, idCol: String, textCol: String,
      maxBits: Int = 3): DataFrame = {
    require(maxBits >= 0 && maxBits < 64, s"maxBits must be in [0, 64): $maxBits")
    val nChunks = maxBits + 1
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    val hashed = df.select(col(idCol),
      Text.simhashBitsMd5(Text.wordTokens(col(textCol))).as("__bits__"))
    val chunked = hashed.select(col(idCol),
      posexplode(array((0 until nChunks).map { i =>
        concat_ws("", slice(col("__bits__"), bounds(i) + 1, bounds(i + 1) - bounds(i))
          .cast("array<string>"))
      }: _*)))
      .withColumnRenamed("pos", "__chunk__").withColumnRenamed("col", "__key__")
    val a = chunked.select(col(idCol).as("id_a"), col("__chunk__"), col("__key__"))
    val b = chunked.select(col(idCol).as("id_b"), col("__chunk__"), col("__key__"))
    val candidates = a.join(b, Seq("__chunk__", "__key__"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    candidates
      .join(hashed.select(col(idCol).as("id_a"), col("__bits__").as("bits_a")), Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col("__bits__").as("bits_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("bits_a"), col("bits_b"), (x, y) => abs(x - y)),
          lit(0), (acc, x) => acc + x).cast("long").as("hamming"))
      .filter(col("hamming") <= maxBits)
  }

  /** Embedding-cosine near-duplicate pairs — exact baseline: broadcast
    * self-join scoring every (i<j) pair with the codegen'd native cosine.
    * Quadratic by definition; the verify oracle for [[embeddingPairsLsh]]
    * and correct at any corpus size where n² pairs are acceptable.
    *
    * The whole corpus is broadcast, so `maxRows` caps it (same valve as
    * `Frame.transpose`'s maxCells) — a clear error beats a driver OOM.
    * Past the cap, [[embeddingPairsLsh]] is the scale path. */
  def embeddingPairsBrute(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxRows: Long = 100000L): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"embeddingPairsBrute broadcasts the corpus and scores n² pairs: $n rows > " +
        s"maxRows=$maxRows; raise maxRows explicitly or use embeddingPairsLsh")
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va__"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb__"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.nativeCosine(df)(col("__va__"), col("__vb__")))
      // Spark orders NaN above every double, so a zero-norm vector (cosine
      // 0/0 = NaN) would pass ANY threshold — a pair with no defined angle
      // is not a near-dup
      .filter(!isnan(col("cosine")) && col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Embedding-cosine near-dup at scale: multi-table random-hyperplane
    * LSH (deterministic planes — no broadcast state, the q108 machinery)
    * buckets the corpus, candidates come from the (table, bucket)
    * equi-self-join, and every candidate is verified with the exact
    * cosine — precision 1.0, recall ≈ 1-(1-p^nPlanes)^nTables with
    * p = 1 - θ/π. Sized for true near-dups (cos ≥ 0.9 → ~98% recall at
    * 6 planes × 8 tables); raise nTables for lower thresholds.
    *
    * Exchanges carry id/bucket columns only (table join + pair distinct);
    * the embedding vectors re-attach by id just before the exact-cosine
    * verify — see [[minhashLshPairs]] for the rationale. */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 6, nTables: Int = 8): DataFrame = {
    val vecs = df.select(col(idCol), col(vecCol))
    val banded = vecs.select(col(idCol),
      posexplode(array((0 until nTables).map(t =>
        Similarity.lshBucket(col(vecCol), nPlanes, t)): _*)))
      .withColumnRenamed("pos", "__table__")
      .withColumnRenamed("col", "__bucket__")
    val a = banded.select(col(idCol).as("id_a"), col("__table__"), col("__bucket__"))
    val b = banded.select(col(idCol).as("id_b"), col("__table__"), col("__bucket__"))
    val candidates = a.join(b, Seq("__table__", "__bucket__"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    candidates
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va__")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb__")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.nativeCosine(df)(col("__va__"), col("__vb__")).as("cosine"))
      .filter(!isnan(col("cosine")) && col("cosine") >= threshold) // see brute: NaN ≠ near-dup
  }

  /**
   * Near-dup clustering: connected components over a candidate-pair edge
   * list — the step after any pair generator above (a near-dups b, b
   * near-dups c ⇒ {a,b,c} is one duplicate cluster, keep one
   * representative). Hash-min label propagation: every node starts
   * labelled with its own id; each round, a node's label drops to the
   * minimum label among itself and its neighbours; fixpoint = each
   * component labelled by its minimum member id.
   *
   * Scale shape: one round = one hash-join (edges ⋈ labels, both sides
   * partitioned by the join key) + one groupBy-min + one POINTER JUMP
   * (labels ⋈ labels on comp = id, i.e. comp := min(comp, comp[comp]))
   * — all linear in |E|+|V| per round. The jump is the path-doubling
   * step of hash-min CC (same effect as the large-star contraction in
   * Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14): the label pointer's reach doubles every round, so rounds
   * needed = O(log diameter), not O(diameter) — a 10k-node adversarial
   * PATH graph converges in ~15 rounds (pinned by a DedupSpec case).
   * Near-dup graphs are dense tiny-diameter clusters (2-4) and finish in
   * 3-4 rounds either way; the round cap still bounds worst-case work
   * loudly, and `localCheckpoint` truncates the growing lineage each
   * round (same discipline as [[Kmeans.train]]).
   *
   * Returns (id, component): one row per node that appears in an edge,
   * component = min node id in its cluster. Singletons (docs in no pair)
   * are their own trivial cluster — union them in from the corpus if the
   * caller needs total coverage.
   */
  def connectedComponents(edges: DataFrame, idACol: String, idBCol: String,
      maxRounds: Int = 20): DataFrame = {
    // MATERIALIZE the undirected edge list before the loop (r15). `und`
    // is referenced by every round's neighbour join, and each round is a
    // separate action — without the checkpoint, every round RE-EXECUTES
    // the caller's entire pair-generation plan (banding, shuffles, exact
    // verify: the expensive part of the whole near-dup job) because Spark
    // does not reuse shuffle output across separate query executions.
    // Measured (SCALE_r15): e2e near-dup removal at 64×/t=0.8 fell
    // 417.9 s → 256.5 s (−39%) and the 1× base 14.7 → 6.4 s; the
    // e2e-to-pairs-alone ratio fell ~2.8× → ~1.7× — the gap was the
    // redundant pair-generation passes, one per extra CC round.
    // Same block-manager discipline as the label checkpoints
    // (memory+disk, freed on context cleanup); the edge list is
    // O(duplicate pairs), tiny relative to the corpus.
    //
    // SCALE TRADE (documented, deliberate): localCheckpoint blocks are
    // executor-local and NOT replayable — lose an executor mid-loop and
    // the job fails instead of recomputing, and the whole CC pass retries
    // from the pair generator. At 100 TB that retry is tolerable (the
    // loop is minutes, not hours) and the alternative was measured 2.9×
    // worse (SCALE_r15: every round re-ran pair generation). If executor
    // churn is real in a deployment, swap in reliable `checkpoint()`
    // against a checkpoint dir — same plan shape, replayable blocks.
    val und = edges.select(col(idACol).as("__src__"), col(idBCol).as("__dst__"))
      .union(edges.select(col(idBCol).as("__src__"), col(idACol).as("__dst__")))
      .distinct()
      .localCheckpoint()
    var labels = und.select(col("__src__").as("__id__")).distinct()
      .withColumn("__comp__", col("__id__"))
      .localCheckpoint()
    // Convergence sentinel: Σ__comp__ as exact DECIMAL(38,0). Labels are
    // monotone non-increasing per id and the id set is fixed after round
    // 0, so the label table changed this round ⟺ the exact sum dropped.
    // This replaces the previous per-round convergence JOIN of the old
    // and new label tables (+ count over both) with ONE narrow aggregate
    // over the new table only — one fewer two-sided pass per round
    // (guide §2.3/§2.4: fewer bytes through fewer stages). DECIMAL(38,0)
    // keeps the compare exact at any scale (10^9 nodes × 10^18-magnitude
    // ids is still 11 digits of headroom; a double's 2^53 mantissa would
    // tie silently and could declare convergence EARLY — correctness, so
    // exactness is non-negotiable).
    def compSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("__comp__").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s // empty edge list
    }
    // The sum sentinel is only sound when the decimal(38,0) cast is exact:
    // a string/UUID id casts to NULL (sum 0 every round -> instant false
    // convergence) and a fractional double truncates (a label drop inside
    // the truncated digits would be invisible). Integral ids cast exactly;
    // anything else falls back to the join-based change check below —
    // correct for any ordered id type, one extra two-sided pass per round.
    val integralId = und.schema("__src__").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    def changedVsJoin(prev: DataFrame, next: DataFrame): Boolean = {
      val old = prev.select(col("__id__"), col("__comp__").as("__oldcomp__"))
      !next.join(old, Seq("__id__"))
        .where(!(col("__comp__") <=> col("__oldcomp__"))).isEmpty
    }
    var prevSum = if (integralId) compSum(labels) else null
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // pointer jump (path doubling) FIRST: shortcut each label through
      // the label table itself — comp := min(comp, comp[comp]). One extra
      // self-join on the (small) label table per round turns worst-case
      // convergence from O(diameter) rounds into O(log diameter): the
      // pointer i→comp(i) doubles its reach every round (2^r − 1 after r
      // rounds), so even an adversarial 10k-node PATH graph (depth ≫ the
      // cap) converges in ~15 rounds. Dense near-dup clusters (diameter
      // 2-4) pay one tiny join for rounds they usually save. The jump
      // runs BEFORE propagation so the round still ENDS in the
      // groupBy(__id__) aggregate — the checkpointed labels keep their
      // hashpartitioning(__id__), which the caller's anti join reuses
      // (shuffle budget pinned by PlanAuditSpec's q168 contract).
      val parents = labels
        .select(col("__id__").as("__pid__"), col("__comp__").as("__pcomp__"))
      val jumped = labels
        .join(parents, col("__comp__") === col("__pid__"), "left")
        .select(col("__id__"),
          least(col("__comp__"), coalesce(col("__pcomp__"), col("__comp__"))).as("__comp__"))
      // neighbour labels flow along edges; min with own label
      val incoming = und
        .join(jumped.withColumnRenamed("__id__", "__src__"), Seq("__src__"))
        .select(col("__dst__").as("__id__"), col("__comp__"))
      val next = jumped.union(incoming)
        .groupBy(col("__id__"))
        .agg(min(col("__comp__")).as("__comp__"))
        .localCheckpoint()
      // a single scalar per round: did any label drop? (exact-sum
      // sentinel — see compSum above; `next` is already checkpointed so
      // this is one narrow agg over block-manager data, not a recompute)
      val changed =
        if (integralId) {
          val nextSum = compSum(next)
          val c = nextSum.compareTo(prevSum) != 0
          prevSum = nextSum
          c
        } else changedVsJoin(labels, next)
      // Release the SUPERSEDED round's checkpoint blocks eagerly. Each
      // localCheckpoint materializes a full label-table copy in the block
      // manager; without this, copies from every round accumulate and
      // only the async ContextCleaner (driver-GC-triggered) can reclaim
      // them — a race it loses under heap pressure: the 128x e2e scale
      // run OOM'd in a late CC stage on the default 8 GiB heap (r15), and
      // r14's 256x run logged 8 page-allocation retries for the same
      // reason. `next` is already eagerly checkpointed and the sum
      // sentinel no longer reads the old labels at all, so the old
      // blocks are provably dead here. Memory per round is now bounded
      // by TWO label tables regardless of round count.
      val superseded = labels
      labels = next
      superseded.unpersist(blocking = false)
      converged = !changed
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds " +
      "(pathological chain graph — use a larger cap or a star-contraction scheme)")
    labels.select(col("__id__").as("id"), col("__comp__").as("component"))
  }

  /**
   * End-to-end near-dup removal: given the corpus and a candidate-pair
   * edge list from any generator above, drop every clustered document
   * except its cluster's minimum-id representative. Singletons (no pair)
   * pass through untouched. One left-anti join of the corpus against the
   * non-representative id set — the components labels are tiny relative
   * to the corpus (only docs that appear in a pair), so the anti join
   * broadcasts in practice and the corpus never shuffles.
   */
  def dropNearDuplicates(corpus: DataFrame, idCol: String,
      pairs: DataFrame, idACol: String, idBCol: String,
      maxRounds: Int = 20): DataFrame = {
    val losers = connectedComponents(pairs, idACol, idBCol, maxRounds)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023,
   * arXiv:2303.09540): assign every embedding to its nearest centroid,
   * score exact cosines only WITHIN each cluster, and drop any vector
   * whose cluster contains a ≥-threshold neighbor with a smaller id
   * (keep-first, the family's standard rule). Kept rows return
   * unchanged.
   *
   * The cluster partition bounds the pair space exactly the way LSH
   * bands do in [[embeddingPairsLsh]]: the within-cluster self-join is
   * an equi-join on centroid_id, so candidate volume is Σ|cluster|²
   * — at 100 TB the centroid count scales with the corpus (the paper
   * uses k ≈ n/expected-cluster-size), keeping |cluster| roughly
   * constant and the join linear in rows. Centroids arrive as a
   * DataFrame (trained via [[Kmeans.train]] or any fixed seed set) and
   * broadcast inside [[Similarity.assignCentroid]]; zero-norm vectors
   * (cosine NaN) never count as duplicates, matching the brute path.
   */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      threshold: Double): DataFrame = {
    val assigned = Similarity.assignCentroid(
      df.select(col(idCol), col(vecCol)), vecCol, centroids, centIdCol, centVecCol)
    df.join(semDropped(assigned, idCol, vecCol, threshold), Seq(idCol), "left_anti")
  }

  /** [[semDedup]] with the two-level assignment ([[Kmeans.assignTwoLevel]])
    * — the 100 TB path once the centroid count tracks the corpus (k ∝ n
    * makes exact assignment's n·k cosines quadratic; two-level is
    * ≈ n·√k). Same keep-first prune; assignment is approximate only at
    * coarse-group boundaries, and nProbe ≥ coarseK reproduces
    * [[semDedup]] exactly (DedupSpec pins the parity). Centroids follow
    * the Kmeans convention: columns (centroid_id, cvec). */
  def semDedupScalable(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      coarseK: Int, nProbe: Int = 2): DataFrame = {
    val assigned = Kmeans.assignTwoLevel(
      df.select(col(idCol), col(vecCol)), idCol, vecCol, centroids, coarseK, nProbe)
    df.join(semDropped(assigned, idCol, vecCol, threshold), Seq(idCol), "left_anti")
  }

  /** Keep-first prune within clusters: ids having a >=-threshold
    * neighbor with a smaller id under the same centroid_id. */
  private def semDropped(assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = assigned.select(col("centroid_id"),
      col(idCol).as("__ia__"), col(vecCol).as("__va__"))
    val b = assigned.select(col("centroid_id"),
      col(idCol).as("__ib__"), col(vecCol).as("__vb__"))
    a.join(b, Seq("centroid_id"))
      .filter(col("__ia__") > col("__ib__"))
      .withColumn("__cos__", Similarity.nativeCosine(assigned)(col("__va__"), col("__vb__")))
      .filter(!isnan(col("__cos__")) && col("__cos__") >= threshold)
      .select(col("__ia__").as(idCol)).distinct()
  }
}
