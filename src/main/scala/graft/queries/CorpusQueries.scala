package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{Frame, SortKey}
import graft.ops.{Corpus, Dsir, QualityModel, Sketch}
import QueryKit._

/**
 * Corpus-preparation operators (ops/Corpus): passage-level dedup,
 * Gopher repetition signals, benchmark decontamination, TF-IDF keyword
 * extraction, and context-length packing — the pipeline stages between
 * near-dup removal (q104–q106/q168) and training-shard write-out.
 *
 * Oracles mirror the Spark semantics exactly: whitespace tokens are
 * `regexp_extract_all(text, '\S+')` in DuckDB vs a filtered
 * `split(trim(text), "\\s+")` in Spark (both yield [] on blank text),
 * and token ordinals come from DuckDB's zipped unnest +
 * generate_subscripts.
 */
object CorpusQueries {

  val all: Seq[Q] = Seq(

    // Passage-level exact dedup (CCNet/Dolma shape): 10-word segments,
    // keep-first corpus-wide, reassemble documents from kept segments.
    // One exchange on the segment text + one on doc_id.
    Q("q179_segment_dedup",
      (s, dir) => Frame(Corpus.segmentDedup(t(s, dir, "documents"), "doc_id", "text", 10))
        .sortValues(Seq(SortKey.asc("doc_id"))).df,
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord
          FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS l FROM documents)
        ),
        segs AS (
          SELECT doc_id, (ord-1)//10 AS seg_idx, string_agg(tok, ' ' ORDER BY ord) AS seg
          FROM toks GROUP BY 1,2
        ),
        kept AS (
          SELECT doc_id, seg_idx, seg,
                 row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
          FROM segs
        )
        SELECT doc_id, count(*) AS n_kept, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
        FROM kept WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""")),

    // Gopher-style repetition signals — zero-exchange map over the scan
    // (higher-order array functions, no explode/shuffle).
    // Deterministic order WITHOUT a trailing orderBy: the input is
    // range-partitioned + sorted on doc_id BEFORE the heavy map, and the
    // map is narrow, so global order survives to the sink. A trailing
    // orderBy would be worse than redundant — EliminateSorts drops the
    // pre-sort and the final range exchange then SAMPLES the expensive
    // projection, evaluating every token fold twice.
    Q("q180_repetition_stats",
      (s, dir) => Corpus.repetitionStats(
        tSplitSorted(s, dir, "documents", "doc_id"), "doc_id", "text"),
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l,1) AS ord
          FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\S+') AS l FROM documents)
        ),
        wc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1,2),
        ws AS (SELECT doc_id, sum(c) AS total, count(*) AS dis, max(c) AS topc FROM wc GROUP BY 1),
        bg AS (SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS g,
                      lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt FROM toks),
        bc AS (SELECT doc_id, g, count(*) AS c FROM bg WHERE nxt IS NOT NULL GROUP BY 1,2),
        bs AS (SELECT doc_id, sum(c) AS total, count(*) AS dis, max(c) AS topc FROM bc GROUP BY 1)
        SELECT d.doc_id,
          round(coalesce(1.0 - ws.dis / CAST(ws.total AS DOUBLE), 0.0), 6) AS dup_word_frac,
          round(coalesce(ws.topc / CAST(ws.total AS DOUBLE), 0.0), 6) AS top_word_frac,
          round(coalesce(1.0 - bs.dis / CAST(bs.total AS DOUBLE), 0.0), 6) AS dup_bigram_frac,
          round(coalesce(bs.topc / CAST(bs.total AS DOUBLE), 0.0), 6) AS top_bigram_frac
        FROM documents d LEFT JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id)
        ORDER BY doc_id""")),

    // Benchmark decontamination: docs sharing any lowercased word
    // 3-gram with the held-out set (doc_id % 97 = 0 stands in for the
    // benchmark). Benchmark gram set broadcast; corpus side map-only
    // until the per-doc hit aggregation.
    Q("q181_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Frame(Corpus.decontaminate(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", n = 3)
          .select(col("doc_id"), col("n_hits"),
            col("n_grams").cast("long").as("n_grams"), col("hit_frac")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l,1) AS ord
          FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\S+') AS l FROM documents)
        ),
        grams AS (
          SELECT doc_id,
                 array_to_string(list(tok) OVER (PARTITION BY doc_id ORDER BY ord
                   ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), ' ') AS g,
                 count(*) OVER (PARTITION BY doc_id ORDER BY ord
                   ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS wn
          FROM toks
        ),
        dg AS (SELECT DISTINCT doc_id, g FROM grams WHERE wn = 3),
        bench AS (SELECT DISTINCT g FROM dg WHERE doc_id % 97 = 0),
        corp AS (SELECT doc_id, g FROM dg WHERE doc_id % 97 <> 0),
        tot AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY 1)
        SELECT c.doc_id, count(*) AS n_hits, any_value(t.n_grams) AS n_grams,
               round(count(*) / CAST(any_value(t.n_grams) AS DOUBLE), 6) AS hit_frac
        FROM corp c JOIN bench b USING (g) JOIN tot t ON c.doc_id = t.doc_id
        GROUP BY c.doc_id ORDER BY c.doc_id""")),

    // Per-document top-3 keywords by smoothed TF-IDF. Token explode →
    // (doc,term) count → term document-frequency → shuffle join on term
    // (vocabulary scales with the corpus: NOT broadcast) → top-k window.
    Q("q182_tfidf_topk",
      (s, dir) => Frame(Corpus.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", 3))
        .sortValues(Seq(SortKey.asc("doc_id"), SortKey.asc("rank"))).df,
      Some("""
        WITH terms AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1,2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                 tf.tf * (ln((1 + n.n) / CAST(1 + dfq.df AS DOUBLE)) + 1.0) AS score
          FROM tf JOIN dfq USING (term) CROSS JOIN n),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
                   FROM scored)
        SELECT doc_id, rank, term, tf, df, round(score, 6) AS score
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // Context-length packing: docs concatenated in id order, each
    // assigned to the 1000-token chunk where it starts. Running offset =
    // two-phase parallel prefix (no single-partition window).
    Q("q183_pack_chunks",
      (s, dir) => Frame(Corpus.packChunks(t(s, dir, "documents"), "doc_id", "text", 1000L))
        .sortValues(Seq(SortKey.asc("chunk_id"))).df,
      Some("""
        WITH tok AS (SELECT doc_id, len(regexp_extract_all(trim(text), '\S+')) AS t FROM documents),
        run AS (SELECT doc_id, t,
                       sum(t) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM tok)
        SELECT CAST((cum - t) // 1000 AS BIGINT) AS chunk_id, count(*) AS n_docs,
               CAST(sum(t) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM run GROUP BY 1 ORDER BY 1""")),

    // PII scrubbing (functions/Text.scrubPii): emails → <EMAIL>, IPv4 →
    // <IP>, phone-like digit runs → <PHONE>, as a codegen'd
    // regexp_replace chain over the scan. The fixture text is synthetic,
    // so deterministic PII is injected from doc fields (same construction
    // in the oracle); the md5 of the scrubbed text pins the full output
    // byte-for-byte, the counts pin the audit view.
    Q("q190_pii_scrub",
      (s, dir) => {
        val withPii = t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1 555 10"),
            pmod(col("doc_id"), lit(100)).cast("string"), lit(" at 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")).as("text"))
        val (ne, ni, np) = graft.functions.Text.piiCounts(col("text"))
        Frame(withPii.select(col("doc_id"),
          ne.cast("long").as("n_email"), ni.cast("long").as("n_ip"),
          np.cast("long").as("n_phone"),
          md5(graft.functions.Text.scrubPii(col("text"))).as("scrub_md5")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some("""
        WITH pii AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com or +1 555 10'
                      || doc_id % 100 || ' at 10.0.' || doc_id % 256 || '.7' AS text
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text,
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
               CAST(len(regexp_extract_all(
                 regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                 '\+?[0-9][0-9 ()-]{6,}[0-9]')) AS BIGINT) AS n_phone,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                 '\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g')) AS scrub_md5
        FROM pii ORDER BY doc_id""")),

    // Gopher/C4 quality flags (ops/Corpus.qualityFlags): alpha-word
    // ratio, mean word length, bullet/ellipsis line ratios, boilerplate
    // markers, and the keep conjunction at the published thresholds —
    // all zero-exchange expressions over the scan. Structure is injected
    // deterministically (the fixture is single-line prose) so every flag
    // actually varies; the oracle rebuilds the identical text.
    Q("q194_quality_flags",
      (s, dir) => {
        val structured = t(s, dir, "documents").select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(col("text"), lit("\n- bullet one\n- bullet two...\nlorem ipsum {")))
            .when(pmod(col("doc_id"), lit(3)) === 1,
              concat(col("text"), lit("\nplain closing line...")))
            .otherwise(col("text")).as("text"))
        val flags = graft.ops.Corpus.qualityFlags(structured, "doc_id", "text")
        Frame(flags.select(col("doc_id"),
          round(col("alpha_word_ratio"), 6).as("alpha_word_ratio"),
          round(col("mean_word_len"), 6).as("mean_word_len"),
          round(col("bullet_line_ratio"), 6).as("bullet_line_ratio"),
          round(col("ellipsis_line_ratio"), 6).as("ellipsis_line_ratio"),
          col("has_lorem"), col("has_brace"), col("keep")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some("""
        WITH structured AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || '- bullet one'
                        || chr(10) || '- bullet two...' || chr(10) || 'lorem ipsum {'
                      WHEN doc_id % 3 = 1 THEN text || chr(10) || 'plain closing line...'
                      ELSE text END AS text
          FROM documents),
        f AS (
          SELECT doc_id,
                 len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                   / greatest(len(w), 1) AS alpha_word_ratio,
                 coalesce(list_sum(list_transform(w, x -> strlen(x))), 0)
                   / greatest(len(w), 1) AS mean_word_len,
                 len(list_filter(l, x -> regexp_matches(x, '^\s*[-*•]')))
                   / greatest(len(l), 1) AS bullet_line_ratio,
                 len(list_filter(l, x -> regexp_matches(x, '\.\.\.\s*$')))
                   / greatest(len(l), 1) AS ellipsis_line_ratio,
                 contains(lower(text), 'lorem ipsum') AS has_lorem,
                 contains(text, '{') AS has_brace
          FROM (SELECT doc_id, text,
                       regexp_extract_all(trim(text), '\S+') AS w,
                       string_split(text, chr(10)) AS l
                FROM structured))
        SELECT doc_id,
               round(alpha_word_ratio, 6) AS alpha_word_ratio,
               round(mean_word_len, 6) AS mean_word_len,
               round(bullet_line_ratio, 6) AS bullet_line_ratio,
               round(ellipsis_line_ratio, 6) AS ellipsis_line_ratio,
               has_lorem, has_brace,
               (alpha_word_ratio >= 0.8 AND mean_word_len BETWEEN 3.0 AND 10.0
                AND bullet_line_ratio <= 0.9 AND ellipsis_line_ratio <= 0.3
                AND NOT has_lorem AND NOT has_brace) AS keep
        FROM f ORDER BY doc_id""")),

    // Temperature-flattened domain mixture sampling (XLM-R/mT5/GPT-3
    // α-sampling, α=0.5): one count shuffle, a two-window rate over the
    // |domains|-row aggregate, broadcast join + md5-threshold filter.
    // Both sides spell the identical rate arithmetic (sqrt via pow is
    // correctly rounded, so the only cross-engine drift is summation
    // order over a handful of domains — a ~1e-15 boundary-flip risk per
    // row, the same float-compare exposure the sampler family already
    // carries). The checked aggregate is per-domain kept count + kept
    // chars: any rate or hash drift moves both.
    Q("q225_temperature_mixture",
      (s, dir) => Frame(
        Corpus.temperatureMixture(t(s, dir, "documents"), "source", "doc_id", 0.5, "mix9")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept")))
        .sortValues(Seq(SortKey.asc("source"))).df,
      Some("""
        WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
                   FROM documents WHERE source IS NOT NULL GROUP BY source),
        w AS (SELECT source, n, pow(n / sum(n) OVER (), 0.5) AS w FROM c),
        q AS (SELECT source, n, w / sum(w) OVER () AS q FROM w),
        r AS (SELECT source, least(1.0, q / n * min(n / q) OVER ()) AS rate FROM q)
        SELECT d.source, count(*) AS n_kept, CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
        FROM documents d JOIN r USING (source)
        WHERE CAST(('0x' || substr(md5('mix9' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
              < rate * 4294967296.0
        GROUP BY d.source ORDER BY d.source""")),

    // Sliding-window chunking (context-window prep: 16-word chunks,
    // stride 8 = 8-word overlap). Map-only explode — zero exchanges
    // before the digest groupBy. The per-doc digest md5's the ordered
    // chunk concatenation, so a drift in any chunk's text, count, or
    // order flips the row.
    Q("q226_doc_chunking",
      (s, dir) => {
        val ch = Corpus.chunkDocuments(t(s, dir, "documents"), "doc_id", "text", 16, 8)
        Frame(ch.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(col("n_tokens")).cast("long").as("tok_sum"),
            md5(array_join(
              transform(
                array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
                x => x.getField("chunk_text")),
              "|")).as("digest")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS l FROM documents),
        chunks AS (
          SELECT doc_id, ci AS chunk_id,
                 array_to_string(list_slice(l, ci*8 + 1, least(ci*8 + 16, len(l))), ' ')
                   AS chunk_text,
                 least(ci*8 + 16, len(l)) - ci*8 AS n_tok
          FROM (SELECT doc_id, l,
                       unnest(range(0, CAST((len(l) + 7) // 8 AS INT))) AS ci
                FROM toks))
        SELECT doc_id, count(*) AS n_chunks, CAST(sum(n_tok) AS BIGINT) AS tok_sum,
               md5(string_agg(chunk_text, '|' ORDER BY chunk_id)) AS digest
        FROM chunks GROUP BY doc_id ORDER BY doc_id""")),

    // CCNet-style LM perplexity scoring (Wenzek et al. 2020): an add-k
    // bigram model self-trained on the corpus scores each doc's
    // per-token perplexity. The oracle replays the identical counts,
    // smoothing and log-sum in DuckDB (k=0.1; unseen-history rows fall
    // to the uniform 1/V). Per-doc ln-sum order is engine-dependent but
    // ~1e-13 relative — round(4) absorbs it, same discipline as the
    // corr-matrix family. Output keyed small for a stable hash: the
    // per-lang mean of per-doc ppl plus counts.
    Q("q236_lm_perplexity",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val scored = Corpus.perplexity(docs, docs, "doc_id", "text", k = 0.1)
        docs.join(scored, "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bigrams")).cast("long").as("bi_sum"),
            round(avg(round(col("ppl"), 4)), 4).as("mean_ppl"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, lang, regexp_extract_all(trim(lower(text)), '\S+') AS t
          FROM documents),
        bi AS (
          SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
          FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
          WHERE len(t) >= 2),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        v AS (SELECT count(DISTINCT w)::DOUBLE AS v
              FROM (SELECT unnest(t) AS w FROM tok)),
        p AS (
          SELECT b.doc_id,
                 CASE WHEN c1.c1 IS NOT NULL
                      THEN (coalesce(c12.c12, 0)::DOUBLE + 0.1) / (c1.c1::DOUBLE + 0.1 * v.v)
                      ELSE 1.0 / v.v END AS p
          FROM bi b
          LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
          LEFT JOIN c1 ON b.w1 = c1.w1
          CROSS JOIN v),
        scored AS (
          SELECT doc_id, count(*) AS n_bigrams,
                 exp(-sum(ln(p)) / count(*)) AS ppl
          FROM p GROUP BY doc_id)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_bigrams) AS BIGINT) AS bi_sum,
               round(avg(round(ppl, 4)), 4) AS mean_ppl
        FROM documents JOIN scored USING (doc_id)
        GROUP BY lang ORDER BY lang""")),

    // CCNet's NEXT stage after q236's scoring: cut each language's
    // perplexity distribution into head/middle/tail terciles and label
    // every document (Wenzek et al. 2020 §4.3 — the split CCNet uses to
    // keep the best thirds per language). Boundaries come from the
    // quantized-histogram quantile (q264's construction, per-lang), so
    // the cut values are exact-integer rank math over a span-bounded
    // histogram and every label is bit-identical cross-engine — the
    // whole composition (LM train → score → cut → label → report) stays
    // hash-oracle-able. Exchanges: q236's scoring joins + one bounded
    // histogram aggregate + a broadcast of the |langs|×2 cut table.
    Q("q267_ccnet_ppl_buckets",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // mean over EXACT integer 10^-4 units, one double division at the
        // end — round(avg(double),4) flipped a half-ulp boundary between
        // this plan's partition order and DuckDB's (the q248 lesson);
        // r_ppl is already 4-decimal, so the quantization is lossless
        Corpus.perplexityBuckets(docs, "doc_id", "text", "lang", k = 0.1)
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(graft.ops.Sketch.quantize(col("r_ppl"), 4)).as("__sq__"))
          .select(col("lang"), col("bucket"), col("n_docs"),
            (col("__sq__").cast("double") /
              (col("n_docs") * 10000L).cast("double")).as("mean_rppl"))
          .orderBy(col("lang"), col("bucket"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, lang, regexp_extract_all(trim(lower(text)), '\S+') AS t
          FROM documents),
        bi AS (
          SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
          FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
          WHERE len(t) >= 2),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        v AS (SELECT count(DISTINCT w)::DOUBLE AS v
              FROM (SELECT unnest(t) AS w FROM tok)),
        p AS (
          SELECT b.doc_id,
                 CASE WHEN c1.c1 IS NOT NULL
                      THEN (coalesce(c12.c12, 0)::DOUBLE + 0.1) / (c1.c1::DOUBLE + 0.1 * v.v)
                      ELSE 1.0 / v.v END AS p
          FROM bi b
          LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
          LEFT JOIN c1 ON b.w1 = c1.w1
          CROSS JOIN v),
        scored AS (
          SELECT d.doc_id, d.lang,
                 round(exp(-sum(ln(p.p)) / count(*)), 4) AS r_ppl
          FROM p JOIN documents d USING (doc_id)
          GROUP BY d.doc_id, d.lang),
        hist AS (
          SELECT lang, CAST(floor(r_ppl * 10000 + 0.5) AS BIGINT) AS qv,
                 count(*) AS cnt
          FROM scored GROUP BY 1, 2),
        cum AS (
          SELECT lang, qv, sum(cnt) OVER (PARTITION BY lang ORDER BY qv) AS cum,
                 sum(cnt) OVER (PARTITION BY lang) AS n
          FROM hist),
        qs AS (SELECT * FROM (VALUES (1), (2)) AS q(num)),
        picks AS (
          SELECT lang, num,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % 3)) // 3 + 1
                     THEN qv END) AS lo,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % 3)) // 3 + 1
                               + (CASE WHEN ((n-1)*num) % 3 > 0 THEN 1 ELSE 0 END)
                     THEN qv END) AS hi,
                 max(((n-1)*num) % 3) AS rem
          FROM cum, qs GROUP BY 1, 2),
        cuts AS (
          SELECT lang,
                 min(CASE WHEN num = 1
                     THEN CAST((3 - rem) * lo + rem * hi AS DOUBLE) / 30000 END) AS b1,
                 max(CASE WHEN num = 2
                     THEN CAST((3 - rem) * lo + rem * hi AS DOUBLE) / 30000 END) AS b2
          FROM picks GROUP BY lang),
        labeled AS (
          SELECT s.doc_id, s.lang, s.r_ppl,
                 CASE WHEN s.r_ppl <= c.b1 THEN 'head'
                      WHEN s.r_ppl <= c.b2 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM scored s JOIN cuts c USING (lang))
        SELECT lang, bucket, count(*) AS n_docs,
               CAST(sum(CAST(floor(r_ppl * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / CAST(count(*) * 10000 AS BIGINT) AS mean_rppl
        FROM labeled GROUP BY 1, 2 ORDER BY 1, 2""")),

    // the group-relative frequent tail over real text: tokens making up
    // >= 1% of EACH LANGUAGE's token stream (stopword/template-word
    // discovery — the fingerprint CCNet-style pipelines inspect per
    // language). ops/Sketch.heavyHittersByGroup: per-partition per-group
    // Misra-Gries candidates (pigeonhole-complete within each group),
    // broadcast verify, exact counts — no token-cardinality shuffle. The
    // oracle counts every token exactly; hash equality proves per-group
    // candidate recall.
    Q("q268_groupby_heavy_hitters",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("lang"),
          explode(Corpus.wsTokensLower(col("text"))).as("token"))
        graft.api.Frame(toks).groupby("lang").heavyHitters("token", 0.01).df
      },
      Some("""
        WITH tok AS (
          SELECT lang, unnest(regexp_extract_all(trim(lower(text)), '\S+')) AS token
          FROM documents),
        n AS (SELECT lang, count(*) AS n FROM tok GROUP BY 1)
        SELECT tok.lang, token, count(*) AS cnt
        FROM tok JOIN n ON tok.lang = n.lang
        GROUP BY tok.lang, token, n.n
        HAVING CAST(count(*) AS HUGEINT) * 1000000 >= CAST(n.n AS HUGEINT) * 10000
        ORDER BY tok.lang, cnt DESC, token""")),

    // the sketch-family capstone (the q249 idea applied to corpus
    // ACCOUNTING): one per-language budget report composing exact token
    // totals, KMV vocabulary NDV, token-WEIGHTED doc-length percentiles
    // (inverted cdf), and the ≥1%-frequency token count — every piece a
    // bounded-state aggregate, the whole report one row per language and
    // hash-exact end to end. This is the planning table a 100 TB corpus
    // run starts from (how many tokens per domain, how big a vocab, how
    // long the token-mass-weighted documents, how template-heavy).
    Q("q273_corpus_budget_report",
      (s, dir) => {
        import graft.ops.Sketch
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("lang"),
          explode(Corpus.wsTokensLower(col("text"))).as("token"))
        val totals = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_tokens"))
        val vocab = Sketch.ndvByGroup(toks, Seq("lang"), "token", 64)
          .select(col("lang"), col("sketch_size"), col("ndv_est").as("vocab_est"))
        val docTok = docs.select(col("lang"), col("n_chars"),
          size(Corpus.wsTokensLower(col("text"))).as("n_tok"))
        val wq = Sketch.weightedQuantileQuantizedBy(docTok, Seq("lang"),
            "n_chars", "n_tok", Seq((500000L, 1000000L), (900000L, 1000000L)), 0)
          .groupBy(col("lang"))
          .agg(min(when(col("q_num") === 500000L, col("value"))).as("chars_p50_tokwt"),
            min(when(col("q_num") === 900000L, col("value"))).as("chars_p90_tokwt"))
        val hh = Sketch.heavyHittersByGroup(toks, Seq("lang"), "token", 1, 100)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_common"))
        totals.join(vocab, Seq("lang")).join(wq, Seq("lang"))
          .join(hh, Seq("lang"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH toks AS (
          SELECT lang, unnest(regexp_extract_all(trim(lower(text)), '\S+')) AS token
          FROM documents),
        tot AS (SELECT lang, count(*) AS n_tokens FROM toks GROUP BY 1),
        h AS (SELECT lang,
                     CAST(('0x' || substr(md5(token), 1, 15)) AS UBIGINT) AS hv
              FROM toks),
        dd AS (SELECT DISTINCT lang, hv FROM h),
        rr AS (SELECT lang, hv,
                      row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
               FROM dd),
        vocab AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS sketch_size,
                 CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                      ELSE floor((63.0 * 1152921504606846976.0
                                  / max(CASE WHEN rn = 64 THEN hv END)) * 10) / 10
                 END AS vocab_est
          FROM rr WHERE rn <= 64 GROUP BY 1),
        dt AS (
          SELECT lang, n_chars,
                 len(regexp_extract_all(trim(lower(text)), '\S+')) AS w
          FROM documents),
        hist AS (
          SELECT lang, CAST(floor(n_chars * 1 + 0.5) AS BIGINT) AS qv,
                 sum(CAST(w AS BIGINT)) AS w
          FROM dt
          WHERE n_chars IS NOT NULL AND w IS NOT NULL AND CAST(w AS BIGINT) > 0
          GROUP BY 1, 2),
        cumw AS (
          SELECT lang, qv, sum(w) OVER (PARTITION BY lang ORDER BY qv) AS cum,
                 sum(w) OVER (PARTITION BY lang) AS tw
          FROM hist),
        wq AS (
          SELECT lang,
                 CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 1000000
                                    >= CAST(tw AS HUGEINT) * 500000
                          THEN qv END) AS DOUBLE) AS chars_p50_tokwt,
                 CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 1000000
                                    >= CAST(tw AS HUGEINT) * 900000
                          THEN qv END) AS DOUBLE) AS chars_p90_tokwt
          FROM cumw GROUP BY 1),
        hh AS (
          SELECT lang, count(*) AS n_common FROM (
            SELECT t.lang, t.token
            FROM toks t JOIN tot n ON t.lang = n.lang
            GROUP BY t.lang, t.token, n.n_tokens
            HAVING CAST(count(*) AS HUGEINT) * 100 >= CAST(n.n_tokens AS HUGEINT))
          GROUP BY 1)
        SELECT tot.lang, tot.n_tokens, vocab.sketch_size, vocab.vocab_est,
               wq.chars_p50_tokwt, wq.chars_p90_tokwt, hh.n_common
        FROM tot
        JOIN vocab USING (lang) JOIN wq USING (lang) JOIN hh USING (lang)
        ORDER BY tot.lang""")),

    // Bloom-filter decontamination (the q181 semantics on the scale path
    // for benchmark sets too large to broadcast as a hash relation):
    // distributed bloom build over the gram set → map-side prune of the
    // corpus stream through the broadcast bitmap → exact SHUFFLE-join
    // verify of the sliver of survivors. Bit-identical to q181 by the
    // Bloom no-false-negative contract, so the oracle is q181's.
    Q("q240_decontaminate_bloom",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Frame(Corpus.decontaminateBloom(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", n = 3, fpp = 0.01)
          .select(col("doc_id"), col("n_hits"),
            col("n_grams").cast("long").as("n_grams"), col("hit_frac")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l,1) AS ord
          FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\S+') AS l FROM documents)
        ),
        grams AS (
          SELECT doc_id,
                 array_to_string(list(tok) OVER (PARTITION BY doc_id ORDER BY ord
                   ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), ' ') AS g,
                 count(*) OVER (PARTITION BY doc_id ORDER BY ord
                   ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS wn
          FROM toks
        ),
        dg AS (SELECT DISTINCT doc_id, g FROM grams WHERE wn = 3),
        bench AS (SELECT DISTINCT g FROM dg WHERE doc_id % 97 = 0),
        corp AS (SELECT doc_id, g FROM dg WHERE doc_id % 97 <> 0),
        tot AS (SELECT doc_id, count(*) AS n_grams FROM corp GROUP BY 1)
        SELECT c.doc_id, count(*) AS n_hits, any_value(t.n_grams) AS n_grams,
               round(count(*) / CAST(any_value(t.n_grams) AS DOUBLE), 6) AS hit_frac
        FROM corp c JOIN bench b USING (g) JOIN tot t ON c.doc_id = t.doc_id
        GROUP BY c.doc_id ORDER BY c.doc_id""")),

    // The quantity every BPE training round argmaxes: adjacent symbol
    // pair counts weighted by word frequency, over the round-0 (single
    // character) symbolization of the distinct-word table. Top 25 with
    // the training loop's exact tiebreak (count desc, pair asc) — the
    // full iterative train is pinned in BpeSpec (a loop is not one SQL).
    Q("q241_bpe_pair_counts",
      (s, dir) => graft.ops.Bpe.pairCounts(
          graft.ops.Bpe.wordFreqTable(t(s, dir, "documents"), "text"))
        .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
        .limit(25)
        .orderBy(col("left").asc, col("right").asc),
      Some("""
        WITH words AS (
          SELECT w, count(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(trim(text)), '\S+')) AS w
            FROM documents) GROUP BY w),
        chars AS (
          SELECT w, freq, regexp_extract_all(w, '.') AS cs FROM words),
        pairs AS (
          SELECT cs[i.i] AS "left", cs[i.i + 1] AS "right", freq
          FROM chars, LATERAL (SELECT unnest(range(1, len(cs))) AS i) i
          WHERE len(cs) >= 2)
        SELECT "left", "right", pair_count FROM (
          SELECT "left", "right", CAST(sum(freq) AS BIGINT) AS pair_count
          FROM pairs GROUP BY 1, 2
          ORDER BY pair_count DESC, "left", "right" LIMIT 25)
        ORDER BY "left", "right" """)),

    // DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    // bag-of-buckets distributions (add-1 smoothing, B=1024) fit on the
    // full corpus vs the English slice; per-doc logw = Σ n_b·(log p_t −
    // log p_r). Feature stream is map-only; the 1024-row log-ratio table
    // broadcasts; weights are one (id,bucket) + one id exchange.
    Q("q244_dsir_weights",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dsir.importanceWeights(docs, docs.filter(col("lang") === "en"),
            "doc_id", "text", 1024)
          .select(col("doc_id"), col("n_feats"), roundz(col("logw"), 6).as("logw"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, regexp_extract_all(trim(lower(text)), '\S+') AS t
          FROM documents),
        feat AS (
          SELECT doc_id, unnest(t) AS f FROM tok
          UNION ALL
          SELECT doc_id, t[i.i] || ' ' || t[i.i + 1] AS f
          FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
          WHERE len(t) >= 2),
        fb AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(f), 1, 8)) AS UBIGINT) % 1024 AS bucket
          FROM feat),
        tcnt AS (SELECT bucket, count(*) AS c FROM fb
                 JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
        rcnt AS (SELECT bucket, count(*) AS c FROM fb GROUP BY 1),
        ttot AS (SELECT count(*)::DOUBLE AS n FROM fb
                 JOIN documents USING (doc_id) WHERE lang = 'en'),
        rtot AS (SELECT count(*)::DOUBLE AS n FROM fb),
        ratio AS (
          SELECT b.bucket,
                 (ln(coalesce(t.c, 0) + 1.0) - ln(tt.n + 1024.0))
               - (ln(coalesce(r.c, 0) + 1.0) - ln(rt.n + 1024.0)) AS lr
          FROM (SELECT unnest(range(0, 1024)) AS bucket) b
          LEFT JOIN tcnt t USING (bucket) LEFT JOIN rcnt r USING (bucket)
          CROSS JOIN ttot tt CROSS JOIN rtot rt),
        per AS (SELECT doc_id, bucket, count(*) AS n FROM fb GROUP BY 1, 2),
        w AS (
          SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
                 sum(n * lr) AS logw
          FROM per JOIN ratio USING (bucket) GROUP BY 1)
        SELECT d.doc_id, coalesce(w.n_feats, 0) AS n_feats,
               round(coalesce(w.logw, 0.0), 6) + 0.0 AS logw
        FROM documents d LEFT JOIN w USING (doc_id)
        ORDER BY doc_id""")),

    // DSIR Gumbel-top-k resampling: k=100 docs maximizing logw + g where
    // g = −ln(−ln(u)), u from md5('dsir9' ‖ doc_id) — sampling without
    // replacement ∝ w, deterministic in both engines. TakeOrdered top-k,
    // no global sort.
    Q("q245_dsir_resample",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dsir.resampleTopK(docs, docs.filter(col("lang") === "en"),
            "doc_id", "text", 1024, 100, "dsir9")
          .select(col("doc_id"), col("n_feats"),
            roundz(col("logw"), 6).as("logw"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, regexp_extract_all(trim(lower(text)), '\S+') AS t
          FROM documents),
        feat AS (
          SELECT doc_id, unnest(t) AS f FROM tok
          UNION ALL
          SELECT doc_id, t[i.i] || ' ' || t[i.i + 1] AS f
          FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
          WHERE len(t) >= 2),
        fb AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(f), 1, 8)) AS UBIGINT) % 1024 AS bucket
          FROM feat),
        tcnt AS (SELECT bucket, count(*) AS c FROM fb
                 JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
        rcnt AS (SELECT bucket, count(*) AS c FROM fb GROUP BY 1),
        ttot AS (SELECT count(*)::DOUBLE AS n FROM fb
                 JOIN documents USING (doc_id) WHERE lang = 'en'),
        rtot AS (SELECT count(*)::DOUBLE AS n FROM fb),
        ratio AS (
          SELECT b.bucket,
                 (ln(coalesce(t.c, 0) + 1.0) - ln(tt.n + 1024.0))
               - (ln(coalesce(r.c, 0) + 1.0) - ln(rt.n + 1024.0)) AS lr
          FROM (SELECT unnest(range(0, 1024)) AS bucket) b
          LEFT JOIN tcnt t USING (bucket) LEFT JOIN rcnt r USING (bucket)
          CROSS JOIN ttot tt CROSS JOIN rtot rt),
        per AS (SELECT doc_id, bucket, count(*) AS n FROM fb GROUP BY 1, 2),
        w AS (
          SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
                 sum(n * lr) AS logw
          FROM per JOIN ratio USING (bucket) GROUP BY 1),
        scored AS (
          SELECT d.doc_id, coalesce(w.n_feats, 0) AS n_feats,
                 coalesce(w.logw, 0.0) AS logw_raw,
                 round(coalesce(w.logw, 0.0)
                   + -ln(-ln((CAST(('0x' || substr(md5('dsir9' ||
                       CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0)
                     / 4294967297.0)), 6) + 0.0 AS score
          FROM documents d LEFT JOIN w USING (doc_id))
        SELECT doc_id, n_feats, round(logw_raw, 6) + 0.0 AS logw, score
        FROM scored ORDER BY score DESC, doc_id LIMIT 100""")),

    // Exact duplicated-span removal (Lee et al. 2022 ExactSubstr,
    // token-aligned): sliding 8-gram 60-bit fingerprints, keep-first /
    // remove-later at arbitrary offsets, covered intervals merged by a
    // per-doc running-max window. Gram text never crosses an exchange —
    // occurrence rows are (id, start, hash60). The md5 digest pins the
    // full reassembled text of every doc.
    Q("q246_exact_substr_dedup",
      (s, dir) => Frame(Corpus.exactSubstrDedup(
          t(s, dir, "documents"), "doc_id", "text", spanTokens = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("text_dedup")).as("digest")))
        .sortValues(Seq(SortKey.asc("doc_id"))).df,
      Some("""
        WITH tok AS (
          SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id, i.i - 1 AS start,
                 CAST(('0x' || substr(md5(
                   array_to_string(t[i.i : i.i + 7], ' ')), 1, 15)) AS UBIGINT) AS h
          FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) i
          WHERE len(t) >= 8),
        dup AS (
          SELECT doc_id, start FROM (
            SELECT doc_id, start,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
            FROM grams) WHERE rn > 1),
        toks AS (
          SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS pos
          FROM tok),
        m AS (
          SELECT k.doc_id, k.pos, k.tok,
                 max(CASE WHEN d.start IS NOT NULL THEN d.start + 8 END)
                   OVER (PARTITION BY k.doc_id ORDER BY k.pos
                         ROWS UNBOUNDED PRECEDING) AS cover_end
          FROM toks k
          LEFT JOIN dup d ON k.doc_id = d.doc_id AND k.pos = d.start),
        reb AS (
          SELECT doc_id, count(*) AS n_tokens,
                 CAST(sum(CASE WHEN cover_end IS NOT NULL AND pos < cover_end
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                 string_agg(CASE WHEN cover_end IS NULL OR pos >= cover_end
                                 THEN tok END, ' ' ORDER BY pos) AS text_dedup
          FROM m GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(reb.n_tokens, 0) AS n_tokens,
               coalesce(reb.n_removed, 0) AS n_removed,
               md5(coalesce(reb.text_dedup, '')) AS digest
        FROM documents d LEFT JOIN reb USING (doc_id)
        ORDER BY doc_id""")),

    // FLAGSHIP COMPOSITION: the whole training-data prep pipeline in one
    // declarative program — Gopher/C4 quality keep → exact dedup
    // keep-first → 3-gram benchmark decontamination (doc_id%97==0 is the
    // held-out slice) → DSIR Gumbel-top-200 selection toward the English
    // slice → greedy 1000-token context packing. Catalyst optimizes the
    // whole selection DAG as one plan (column pruning reaches the scan);
    // the only materialization boundary is packChunks' eager checkpoint
    // of the SELECTED docs' (id, token-count) pairs — k rows, not the
    // corpus. The q3 survivor set feeds three branches (DSIR raw, DSIR
    // target, final join); identical exchange subtrees dedup via
    // ReuseExchange, and at 100 TB the production move is an explicit
    // q3-level persist — a one-line valve, orthogonal to the semantics
    // pinned here. Every stage reuses the operator its own gate query
    // pins (q194/q101/q181/q245/q183); the oracle chains the same five
    // SQL stages.
    Q("q249_training_pipeline",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keepIds = Corpus.qualityFlags(docs, "doc_id", "text")
          .filter(col("keep")).select("doc_id")
        val q1 = docs.join(keepIds, Seq("doc_id"))
        val q2 = graft.ops.Dedup.exact(q1, "doc_id", "text")
        val corpus = q2.filter(col("doc_id") % 97 =!= 0)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        val hits = Corpus.decontaminate(corpus, bench, "doc_id", "text", n = 3)
          .filter(col("n_hits") > 0).select("doc_id")
        val q3 = corpus.join(hits, Seq("doc_id"), "left_anti")
        val sel = Dsir.resampleTopK(q3, q3.filter(col("lang") === "en"),
          "doc_id", "text", 1024, 200, "pipe9").select("doc_id")
        val q4 = q3.join(sel, Seq("doc_id"))
        Frame(Corpus.packChunks(q4, "doc_id", "text", 1000L))
          .sortValues(Seq(SortKey.asc("chunk_id"))).df
      },
      Some("""
        WITH f AS (
          SELECT doc_id,
                 len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                   / greatest(len(w), 1) AS awr,
                 coalesce(list_sum(list_transform(w, x -> strlen(x))), 0)
                   / greatest(len(w), 1) AS mwl,
                 len(list_filter(l, x -> regexp_matches(x, '^\s*[-*•]')))
                   / greatest(len(l), 1) AS blr,
                 len(list_filter(l, x -> regexp_matches(x, '\.\.\.\s*$')))
                   / greatest(len(l), 1) AS elr,
                 contains(lower(text), 'lorem ipsum') AS hl,
                 contains(text, '{') AS hb
          FROM (SELECT doc_id, text,
                       regexp_extract_all(trim(text), '\S+') AS w,
                       string_split(text, chr(10)) AS l
                FROM documents)),
        q1 AS (
          SELECT d.doc_id, d.text, d.lang FROM documents d JOIN f USING (doc_id)
          WHERE awr >= 0.8 AND mwl BETWEEN 3.0 AND 10.0 AND blr <= 0.9
            AND elr <= 0.3 AND NOT hl AND NOT hb),
        q2 AS (
          SELECT doc_id, text, lang FROM (
            SELECT q1.*, row_number() OVER (
              PARTITION BY md5(trim(regexp_replace(lower(text), '[^\p{L}\p{N}_]+', ' ', 'g')))
              ORDER BY doc_id) AS rn FROM q1) WHERE rn = 1),
        corp AS (SELECT doc_id, text, lang FROM q2 WHERE doc_id % 97 <> 0),
        bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        ctoks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord
          FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\S+') AS l FROM corp)),
        cgrams AS (
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id,
                   array_to_string(list(tok) OVER (PARTITION BY doc_id ORDER BY ord
                     ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), ' ') AS g,
                   count(*) OVER (PARTITION BY doc_id ORDER BY ord
                     ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS wn
            FROM ctoks) WHERE wn = 3),
        btoks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord
          FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\S+') AS l FROM bench)),
        bgrams AS (
          SELECT DISTINCT g FROM (
            SELECT doc_id,
                   array_to_string(list(tok) OVER (PARTITION BY doc_id ORDER BY ord
                     ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), ' ') AS g,
                   count(*) OVER (PARTITION BY doc_id ORDER BY ord
                     ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS wn
            FROM btoks) WHERE wn = 3),
        hits AS (SELECT DISTINCT doc_id FROM cgrams JOIN bgrams USING (g)),
        q3 AS (SELECT * FROM corp
               WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
        tok AS (SELECT doc_id, regexp_extract_all(trim(lower(text)), '\S+') AS t FROM q3),
        feat AS (
          SELECT doc_id, unnest(t) AS ff FROM tok
          UNION ALL
          SELECT doc_id, t[i.i] || ' ' || t[i.i + 1] AS ff
          FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
          WHERE len(t) >= 2),
        fb AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(ff), 1, 8)) AS UBIGINT) % 1024 AS bucket
          FROM feat),
        tcnt AS (SELECT bucket, count(*) AS c FROM fb
                 JOIN q3 USING (doc_id) WHERE lang = 'en' GROUP BY 1),
        rcnt AS (SELECT bucket, count(*) AS c FROM fb GROUP BY 1),
        ttot AS (SELECT count(*)::DOUBLE AS n FROM fb
                 JOIN q3 USING (doc_id) WHERE lang = 'en'),
        rtot AS (SELECT count(*)::DOUBLE AS n FROM fb),
        ratio AS (
          SELECT b.bucket,
                 (ln(coalesce(tc.c, 0) + 1.0) - ln(tt.n + 1024.0))
               - (ln(coalesce(rc.c, 0) + 1.0) - ln(rt.n + 1024.0)) AS lr
          FROM (SELECT unnest(range(0, 1024)) AS bucket) b
          LEFT JOIN tcnt tc USING (bucket) LEFT JOIN rcnt rc USING (bucket)
          CROSS JOIN ttot tt CROSS JOIN rtot rt),
        per AS (SELECT doc_id, bucket, count(*) AS n FROM fb GROUP BY 1, 2),
        w AS (SELECT doc_id, sum(n * lr) AS logw
              FROM per JOIN ratio USING (bucket) GROUP BY 1),
        sel AS (
          SELECT doc_id FROM (
            SELECT d.doc_id,
                   round(coalesce(w.logw, 0.0)
                     + -ln(-ln((CAST(('0x' || substr(md5('pipe9' ||
                         CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0)
                       / 4294967297.0)), 6) AS score
            FROM q3 d LEFT JOIN w USING (doc_id))
          ORDER BY score DESC, doc_id LIMIT 200),
        q4 AS (SELECT q3.doc_id, q3.text FROM q3 JOIN sel USING (doc_id)),
        ptok AS (SELECT doc_id, len(regexp_extract_all(trim(text), '\S+')) AS tk FROM q4),
        run AS (SELECT doc_id, tk,
                       sum(tk) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM ptok)
        SELECT CAST((cum - tk) // 1000 AS BIGINT) AS chunk_id,
               count(*) AS n_docs,
               CAST(sum(tk) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM run GROUP BY 1 ORDER BY 1""")),

    // Corpus data card: per-(source, lang) release stats — doc/token
    // counts, mean + exact median length, quality-keep rate, exact-dup
    // rate. One codegen'd pass over the text, one hash aggregate on the
    // catalog-sized key.
    Q("q251_corpus_report",
      (s, dir) => Frame(Corpus.corpusReport(
          t(s, dir, "documents"), "source", "lang", "doc_id", "text"))
        .sortValues(Seq(SortKey.asc("source"), SortKey.asc("lang"))).df,
      Some("""
        WITH f AS (
          SELECT doc_id,
                 len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                   / greatest(len(w), 1) AS awr,
                 coalesce(list_sum(list_transform(w, x -> strlen(x))), 0)
                   / greatest(len(w), 1) AS mwl,
                 len(list_filter(l, x -> regexp_matches(x, '^\s*[-*•]')))
                   / greatest(len(l), 1) AS blr,
                 len(list_filter(l, x -> regexp_matches(x, '\.\.\.\s*$')))
                   / greatest(len(l), 1) AS elr,
                 contains(lower(text), 'lorem ipsum') AS hl,
                 contains(text, '{') AS hb
          FROM (SELECT doc_id, text,
                       regexp_extract_all(trim(text), '\S+') AS w,
                       string_split(text, chr(10)) AS l
                FROM documents)),
        k AS (
          SELECT doc_id,
                 (awr >= 0.8 AND mwl BETWEEN 3.0 AND 10.0 AND blr <= 0.9
                  AND elr <= 0.3 AND NOT hl AND NOT hb) AS keep
          FROM f),
        b AS (
          SELECT source, lang, doc_id,
                 len(regexp_extract_all(trim(text), '\S+')) AS tok,
                 md5(trim(regexp_replace(lower(text), '[^\p{L}\p{N}_]+', ' ', 'g'))) AS fp
          FROM documents)
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS n_tokens,
               round(avg(tok), 4) AS mean_tokens,
               quantile_cont(tok, 0.5) AS median_tokens,
               round(avg(CASE WHEN keep THEN 1.0 ELSE 0.0 END), 6) AS keep_rate,
               round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 6) AS dup_rate
        FROM b JOIN k USING (doc_id)
        GROUP BY 1, 2 ORDER BY source, lang""")),

    // The 100 TB face of q251: the same per-(source, lang) data card
    // composed ENTIRELY from bounded-state sketches — exact counts
    // (catalog-sized key), KMV-64 NDV of content fingerprints (≤ 64
    // longs per group cross any exchange, vs q251's count(DISTINCT fp)
    // which shuffles every distinct fingerprint), and median/p90 doc
    // length from the quantized-histogram quantile sketch (span-bounded
    // state). Three sketch aggregates joined on the catalog key: corpus
    // profiling whose exchange bytes are INDEPENDENT of corpus size —
    // the worked example of the sketch family snapping together.
    // dup_rate_est is derived from the NDV estimate (clamped at 0; the
    // KMV estimator can overshoot n_docs on small groups) — both engines
    // replay the identical closed-form arithmetic, so the card is
    // hash-exact despite being an "approximate" summary.
    Q("q276_sketch_data_card",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keys = Seq("source", "lang")
        val counts = docs.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n_docs"))
        val ndv = Sketch.ndvByGroup(
          docs.withColumn("__fp", graft.functions.Text.fingerprint(col("text"))),
          keys, "__fp", 64)
          .select(col("source"), col("lang"), col("ndv_est"))
        val qWide = Sketch.quantileQuantizedBy(docs, keys, "n_chars",
          Seq((1L, 2L), (9L, 10L)), 0)
          .groupBy(keys.map(col): _*)
          .agg(
            // integer-rational pivot: exact for ANY q, where a double
            // q === 0.5 equality is exact only for dyadics
            max(when(col("q_num") === 1L && col("q_den") === 2L,
              col("value"))).as("chars_p50"),
            max(when(col("q_num") === 9L && col("q_den") === 10L,
              col("value"))).as("chars_p90"))
        Frame(counts
          .join(ndv, keys)
          .join(qWide, keys)
          .select(col("source"), col("lang"), col("n_docs"),
            col("ndv_est").as("ndv_fp"),
            roundz(greatest(lit(0.0),
              lit(1.0) - col("ndv_est") / col("n_docs")), 4).as("dup_rate_est"),
            col("chars_p50"), col("chars_p90")))
          .sortValues(Seq(SortKey.asc("source"), SortKey.asc("lang"))).df
      },
      Some("""
        WITH fp AS (
          SELECT source, lang,
                 md5(trim(regexp_replace(lower(text), '[^\p{L}\p{N}_]+', ' ', 'g'))) AS fp
          FROM documents),
        cnt AS (SELECT source, lang, count(*) AS n_docs FROM documents GROUP BY 1, 2),
        h AS (SELECT source, lang,
                     CAST(('0x' || substr(md5(fp), 1, 15)) AS UBIGINT) AS hv
              FROM fp WHERE fp IS NOT NULL),
        d AS (SELECT DISTINCT source, lang, hv FROM h),
        r AS (SELECT source, lang, hv,
                     row_number() OVER (PARTITION BY source, lang ORDER BY hv) AS rn
              FROM d),
        sk AS (
          SELECT source, lang,
                 CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                      ELSE floor((63.0 * 1152921504606846976.0
                                  / max(CASE WHEN rn = 64 THEN hv END)) * 10) / 10
                 END AS ndv_fp
          FROM r WHERE rn <= 64 GROUP BY 1, 2),
        hist AS (
          SELECT source, lang, CAST(floor(n_chars + 0.5) AS BIGINT) AS qv,
                 count(*) AS cnt
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2, 3),
        cum AS (
          SELECT source, lang, qv,
                 sum(cnt) OVER (PARTITION BY source, lang ORDER BY qv) AS cum,
                 sum(cnt) OVER (PARTITION BY source, lang) AS n
          FROM hist),
        qs AS (SELECT * FROM (VALUES (1, 2), (9, 10)) AS q(num, den)),
        picks AS (
          SELECT source, lang, num, den,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % den)) // den + 1
                     THEN qv END) AS lo,
                 min(CASE WHEN cum >= ((n-1)*num - (((n-1)*num) % den)) // den + 1
                               + (CASE WHEN ((n-1)*num) % den > 0 THEN 1 ELSE 0 END)
                     THEN qv END) AS hi,
                 max(((n-1)*num) % den) AS rem
          FROM cum, qs GROUP BY 1, 2, 3, 4),
        qw AS (
          SELECT source, lang,
                 max(CASE WHEN den = 2
                     THEN CAST((den - rem) * lo + rem * hi AS DOUBLE) / den END) AS chars_p50,
                 max(CASE WHEN den = 10
                     THEN CAST((den - rem) * lo + rem * hi AS DOUBLE) / den END) AS chars_p90
          FROM picks GROUP BY 1, 2)
        SELECT c.source, c.lang, c.n_docs, sk.ndv_fp,
               round(greatest(0.0, 1.0 - sk.ndv_fp / c.n_docs), 4) + 0.0 AS dup_rate_est,
               qw.chars_p50, qw.chars_p90
        FROM cnt c JOIN sk USING (source, lang) JOIN qw USING (source, lang)
        ORDER BY source, lang""")),

    // Trainable quality classifier (the DCLM/FineWeb-Edu model-filter
    // stage): logistic regression over hashed-token features, fit by
    // full-batch GD (dim 256, 30 steps, lr 2.0; weights rounded to 8dp per
    // step so the fit is an exact deterministic function of the corpus),
    // label = "long doc" (n_chars >= 300 — the one label this synthetic
    // corpus makes learnable; length IS a first-order quality feature in
    // real pipelines). Presence features: x = 1 per distinct hashed
    // bucket, so every coordinate shares the bias's curvature scale. The oracle unrolls the identical iterations
    // in SQL (generated below); scores round to 4dp like every float
    // surface here.
    Q("q252_quality_classifier",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val labels = docs.select(col("doc_id"),
          when(col("n_chars") >= 300, 1.0).otherwise(0.0).as("y"))
        val feats = QualityModel.hashedFeatures(docs, "doc_id", "text", dim = 256)
        val w = QualityModel.trainLogReg(feats, labels, "doc_id",
          dim = 256, iters = 30, lr = 2.0)
        Frame(QualityModel.score(docs, w, "doc_id", "text", dim = 256)
          .join(labels, "doc_id")
          .select(col("doc_id"), col("y"), round(col("score"), 4).as("score")))
          .sortValues(Seq(SortKey.asc("doc_id"))).df
      },
      Some(logRegOracleSql(dim = 256, iters = 30, lr = 2.0))),

    // Deterministic seeded shuffle + balanced sharding (the training-data
    // write-out permutation): order by md5(seed:id), round-robin over the
    // permuted sequence into 8 shards — shard sizes differ by ≤ 1 by
    // construction and the layout is a pure function of (seed, corpus).
    // Integer-only output → exact oracle.
    Q("q253_shuffle_shard",
      (s, dir) => Frame(Corpus.shuffleShard(
        t(s, dir, "documents"), "doc_id", seed = "s42", numShards = 8))
        .sortValues(Seq(SortKey.asc("doc_id"))).df,
      Some("""
        WITH p AS (
          SELECT doc_id,
                 row_number() OVER (
                   ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
                   AS pos
          FROM documents)
        SELECT doc_id, pos % 8 AS shard_id, pos // 8 AS pos_in_shard
        FROM p ORDER BY doc_id""")),

    // GPT-style concat-and-split packing: the corpus token stream cut
    // into exact 1000-token sequences, docs splitting across boundaries;
    // output = the (sequence, doc) span table. Integer-only → exact
    // oracle (running sum + per-doc range unnest in DuckDB).
    Q("q255_pack_sequences",
      (s, dir) => Frame(Corpus.packSequences(
        t(s, dir, "documents"), "doc_id", "text", seqLen = 1000L))
        .sortValues(Seq(SortKey.asc("seq_id"), SortKey.asc("doc_id"))).df,
      Some("""
        WITH tok AS (
          SELECT doc_id, len(regexp_extract_all(trim(text), '\S+')) AS n
          FROM documents),
        nz AS (SELECT doc_id, n FROM tok WHERE n > 0),
        run AS (
          SELECT doc_id, n,
                 CAST(sum(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                   AS BIGINT) AS strt
          FROM nz),
        spans AS (
          SELECT doc_id, n, strt,
                 unnest(range(strt // 1000, (strt + n - 1) // 1000 + 1))
                   AS seq_id
          FROM run)
        SELECT seq_id, doc_id,
               greatest(strt - seq_id * 1000, 0) AS start_in_seq,
               least((seq_id + 1) * 1000, strt + n)
                 - greatest(seq_id * 1000, strt) AS n_toks
        FROM spans ORDER BY seq_id, doc_id""")),

    // UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    // water-filling a 30k-token budget across the 5 languages with a
    // 1.5-epoch cap. At sf0.01 the four smaller languages cap out
    // (epochs = 1.5) and `en` absorbs the remainder uncapped — both
    // branches of min(cap, u) are exercised. The closed form (u = the
    // max over prefix fair shares) is two window passes over the 5-row
    // aggregate; the oracle replays it literally.
    Q("q257_unimax_allocation",
      (s, dir) => Frame(Corpus.unimaxAllocation(
        t(s, dir, "documents")
          .withColumn("n_tok", size(Corpus.wsTokens(col("text")))),
        "lang", "n_tok", budget = 30000L, maxEpochs = 1.5)
        .select(col("lang"), col("n_tokens"), col("cap"),
          round(col("alloc"), 6).as("alloc"), round(col("epochs"), 6).as("epochs")))
        .sortValues(Seq(SortKey.asc("lang"))).df,
      Some("""
        WITH nt AS (
          SELECT lang, sum(len(regexp_extract_all(trim(text), '\S+')))::BIGINT AS n_tokens
          FROM documents WHERE lang IS NOT NULL GROUP BY lang),
        c AS (
          SELECT lang, n_tokens, n_tokens * 1.5 AS cap,
                 row_number() OVER (ORDER BY n_tokens * 1.5, lang) AS i,
                 coalesce(sum(n_tokens * 1.5) OVER (ORDER BY n_tokens * 1.5, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
                 count(*) OVER () AS m
          FROM nt),
        u AS (SELECT max((30000 - p) / (m - i + 1)) AS u FROM c)
        SELECT lang, n_tokens, cap, round(least(cap, u), 6) AS alloc,
               round(least(cap, u) / n_tokens, 6) AS epochs
        FROM c CROSS JOIN u ORDER BY lang""")),

    // UniMax sampling: materialize the q257 plan as training rows — every
    // capped language replays one full epoch (epoch 0) plus a
    // deterministic md5-ordered partial half-epoch; `en` (uncapped,
    // epochs ≈ 0.6) contributes a partial epoch only. The partial-epoch
    // running token sum is the hot-key-proof grouped prefix
    // (Cumulative.groupedRunning), not a per-language window.
    Q("q258_unimax_sample",
      (s, dir) => Frame(Corpus.unimaxSample(
        t(s, dir, "documents")
          .withColumn("n_tok", size(Corpus.wsTokens(col("text")))),
        "lang", "doc_id", "n_tok", budget = 30000L, maxEpochs = 1.5,
        salt = "s9")
        .select(col("lang"), col("doc_id"), col("n_tokens"),
          col("epoch").cast("long").as("epoch")))
        .sortValues(Seq(SortKey.asc("lang"), SortKey.asc("doc_id"),
          SortKey.asc("epoch"))).df,
      Some("""
        WITH nt AS (
          SELECT lang, sum(len(regexp_extract_all(trim(text), '\S+')))::BIGINT AS n_tokens
          FROM documents WHERE lang IS NOT NULL GROUP BY lang),
        c AS (
          SELECT lang, n_tokens, n_tokens * 1.5 AS cap,
                 row_number() OVER (ORDER BY n_tokens * 1.5, lang) AS i,
                 coalesce(sum(n_tokens * 1.5) OVER (ORDER BY n_tokens * 1.5, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
                 count(*) OVER () AS m
          FROM nt),
        u AS (SELECT max((30000 - p) / (m - i + 1)) AS u FROM c),
        a AS (SELECT lang, n_tokens AS dn, least(cap, u) AS alloc
              FROM c CROSS JOIN u),
        f AS (SELECT lang, dn, CAST(floor(alloc / dn) AS BIGINT) AS fe,
                     alloc - floor(alloc / dn) * dn AS rem FROM a),
        d AS (SELECT lang, doc_id,
                     len(regexp_extract_all(trim(text), '\S+'))::BIGINT AS n_tokens
              FROM documents WHERE lang IS NOT NULL),
        fullx AS (
          SELECT d.lang, d.doc_id, d.n_tokens, unnest(range(f.fe)) AS epoch
          FROM d JOIN f USING (lang)),
        h AS (
          SELECT d.lang, d.doc_id, d.n_tokens, f.fe, f.rem,
                 md5('s9:' || d.doc_id) AS hk
          FROM d JOIN f USING (lang)),
        p AS (
          SELECT lang, doc_id, n_tokens, fe AS epoch FROM (
            SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY lang
              ORDER BY hk, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
            FROM h) WHERE prev < rem)
        SELECT lang, doc_id, n_tokens, epoch FROM fullx
        UNION ALL SELECT lang, doc_id, n_tokens, epoch FROM p
        ORDER BY lang, doc_id, epoch""")))

  /** The q252 oracle, with the GD recurrence unrolled `iters` times —
    * one (margins, gradient, weights) CTE triple per step, each the
    * literal SQL of the Spark iteration in [[QualityModel.trainLogReg]]. */
  private def logRegOracleSql(dim: Int, iters: Int, lr: Double): String = {
    val steps = (1 to iters).map { k =>
      s"""m$k AS (SELECT f.doc_id, sum(f.x * w.w) AS margin
         |       FROM fx f JOIN w${k - 1} w USING (bucket) GROUP BY f.doc_id),
         |g$k AS (SELECT f.bucket,
         |              sum((1.0 / (1.0 + exp(-m.margin)) - l.y) * f.x)
         |                / any_value(n.n) AS g
         |       FROM fx f JOIN m$k m USING (doc_id) JOIN lab l USING (doc_id)
         |       CROSS JOIN n GROUP BY f.bucket),
         |w$k AS MATERIALIZED (
         |       SELECT w.bucket, round(w.w - $lr * coalesce(g.g, 0.0), 8) AS w
         |       FROM w${k - 1} w LEFT JOIN g$k g USING (bucket))""".stripMargin
    }.mkString(",\n")
    s"""
      WITH tok AS (
        SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y,
               regexp_extract_all(trim(lower(text)), '\\S+') AS t
        FROM documents),
      fdoc AS MATERIALIZED (
        SELECT doc_id, y, unnest(t) AS tok
        FROM tok WHERE len(t) > 0),
      fx0 AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % $dim AS bucket,
               1.0 AS x
        FROM fdoc),
      fx AS MATERIALIZED (
        SELECT doc_id, bucket, x FROM fx0
        UNION ALL
        SELECT DISTINCT doc_id, CAST(-1 AS BIGINT) AS bucket, 1.0 AS x FROM fx0),
      lab AS MATERIALIZED (SELECT doc_id, any_value(y) AS y FROM fdoc GROUP BY doc_id),
      n AS MATERIALIZED (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM fx0),
      w0 AS (SELECT CAST(b AS BIGINT) AS bucket, 0.0 AS w FROM range(-1, $dim) r(b)),
      $steps,
      mfin AS (SELECT f.doc_id, sum(f.x * w.w) AS margin
               FROM fx f JOIN w$iters w USING (bucket) GROUP BY f.doc_id)
      SELECT m.doc_id, l.y, round(1.0 / (1.0 + exp(-m.margin)), 4) AS score
      FROM mfin m JOIN lab l USING (doc_id)
      ORDER BY doc_id"""
  }
}
