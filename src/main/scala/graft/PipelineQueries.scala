package graft

import Queries._
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Decontaminate, Dedup, Multimodal, Similarity, TextAnalysis, TextOps}

/** LLM-training-data pipeline operators over documents/embeddings:
  * dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
  * similarity search (brute-force + IVF), text analysis (lang-id, quality,
  * token counts, fingerprints), multimodal columns. Oracles where the
  * semantics are SQL-expressible; LSH-based ops get rows-only checks plus
  * ScalaTest specs with planted duplicates.
  */
object PipelineQueries {

  // DuckDB token/shingle preamble shared by several oracles.
  /** The shingle preamble with RECURSIVE enabled, for oracles that chain
    * a recursive CTE after it (q148, q160). */
  private[graft] def DUCK_SHINGLES_RECURSIVE: String =
    DUCK_SHINGLES.replace("WITH ", "WITH RECURSIVE ")

  private val DUCK_SHINGLES = """
    WITH tok AS (
      SELECT doc_id, lang, source,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> len(x) > 0) AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, lang, source,
        list_distinct(list_transform(range(1, len(t) - 1),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok WHERE len(t) >= 3
    )"""

  def all: Seq[Q] = Seq(
    // -- exact dedup: representative per text (hash-groupBy; one shuffle)
    dual("q50_dedup_exact", """
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
             min(n_chars) AS n_chars
      FROM documents
      GROUP BY text
      ORDER BY keep_id"""),

    // -- MinHash-LSH near-dup candidates, exact-Jaccard verified.
    //    LSH recall < 1 ⇒ no SQL oracle; spec plants known dups.
    noOracle("q51_dedup_minhash") { (s, d) =>
      Dedup.minhashNearDups(
        Tables.load(s, d, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .orderBy("id_a", "id_b")
    },

    // -- exact n-gram Jaccard pairs within (lang, source) blocking
    dfQ("q52_ngram_jaccard", DUCK_SHINGLES + """
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(len(list_intersect(a.s, b.s))::DOUBLE /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
      FROM sh a
      JOIN sh b ON a.lang = b.lang AND a.source = b.source
               AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.02
      ORDER BY id_a, id_b""") { (s, d) =>
      Dedup.ngramJaccardPairs(
        Tables.load(s, d, "documents"), "doc_id", "text",
        blockCols = Seq("lang", "source"), shingleSize = 3, threshold = 0.02)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // -- SimHash near-dup pairs (Hamming ≤ 3 over 64-bit fingerprints)
    noOracle("q53_dedup_simhash") { (s, d) =>
      Dedup.simhashNearDups(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b")
    },

    // -- embedding cosine near-dup pairs via sign-LSH + exact verify
    noOracle("q54_embed_neardup") { (s, d) =>
      // moderate-similarity regime: 4-bit bands for recall at cos≈0.5
      Dedup.embeddingNearDups(
        Tables.load(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.5, signatureBits = 64, bands = 16)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    },

    // -- brute-force cosine top-k (correctness baseline for ANN)
    dfQ("q55_ann_bruteforce", """
      SELECT b.vec_id AS id,
        round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4) AS cos4
      FROM embeddings a, embeddings b
      WHERE a.vec_id = 0
      ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
      LIMIT 10""") { (s, d) =>
      Similarity.topKForId(
        Tables.load(s, d, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
        .select(col("id"), round(col("cosine"), 4).as("cos4"))
    },

    // -- IVF (bucketed) ANN — approximate scale path; rows-only check,
    //    recall measured in the spec against q55's exact answer
    noOracle("q56_ann_ivf") { (s, d) =>
      val emb = Tables.load(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).collect()
        .head.getSeq[Float](0)
      val ivf = Similarity.buildIvf(emb, "vec_id", "embedding", nlist = 8)
      Similarity.searchIvf(ivf, q, k = 10, nprobe = 3)
        .select(col("id"), round(col("cosine"), 4).as("cos4"))
    },

    // -- token counting: whitespace + BPE-ish regex
    dfQ("q57_token_count", """
      SELECT doc_id,
        len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_ws,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
      FROM documents
      ORDER BY doc_id""") { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).as("n_ws"),
          TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"))
        .orderBy("doc_id")
    },

    // -- language ID heuristic: confusion matrix vs the labeled lang col
    dfQ("q58_langid_confusion", """
      WITH tok AS (
        SELECT doc_id, lang,
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> len(x) > 0) AS t,
          regexp_matches(text, '[一-鿿]') AS has_cjk
        FROM documents
      ), scored AS (
        SELECT doc_id, lang, has_cjk,
          len(list_filter(t, x -> list_contains(
            ['the','a','of','and','to','in','is','that','it','for'], x))) AS s_en,
          len(list_filter(t, x -> list_contains(
            ['der','die','das','und','ist','nicht','ein','mit','zu','auf'], x))) AS s_de,
          len(list_filter(t, x -> list_contains(
            ['le','la','les','et','est','un','une','des','que','pour'], x))) AS s_fr,
          len(list_filter(t, x -> list_contains(
            ['el','la','los','las','y','es','un','una','que','por'], x))) AS s_es
        FROM tok
      )
      SELECT lang, CASE
          WHEN has_cjk THEN 'zh'
          WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
          WHEN s_es > greatest(s_en, s_de, s_fr) THEN 'es'
          WHEN s_fr > greatest(s_en, s_de) THEN 'fr'
          WHEN s_de > s_en THEN 'de'
          ELSE 'en' END AS predicted,
        count(*) AS n
      FROM scored
      GROUP BY 1, 2
      ORDER BY lang, predicted""") { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("lang"),
          TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },

    // -- quality metrics (per-row, no shuffle)
    dfQ("q59_text_quality", """
      WITH m AS (
        SELECT doc_id,
          length(text) AS n_chars,
          len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                          x -> len(x) > 0)) AS n_tokens,
          length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
            AS n_punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS n_digit
        FROM documents
      )
      SELECT doc_id, n_chars, n_tokens,
        round(n_punct::DOUBLE / n_chars, 6) AS punct_ratio,
        round(n_digit::DOUBLE / n_chars, 6) AS digit_ratio
      FROM m
      ORDER BY doc_id""") { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.qualityMetrics(col("text")).as("m"))
        .select(col("doc_id"),
          col("m.n_chars").as("n_chars"),
          col("m.n_tokens").as("n_tokens"),
          round(col("m.punct_ratio"), 6).as("punct_ratio"),
          round(col("m.digit_ratio"), 6).as("digit_ratio"))
        .orderBy("doc_id")
    },

    // -- fingerprints (xxhash64 — no DuckDB equivalent; deterministic)
    noOracle("q60_fingerprint") { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.robustFingerprint(col("text")).as("fp_robust"))
        .orderBy("doc_id")
    },

    // -- multimodal plumbing: binary payload + decoded metadata; the
    //    oracle covers the non-stub columns (size, digest)
    dfQ("q61_multimodal_meta", """
      SELECT doc_id AS id, octet_length(text::BLOB) AS n_bytes,
             sha256(text) AS content_sha256
      FROM documents
      ORDER BY id""") { (s, d) =>
      val bin = Tables.load(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.withDecodedMeta(bin, "doc_id", "payload", kind = "image")
        .select(col("id"), col("n_bytes"), col("content_sha256"))
        .orderBy("id")
    },

    // -- ngrams as distributed counting (Hive's ngrams UDAF re-expressed
    //    Spark-first: explode + count + top-k is exact and scales; the
    //    UDAF was a single-reducer approximation)
    dfQ("q62_ngrams_top", DUCK_SHINGLES.replace("list_distinct(", "(") + """
      SELECT ngram, count(*) AS n
      FROM (SELECT unnest(s) AS ngram FROM sh)
      GROUP BY ngram
      ORDER BY n DESC, ngram
      LIMIT 20""") { (s, d) =>
      Tables.load(s, d, "documents")
        .select(explode(
          TextOps.shingleSet(col("text"), 3, distinct = false)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)
    },

    // -- TF-IDF top terms per document (training-data curation staple)
    dfQ("q89_tfidf", """
      WITH tok AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                 x -> len(x) > 0)) AS term
        FROM documents
      ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
      ), dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
      ), total AS (SELECT count(*) AS n FROM documents),
      scored AS (
        SELECT doc_id, term,
          round(tf * (ln((total.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN total
      )
      SELECT doc_id, term, score, rn FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM scored) t
      WHERE rn <= 3
      ORDER BY doc_id, rn""") { (s, d) =>
      TextAnalysis.tfIdfTopK(Tables.load(s, d, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rn")
    },

    // -- context_ngrams with Hive wildcard semantics: words following
    //    "the" (context = ['the', null] → top wildcard fillers)
    dfQ("q99_context_ngrams_wildcard", """
      WITH tok AS (
        SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> len(x) > 0) AS t
        FROM documents
      ), bigrams AS (
        SELECT t[i] AS w1, t[i+1] AS w2
        FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
      )
      SELECT w2 AS filler, count(*) AS n
      FROM bigrams WHERE w1 = 'the'
      GROUP BY w2
      ORDER BY n DESC, filler
      LIMIT 10""") { (s, d) =>
      TextAnalysis.contextNgrams(
        Tables.load(s, d, "documents"), "text",
        context = Seq(Some("the"), None), k = 10)
    },

    // -- capstone: full curation pipeline (quality gate → lang-id →
    //    exact dedup → per-language stats), oracle replicates each stage
    dfQ("q95_curation_pipeline", """
      WITH metrics AS (
        SELECT doc_id, text, lang,
          len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                          x -> len(x) > 0)) AS n_tokens,
          (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
            ::DOUBLE / length(text) AS punct_ratio,
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> len(x) > 0) AS t,
          regexp_matches(text, '[一-鿿]') AS has_cjk
        FROM documents
      ), scored AS (
        SELECT *,
          len(list_filter(t, x -> list_contains(
            ['the','a','of','and','to','in','is','that','it','for'], x))) AS s_en,
          len(list_filter(t, x -> list_contains(
            ['der','die','das','und','ist','nicht','ein','mit','zu','auf'], x))) AS s_de,
          len(list_filter(t, x -> list_contains(
            ['le','la','les','et','est','un','une','des','que','pour'], x))) AS s_fr,
          len(list_filter(t, x -> list_contains(
            ['el','la','los','las','y','es','un','una','que','por'], x))) AS s_es
        FROM metrics
        WHERE n_tokens >= 20 AND punct_ratio < 0.05
      ), gated AS (
        SELECT doc_id, text, lang, n_tokens, CASE
            WHEN has_cjk THEN 'zh'
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_es > greatest(s_en, s_de, s_fr) THEN 'es'
            WHEN s_fr > greatest(s_en, s_de) THEN 'fr'
            WHEN s_de > s_en THEN 'de'
            ELSE 'en' END AS predicted
        FROM scored
      ), deduped AS (
        SELECT min(doc_id) AS keep_id,
          arg_min(lang, doc_id) AS lang,
          arg_min(predicted, doc_id) AS predicted,
          arg_min(n_tokens, doc_id) AS n_tokens
        FROM gated GROUP BY text
      )
      SELECT lang, count(*) AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens,
        count(*) FILTER (WHERE predicted = lang) AS n_pred_match
      FROM deduped
      GROUP BY lang
      ORDER BY lang""") { (s, d) =>
      graft.operators.Curation.corpusStats(
        graft.operators.Curation.curate(
          Tables.load(s, d, "documents"), "doc_id", "text"))
    },

    // -- context_ngrams equivalent: top trigrams matching a context prefix
    dfQ("q63_context_ngrams", DUCK_SHINGLES.replace("list_distinct(", "(") + """
      SELECT ngram, count(*) AS n
      FROM (SELECT unnest(s) AS ngram FROM sh)
      WHERE ngram LIKE 'the %'
      GROUP BY ngram
      ORDER BY n DESC, ngram
      LIMIT 10""") { (s, d) =>
      Tables.load(s, d, "documents")
        .select(explode(
          TextOps.shingleSet(col("text"), 3, distinct = false)).as("ngram"))
        .filter(col("ngram").startsWith("the "))
        .groupBy("ngram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(10)
    },

    // -- benchmark decontamination: corpus docs sharing 8-gram spans with
    //    an eval set (= first 40 tokens of every doc_id%10==7 doc, so
    //    contamination is planted by construction: the source pages are
    //    still in the corpus). Eval gram dictionary broadcasts; the
    //    corpus streams through one broadcast hash join, no text shuffle.
    dfQ("q117_decontaminate", """
      WITH tok AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> len(x) > 0) AS t
        FROM documents
      ), grams AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6),
          i -> array_to_string(t[i:i+7], ' '))) AS g
        FROM tok
      ), ev AS (
        SELECT t[1:40] AS t40 FROM tok WHERE doc_id % 10 = 7
      ), eval_grams AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t40) - 6),
          i -> array_to_string(t40[i:i+7], ' '))) AS ngram
        FROM ev
      )
      SELECT doc_id, count(*) AS n_hits
      FROM (SELECT doc_id, unnest(g) AS ngram FROM grams) c
      JOIN eval_grams USING (ngram)
      GROUP BY doc_id
      ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val evalSet = docs.filter(col("doc_id") % 10 === 7)
        .select(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 1, 40)).as("text"))
      Decontaminate.overlap(docs, evalSet, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    },

    // -- domain blocklist filter: first gate of a web-corpus pipeline.
    //    URLs are planted from `source` on both sides; Spark extracts the
    //    host with real parse_url, the oracle recomputes it arithmetically
    dfQ("q118_domain_filter", """
      WITH u AS (
        SELECT doc_id, source || '.example.com' AS host
        FROM documents
      )
      SELECT host, count(*) AS n_docs
      FROM u
      WHERE host NOT IN ('src3.example.com', 'src7.example.com')
      GROUP BY host
      ORDER BY host""") { (s, d) =>
      val withUrl = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          concat(lit("https://"), col("source"), lit(".example.com/p/"),
            col("doc_id")).as("url"))
      Curation.domainFilter(withUrl, "url",
        Seq("src3.example.com", "src7.example.com"))
        .groupBy("host").agg(count(lit(1)).as("n_docs"))
        .orderBy("host")
    },

    // -- deterministic stratified downsampling (data mixing): keep 50%
    //    of en, 30% of zh, everything else — decided by id bucket, not
    //    rand(), so re-runs select identical rows. The oracle uses the
    //    same modulo buckets; the xxhash64 default is spec-tested.
    dfQ("q122_stratified_sample", """
      SELECT lang, count(*) AS n_kept
      FROM documents
      WHERE (doc_id % 10) < CASE lang
        WHEN 'en' THEN 5 WHEN 'zh' THEN 3 ELSE 10 END
      GROUP BY lang
      ORDER BY lang""") { (s, d) =>
      import graft.operators.Sampling
      Sampling.stratified(Tables.load(s, d, "documents"), "lang", "doc_id",
          Map("en" -> 0.5, "zh" -> 0.3), buckets = 10,
          bucketExpr = Some(pmod(col("doc_id"), lit(10))))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },

    // -- Unicode NFC normalization + whitespace cleanup (native
    //    NfcNormalize expression; Spark has no normalization built-in).
    //    Decomposed "e"+U+0301 is planted on both sides; DuckDB's
    //    nfc_normalize is the oracle, so composition is actually proven
    dfQ("q123_normalize_text", """
      WITH planted AS (
        SELECT doc_id,
          text || '  cafe' || chr(769) || '  no' || chr(776) || 'el ' AS t
        FROM documents
      )
      SELECT doc_id,
        trim(regexp_replace(nfc_normalize(t), '\s+', ' ', 'g')) AS norm,
        length(trim(regexp_replace(nfc_normalize(t), '\s+', ' ', 'g'))) AS n
      FROM planted
      ORDER BY doc_id""") { (s, d) =>
      val planted = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit("  cafe\u0301  no\u0308el ")).as("t"))
      planted.select(col("doc_id"),
          TextOps.cleanText(col("t")).as("norm"),
          length(TextOps.cleanText(col("t"))).as("n"))
        .orderBy("doc_id")
    },

    // -- heavy hitters via the space_saving UDAF: with capacity ≥ the
    //    corpus's distinct-token count the sketch is provably exact, so
    //    the full (item, count, err=0) output hash-checks against the
    //    exact DuckDB group-count; the eviction regime (capacity <
    //    distinct) is covered by HeavyHittersSpec with planted skew
    dfQ("q130_heavy_hitters", """
      WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text),
          '[^a-z0-9]+'), x -> len(x) > 0)) AS item
        FROM documents
      )
      SELECT item, count(*) AS count_est, 0::BIGINT AS err
      FROM tok GROUP BY item
      ORDER BY count_est DESC, item
      LIMIT 10""") { (s, d) =>
      import graft.operators.HeavyHitters
      val toks = Tables.load(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("item"))
      HeavyHitters.topK(toks, col("item"), k = 10, capacity = 64)
    },

    // -- grouped space_saving: per-language top-3 tokens over the
    //    NFC-cleaned corpus — the UDAF under groupBy (per-group
    //    sketches merged across partitions), exact regime so the
    //    full output hash-checks; sketch output is pre-sorted, so
    //    posexplode's position IS the rank (no window needed)
    dfQ("q131_topk_per_lang", """
      WITH tok AS (
        SELECT lang, unnest(list_filter(string_split_regex(
          lower(nfc_normalize(text)), '[^a-z0-9]+'), x -> len(x) > 0)) AS item
        FROM documents
      ), c AS (
        SELECT lang, item, count(*) AS n FROM tok GROUP BY lang, item
      )
      SELECT lang, item, n AS count_est, rn FROM (
        SELECT lang, item, n, row_number() OVER (
          PARTITION BY lang ORDER BY n DESC, item) AS rn
        FROM c) t
      WHERE rn <= 3
      ORDER BY lang, rn""") { (s, d) =>
      import graft.operators.HeavyHitters
      val toks = Tables.load(s, d, "documents")
        .select(col("lang"),
          explode(TextOps.tokens(TextOps.cleanText(col("text")))).as("item"))
      toks.groupBy("lang")
        .agg(HeavyHitters.sketch(col("item"), 64).as("sk"))
        .select(col("lang"),
          posexplode(slice(col("sk"), 1, 3)).as(Seq("pos", "e")))
        .select(col("lang"), col("e.item").as("item"),
          col("e.count_est").as("count_est"), (col("pos") + 1).as("rn"))
        .orderBy("lang", "rn")
    },

    // -- weighted resampling (mixture spec): en×1.5, zh×3, de×0 — the
    //    oversampling half of data mixing. Deterministic fractional
    //    copies via the same modulo buckets as q122.
    dfQ("q124_weighted_resample", """
      WITH w AS (
        SELECT lang,
          CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 3 WHEN 'de' THEN 0
            ELSE 1 END
          + CASE WHEN lang = 'en' AND (doc_id % 10) < 5 THEN 1 ELSE 0
            END AS copies
        FROM documents
      )
      SELECT lang, sum(copies)::BIGINT AS n_rows
      FROM w GROUP BY lang
      HAVING sum(copies) > 0
      ORDER BY lang""") { (s, d) =>
      import graft.operators.Sampling
      Sampling.resampleByWeight(Tables.load(s, d, "documents"),
          "lang", "doc_id", Map("en" -> 1.5, "zh" -> 3.0, "de" -> 0.0),
          buckets = 10, bucketExpr = Some(pmod(col("doc_id"), lit(10))))
        .groupBy("lang").agg(count(lit(1)).as("n_rows"))
        .orderBy("lang")
    },

    // -- overlapping token-window chunking (context-length preparation):
    //    window 32, stride 24 → 8-token overlap; last window short; the
    //    oracle recomputes every window with DuckDB list slicing
    dfQ("q145_chunk_overlap", """
      WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents WHERE length(trim(text)) > 0),
      n AS (
        SELECT doc_id, toks, len(toks) AS n,
          (1 + greatest(n - 32, 0) // 24
             + CASE WHEN greatest(n - 32, 0) % 24 > 0 THEN 1 ELSE 0 END)
            AS nchunks
        FROM t)
      SELECT doc_id, gs.chunk_id,
        array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
          AS chunk_text,
        least(32, n - chunk_id * 24)::BIGINT AS n_tokens
      FROM n, LATERAL (SELECT unnest(range(nchunks))::INT AS chunk_id) gs
      ORDER BY doc_id, chunk_id""") { (s, d) =>
      import graft.operators.Packing
      Packing.chunk(Tables.load(s, d, "documents"),
          "doc_id", "text", chunkTokens = 32, strideTokens = 24)
        .orderBy("doc_id", "chunk_id")
    },

    // -- token-budget sharding: distributed exclusive prefix sum of
    //    per-doc token counts in doc_id order (range partition + local
    //    windows + tiny offset broadcast — no global single-partition
    //    window), shard = floor(tokens_before / 2000). Oracle: the
    //    single-window cumulative sum DuckDB can afford at oracle scale.
    dfQ("q146_token_shard", """
      WITH n AS (
        SELECT doc_id,
          len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tok
        FROM documents)
      SELECT doc_id, n_tok,
        coalesce(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS tokens_before,
        (coalesce(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2000)
          ::BIGINT AS shard
      FROM n ORDER BY doc_id""") { (s, d) =>
      import graft.operators.Packing
      val docs = Tables.load(s, d, "documents").select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      Packing.shardByTokenBudget(docs, "doc_id", "n_tok",
          budgetTokens = 2000)
        .select("doc_id", "n_tok", "tokens_before", "shard")
        .orderBy("doc_id")
    },

    // -- greedy sequence packing (fill + n <= budget → same bin, else a
    //    new bin) per source group in doc_id order; the stateful scan is
    //    flatMapGroups on Spark and a recursive CTE in DuckDB — hash
    //    equality pins the exact bin-reset boundary behavior
    dfQ("q147_pack_greedy", """
      WITH RECURSIVE d AS (
        SELECT source, doc_id,
          len(string_split_regex(trim(text), '\s+'))::BIGINT AS n,
          row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents),
      p AS (
        SELECT source, doc_id, n, rn, 0::BIGINT AS bin, n AS fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.source, d.doc_id, d.n, d.rn,
          CASE WHEN p.fill + d.n <= 500 THEN p.bin ELSE p.bin + 1 END,
          CASE WHEN p.fill + d.n <= 500 THEN p.fill + d.n ELSE d.n END
        FROM p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
      SELECT source, doc_id, n, bin FROM p
      ORDER BY source, doc_id""") { (s, d) =>
      import graft.operators.Packing
      val docs = Tables.load(s, d, "documents").select(
        col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      Packing.packGreedy(docs, "source", "doc_id", "n_tok",
          budgetTokens = 500)
        .orderBy("source", "doc_id")
    },

    // -- near-dup cluster resolution: exact-Jaccard pairs (q52's
    //    generator) → connected components via distributed min-label
    //    propagation; component = smallest reachable doc_id. Oracle:
    //    recursive-CTE transitive closure over the identical pair list.
    dfQ("q148_dedup_clusters",
      DUCK_SHINGLES.replace("WITH ", "WITH RECURSIVE ") + """
      , pr AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a
        JOIN sh b ON a.lang = b.lang AND a.source = b.source
                 AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))::DOUBLE /
              (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.02),
      e AS (
        SELECT id_a AS src, id_b AS dst FROM pr
        UNION SELECT id_b, id_a FROM pr),
      reach AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
      comp AS (
        SELECT d.doc_id,
          least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
        FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
        GROUP BY d.doc_id)
      SELECT doc_id, component FROM comp ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        blockCols = Seq("lang", "source"), shingleSize = 3,
        threshold = 0.02)
      Dedup.connectedComponents(docs, "doc_id", pairs, "id_a", "id_b")
        .orderBy("doc_id")
    },

    // -- cross-document line-level boilerplate removal (RefinedWeb-style):
    //    a planted 10-token "newsletter" line lands in every doc_id%5==0
    //    document on BOTH sides; 10-token pseudo-lines make the line
    //    splitter deterministic on this newline-free corpus. The oracle
    //    recomputes the document-frequency filter and the ordered rebuild.
    dfQ("q149_line_boilerplate", """
      WITH t AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN
            'subscribe to our newsletter now for daily updates and offers '
              || text
          ELSE text END AS text2
        FROM documents),
      tok AS (
        SELECT doc_id, string_split_regex(trim(text2), '\s+') AS toks
        FROM t),
      ln AS (
        SELECT doc_id,
          list_transform(range(0, (len(toks) + 9) // 10),
            g -> array_to_string(toks[g*10+1 : g*10+10], ' ')) AS l
        FROM tok),
      ex AS (
        SELECT doc_id, gs AS pos, l[gs] AS line
        FROM ln, LATERAL (SELECT generate_subscripts(l, 1) AS gs)),
      freq AS (
        SELECT line FROM ex GROUP BY line
        HAVING count(DISTINCT doc_id) >= 30),
      kept AS (
        SELECT e.doc_id,
          string_agg(e.line, ' ' ORDER BY e.pos) AS clean_text,
          count(*) AS n_kept
        FROM ex e WHERE e.line NOT IN (SELECT line FROM freq)
        GROUP BY e.doc_id)
      SELECT l.doc_id,
        coalesce(k.clean_text, '') AS clean_text,
        coalesce(k.n_kept, 0)::BIGINT AS n_kept,
        (len(l.l) - coalesce(k.n_kept, 0))::BIGINT AS n_dropped
      FROM ln l LEFT JOIN kept k ON l.doc_id = k.doc_id
      ORDER BY l.doc_id""") { (s, d) =>
      import graft.operators.Lines
      val planted = Tables.load(s, d, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit("subscribe to our newsletter now for daily updates " +
            "and offers "), col("text")))
          .otherwise(col("text")).as("text2"))
      Lines.stripBoilerplate(planted, "doc_id",
          Lines.pseudoLines(col("text2"), 10), minDocFreq = 30,
          joiner = " ")
        .orderBy("doc_id")
    }
  )
}
