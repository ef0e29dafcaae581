"""§2 M — Text analysis operators for training-data pipelines.

All tokenization is split-on-space (the fixture corpus is pre-normalized
lowercase words); every operator is expressed as explode → relational
algebra, which distributes trivially: the exploded token table is the
workhorse shape at 100 TB (shuffle keyed by token or doc as needed).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.ops.parity import O_DEC
from adlspark.registry import query

_STOPWORDS = ("the", "a", "of", "and", "to", "in")
_SW_SQL = "('" + "', '".join(_STOPWORDS) + "')"


def _words(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))


@query(
    "llm_text_stats",
    oracle=f"""
WITH s AS (
  SELECT lang, count(*) AS n_docs,
         round(CAST(sum(TRY_CAST((n_chars) AS {O_DEC})) AS DOUBLE) / count(*), 6)
           AS avg_chars
  FROM documents GROUP BY lang
), t AS (
  SELECT lang, count(DISTINCT w) AS n_distinct_tokens, count(*) AS n_tokens
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY lang
)
SELECT s.lang, n_docs, avg_chars, n_distinct_tokens, n_tokens
FROM s JOIN t ON s.lang = t.lang
""",
)
def llm_text_stats(spark, sf_dir):
    """Corpus stats per lang: docs, exact-avg chars, token counts."""
    d = tables.load(spark, sf_dir, "documents")
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("n_chars").try_cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_chars"),
    )
    t = (
        _words(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.countDistinct("w").alias("n_distinct_tokens"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return s.join(t, on="lang")


@query(
    "llm_top_terms",
    oracle="""
SELECT lang, w AS term, n, rnk FROM (
  SELECT lang, w, n,
         row_number() OVER (PARTITION BY coalesce(lang, chr(1))
                            ORDER BY n DESC, w) AS rnk
  FROM (
    SELECT lang, w, count(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY lang, w
  ) c
) r WHERE rnk <= 10
""",
)
def llm_top_terms(spark, sf_dir):
    """Top-10 terms per lang by term frequency."""
    counts = (
        _words(spark, sf_dir)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.col("w"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 10)
        .select("lang", F.col("w").alias("term"), "n", "rnk")
    )


@query(
    "llm_tfidf",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w
), df AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.w,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
  FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
)
SELECT doc_id, w AS top_term, score FROM (
  SELECT doc_id, w, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, w) AS r
  FROM scored
) t WHERE r = 1
""",
)
def llm_tfidf(spark, sf_dir):
    """TF-IDF, top-scoring term per document. df-table is broadcast
    (vocabulary ≪ corpus); ranking is on the rounded score."""
    words = _words(spark, sf_dir).select("doc_id", "w")
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tables.fast_count(spark, sf_dir, "documents")
    scored = tf.join(F.broadcast(df), on="w").select(
        "doc_id",
        "w",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    w_r = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("w"))
    return (
        scored.withColumn("r", F.row_number().over(w_r))
        .where(F.col("r") == 1)
        .select("doc_id", F.col("w").alias("top_term"), "score")
    )


@query(
    "llm_lang_partition_pipeline",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, lang, source, lower(trim(text)) AS text FROM documents
), tok AS (
  SELECT doc_id, lang, source, len(string_split(text, ' ')) AS n_tokens
  FROM norm
)
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(TRY_CAST((n_tokens) AS {O_DEC})) AS DOUBLE) / count(*), 6)
         AS avg_tokens
FROM tok GROUP BY lang, source
""",
)
def llm_lang_partition_pipeline(spark, sf_dir):
    """Per-(lang, source) ETL composition: normalize → tokenize → count.
    The chained-DataFrame form Catalyst collapses into one scan + one
    aggregate — the shape of a partitioned corpus-prep pipeline."""
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("n_tokens"),
    )
    return tok.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.sum(F.col("n_tokens").try_cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_tokens"),
    )


@query(
    "llm_langid",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       round(CAST(len(list_filter(toks, x -> x IN {_SW_SQL})) AS DOUBLE)
             / len(toks), 6) AS stopword_ratio,
       CASE WHEN CAST(len(list_filter(toks, x -> x IN {_SW_SQL})) AS DOUBLE)
                 / len(toks) > 0.02
            THEN 'en' ELSE 'unknown' END AS predicted_lang
FROM t
""",
)
def llm_langid(spark, sf_dir):
    """Heuristic language ID: English-stopword density. (The fixture
    corpus is synthetic shared-vocabulary text, so the heuristic mostly
    fires 'en' — the operator under test is the n-gram-density shape,
    not model quality.)"""
    d = tables.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.filter(toks, lambda x: x.isin(*_STOPWORDS))
    ratio = F.size(sw).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio > 0.02, "en").otherwise("unknown").alias("predicted_lang"),
    )


@query(
    "llm_text_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks,
         length(replace(text, ' ', '')) AS n_alpha
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(CAST(n_alpha AS DOUBLE) / len(toks), 6) AS avg_token_len,
       round(CAST(len(list_filter(toks, x -> x IN {_SW_SQL})) AS DOUBLE)
             / len(toks), 6) AS stopword_ratio,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
         AS distinct_ratio,
       CASE WHEN len(toks) >= 20
             AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.3
            THEN 'keep' ELSE 'drop' END AS verdict
FROM t
""",
)
def llm_text_quality(spark, sf_dir):
    """Quality scoring: token count, mean token length, stopword ratio,
    type-token ratio, and a keep/drop verdict — the standard pre-training
    corpus filter, one narrow projection per doc."""
    d = tables.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_alpha = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    sw_ratio = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast(
        "double"
    ) / n_tok
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_alpha.cast("double") / n_tok, 6).alias("avg_token_len"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(ttr, 6).alias("distinct_ratio"),
        F.when((n_tok >= 20) & (ttr > 0.3), "keep").otherwise("drop").alias(
            "verdict"
        ),
    )


@query(
    "llm_token_count",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS re_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
FROM documents
""",
)
def llm_token_count(spark, sf_dir):
    """Token counting three ways: whitespace, BPE-ish regex (word runs +
    punctuation singletons), and the chars/4 LLM heuristic."""
    d = tables.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]', 0)")
        )
        .cast("long")
        .alias("re_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("approx_bpe_tokens"),
    )


@query(
    "llm_train_split",
    oracle="""
WITH b AS (
  SELECT doc_id, lang,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 100 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM b GROUP BY lang, split
""",
)
def llm_train_split(spark, sf_dir):
    """Deterministic, engine-independent train/val/test split (80/10/10)
    by md5 hash bucket of the document id — the reproducible-split
    primitive every training-data pipeline needs: membership is a pure
    function of the id (stable under re-runs, re-partitioning, engine
    choice, and corpus growth), never a random() sample. Stratified
    report per (lang, split) proves the buckets hold across strata.
    At 100 TB this is a narrow projection + one small aggregate —
    no shuffle of the corpus itself."""
    d = tables.load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@query(
    "llm_corpus_filter_pipeline",
    oracle=f"""
WITH canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), q AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), keepq AS (
  SELECT doc_id FROM q
  WHERE len(toks) >= 20
    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.3
)
SELECT d.lang,
       count(*) AS n_total,
       count(c.doc_id) AS n_canonical,
       count(CASE WHEN c.doc_id IS NOT NULL AND k.doc_id IS NOT NULL
                  THEN 1 END) AS n_kept,
       round(CAST(count(CASE WHEN c.doc_id IS NOT NULL AND k.doc_id IS NOT NULL
                             THEN 1 END) AS DOUBLE) / count(*), 6) AS kept_ratio
FROM documents d
LEFT JOIN canon c ON d.doc_id = c.doc_id
LEFT JOIN keepq k ON d.doc_id = k.doc_id
GROUP BY d.lang
""",
)
def llm_corpus_filter_pipeline(spark, sf_dir):
    """End-to-end corpus cleaning funnel — the composition a pre-training
    pipeline actually runs: exact-dedup keep-one (canonical = min doc_id
    per content hash) ∘ quality filter (length + type-token ratio), with
    per-lang funnel counts (total → canonical → kept). Every stage is a
    hash aggregate or hash join on doc_id/content-hash — the whole funnel
    is 3 shuffles at any scale, and the stages share the single corpus
    scan."""
    d = tables.load(spark, sf_dir, "documents")
    canon = (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("is_canonical"))
    )
    toks = F.split("text", " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    keepq = (
        d.where((F.size(toks) >= 20) & (ttr > 0.3))
        .select("doc_id", F.lit(True).alias("is_quality"))
    )
    kept = F.col("is_canonical").isNotNull() & F.col("is_quality").isNotNull()
    return (
        d.select("doc_id", "lang")
        .join(canon, "doc_id", "left")
        .join(keepq, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("is_canonical").alias("n_canonical"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.round(
                F.sum(F.when(kept, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("kept_ratio"),
        )
    )


@query(
    "llm_pii_scrub",
    oracle=r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 id ' || CAST(1000000 + doc_id AS VARCHAR) AS raw
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(raw, '[a-z0-9._%+-]{1,64}@[a-z0-9.-]+\.[a-z]{2,}'))
         AS n_emails,
       len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
         AS n_ips,
       len(regexp_extract_all(raw, '\b\d{7,256}\b')) AS n_long_ids,
       md5(regexp_replace(regexp_replace(regexp_replace(raw,
             '[a-z0-9._%+-]{1,64}@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{7,256}\b', '<ID>', 'g')) AS scrubbed_md5
FROM aug
""",
)
def llm_pii_scrub(spark, sf_dir):
    r"""PII scrubbing — the redaction pass every training corpus gets
    before the tokenizer: emails, IPv4 addresses and long numeric ids are
    counted and replaced with typed placeholder tokens. The fixture text
    is synthetic (PII-free), so deterministic PII is INJECTED per doc
    (email/IP/id derived from doc_id) and the scrub must find exactly
    those; the output carries match counts plus the md5 of the scrubbed
    text so the oracle value-checks the rewritten string itself. One
    narrow projection — regex runs inside whole-stage codegen, no
    shuffle, linear at any scale.

    Quantifier bounds (round-10 giant-doc corpus): the email local
    part is capped at {1,64} (the RFC 5321 limit) and id runs at
    {7,256} — with unbounded +/{7,}, Java's backtracking engine is
    QUADRATIC over a megabyte character run that stays inside the
    class (each failed start re-consumes the rest of the run; a 1 MB
    single-token doc took this key from 0.5 s to minutes) while
    DuckDB's RE2 is linear-time and never noticed. The bounds make the
    per-position attempt O(64)/O(256) and are mirrored verbatim in the
    oracle. NOTE the bounds cap the ATTEMPT, not the match domain: the
    pattern is unanchored, so a >64-char local-part run is still
    PARTIALLY matched (its trailing 64 chars before the @) and counted/
    rewritten — identically on both engines, which is the only
    mirrorable semantic (RE2 has no lookbehind, so truly excluding
    long locals can't be expressed on the oracle side). Likewise >256-
    digit runs are matched in <=256-digit chunks on both engines."""
    d = tables.load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 id "),
        (F.col("doc_id") + 1000000).cast("string"),
    )
    email_re = r"[a-z0-9._%+-]{1,64}@[a-z0-9.-]+\.[a-z]{2,}"
    ip_re = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    id_re = r"\b\d{7,256}\b"
    aug = d.select("doc_id", raw.alias("raw"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), email_re, "<EMAIL>"),
            ip_re,
            "<IP>",
        ),
        id_re,
        "<ID>",
    )
    # Counts use the native Column API (not F.expr) so the Python regex
    # strings reach the engine verbatim — an F.expr SQL literal collapses
    # '\.' to '.' unless backslash-doubled, which silently changed the
    # email pattern vs the scrub expression and the oracle.
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(email_re), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(ip_re), 0))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(id_re), 0))
        .cast("long")
        .alias("n_long_ids"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
    )


@query(
    "llm_doc_chunk",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), tok AS (
  -- linear chunking: the old LATERAL list_slice(w, s+1, s+32) carried
  -- and re-sliced the whole token list per chunk row — quadratic on a
  -- megadoc (round-10 giant-doc corpus). Each token belongs to at
  -- most TWO stride-24/size-32 chunks: its own p//24 block, and the
  -- previous block when its in-block offset is < 32-24 = 8.
  SELECT doc_id, generate_subscripts(w, 1) - 1 AS p, unnest(w) AS tk
  FROM d
), assign AS (
  SELECT doc_id, CAST(p // 24 AS BIGINT) AS chunk_id, p, tk FROM tok
  UNION ALL
  SELECT doc_id, CAST(p // 24 AS BIGINT) - 1, p, tk FROM tok
  WHERE p // 24 >= 1 AND p - (p // 24 - 1) * 24 < 32
)
SELECT doc_id, chunk_id,
       string_agg(tk, ' ' ORDER BY p) AS chunk_text,
       count(*) AS n_tokens
FROM assign GROUP BY doc_id, chunk_id
""",
)
def llm_doc_chunk(spark, sf_dir):
    """Fixed-size overlapping token chunking — the step every training
    pipeline runs between cleaning and tokenization: each document is cut
    into 32-token windows advancing by a 24-token stride (8-token
    overlap so no boundary context is lost); the final chunk may be
    short. One narrow projection + posexplode: chunk starts come from a
    per-row ``sequence`` (no join, no shuffle), so the operator is linear
    in token volume and embarrassingly parallel at any corpus size —
    output rows ≈ docs × (tokens/stride)."""
    chunk, stride = 32, 24
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    starts = d.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(0), F.size("w") - F.lit(1), F.lit(stride))
        ).alias("s"),
    )
    piece = F.slice(F.col("w"), F.col("s") + F.lit(1), F.lit(chunk))
    return starts.select(
        "doc_id",
        (F.col("s") / stride).cast("long").alias("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


@query(
    "llm_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, count(*) AS cnt FROM tok GROUP BY w
), total AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t FROM freq
)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       round(avg(ln(CAST(freq.cnt AS DOUBLE) / total.t)), 6) AS avg_logprob
FROM tok JOIN freq USING (w) CROSS JOIN total
GROUP BY tok.doc_id
""",
)
def llm_unigram_logprob(spark, sf_dir):
    """Unigram language-model quality score: each document's mean token
    log-probability under the corpus unigram distribution — the cheapest
    useful LM-based quality filter (garbage and boilerplate both score
    far from the corpus mean; real pipelines threshold on it before
    paying for a neural scorer).

    Shape at scale: one explode, one token-keyed count aggregate (map-
    side combinable), one token-keyed join back (token frequency tables
    are vocabulary-sized — broadcastable for real corpora), one doc-keyed
    average. The corpus total rides a 1-row broadcast cross join, never a
    driver collect."""
    tok = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("t"))
    return (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("cnt").cast("double") / F.col("t"))), 6
            ).alias("avg_logprob"),
        )
    )


@query(
    "llm_stratified_sample",
    oracle="""
WITH n AS (
  SELECT lang, count(*) AS lang_n FROM documents GROUP BY lang
), b AS (
  SELECT d.doc_id, d.lang,
         CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT)
           % 10000 AS bucket,
         n.lang_n
  FROM documents d JOIN n USING (lang)
)
SELECT doc_id, lang
FROM b
WHERE bucket < 10000.0 * 100 / lang_n
""",
)
def llm_stratified_sample(spark, sf_dir):
    """Equalizing stratified sampler: each lang contributes ~100 docs
    regardless of its share of the corpus — the balancing step a
    multilingual training mix needs (dominant languages downsampled,
    small ones kept whole). Membership is the same engine-independent
    md5-bucket primitive as llm_train_split (pure function of doc_id —
    stable under re-runs, re-partitioning, engine choice), with the
    per-stratum threshold 10000·target/lang_n from a broadcast lang-count
    join. At scale: one narrow projection + one broadcast join; the
    corpus itself never shuffles."""
    d = tables.load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_n"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return (
        d.join(F.broadcast(counts), "lang")
        .where(bucket < F.lit(10000.0) * 100 / F.col("lang_n"))
        .select("doc_id", "lang")
    )


@query(
    "llm_token_histogram",
    oracle="""
WITH t AS (
  SELECT CAST(floor(len(string_split(text, ' ')) / 10) AS BIGINT) AS bucket,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT bucket,
       bucket * 10 AS bucket_lo,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM t GROUP BY bucket
""",
)
def llm_token_histogram(spark, sf_dir):
    """Document-length histogram (10-token buckets): the corpus profile
    every pipeline checks before choosing chunk sizes and length filters.
    Pure projection + one map-side-combinable aggregate over exact
    integers — no float discipline needed, linear at any corpus size."""
    d = tables.load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return (
        d.select(
            F.floor(n_tokens / 10).cast("long").alias("bucket"),
            n_tokens.alias("n_tokens"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 10).alias("bucket_lo"),
            "n_docs",
            "total_tokens",
        )
    )


@query(
    "llm_pack_bins",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY coalesce(lang, chr(1))
                                  ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS off
  FROM t
)
SELECT lang, CAST(floor(off / 2048) AS BIGINT) AS bin,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc
FROM c GROUP BY lang, bin
""",
)
def llm_pack_bins(spark, sf_dir):
    """Context packing: documents laid out in deterministic (lang,
    doc_id) order and cut into 2048-token bins by cumulative offset —
    the sequence-packing step that turns a cleaned corpus into
    fixed-budget training rows. Offset-based binning (a doc's bin =
    floor(start_offset/budget)) is the streaming-friendly form: exact
    greedy packing needs sequential state, while this is one window
    cumsum + one aggregate, and docs straddling a boundary are counted
    in their starting bin (documented approximation, same choice both
    engines). All-integer arithmetic — no float discipline needed."""
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        c.groupBy("lang", F.floor(F.col("off") / 2048).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@query(
    "llm_contamination_check",
    oracle="""
WITH b AS (
  SELECT doc_id, lang, text,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 100 AS bucket
  FROM documents
), labeled AS (
  SELECT doc_id, lang, text,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
  FROM b
), w AS (
  SELECT doc_id, lang, split, string_split(text, ' ') AS toks FROM labeled
), sh AS (
  SELECT doc_id, lang, split,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS s
  FROM w
)
SELECT te.doc_id AS test_doc,
       count(DISTINCT tr.doc_id) AS n_train_docs,
       count(*) AS n_hits
FROM sh te JOIN sh tr ON te.s = tr.s AND te.lang = tr.lang
WHERE te.split = 'test' AND tr.split = 'train'
GROUP BY te.doc_id
""",
)
def llm_contamination_check(spark, sf_dir):
    """Train/test contamination detection: for every test-split document,
    how many train-split documents share 3-gram shingles with it (and how
    many shingle×train-doc hits in total) — the leakage audit every
    benchmark-respecting training pipeline runs before a model sees the
    data. Splits come from the same md5-bucket primitive as
    llm_train_split, shingles from the same 3-gram construction as the
    Jaccard kernel.

    QUOTIENTED by identity group (the dedup-kernel pattern, round 8):
    contamination is overlap ≥ 1, i.e. Jaccard τ → 0, where PPJoin's
    prefix shrinks to the WHOLE set — prefix filtering cannot prune a
    single-shared-shingle join, so the scale fix for duplicate-dense
    corpora (exactly the corpora a contamination audit exists for) is
    the identity-group quotient alone. Docs collapse to one class per
    (lang, split, distinct shingle set); the inverted-index (shingle,
    lang) join and both aggregations run once per CLASS PAIR; the
    outputs expand back exactly because identity classes partition the
    doc ids — a test class's n_train_docs is the sum of matched train
    class sizes, and every shared shingle contributes (1 test shingle ×
    class_size train docs) hits. A k-copy contaminated benchmark page
    therefore costs one class, not k² join rows. Residual hot-shingle
    fan-out ACROSS distinct classes is irreducible for exact
    distinct-doc counts (the answer itself is that large); the
    map-side-combinable count aggregate absorbs it.
    Gated on the K=7 duplicate corpus by tests/test_dup_density.py."""
    d = tables.load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    # NULL-key discipline: NULL lang joins nothing in the direct form
    # (te.lang = tr.lang) and NULL text yields no exploded shingles —
    # dropping those rows up front is observation-equivalent and keeps
    # the groupBy from merging NULL keys into one spurious class.
    docs = (
        d.withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            "lang",
            split.alias("split"),
            F.expr(
                "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0)),"
                " i -> concat_ws(' ', slice(_toks, i+1, 3))))"
            ).alias("sh"),
        )
        .where(F.col("lang").isNotNull() & F.col("sh").isNotNull())
    )
    cls = (
        docs.where(F.col("split").isin("test", "train"))
        .groupBy("lang", "split", F.array_sort("sh").alias("sh"))
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("members"),
            F.count(F.lit(1)).alias("csize"),
            F.min("doc_id").alias("cid"),
        )
        # lazy + sorted members: first job materializes it (both join
        # sides + expansion); deterministic rows under stage races
        .localCheckpoint(eager=False)
    )
    te_sh = cls.where(F.col("split") == "test").select(
        "lang", F.col("cid").alias("te_cid"), F.explode("sh").alias("s")
    )
    tr_sh = cls.where(F.col("split") == "train").select(
        "lang",
        F.col("cid").alias("tr_cid"),
        F.col("csize").alias("tr_size"),
        F.explode("sh").alias("s"),
    )
    per_te_cls = (
        te_sh.join(tr_sh, ["s", "lang"])
        # shingles are distinct within a class: count(*) per class pair
        # IS the shared-shingle count
        .groupBy("te_cid", "tr_cid", "tr_size")
        .agg(F.count(F.lit(1)).alias("inter"))
        .groupBy("te_cid")
        .agg(
            F.sum("tr_size").cast("long").alias("n_train_docs"),
            F.sum(F.col("inter") * F.col("tr_size")).cast("long").alias("n_hits"),
        )
    )
    return (
        per_te_cls.join(
            cls.where(F.col("split") == "test").select(
                F.col("cid").alias("te_cid"), "members"
            ),
            "te_cid",
        )
        .select(
            F.explode("members").alias("test_doc"), "n_train_docs", "n_hits"
        )
    )


@query(
    "llm_repetition_filter",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(toks) - 1, 1)),
           i -> concat_ws(' ', toks[i], toks[i+1]))) AS bigram
  FROM w
), per AS (
  SELECT bg.doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         max(cnt) AS top_bigram_n
  FROM (SELECT doc_id, bigram, count(*) AS cnt
        FROM bg GROUP BY doc_id, bigram) bg
  GROUP BY bg.doc_id
)
SELECT doc_id, n_bigrams,
       round(CAST(top_bigram_n AS DOUBLE) / n_bigrams, 6)
         AS top_bigram_ratio,
       (CAST(top_bigram_n AS DOUBLE) / n_bigrams > 0.05) AS is_repetitive
FROM per
""",
)
def llm_repetition_filter(spark, sf_dir):
    """Intra-document repetition score: the share of a document's bigrams
    taken by its single most-repeated bigram, and a threshold flag — the
    boilerplate/spam heuristic in the C4/Gopher family of quality rules
    (looping text and template junk light this up long before a model
    does). Two map-side-combinable aggregates over an exploded bigram
    table (per-(doc, bigram) count, then per-doc max) — the shuffle keys
    are doc-scoped so the operator is linear and skew-free at any corpus
    size; the ratio is one exact int division rounded identically in
    both engines."""
    d = (
        tables.load(spark, sf_dir, "documents")
        .withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(size(_toks)-2, 0)),"
                    " i -> concat_ws(' ', slice(_toks, i+1, 2)))"
                )
            ).alias("bigram"),
        )
    )
    counts = d.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    per = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.max("cnt").alias("top_bigram_n"),
    )
    ratio = F.col("top_bigram_n").cast("double") / F.col("n_bigrams")
    return per.select(
        "doc_id",
        "n_bigrams",
        F.round(ratio, 6).alias("top_bigram_ratio"),
        (ratio > 0.05).alias("is_repetitive"),
    )


@query(
    "llm_entropy_filter",
    oracle="""
WITH ch AS (
  -- linear char explode: the old list_transform(generate_series(...),
  -- i -> substring(text, i, 1)) re-scanned to char i per element
  -- (UTF-8 position scan), quadratic on a megadoc — round-10
  -- giant-doc corpus. string_split(text, '') is one linear pass;
  -- the CASE guards the empty text, where both engines' empty-sep
  -- split yields [''] (a phantom char row) instead of [].
  SELECT doc_id, unnest(CASE WHEN len(text) >= 1
                             THEN string_split(text, '')
                             ELSE CAST([] AS VARCHAR[]) END) AS c
  FROM documents
), cc AS (
  SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c
), tot AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS t FROM cc GROUP BY doc_id
), h AS (
  SELECT cc.doc_id,
         CAST(tot.t AS BIGINT) AS n_chars_counted,
         round(-sum((n / CAST(t AS DOUBLE)) * ln(n / CAST(t AS DOUBLE))), 6)
           AS char_entropy
  FROM cc JOIN tot USING (doc_id)
  GROUP BY cc.doc_id, tot.t
)
SELECT doc_id, n_chars_counted, char_entropy,
       char_entropy < 2.5 AS is_low_entropy
FROM h
""",
)
def llm_entropy_filter(spark, sf_dir):
    """Character-level Shannon entropy per document — the classic cheap
    gibberish/boilerplate detector (near-random byte soup scores high,
    single-character or template spam scores low; both tails get cut
    before expensive model-based scoring). Complements the word-level
    signals (llm_text_quality, llm_repetition_filter) with a
    sub-token-level one.

    Scale shape: one char explode (linear, ~n_chars rows), a
    (doc, char)-keyed count and a doc-keyed entropy sum — both
    map-side combinable; all expressions JVM-side. The alphabet is
    bounded (~tens of symbols), so the intermediate is at most
    |alphabet| rows per doc regardless of document length.
    """
    d = tables.load(spark, sf_dir, "documents")
    # linear char explode via empty-separator split (the old
    # transform(sequence(...), i -> substring(text, i, 1)) re-scanned
    # to char i per element — quadratic on a megadoc; round-10
    # giant-doc corpus). Guard: split('', '') is [''] on BOTH engines
    # (one phantom char), so the empty text maps to an empty array —
    # no entropy row, matching the oracle.
    ch = d.select(
        "doc_id",
        F.explode(
            F.when(F.length("text") >= 1, F.split("text", ""))
            .otherwise(F.expr("CAST(array() AS array<string>)"))
        ).alias("c"),
    )
    cc = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = cc.groupBy("doc_id").agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t").cast("double")
    h = (
        cc.join(tot, "doc_id")
        .groupBy("doc_id", "t")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("char_entropy"))
        .select(
            "doc_id",
            F.col("t").cast("long").alias("n_chars_counted"),
            "char_entropy",
        )
    )
    return h.select(
        "doc_id",
        "n_chars_counted",
        "char_entropy",
        (F.col("char_entropy") < 2.5).alias("is_low_entropy"),
    )


@query(
    "llm_bigram_logprob",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM w WHERE len(toks) >= 2
), bgc AS (
  SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram
), hc AS (
  SELECT string_split(bigram, ' ')[1] AS head,
         CAST(sum(c2) AS BIGINT) AS c1
  FROM bgc GROUP BY head
)
SELECT bg.doc_id,
       count(*) AS n_bigrams,
       round(avg(ln(CAST(bgc.c2 AS DOUBLE) / hc.c1)), 6) AS avg_bigram_logprob
FROM bg
JOIN bgc USING (bigram)
JOIN hc ON string_split(bg.bigram, ' ')[1] = hc.head
GROUP BY bg.doc_id
""",
)
def llm_bigram_logprob(spark, sf_dir):
    """Bigram language-model quality score: each document's mean
    conditional log-probability ln p(w_i | w_{i-1}) under corpus bigram
    statistics — one Markov order above llm_unigram_logprob, and the
    strongest cheap LM signal before a neural scorer (repetitive
    boilerplate scores suspiciously HIGH, incoherent word soup scores
    LOW; pipelines cut both tails). No smoothing is needed because
    scored bigrams come from the same corpus as the counts.

    Scale shape: one bigram explode (linear), bigram- and head-keyed
    count aggregates (both map-side combinable, vocabulary²-bounded not
    corpus-bounded), two token-keyed joins back, one doc-keyed average.
    For real corpora the head-count table is broadcastable and the
    bigram join shuffles on a well-distributed key."""
    d = tables.load(spark, sf_dir, "documents").withColumn(
        "_toks", F.split("text", " ")
    )
    bg = (
        d.where(F.size("_toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2),"
                    " i -> concat_ws(' ', _toks[i], _toks[i+1]))"
                )
            ).alias("bigram"),
        )
    )
    bgc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    hc = (
        bgc.select(F.split("bigram", " ")[0].alias("head"), "c2")
        .groupBy("head")
        .agg(F.sum("c2").alias("c1"))
    )
    return (
        bg.join(bgc, "bigram")
        .join(F.broadcast(hc), F.split(F.col("bigram"), " ")[0] == F.col("head"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("c2").cast("double") / F.col("c1"))), 6
            ).alias("avg_bigram_logprob"),
        )
    )


@query(
    "llm_url_dedup",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'HTTPS://' || upper(source) || '.Example.COM:443/' || lang
           || '/page-' || CAST(doc_id % 50 AS VARCHAR)
           || '/?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) AS raw_url
  FROM documents
), n AS (
  SELECT doc_id, raw_url,
         lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/:]+)', 1))
           || regexp_replace(
                regexp_extract(raw_url, '^[A-Za-z]+://[^/]+(/[^?#]*)', 1),
                '/$', '')
           AS canon_url
  FROM u
)
SELECT canon_url,
       min(doc_id) AS canonical_doc,
       count(*) AS n_dups
FROM n GROUP BY canon_url
""",
)
def llm_url_dedup(spark, sf_dir):
    """URL-canonicalization dedup — the first dedup rung of a web-crawl
    pipeline, BEFORE any content hashing: lowercase the host, drop the
    scheme, default port, query string (tracking params) and trailing
    slash, then group by the canonical URL and keep the lowest doc id.
    The fixture synthesizes messy-but-deterministic raw URLs (mixed
    case, :443, utm tracking params, doc_id%50 collisions) so the
    canonicalizer has real work to do.

    Scale shape: canonicalization is a pure narrow regex map (JVM-side,
    codegen); the dedup is one group-by on the canonical key — at crawl
    scale this single shuffle replaces content hashing for the ~30% of
    duplicates that are URL-level, which is why pipelines run it first.
    """
    d = tables.load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://"),
        F.upper(F.col("source")),
        F.lit(".Example.COM:443/"),
        F.col("lang"),
        F.lit("/page-"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("/?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
    )
    host = F.lower(F.regexp_extract(raw, "^[A-Za-z]+://([^/:]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract(raw, "^[A-Za-z]+://[^/]+(/[^?#]*)", 1), "/$", ""
    )
    return (
        d.select("doc_id", F.concat(host, path).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


@query(
    "llm_quality_classifier",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         -- empty-vs-null split: DuckDB list_sum([]) is NULL where
         -- Spark's aggregate seeds 0L, so an EMPTY-token doc coalesces
         -- to margin 0 — but a NULL-text doc stays NULL on both sides
         CAST(CASE WHEN toks IS NULL THEN NULL
              ELSE coalesce(list_sum(list_transform(toks, x ->
           (CAST('0x' || substring(md5(x), 1, 15) AS BIGINT) % 1024)
             * 2654435761 % 2001 - 1000)), 0) END AS BIGINT) AS margin
  FROM tok
)
SELECT doc_id, n_tokens, margin,
       round(1.0 / (1.0 + exp(-(margin / (greatest(n_tokens, 1) * 1000.0)))), 6)
         AS quality_score,
       margin >= 0 AS keep
FROM feat
""",
)
def llm_quality_classifier(spark, sf_dir):
    """fastText-style linear quality classifier over hashed bag-of-words.

    Production corpus filters (CCNet, Gopher/FineWeb quality models)
    score each document with a linear model over hashed token features
    and keep documents above a threshold. The operator reproduces that
    shape with a deterministic stand-in model: token → 1024-bucket hash
    (md5-derived, bit-identical cross-engine — same rationale as
    llm_simhash), bucket → integer weight in [-1000, 1000] via a
    Knuth-multiplicative mix, document margin = Σ weights (EXACT integer
    arithmetic, so the keep decision `margin >= 0` can never drift on
    float summation order), score = sigmoid(margin / (n·1000)).

    Scale shape: the entire operator is a NARROW map — split, transform,
    aggregate() fold per row, all inside whole-stage codegen. Zero
    shuffles, zero Python workers; at 100 TB it is scan-bound, which is
    the correct cost for a corpus scoring pass. Swapping the stand-in
    weights for a trained model is a broadcast-join of a 1024-row weight
    table (or a literal array), not a redesign.
    """
    d = tables.load(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), x -> x <> '')")
    margin = F.expr(
        "aggregate(filter(split(text, ' '), x -> x <> ''), 0L, (acc, x) ->"
        " acc + (pmod(cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint),"
        " 1024) * 2654435761L) % 2001 - 1000)"
    )
    scored = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        margin.alias("margin"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "margin",
        F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.col("margin")
                        / (F.greatest(F.col("n_tokens"), F.lit(1)) * F.lit(1000.0))
                    )
                )
            ),
            6,
        ).alias("quality_score"),
        (F.col("margin") >= 0).alias("keep"),
    )


@query(
    "llm_text_normalize",
    oracle="""
WITH raw AS (
  SELECT doc_id,
         '  ' || upper(substring(text, 1, 20)) || chr(9)
           || substring(text, 21) || '   ' AS raw
  FROM documents
), norm AS (
  SELECT doc_id, raw,
         trim(regexp_replace(lower(raw), '\\s+', ' ', 'g')) AS norm
  FROM raw
)
SELECT doc_id,
       len(raw) AS n_chars_raw,
       len(norm) AS n_chars_norm,
       md5(norm) AS norm_md5
FROM norm
""",
)
def llm_text_normalize(spark, sf_dir):
    """Text normalization — the first transform of every ingest pipeline:
    case-fold, collapse whitespace runs (spaces/tabs/newlines) to single
    spaces, trim. The fixture text is already clean, so a deterministic
    'dirty' view is synthesized first (upper-cased head, embedded tab,
    padding) and the operator must provably undo it — the md5 of each
    normalized string is part of the checked output, so the oracle
    verifies byte equality, not just lengths. Unicode NFC/NFKC fold and
    control-char stripping slot into the same regexp_replace chain
    (omitted here: not expressible identically in the DuckDB oracle).

    Scale shape: pure narrow map, whole-stage codegen, zero shuffles —
    scan-bound at any corpus size, exactly like llm_quality_classifier.
    """
    d = tables.load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("  "),
        F.upper(F.substring("text", 1, 20)),
        F.lit("\t"),
        F.expr("substring(text, 21)"),
        F.lit("   "),
    )
    norm = F.trim(F.regexp_replace(F.lower(raw), r"\s+", " "))
    return d.select(
        "doc_id",
        F.length(raw).alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm.cast("binary")).alias("norm_md5"),
    )


@query(
    "llm_gopher_rules",
    oracle="""
WITH f AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
         -- empty-vs-null split: DuckDB list_sum([]) is NULL where
         -- Spark's aggregate seeds 0L, so an EMPTY-token doc sums to 0
         -- — but a NULL-text doc stays NULL on both sides
         CAST(CASE WHEN text IS NULL THEN NULL
              ELSE coalesce(list_sum(list_transform(list_filter(string_split(text, ' '),
           x -> x <> ''), x -> len(x))), 0) END AS BIGINT) AS sum_word_len,
         len(list_filter(string_split(text, ' '),
           x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is', 'that')))
           AS n_stop,
         len(regexp_extract_all(text, '[a-z]')) AS n_alpha,
         len(text) AS n_chars
  FROM documents
)
SELECT doc_id, n_words,
       round(sum_word_len / greatest(n_words, 1), 6) AS mean_word_len,
       round(n_alpha / greatest(n_chars, 1), 6) AS alpha_ratio,
       n_words >= 50 AND n_words <= 100000 AS ok_word_count,
       sum_word_len / greatest(n_words, 1) >= 3.0
         AND sum_word_len / greatest(n_words, 1) <= 10.0 AS ok_mean_word_len,
       n_stop >= 2 AS ok_stopwords,
       n_alpha / greatest(n_chars, 1) >= 0.6 AS ok_alpha_ratio,
       n_words >= 50 AND n_words <= 100000
         AND sum_word_len / greatest(n_words, 1) >= 3.0
         AND sum_word_len / greatest(n_words, 1) <= 10.0
         AND n_stop >= 2
         AND n_alpha / greatest(n_chars, 1) >= 0.6 AS keep
FROM f
""",
)
def llm_gopher_rules(spark, sf_dir):
    """The Gopher quality-rule suite (Rae et al. 2021, Table A1 subset):
    word-count bounds, mean-word-length band, minimum stopword hits, and
    alphabetic-character ratio — each rule surfaced as its own flag plus
    the combined keep decision, so downstream analysis can attribute WHY
    a document was dropped (the per-rule attribution is what pipeline
    dashboards chart). Completes the quality family next to the learned
    scorer (llm_quality_classifier) and the entropy/repetition filters.

    Scale shape: one narrow pass — every feature is a split/transform/
    regexp aggregate inside codegen over the row's own text; zero
    shuffles, scan-bound at any corpus size. Ratios are computed in
    integer counts and divided once (round 6) for cross-engine parity.
    """
    d = tables.load(spark, sf_dir, "documents")
    words = F.expr("filter(split(text, ' '), x -> x <> '')")
    n_words = F.size(words)
    sum_wl = F.expr(
        "aggregate(filter(split(text, ' '), x -> x <> ''), 0L,"
        " (a, x) -> a + length(x))"
    )
    stop = F.expr(
        "size(filter(split(text, ' '), x -> x IN"
        " ('the', 'and', 'of', 'to', 'a', 'in', 'is', 'that')))"
    )
    n_alpha = F.size(F.expr("regexp_extract_all(text, '[a-z]', 0)"))
    n_chars = F.length("text")
    mean_wl = sum_wl / F.greatest(n_words, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    ok_wc = (n_words >= 50) & (n_words <= 100000)
    ok_mwl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    ok_stop = stop >= 2
    ok_alpha = alpha_ratio >= 0.6
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_alpha.alias("ok_alpha_ratio"),
        (ok_wc & ok_mwl & ok_stop & ok_alpha).alias("keep"),
    )


@query(
    "llm_perplexity_bucket",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, count(*) AS cnt FROM tok GROUP BY w
), total AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t FROM freq
), lp AS (
  SELECT tok.doc_id, tok.lang,
         round(avg(ln(CAST(freq.cnt AS DOUBLE) / total.t)), 6) AS avg_logprob
  FROM tok JOIN freq USING (w) CROSS JOIN total
  GROUP BY tok.doc_id, tok.lang
)
SELECT doc_id, lang, avg_logprob,
       CASE ntile(3) OVER (PARTITION BY coalesce(lang, chr(1))
                           ORDER BY coalesce(avg_logprob,
                                             '-infinity'::DOUBLE) DESC,
                                    doc_id)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM lp
""",
)
def llm_perplexity_bucket(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    document with a language-model proxy (here the corpus unigram
    log-likelihood — the same statistic as ``llm_unigram_logprob``) and
    split each language into head/middle/tail TERCILES, the standard
    quality partition used to mix or drop web data before training.

    Exactness: the per-doc score is rounded to 6 digits BEFORE ranking
    and the tercile order tie-breaks on doc_id, so both engines rank an
    identical (rounded_score, doc_id) key — the bucket assignment cannot
    drift on last-ulp float noise.

    Scale shape: token frequencies are vocabulary-sized (Heaps-sublinear
    in the corpus — broadcastable); the corpus total rides a 1-row
    broadcast cross join; the tercile window shuffles one row per doc
    hash-partitioned BY LANGUAGE, so the sort is per-lang and the widest
    partition is the largest language, not the corpus.
    """
    tok = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("t"))
    lp = (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.avg(F.log(F.col("cnt").cast("double") / F.col("t"))), 6
            ).alias("avg_logprob")
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id")
    )
    n3 = F.ntile(3).over(w)
    bucket = (
        F.when(n3 == 1, F.lit("head"))
        .when(n3 == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return lp.select("doc_id", "lang", "avg_logprob", bucket.alias("bucket"))


@query(
    "llm_soft_dedup_weight",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
), cl AS (
  SELECT doc_id, md5(text) AS h,
         count(*) OVER (PARTITION BY md5(text)) AS cluster_size
  FROM corpus
)
SELECT doc_id, CAST(cluster_size AS BIGINT) AS cluster_size,
       round(1.0 / cluster_size, 6) AS weight
FROM cl
""",
)
def llm_soft_dedup_weight(spark, sf_dir):
    """Soft deduplication: instead of DROPPING duplicates, weight every
    copy by 1/cluster_size so each distinct text contributes unit mass
    to the training mix — the down-weighting used when exact removal is
    too aggressive (boilerplate that is legitimately frequent). The
    corpus is the documents table plus a re-ingested batch (every
    7th doc re-appears under a shifted id), the same fixture-augmentation
    convention as ``llm_incremental_dedup``, so real multi-member
    clusters exist at every SF.

    Scale shape: one hash-shuffle on md5(text) — identical cost to
    ``llm_dedup_exact``; the weight is a pure projection off the window
    count. Integer reciprocals divide deterministically in IEEE double,
    so round-6 is drift-free.
    """
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    w = Window.partitionBy(F.md5("text"))
    size = F.count(F.lit(1)).over(w)
    return corpus.select(
        "doc_id",
        size.alias("cluster_size"),
        F.round(F.lit(1.0) / size, 6).alias("weight"),
    )


@query(
    "llm_ngram_novelty",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), tok AS (
  -- linear trigrams (the old LATERAL list_slice was quadratic on a
  -- megadoc — round-10 giant-doc corpus)
  SELECT doc_id, generate_subscripts(w, 1) AS p, unnest(w) AS tk,
         len(w) AS n_toks
  FROM d
), g AS (
  SELECT DISTINCT doc_id,
         concat_ws(' ', tk, lead(tk) OVER win, lead(tk, 2) OVER win) AS ng
  FROM tok
  WINDOW win AS (PARTITION BY doc_id ORDER BY p)
  QUALIFY p <= n_toks - 2
), first_seen AS (
  SELECT ng, min(doc_id) AS first_doc FROM g GROUP BY ng
)
SELECT g.doc_id,
       count(*) AS n_ngrams,
       CAST(sum(CASE WHEN first_doc < g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seen_before,
       round(CAST(sum(CASE WHEN first_doc < g.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS seen_frac
FROM g JOIN first_seen USING (ng)
GROUP BY g.doc_id
""",
)
def llm_ngram_novelty(spark, sf_dir):
    """N-gram novelty scoring: for each document, the fraction of its
    distinct word trigrams that already occurred in an EARLIER document
    (ingestion order = doc_id) — the cheap memorization/redundancy
    signal used to rank crawl batches before the expensive dedup passes
    (high seen_frac ≈ boilerplate or near-dup of prior data).

    Scale shape (tightened round 12 — the r11 drift watch-item): the
    per-doc DISTINCT trigram set is built ARRAY-SIDE
    (transform(sequence) + array_distinct inside one codegen'd
    projection), so (a) the exploded rows are already (doc_id, ng)
    pairs — no global .distinct() shuffle of the widest relation, and
    (b) the token array is never replicated per exploded row (the old
    explode(idx) carried `w` through Generate, copying the whole array
    into every per-position UnsafeRow). The global first-occurrence is
    a window min over the one ngram-keyed shuffle (replacing the old
    groupBy + join-back pair), then the per-doc aggregate. 2 shuffles
    total, down from 4; skew-bounded by trigram frequency. The seen
    fraction is a small-integer divide — deterministic in IEEE double,
    so round-6 is drift-free.
    """
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    tri = F.when(
        F.size("w") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("w", i),
                F.element_at("w", i + 1),
                F.element_at("w", i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select(
        "doc_id", F.explode(F.array_distinct(tri)).alias("ng")
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("ng"))
    seen = F.sum(
        F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
    )
    return (
        g.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            seen.cast("long").alias("n_seen_before"),
            F.round(
                seen.cast("double") / F.count(F.lit(1)), 6
            ).alias("seen_frac"),
        )
    )


@query(
    "llm_vocab_coverage",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, count(*) AS cnt FROM tok GROUP BY w
), ranked AS (
  SELECT w, cnt,
         row_number() OVER (ORDER BY cnt DESC, w) AS rnk,
         CAST(sum(cnt) OVER (ORDER BY cnt DESC, w
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS total
  FROM freq
), ks AS (SELECT unnest([5, 10, 25]) AS k)
SELECT k,
       max(CASE WHEN rnk <= k THEN cum ELSE 0 END) AS covered,
       max(total) AS total_tokens,
       round(CAST(max(CASE WHEN rnk <= k THEN cum ELSE 0 END) AS DOUBLE)
             / max(total), 6) AS coverage
FROM ks CROSS JOIN ranked
GROUP BY k
""",
)
def llm_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve: what fraction of all token OCCURRENCES
    is covered by the top-k most frequent types, for k in {5, 10, 25}
    (fixture vocabulary is 31 types; production uses 1e4-1e6) — the
    statistic that sizes a tokenizer vocabulary / OOV budget before BPE
    training.

    Scale shape: the frequency table is vocabulary-sized (Heaps-
    sublinear), so the global rank/cumsum window — nominally a single-
    partition sort — runs over vocab rows, not corpus rows; the corpus-
    sized work is one map-side-combinable token count. Counts are exact
    integers; the coverage ratio is one integer divide — deterministic,
    round-6 drift-free.
    """
    tok = tables.load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    ord_w = Window.orderBy(F.col("cnt").desc(), F.col("w"))
    ranked = freq.select(
        F.row_number().over(ord_w).alias("rnk"),
        F.sum("cnt").over(
            ord_w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(10), F.lit(25))).alias("k")
    )
    covered = F.max(F.when(F.col("rnk") <= F.col("k"), F.col("cum")).otherwise(0))
    return (
        ks.crossJoin(F.broadcast(ranked))
        .groupBy("k")
        .agg(
            covered.alias("covered"),
            F.max("total").alias("total_tokens"),
            F.round(
                covered.cast("double") / F.max("total"), 6
            ).alias("coverage"),
        )
    )


@query(
    "llm_temperature_sample",
    oracle="""
WITH n AS (
  SELECT lang, count(*) AS lang_n FROM documents GROUP BY lang
), m AS (
  SELECT min(lang_n) AS n_min FROM n
), b AS (
  SELECT d.doc_id, d.lang, n.lang_n, m.n_min,
         CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT)
           % 10000 AS bucket
  FROM documents d JOIN n USING (lang) CROSS JOIN m
)
SELECT doc_id, lang
FROM b
WHERE bucket * bucket * lang_n < 100000000 * n_min
""",
)
def llm_temperature_sample(spark, sf_dir):
    """Temperature-scaled source sampling (α = 0.5): downsample each
    language at rate √(n_min/n_s), the multilingual mixture-flattening rule
    from XLM-R / mT5 (p_s ∝ n_s^α) restricted to downsampling-only so the
    smallest source is kept whole and nothing is duplicated.

    Membership is the same engine-independent md5-bucket primitive as
    ``llm_train_split``, but the irrational threshold 10000·√(n_min/n_s)
    is compared in INTEGER form — bucket²·n_s < 10⁸·n_min — so the
    accept/reject boundary is exact on both engines (a float sqrt
    comparison could flip a boundary bucket by one ulp). Scale: one
    narrow count per language (broadcast back), plus a map-side filter on
    a pure function of doc_id — the corpus never shuffles, identical
    membership under any partitioning or engine.
    """
    d = tables.load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_n"))
    n_min = counts.agg(F.min("lang_n").alias("n_min"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(n_min))
        .where(bucket * bucket * F.col("lang_n") < F.lit(100000000) * F.col("n_min"))
        .select("doc_id", "lang")
    )


@query(
    "llm_cooccurrence_pmi",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, count(*) AS df FROM tok GROUP BY w
), vocab AS (
  SELECT w, df FROM (
    SELECT w, df, row_number() OVER (ORDER BY df DESC, w) AS rnk FROM freq
  ) WHERE rnk <= 50
), vt AS (
  SELECT t.doc_id, t.w, v.df FROM tok t JOIN vocab v USING (w)
), pairs AS (
  SELECT a.w AS token_a, b.w AS token_b,
         any_value(a.df) AS df_a, any_value(b.df) AS df_b,
         count(*) AS n_co
  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
), total AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok)
SELECT token_a, token_b, n_co,
       round(ln(CAST(n_co * n_docs AS DOUBLE) / CAST(df_a * df_b AS DOUBLE)), 6)
         AS pmi
FROM pairs CROSS JOIN total
WHERE n_co >= 5
""",
)
def llm_cooccurrence_pmi(spark, sf_dir):
    """Document-level pointwise mutual information between vocabulary
    terms: PMI(a,b) = ln(P(a,b)/(P(a)P(b))) over doc co-occurrence — the
    association statistic behind phrase mining and word-vector SPPMI
    factorization (Levy & Goldberg 2014).

    The quadratic is bounded by construction: pairs are generated only
    within the top-V vocabulary (V = 50 by document frequency,
    deterministic tiebreak), so a doc contributes at most C(V,2) pairs
    regardless of its length — the knob that keeps the self-join linear
    in corpus size at 100 TB (V is a constant; the doc_id join key is
    the shuffle key and co-occurrence counting is map-side combinable).
    The ln ratio is over exact integers on both engines; round(,6) sits
    ≫ the ≤1-ulp libm drift.
    """
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    w_rank = Window.orderBy(F.desc("df"), F.col("w"))
    vocab = (
        freq.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= 50)
        .select("w", "df")
    )
    vt = tok.join(F.broadcast(vocab), "w")
    a = vt.select(
        "doc_id", F.col("w").alias("token_a"), F.col("df").alias("df_a")
    )
    b = vt.select(
        "doc_id", F.col("w").alias("token_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(
            F.any_value(F.col("df_a")).alias("df_a"),
            F.any_value(F.col("df_b")).alias("df_b"),
            F.count(F.lit(1)).alias("n_co"),
        )
    )
    n_docs = tok.agg(F.count_distinct("doc_id").alias("n_docs"))
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .where(F.col("n_co") >= 5)
        .select(
            "token_a",
            "token_b",
            "n_co",
            F.round(
                F.log(
                    (F.col("n_co") * F.col("n_docs")).cast("double")
                    / (F.col("df_a") * F.col("df_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


@query(
    "llm_dataset_card",
    oracle="""
WITH d AS (
  SELECT source, lang, doc_id, n_chars,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
         md5(text) AS h
  FROM documents
), per AS (
  SELECT source,
         count(*) AS n_docs,
         count(DISTINCT lang) AS n_langs,
         CAST(sum(n_words) AS BIGINT) AS total_words,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         count(DISTINCT h) AS n_unique,
         min(doc_id) AS first_doc
  FROM d GROUP BY source
)
SELECT source, n_docs, n_langs, total_words, total_chars,
       round(CAST(total_words AS DOUBLE) / n_docs, 4) AS words_per_doc,
       round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 4) AS exact_dup_rate,
       first_doc
FROM per
""",
)
def llm_dataset_card(spark, sf_dir):
    """Per-source dataset card: the corpus profile a training-data team
    publishes with every release (doc/word/char volumes, language
    spread, exact-duplicate rate, provenance anchor) — the roll-up that
    sits on top of the curation pipeline's per-doc signals.

    Everything is exact integer aggregation (counts, sums, distinct
    md5) with two display ratios computed as single IEEE divides at
    round 4 — no float accumulation anywhere.

    Scale shape: ONE source-keyed shuffle for all eight statistics; the
    dup-rate's count(DISTINCT md5) is the only expensive member and
    Spark plans it as a two-stage partial-distinct expand — still
    map-side combined, no second scan. Output is #sources rows:
    metadata scale. (At 100 TB you'd likely swap the exact distinct for
    approx_count_distinct — the ``agg_approx_distinct`` path — and keep
    the rest bit-identical.)"""
    d = tables.load(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "doc_id",
        "n_chars",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "n_words"
        ),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("h").alias("n_unique"),
        F.min("doc_id").alias("first_doc"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_langs",
        "total_words",
        "total_chars",
        F.round(F.col("total_words").cast("double") / F.col("n_docs"), 4).alias(
            "words_per_doc"
        ),
        F.round(
            F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs"), 4
        ).alias("exact_dup_rate"),
        "first_doc",
    )


@query(
    "llm_rouge_overlap",
    oracle="""
WITH raw AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
), tok AS (
  -- linear bigram construction: the old list_transform indexed
  -- toks[i]/toks[i+1] per element (quadratic list access on a
  -- megadoc — round-10 giant-doc corpus)
  SELECT doc_id, generate_subscripts(toks, 1) AS p, unnest(toks) AS tk,
         len(toks) AS n
  FROM raw
), bigr AS (
  SELECT doc_id, list_distinct(list(bg)) AS bi
  FROM (
    SELECT doc_id, p, n,
           concat_ws(' ', tk,
                     lead(tk) OVER (PARTITION BY doc_id ORDER BY p)) AS bg
    FROM tok
    QUALIFY p <= n - 1
  ) GROUP BY doc_id
), t AS (
  SELECT raw.doc_id, list_distinct(raw.toks) AS uni,
         coalesce(bigr.bi, CAST([] AS VARCHAR[])) AS bi
  FROM raw LEFT JOIN bigr USING (doc_id)
)
SELECT c.doc_id AS cand_id, r.doc_id AS ref_id,
       CAST(len(list_intersect(c.uni, r.uni)) AS BIGINT) AS n_uni_match,
       CAST(len(r.uni) AS BIGINT) AS n_uni_ref,
       round(CAST(len(list_intersect(c.uni, r.uni)) AS DOUBLE)
             / len(r.uni), 4) AS rouge1_recall,
       round(CAST(len(list_intersect(c.bi, r.bi)) AS DOUBLE)
             / greatest(len(r.bi), 1), 4) AS rouge2_recall
FROM t c JOIN t r ON c.doc_id = r.doc_id + 1 AND c.doc_id % 2 = 1
""",
)
def llm_rouge_overlap(spark, sf_dir):
    """ROUGE-1/ROUGE-2 recall (distinct-n-gram variant) between paired
    documents (each odd doc as candidate vs its even predecessor as
    reference) — the eval-metric computation a data team runs
    distributed over millions of (generation, reference) pairs; the
    pairing rule here is a fixture stand-in for a real pair table.

    Exact integer n-gram set intersections; the two recalls are single
    IEEE divides at round 4 — no float accumulation.

    Scale shape: n-gram sets are computed in one narrow map per side
    (JVM array expressions — no Python), the pair join is a shuffle on
    the pair key with both sides pre-projected to their n-gram arrays,
    and each pair's intersection is array work local to its row. With a
    real pair table the same plan broadcast-joins if one side is small."""
    d = (
        tables.load(spark, sf_dir, "documents")
        # hoist tokenization: one filter(split()) per doc, not one per
        # n-gram reference (the O(len^2) trap fixed repo-wide earlier)
        .select(
            "doc_id",
            F.filter(F.split("text", " "), lambda w: w != "").alias("_toks"),
        )
        .select(
            "doc_id",
            F.array_distinct("_toks").alias("uni"),
            F.array_distinct(
                # guard: sequence(1, 0) is DESCENDING [1,0] in Spark (not
                # empty like DuckDB generate_series), and _toks[1] then
                # faults under ANSI — short docs get an explicit empty set
                F.when(
                    F.size("_toks") >= 2,
                    F.expr(
                        "transform(sequence(1, size(_toks) - 1),"
                        " i -> concat_ws(' ', _toks[i - 1], _toks[i]))"
                    ),
                ).otherwise(F.expr("CAST(array() AS array<string>)"))
            ).alias("bi"),
        )
    )
    c = d.alias("c")
    r = d.alias("r")
    uni_match = F.size(F.array_intersect("c.uni", "r.uni"))
    bi_match = F.size(F.array_intersect("c.bi", "r.bi"))
    return (
        c.join(
            r,
            (F.col("c.doc_id") == F.col("r.doc_id") + 1)
            & (F.col("c.doc_id") % 2 == 1),
        )
        .select(
            F.col("c.doc_id").alias("cand_id"),
            F.col("r.doc_id").alias("ref_id"),
            uni_match.cast("long").alias("n_uni_match"),
            F.size("r.uni").cast("long").alias("n_uni_ref"),
            F.round(uni_match.cast("double") / F.size("r.uni"), 4).alias(
                "rouge1_recall"
            ),
            F.round(
                bi_match.cast("double") / F.greatest(F.size("r.bi"), F.lit(1)), 4
            ).alias("rouge2_recall"),
        )
    )


@query(
    "llm_domain_cap",
    oracle="""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY n_chars DESC NULLS LAST, doc_id) AS kept_rank,
         count(*) OVER (PARTITION BY source) AS domain_docs
  FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL
)
SELECT source, doc_id, n_chars, kept_rank, domain_docs
FROM ranked WHERE kept_rank <= 10
""",
)
def llm_domain_cap(spark, sf_dir):
    """Per-domain document caps — the web-corpus quota step: no single
    domain (source) may contribute more than N documents, keeping the
    N best under a deterministic priority (longest first, doc_id
    tiebreak). Every large crawl-curation pipeline runs this between
    dedup and mixing, because domain volume is power-law distributed
    and an uncapped head domain dominates the token budget.

    Scale shape: a per-domain count aggregate runs first and its (tiny
    — the head of the power law) result is broadcast, splitting the
    corpus into an under-cap slice (keeps every row; its ranks are
    informational) and an over-cap slice (the only rows where ranking
    DECIDES anything). The over-cap slice's ``row_number ≤ cap``
    filter compiles to PARTIAL + FINAL ``WindowGroupLimit`` around the
    exchange (Spark 3.5 InferWindowGroupLimit — plan-verified): each
    map partition keeps only its LOCAL top-``cap`` per domain before
    shuffling, so a billion-row head domain ships ≤ cap rows per map
    partition into the sort, never its full volume — the classic
    scalable grouped top-k, for free from the declarative form. The
    under-cap slice's window has no such limit (it keeps all rows),
    but its domains are ≤ cap rows each by construction. Filters reach
    the scan (PushedFilters: IsNotNull(source), IsNotNull(doc_id)).
    NULL source / NULL doc_id rows are out of domain on both engines
    (a NULL window partition key is also DuckDB-nondeterministic);
    NULL n_chars sorts last (desc_nulls_last ↔ DESC NULLS LAST,
    explicitly — engine defaults differ).
    """
    cap = 10
    d = (
        tables.load(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select("source", "doc_id", "n_chars")
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("domain_docs"))
    with_n = d.join(F.broadcast(counts), "source")
    w = Window.partitionBy("source").orderBy(
        F.desc_nulls_last("n_chars"), F.asc("doc_id")
    )
    over = (
        with_n.where(F.col("domain_docs") > cap)
        .withColumn("kept_rank", F.row_number().over(w))
        .where(F.col("kept_rank") <= cap)
    )
    under = with_n.where(F.col("domain_docs") <= cap).withColumn(
        "kept_rank", F.row_number().over(w)
    )
    return over.unionByName(under).select(
        "source", "doc_id", "n_chars", "kept_rank", "domain_docs"
    )


@query(
    "llm_curation_pipeline",
    oracle="""
WITH dedup AS (
  SELECT doc_id, text, lang, source, n_chars,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
  WHERE text IS NOT NULL AND doc_id IS NOT NULL AND source IS NOT NULL
), feat AS (
  SELECT doc_id, lang, source, n_chars,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is', 'that')))
           AS n_stop,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                            x -> x <> ''))) AS DOUBLE)
           / greatest(len(list_filter(string_split(text, ' '),
                                      x -> x <> '')), 1) AS ttr
  FROM dedup WHERE rn = 1
), kept AS (
  SELECT doc_id, lang, source, n_chars, n_words,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC NULLS LAST, doc_id)
           AS kept_rank
  FROM feat WHERE n_words >= 30 AND n_stop >= 1 AND ttr > 0.3
)
SELECT doc_id, lang, source, n_chars, n_words, kept_rank,
       CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                      AS BIGINT) % 100 < 80 THEN 'train'
            WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                      AS BIGINT) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM kept WHERE kept_rank <= 12
""",
)
def llm_curation_pipeline(spark, sf_dir):
    """End-to-end curation COMPOSITION (VERDICT r13 item 5): exact
    dedup -> quality gate -> per-domain cap -> deterministic split, the
    four stages a training-data pipeline chains between crawl and
    tokenizer, composed in ONE dataflow so stage-contract mismatches
    (the thing the per-stage keys cannot catch) are under the value
    oracle. Output is the curated-corpus manifest: one row per
    surviving document with its cap rank and split assignment.

    Stage shapes, chosen so the composition adds NOTHING beyond the
    minimum two shuffles:

    1. exact dedup — row_number() = 1 over (md5(text), doc_id): ONE
       hash exchange on the content hash; the rank<=1 filter compiles
       to partial+final WindowGroupLimit (plan-pinned,
       tests/test_plans.py), so each map partition forwards one row
       per local content-hash group, and k exact copies cost k/p rows
       per partition, never a groupBy+self-join's second exchange.
    2. quality gate — Gopher-lite (word-count floor, stopword-hit
       floor, type-token-ratio floor) evaluated as codegen expressions
       DURING the same pass; no shuffle, and the gate runs BEFORE the
       cap window so dropped docs never enter the second exchange.
       The TTR boundary is exact cross-engine: both engines divide the
       same two small integers and compare the same nearest-double
       literal.
    3. domain cap — row_number() <= cap over (source; n_chars DESC
       NULLS LAST, doc_id): the second hash exchange. Unlike
       llm_domain_cap (which must keep ALL under-cap rows and so
       splits over/under around the broadcast count), here EVERY row
       is rank-filtered, so the plain declarative window IS the
       scalable form — WindowGroupLimit bounds a billion-row head
       domain to cap rows per map partition before the shuffle.
    4. split — llm_train_split's engine-independent md5-bucket 80/10/10
       as a pure projection on the survivors (membership a function of
       doc_id only: stable under re-runs and corpus growth).

    At 100 TB: two content/domain-keyed exchanges whose map outputs are
    WindowGroupLimit-bounded, everything else scan-local; the manifest
    (<= cap x |domains| rows) is the only thing downstream.
    """
    cap = 12
    d = tables.load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & F.col("doc_id").isNotNull()
        & F.col("source").isNotNull()
    )
    w_dedup = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    canon = (
        d.withColumn("_rn", F.row_number().over(w_dedup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    words = F.expr("filter(split(text, ' '), x -> x <> '')")
    n_words = F.size(words)
    n_stop = F.expr(
        "size(filter(split(text, ' '), x -> x IN"
        " ('the', 'and', 'of', 'to', 'a', 'in', 'is', 'that')))"
    )
    ttr = F.size(F.array_distinct(words)).cast("double") / F.greatest(
        n_words, F.lit(1)
    )
    kept = canon.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        n_words.alias("n_words"),
        n_stop.alias("n_stop"),
        ttr.alias("ttr"),
    ).where((F.col("n_words") >= 30) & (F.col("n_stop") >= 1) & (F.col("ttr") > 0.3))
    w_cap = Window.partitionBy("source").orderBy(
        F.desc_nulls_last("n_chars"), F.asc("doc_id")
    )
    capped = kept.withColumn("kept_rank", F.row_number().over(w_cap)).where(
        F.col("kept_rank") <= cap
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return capped.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "n_words",
        "kept_rank",
        split.alias("split"),
    )
