"""§2 M — Multimodal (binary-payload) column operators.

Design per the north star: image/audio/video payloads are opaque
``binary`` columns alongside typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. The media codec libraries are not present in this
environment, so the codec call itself is STUBBED behind
``decode_payload`` (deterministic fake features, clearly marked); the
Spark-side plumbing — binary schema, batch iteration, partition-parallel
UDF shape, metadata struct propagation — is real and tested.

At 100 TB: payloads dominate bytes, so the layout keeps binary in its own
column (parquet column pruning means metadata-only queries never read
payload pages), partitions are sized by ``maxPartitionBytes`` against the
payload column, and decode parallelism is per-Arrow-batch.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query

FEATURE_DIM = 8


def _decode_impl(payload: bytes, _dim: int = FEATURE_DIM) -> list[float]:
    # defined with only stdlib references so cloudpickle ships it by value
    import hashlib as _hl

    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    h = _hl.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in h[:_dim]]


def decode_payload(payload: bytes) -> list[float]:
    """STUB for the real media decoder (no codec libs in this env).

    Deterministic fake "feature vector": FEATURE_DIM floats derived from
    the payload's sha256 — stable across runs/partitions, so tests can
    assert exact values. A real deployment replaces ONLY this function
    (e.g. PIL/torchvision decode → embedding); the mapInPandas plumbing
    around it is production-shaped and unchanged.
    """
    return _decode_impl(payload)


@query(
    "mm_binary_pipeline",
    oracle="""
WITH dec AS MATERIALIZED (
  SELECT doc_id, lang, octet_length(encode(text)) AS n_bytes,
         round(CAST(('0x' || substring(sha256(text), 1, 2)) AS INT)
               / 255.0, 6) AS f0,
         round(CAST(('0x' || substring(sha256(text), 3, 2)) AS INT)
               / 255.0, 6) AS f1
  FROM documents WHERE text IS NOT NULL
)
SELECT lang, count(*) AS n_docs,
       round(CAST(sum(CAST(f0 AS DECIMAL(38,6))) AS DOUBLE)
             / count(f0), 6) AS avg_f0,
       round(CAST(sum(CAST(f1 AS DECIMAL(38,6))) AS DOUBLE)
             / count(f1), 6) AS avg_f1,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM dec GROUP BY lang
""",
)
def mm_binary_pipeline(spark, sf_dir):
    """Full multimodal pipeline over an opaque binary column:

    documents → synthesize payload (utf-8 bytes of text — stands in for
    an image blob) + typed metadata struct → mapInPandas batch "decode"
    (stubbed) → per-lang feature aggregation.

    Value-oracle (round 11, promoted from rows-only): the payload IS
    the text's UTF-8 bytes, and DuckDB's sha256(VARCHAR) hashes exactly
    those bytes — so the stubbed decode (sha256 digest bytes / 255,
    rounded 6; k/255 can never land on a 1e-6 rounding tie, so
    banker's-vs-away rounding cannot diverge) mirrors without any
    kernel semantics change. The per-lang feature means use the repo's
    exact-decimal davg discipline (plain F.avg would be partition-
    order-dependent)."""
    # Domain: rows with a payload. A NULL-text doc has nothing to
    # decode — a real pipeline routes it to quarantine rather than
    # letting it kill the decode stage (the stub's NotImplementedError
    # below stays as the executor-side invariant behind this filter).
    d = tables.load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )

    def decode_batches(batches):
        # the stub is re-defined inside the closure: executors' Python
        # workers may not have adlspark importable, so nothing here may be
        # pickled by module reference (must mirror _decode_impl)
        import hashlib as _hl

        def decode(payload):
            if payload is None:
                raise NotImplementedError("decode of NULL payload")
            return [
                round(b / 255.0, 6)
                for b in _hl.sha256(payload).digest()[:FEATURE_DIM]
            ]

        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": [m["lang"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "f0": [f[0] for f in feats],
                    "f1": [f[1] for f in feats],
                }
            )
            yield out

    decoded = d.mapInPandas(
        decode_batches, "doc_id long, lang string, n_bytes long, f0 double, f1 double"
    )
    from adlspark.ops.parity import davg

    return decoded.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("f0", 6).alias("avg_f0"),
        davg("f1", 6).alias("avg_f1"),
        F.sum("n_bytes").alias("total_bytes"),
    )


@query(
    "mm_metadata_pruned_scan",
    oracle="""
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""",
)
def mm_metadata_pruned_scan(spark, sf_dir):
    """Metadata-only query over a multimodal table: builds the
    binary+meta layout, then aggregates metadata only — column pruning
    means the payload column is never read (the property that makes
    metadata queries cheap on 100 TB of media)."""
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        "lang",
        F.col("n_chars").alias("n_chars"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def _frame_sample_oracle_sql(frame_bytes: int = 32, stride: int = 4) -> str:
    """Direct SQL form of the frame sampler (round-11 promotion). Frames
    are 2*frame_bytes-char slices of the UPPERCASE HEX encoding of the
    payload — pure ASCII, so VARCHAR substring is byte-exact on both
    engines and DuckDB's fast ASCII slicing applies (no per-row UTF-8
    scan; DuckDB 1.0 has no BLOB substring and its sha256 only takes
    VARCHAR, which fixed the stub feature's definition on the hex
    form). b0 = first byte of sha256(frame hex), the same content-
    derived stub as the kernel; the mean is an integer byte sum divided
    once at the end — exact, order-independent."""
    fw = 2 * frame_bytes  # hex chars per frame
    step = stride * fw  # hex offset between sampled frames
    return f"""WITH d AS MATERIALIZED (
  SELECT doc_id, upper(hex(encode(text))) AS hx
  FROM documents WHERE text IS NOT NULL
), f AS MATERIALIZED (
  SELECT doc_id, hx,
         CAST(ceil(length(hx) / {fw}.0) AS BIGINT) AS n_frames
  FROM d
), s AS MATERIALIZED (
  SELECT doc_id, j,
         CAST(('0x' || substring(
           sha256(substring(hx, CAST(j * {step} + 1 AS BIGINT), {fw})),
           1, 2)) AS INT) AS b0
  FROM f, unnest(generate_series(0, (n_frames - 1) // {stride})) t(j)
  WHERE n_frames > 0
), agg AS MATERIALIZED (
  SELECT doc_id,
         count(*) AS n_sampled,
         round(CAST(max(CASE WHEN j = 0 THEN b0 END) AS DOUBLE) / 255.0,
               6) AS f0_first,
         round(CAST(CAST(sum(b0) AS BIGINT) AS DOUBLE)
               / (255.0 * count(*)), 6) AS f0_mean
  FROM s GROUP BY doc_id
)
SELECT f.doc_id, f.n_frames,
       coalesce(a.n_sampled, 0) AS n_sampled,
       a.f0_first, a.f0_mean
FROM f LEFT JOIN agg a ON a.doc_id = f.doc_id"""


@query("mm_frame_sample", oracle=_frame_sample_oracle_sql())
def mm_frame_sample(spark, sf_dir):
    """Frame sampling over a "video" payload — the 1-row → N-frames batch
    shape (the other multimodal UDF signatures are 1→1): the payload is
    chunked into fixed-size frames (stands in for demuxed video frames),
    every STRIDE-th frame is kept, and each sampled frame gets the
    stubbed per-frame feature. Output stays per-document (frame counts +
    feature summary), so result size is bounded by the input row count
    even when payloads are huge — at 100 TB the frame explosion happens
    inside the Arrow batch and aggregates before it ever hits a shuffle.
    Sampling is deterministic (fixed stride, content-derived features):
    re-runs and re-partitions produce identical results.

    Value-oracle (round 11, promoted from rows-only): frames are
    defined on the uppercase-hex payload encoding (pure ASCII — the
    representation both engines can slice and hash identically;
    2*frame_bytes hex chars = frame_bytes payload bytes, so frame
    counts are unchanged) and the stub feature is the first byte of
    sha256(frame hex). The mean divides an exact integer byte sum once
    at the end, mirroring _frame_sample_oracle_sql term by term."""
    frame_bytes, stride = 32, 4
    fw = 2 * frame_bytes
    # Domain: payload-bearing rows only (see mm_binary_pipeline) —
    # a NULL payload has no frames and would kill the sampler.
    d = tables.load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def sample_batches(batches):
        import hashlib as _hl
        import math as _math

        def _round_away(x: float, nd: int = 6) -> float:
            # DuckDB round(DOUBLE, n) is ties-away-from-zero; Python
            # round() is banker's (same scalar trick as
            # vector.np_round_half_away / llm_mmr_diverse_sample)
            s = x * (10.0 ** nd)
            return _math.copysign(_math.floor(abs(s) + 0.5), s) / (10.0 ** nd)

        for pdf in batches:
            doc_ids, n_frames, n_sampled, f_first, f_mean = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hx = bytes(payload).hex().upper()
                frames = [hx[i : i + fw] for i in range(0, len(hx), fw)]
                sampled = frames[::stride]
                b0s = [
                    _hl.sha256(fr.encode("ascii")).digest()[0]
                    for fr in sampled
                ]
                doc_ids.append(doc_id)
                n_frames.append(len(frames))
                n_sampled.append(len(sampled))
                f_first.append(
                    _round_away(b0s[0] / 255.0) if b0s else None
                )
                f_mean.append(
                    _round_away(sum(b0s) / (255.0 * len(b0s)))
                    if b0s
                    else None
                )
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "n_frames": n_frames,
                    "n_sampled": n_sampled,
                    "f0_first": f_first,
                    "f0_mean": f_mean,
                }
            )

    return d.mapInPandas(
        sample_batches,
        "doc_id long, n_frames long, n_sampled long, f0_first double, f0_mean double",
    )


@query(
    "mm_phash_dedup",
    oracle="""
WITH h AS (
  SELECT doc_id,
         CAST('0x' || substring(sha256(substring(text, 1, 128)), 1, 4)
              AS BIGINT) AS phash
  FROM documents
)
SELECT doc_id, phash,
       min(doc_id) OVER (PARTITION BY phash) AS canonical_id,
       doc_id = min(doc_id) OVER (PARTITION BY phash) AS is_canonical,
       count(*) OVER (PARTITION BY phash) AS cluster_size
FROM h
""",
)
def mm_phash_dedup(spark, sf_dir):
    """Perceptual-hash-style dedup over an opaque BINARY media column —
    the media rung of the dedup ladder (image/audio near-dup via compact
    content hashes, pHash/aHash in production).

    The payload is the document's bytes standing in for a media blob
    (same synthesis as mm_binary_pipeline); the DECODE+HASH step is the
    honestly-stubbed part — a real deployment swaps the sha256-of-header
    for a DCT pHash over decoded pixels — while everything around it is
    production-shaped: binary column kept in its own parquet pages,
    ``mapInPandas`` batch decode emitting a 16-bit code per payload, one
    hash-shuffle window for canonical pick. Because the stub hashes the
    payload's first 128 bytes, truncation/prefix duplicates land in one
    bucket (the media analogue of llm_prefix_dedup), and the sha256 stub
    is reproducible in SQL — so unlike the other mm keys this one carries
    a full value oracle across the Python decode path.

    Scale shape: decode is Arrow-batched narrow work; the only shuffle is
    the 16-bit-bucket window — bucket count is bounded by the code space,
    the same property llm_semantic_dedup leans on.
    """
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def hash_batches(batches):
        import hashlib as _hl

        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            # First 128 CHARACTERS (not bytes): the oracle's
            # substring(text,1,128) is character-based, and the two only
            # coincide while fixtures stay ASCII-prefixed.
            # NULL payload -> NULL phash (bytes(None) raises); both
            # engines then group the NULL-phash rows into one window
            # partition, matching the oracle's PARTITION BY on NULL
            out["phash"] = [
                None
                if p is None
                else int(
                    _hl.sha256(
                        bytes(p).decode("utf-8")[:128].encode("utf-8")
                    ).hexdigest()[:4],
                    16,
                )
                for p in pdf["payload"]
            ]
            yield out

    coded = d.mapInPandas(hash_batches, "doc_id long, phash long")
    w = Window.partitionBy("phash")
    canonical = F.min("doc_id").over(w)
    return coded.select(
        "doc_id",
        "phash",
        canonical.alias("canonical_id"),
        (F.col("doc_id") == canonical).alias("is_canonical"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
