"""Null/NaN-key robustness gates for the pair kernels (round-7 review).

The standard fixtures are null-free (tests/test_fixture_invariants.py
pins that), so the SQL-null semantics of the quotient kernels were
unverified: Spark ``groupBy`` treats NULL keys as EQUAL while every
equi-join — the unquotiented kernels and all the DuckDB oracles — drops
NULL-keyed rows, and Spark orders NaN ABOVE every numeric so a
``sq_norm > 0`` guard alone admits NaN embeddings. Before the fixes,
two null-text documents formed one identity group and the expansion
invented distance-0 / jaccard-1.0 / same-component answers no reference
emits; two NaN-embedding rows emitted a sim-1.0 within pair.

These tests build corpora that CONTAIN such rows and re-run the exact
driver compare (hash parity vs the DuckDB oracle), so the null paths
stay load-bearing. The shingle family turned out to AGREE on NULL text
(both engines' concat_ws swallows NULLs into the [''] shingle set —
probed empirically, round-7 continuation), so those keys are pinned on
the null-text corpus too. The third corpus covers EMPTY and SHORT
texts: Spark's ``sequence(1, 0)`` is descending [1, 0] where DuckDB's
generate_series is empty, which invented phantom windows/chars in
llm_substring_dedup and llm_entropy_filter until guarded.

The fourth corpus (round 8) is UNICODE/multibyte text: astral-plane
emoji, spaceless CJK, NFC-vs-NFD combining marks, RTL Arabic, and an
identical-emoji-text pair. Result: 63/63 oracle keys agree ×3 runs
with ZERO kernel changes needed — Spark's UTF8String and DuckDB's
UTF-8 strings both count codepoints for length/substring and hash
UTF-8 bytes for md5, so the whole text surface is multibyte-safe
as-built. The gates stay so a future kernel using byte-length or
UTF-16 offsets (e.g. a Java-String-indexing UDF) fails loudly.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles, all_queries

SLICE = 60  # base rows kept (oracle cost control)


def _corpus(tmp_path_factory, sf_dir, name, mutate_documents=None,
            mutate_embeddings_tbl=None):
    d = tmp_path_factory.mktemp(name)
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "documents" and mutate_documents is not None:
            df = tbl.to_pandas()
            df = df[df["doc_id"] < SLICE].reset_index(drop=True)
            df = mutate_documents(df)
            tbl = pa.Table.from_pandas(
                df, schema=tbl.schema, preserve_index=False
            )
        if t == "embeddings" and mutate_embeddings_tbl is not None:
            # arrow-level mutation: pandas round-trips silently convert
            # NaN list elements to NULL (this fixture originally shipped
            # a NaN-free "NaN corpus" that way — reviewer-caught)
            tbl = mutate_embeddings_tbl(tbl)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_text_dir(tmp_path_factory, sf_dir):
    """Three NULL-text docs sharing a lang, two sharing another: a merged
    null identity group would emit pairs / a 3-member component."""

    def mut(df):
        extra = pd.DataFrame(
            {
                "doc_id": [900001, 900002, 900003, 900011, 900012],
                "text": [None] * 5,
                "lang": ["en", "en", "en", "de", "de"],
                "source": ["nulltest"] * 5,
                "n_chars": [0] * 5,
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "nulltext", mutate_documents=mut)


@pytest.fixture(scope="module")
def null_lang_dir(tmp_path_factory, sf_dir):
    """Pairs of IDENTICAL-text docs with NULL lang: identical token/
    shingle sets, so only the NULL lang key separates them — the exact
    case where groupBy-null-equality diverges from join semantics."""

    def mut(df):
        t0 = df.loc[0, "text"]
        extra = pd.DataFrame(
            {
                "doc_id": [910001, 910002, 910003],
                "text": [t0, t0, "unique null-lang text " * 3],
                "lang": [None, None, None],
                "source": ["nulltest"] * 3,
                "n_chars": [len(t0), len(t0), 66],
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "nulllang", mutate_documents=mut)


@pytest.fixture(scope="module")
def nan_embed_dir(tmp_path_factory, sf_dir):
    """Two identical TRUE-NaN-element embeddings and two identical
    zero-norm embeddings: with `NaN > 0` TRUE in Spark SQL (and
    `NaN >= 0.4` TRUE in DuckDB), an unguarded within-group expansion
    or an unguarded oracle WHERE emits pairs the IEEE reading never
    does. Built at the arrow level so the NaN survives the parquet
    write; the test asserts its presence."""

    def mut_tbl(tbl):
        import pyarrow.compute as pc

        base = tbl.filter(pc.less(tbl["vec_id"], SLICE)).replace_schema_metadata(
            None
        )
        dim = len(base["embedding"][0])
        nan_vec = [float("nan")] + [0.0] * (dim - 1)
        zero_vec = [0.0] * dim
        sch = base.schema
        extra = pa.table(
            {
                "vec_id": pa.array(
                    [920001, 920002, 920011, 920012], sch.field("vec_id").type
                ),
                "embedding": pa.array(
                    [nan_vec, nan_vec, zero_vec, zero_vec],
                    sch.field("embedding").type,
                ),
                "label": pa.array([0, 0, 1, 1], sch.field("label").type),
            }
        ).select(base.column_names)
        return pa.concat_tables([base, extra.cast(sch)])

    return _corpus(
        tmp_path_factory, sf_dir, "nanembed", mutate_embeddings_tbl=mut_tbl
    )


@pytest.fixture(scope="module")
def unicode_text_dir(tmp_path_factory, sf_dir):
    """Multibyte / non-ASCII texts (round 8 — the last unswept document
    input class): Spark strings are UTF8String (length/substring count
    CODEPOINTS) while DuckDB strings are UTF-8 (length/substring also
    codepoints) — these gates prove the agreement holds across the
    whole oracle surface for astral-plane emoji (4-byte UTF-8,
    surrogate pairs in UTF-16), CJK with NO spaces (one giant token),
    combining diacritics (NFC and NFD spellings are DIFFERENT byte
    sequences — neither engine normalizes), RTL Arabic, and an
    emoji-only doc. Two docs carry IDENTICAL emoji text in one lang so
    the pair/identity-group kernels expand a unicode group; md5 runs
    over UTF-8 bytes on both engines so hash keys stay comparable."""

    def mut(df):
        import unicodedata

        nfc = unicodedata.normalize("NFC", "caf\u00e9 r\u00e9sum\u00e9 na\u00efve d\u00e9j\u00e0 vu")
        nfd = unicodedata.normalize("NFD", nfc)
        assert nfc != nfd and len(nfd) > len(nfc)  # combining marks real
        texts = [
            "😀🜁🀄 astral plane 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 tokens 🚀 mixed with ascii",
            "😀🜁🀄 astral plane 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 tokens 🚀 mixed with ascii",
            "漢字テキストにスペースがないので全体がひとつのトークンになります",
            nfc,
            nfd,
            "النص العربي يُكتب من اليمين إلى اليسار مع تشكيل",
            "😀😁😂🤣😃😄😅😆😉😊",
        ]
        extra = pd.DataFrame(
            {
                "doc_id": [930001, 930002, 930003, 930004, 930005,
                           930006, 930007],
                "text": texts,
                "lang": ["en", "en", "ja", "fr", "fr", "ar", "en"],
                "source": ["unicodetest"] * 7,
                "n_chars": [len(t) for t in texts],
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(
        tmp_path_factory, sf_dir, "unicodetext", mutate_documents=mut
    )


@pytest.fixture(scope="module")
def empty_docs_embed_dir(tmp_path_factory, sf_dir):
    """ZERO-ROW documents AND embeddings (round 9): the empty-partition
    shape for the whole llm family — dedup/minhash with no shingles,
    tfidf with df=0 denominators, similarity with no vectors, splits
    and mixtures over nothing. Schema survives in the 0-row parquet
    footers, so schema-on-read and vector-dim probes still resolve."""
    return _corpus(
        tmp_path_factory,
        sf_dir,
        "emptydocsembed",
        mutate_documents=lambda df: df.iloc[:0],
        mutate_embeddings_tbl=lambda tbl: tbl.slice(0, 0),
    )


def _ddb(corpus_dir):
    con = duckdb.connect()
    for t in adl_tables.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{corpus_dir}/{t}.parquet')"
        )
    return con


# The FULL document-reading oracle surface, derived from the registry
# (round-7: the static subsets silently exempted new keys AND the
# keys outside them — llm_top_terms etc. had never seen a NULL lang).
# Historic finds pinned by these corpora: NULL-text singleton identity
# groups, the shingle-[''] agreement, the sequence(1,0) descending
# trap (substring_dedup / entropy_filter), NULL-text fingerprints,
# NULL-payload phash, and the empty-vs-null quality-margin split.
def _document_oracle_keys():
    import inspect

    qs, os_ = all_queries(), all_oracles()
    out = []
    for k, fn in qs.items():
        if k not in os_:
            continue
        try:
            src = inspect.getsource(fn)
        except Exception:
            src = ""
        if "documents" in (src + " " + os_[k]):
            out.append(k)
    return out


DOC_ORACLE_KEYS = _document_oracle_keys()
NULL_TEXT_KEYS = DOC_ORACLE_KEYS
NULL_LANG_KEYS = DOC_ORACLE_KEYS
UNICODE_TEXT_KEYS = DOC_ORACLE_KEYS


def _doc_or_embed_oracle_keys():
    """documents OR embeddings readers — the empty corpus zeroes both."""
    import inspect

    qs, os_ = all_queries(), all_oracles()
    out = []
    for k, fn in qs.items():
        if k not in os_:
            continue
        try:
            src = inspect.getsource(fn)
        except Exception:
            src = ""
        blob = src + " " + os_[k]
        if "documents" in blob or "embeddings" in blob:
            out.append(k)
    return out


EMPTY_DOC_EMBED_KEYS = _doc_or_embed_oracle_keys()


@pytest.mark.parametrize("key", UNICODE_TEXT_KEYS)
def test_unicode_text_parity(spark, unicode_text_dir, key):
    from adlspark.testing import compare

    con = _ddb(unicode_text_dir)
    try:
        df = all_queries()[key](spark, unicode_text_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def test_document_surface_is_stable():
    assert len(DOC_ORACLE_KEYS) >= 63, len(DOC_ORACLE_KEYS)


@pytest.mark.parametrize("key", NULL_TEXT_KEYS)
def test_null_text_parity(spark, null_text_dir, key):
    from adlspark.testing import compare

    con = _ddb(null_text_dir)
    try:
        df = all_queries()[key](spark, null_text_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", NULL_LANG_KEYS)
def test_null_lang_parity(spark, null_lang_dir, key):
    from adlspark.testing import compare

    con = _ddb(null_lang_dir)
    try:
        df = all_queries()[key](spark, null_lang_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", EMPTY_DOC_EMBED_KEYS)
def test_empty_docs_embed_parity(spark, empty_docs_embed_dir, key):
    from adlspark.testing import compare

    con = _ddb(empty_docs_embed_dir)
    try:
        df = all_queries()[key](spark, empty_docs_embed_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def test_nan_zero_norm_embedding_parity(spark, nan_embed_dir):
    from adlspark.testing import compare

    # the corpus must actually CONTAIN a NaN — a pandas round-trip
    # silently degrades NaN list elements to NULL, which exercises the
    # null path instead of the NaN ordering trap under test
    flat = (
        pq.read_table(
            f"{nan_embed_dir}/embeddings.parquet", columns=["embedding"]
        )
        .column("embedding")
        .combine_chunks()
        .flatten()
    )
    vals = flat.to_numpy(zero_copy_only=False)
    assert np.isnan(vals).sum() == 2, "fixture lost its NaN elements"
    assert flat.null_count == 0

    con = _ddb(nan_embed_dir)
    try:
        df = all_queries()["llm_sim_threshold_join"](spark, nan_embed_dir)
        compare(
            df, con, all_oracles()["llm_sim_threshold_join"],
            key="llm_sim_threshold_join",
        )
    finally:
        con.close()


@pytest.fixture(scope="module")
def edge_text_dir(tmp_path_factory, sf_dir):
    """EMPTY and SHORT texts — the other fixture blind spot: Spark's
    ``sequence(1, 0)`` is DESCENDING [1, 0] while DuckDB's
    generate_series(1, 0) is empty, so an unguarded window/char builder
    emits phantom rows for docs below its window size (llm_substring_
    dedup: ≤7 tokens; llm_entropy_filter: empty text). Identical-pair
    copies make the phantom rows count as duplicates, the loudest
    divergence."""

    def mut(df):
        extra = pd.DataFrame(
            {
                "doc_id": [930001, 930002, 930011, 930012, 930021, 930022],
                "text": ["", "", "just three tokens", "just three tokens",
                         "exactly eight tokens are in this very text",
                         "exactly eight tokens are in this very text"],
                "lang": ["en"] * 6,
                "source": ["edgetest"] * 6,
                "n_chars": [0, 0, 17, 17, 42, 42],
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "edgetext", mutate_documents=mut)


# Full document surface here too (historic finds: the sequence(1,0)
# descending trap, DuckDB list_sum([])=NULL vs Spark's seeded 0).
EDGE_TEXT_KEYS = DOC_ORACLE_KEYS


@pytest.mark.parametrize("key", EDGE_TEXT_KEYS)
def test_edge_text_parity(spark, edge_text_dir, key):
    from adlspark.testing import compare

    con = _ddb(edge_text_dir)
    try:
        df = all_queries()[key](spark, edge_text_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def test_null_docs_are_singleton_components(spark, null_text_dir):
    """Direct statement of the semantic: null-text docs each form their
    own component of size 1 (no invented identity clique)."""
    rows = all_queries()["llm_dedup_cluster"](spark, null_text_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    for did in (900001, 900002, 900003, 900011, 900012):
        assert by_id[did].component == did
        assert by_id[did].component_size == 1


@pytest.fixture(scope="module")
def giant_doc_dir(tmp_path_factory, sf_dir):
    """GIANT documents (round 10) — the pathological-document reality of
    a web-scale corpus that no prior class covered: a ~2 MB normal-ish
    text (cycling 48-word vocabulary, so shingle/token kernels see real
    volume per row, ~400k tokens), a ~1 MB SINGLE TOKEN (no whitespace
    at all — tokenizers must yield one megatoken, not choke; length
    stats must not overflow INT ranges), a punctuation/newline-heavy
    quarter-MB text, and a normal sentence carrying one embedded 200 KB
    megatoken. Seams under test: per-row explode volume (token/shingle
    kernels produce O(doc length) rows from ONE input row — partition
    sizing must tolerate row-count amplification), Arrow transfer of
    multi-MB string cells through pandas-UDF paths, regex engines over
    megabyte subjects, and length-bucket blocking keys built from
    n_chars at magnitudes the fixtures never reach."""

    def mut(df):
        words = [f"w{i:02d}" for i in range(48)]
        big = " ".join(words[i % 48] for i in range(400_000))  # ~2.0 MB
        megatoken = "x" * 1_000_000
        punct = ("line one!\nline, two; three?\n\t" * 9_000)  # ~0.25 MB
        embedded = "start " + "y" * 200_000 + " end"
        texts = [big, megatoken, punct, embedded]
        extra = pd.DataFrame(
            {
                "doc_id": [920001, 920002, 920003, 920004],
                "text": texts,
                "lang": ["en", "en", "en", "en"],
                "source": ["giant"] * 4,
                "n_chars": [len(t) for t in texts],
            }
        )
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "giantdoc", mutate_documents=mut)


@pytest.mark.parametrize("key", DOC_ORACLE_KEYS)
def test_giant_doc_parity(spark, giant_doc_dir, key):
    from adlspark.testing import compare

    con = _ddb(giant_doc_dir)
    try:
        df = all_queries()[key](spark, giant_doc_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()
