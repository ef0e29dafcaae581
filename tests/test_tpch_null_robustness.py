"""NULL measure/date/dim robustness gates for the TPC-H-table keys
(round-7 wave 6 — completes the hostile-corpus program:
documents → tests/test_null_robustness.py, events →
test_event_null_robustness.py, embeddings → test_embed_robustness.py).

Primary/foreign keys stay NOT NULL (the TPC-H schema contract); the
corpus nulls the dates, measures, flags, and dim attributes instead.
Failure classes found and fixed:

- DuckDB 1.0's window sort is nondeterministic over NULL
  partition/order keys (see test_event_null_robustness.py), so every
  window oracle over a nullable TPC-H column carries raw-column
  sentinels (custkey -1, chr(1), 1900 timestamps, -infinity / -1e15
  for measures) matching Spark's null placement (ASC NULLS FIRST,
  DESC NULLS LAST).
- Single-row / zero-variance groups crashed ANSI Spark where DuckDB's
  /0 is NULL: agg_stats and agg_skew_kurt now use try_divide (a NULL
  l_returnflag forms its own 1-row group with no sample variance).
- Date extremes (round 8): the z-order day scale
  ((day_off - lo_d) * 65535) overflowed 32-bit ANSI Spark once the
  o_orderdate range exceeded ~32k days (pre-epoch/far-future rows) —
  a worker crash, i.e. a driver ERROR verdict — while DuckDB silently
  auto-promotes the same expression. lake_zorder_layout now widens to
  BIGINT first; the extreme-date corpus below keeps the whole
  orders/lineitem surface load-bearing across calendar seams (92/92
  agree x3 post-fix, no other kernel needed changes).
- NULL dim attributes (round 8, part/supplier corpus): DuckDB's
  concat() IGNORES NULL args where Spark's concat propagates — the
  fn_string oracle now uses the null-propagating || operator; and the
  ingest_csv_malformed fixture-writer wrote repr(None)='None' for a
  NULL acctbal, wrongly classing the row malformed (empty field now).
- A row-Python UDF receives None for SQL NULL and unguarded
  arithmetic kills the worker: udf_python is NULL-in-NULL-out on both
  engines.

Each test re-runs the exact driver compare (hash parity vs DuckDB) on
the hostile corpus.
"""

from __future__ import annotations

import inspect
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles, all_queries


@pytest.fixture(scope="module")
def null_tpch_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("nulltpch")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "orders":
            df = tbl.to_pandas()
            base = df.iloc[:6].copy()
            mk = int(df["o_orderkey"].max())
            base["o_orderkey"] = [mk + i + 1 for i in range(6)]
            base.loc[base.index[0], "o_orderdate"] = None
            base.loc[base.index[1], "o_orderdate"] = None
            base.loc[base.index[1], "o_totalprice"] = None
            base.loc[base.index[2], "o_totalprice"] = None
            base.loc[base.index[3], "o_orderpriority"] = None
            base.loc[base.index[4], "o_custkey"] = None
            base.loc[base.index[5], "o_orderstatus"] = None
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        if t == "lineitem":
            df = tbl.to_pandas()
            base = df.iloc[:6].copy()
            mk = int(df["l_orderkey"].max())
            base["l_orderkey"] = [mk + i + 1 for i in range(6)]
            base.loc[base.index[0], "l_shipdate"] = None
            base.loc[base.index[1], "l_discount"] = None
            base.loc[base.index[2], "l_quantity"] = None
            base.loc[base.index[3], "l_returnflag"] = None
            base.loc[base.index[4], "l_extendedprice"] = None
            base.loc[base.index[5], "l_tax"] = None
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        if t == "customer":
            df = tbl.to_pandas()
            base = df.iloc[:3].copy()
            mk = int(df["c_custkey"].max())
            base["c_custkey"] = [mk + i + 1 for i in range(3)]
            base.loc[base.index[0], "c_acctbal"] = None
            base.loc[base.index[1], "c_mktsegment"] = None
            base.loc[base.index[2], "c_nationkey"] = None
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def extreme_date_tpch_dir(tmp_path_factory, sf_dir):
    """Date extremes for the orders/lineitem calendar seams (round 8,
    the TPC-H twin of the events extreme-ts corpus): pre-epoch order
    and ship dates (negative unix µs), the epoch boundary, a leap day,
    and far-future — proving date_trunc / dayofweek(+1 convention) /
    date arithmetic agree off the fixtures' generated range. 1900-01-01
    is excluded (oracle null-date sentinel)."""
    import pandas as _pd

    dates = [
        _pd.Timestamp("1901-06-15"),
        _pd.Timestamp("1969-12-31"),
        _pd.Timestamp("1970-01-01"),
        _pd.Timestamp("2024-02-29"),
        _pd.Timestamp("2100-01-01"),
    ]
    d = tmp_path_factory.mktemp("extremedatetpch")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "orders":
            df = tbl.to_pandas()
            base = df.iloc[: len(dates)].copy()
            mk = int(df["o_orderkey"].max())
            base["o_orderkey"] = [mk + i + 1 for i in range(len(dates))]
            base["o_orderdate"] = dates
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        if t == "lineitem":
            df = tbl.to_pandas()
            base = df.iloc[: len(dates)].copy()
            mk = int(df["l_orderkey"].max())
            base["l_orderkey"] = [mk + i + 1 for i in range(len(dates))]
            base["l_shipdate"] = dates
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_dim_dir(tmp_path_factory, sf_dir):
    """NULL attributes in the DIMENSION tables (part/supplier — the
    last tables without a null sweep; round 8). Primary keys stay NOT
    NULL per the schema contract; names, brands, types, sizes, prices,
    balances, and the supplier→nation FK go null. Exercises: string/
    regex functions over NULL names, set ops with NULL members (SQL
    set semantics treat NULLs as equal on BOTH engines, unlike joins),
    star joins with a NULL FK (row drops out on both), and grouping/
    pivot over NULL dim attributes."""
    d = tmp_path_factory.mktemp("nulldim")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "part":
            df = tbl.to_pandas()
            base = df.iloc[:5].copy()
            mk = int(df["p_partkey"].max())
            base["p_partkey"] = [mk + i + 1 for i in range(5)]
            base.loc[base.index[0], "p_name"] = None
            base.loc[base.index[1], "p_brand"] = None
            base.loc[base.index[2], "p_type"] = None
            base.loc[base.index[3], "p_size"] = None
            base.loc[base.index[4], "p_retailprice"] = None
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        if t == "supplier":
            df = tbl.to_pandas()
            base = df.iloc[:3].copy()
            mk = int(df["s_suppkey"].max())
            base["s_suppkey"] = [mk + i + 1 for i in range(3)]
            base.loc[base.index[0], "s_name"] = None
            base.loc[base.index[1], "s_acctbal"] = None
            base.loc[base.index[2], "s_nationkey"] = None
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def _dim_oracle_keys():
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
        if '"part"' in blob or '"supplier"' in blob or "FROM part" in blob \
                or "FROM supplier" in blob:
            out.append(k)
    return out


DIM_ORACLE_KEYS = _dim_oracle_keys()


@pytest.mark.parametrize("key", DIM_ORACLE_KEYS)
def test_null_dim_parity(spark, null_dim_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{null_dim_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, null_dim_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.fixture(scope="module")
def null_tiny_dim_dir(tmp_path_factory, sf_dir):
    """NULL attributes in the TINY dims (nation/region — the final
    tables of the null-sweep program; every table now has one). Keys
    stay NOT NULL; one nation gets a NULL name, one a NULL region FK
    (drops out of star joins on both engines), one region a NULL name.
    The interesting seam: a ROLLUP/GROUPING SETS subtotal row and a
    genuinely-NULL group label both render as NULL name — both engines
    must emit the same multiset (agg_grouping_flags separates them via
    GROUPING())."""
    d = tmp_path_factory.mktemp("nulltinydim")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "nation":
            df = tbl.to_pandas()
            base = df.iloc[:2].copy()
            mk = int(df["n_nationkey"].max())
            base["n_nationkey"] = [mk + 1, mk + 2]
            base.loc[base.index[0], "n_name"] = None
            base["n_regionkey"] = base["n_regionkey"].astype("object")
            base.loc[base.index[1], "n_regionkey"] = None
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        if t == "region":
            df = tbl.to_pandas()
            base = df.iloc[:1].copy()
            mk = int(df["r_regionkey"].max())
            base["r_regionkey"] = [mk + 1]
            base.loc[base.index[0], "r_name"] = None
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def _tiny_dim_oracle_keys():
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
        if '"nation"' in blob or '"region"' in blob or "FROM nation" in blob \
                or "FROM region" in blob:
            out.append(k)
    return out


TINY_DIM_ORACLE_KEYS = _tiny_dim_oracle_keys()


@pytest.mark.parametrize("key", TINY_DIM_ORACLE_KEYS)
def test_null_tiny_dim_parity(spark, null_tiny_dim_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{null_tiny_dim_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, null_tiny_dim_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def _tpch_oracle_keys():
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
        if any(t in blob for t in ("orders", "lineitem", "customer")):
            out.append(k)
    return out


TPCH_ORACLE_KEYS = _tpch_oracle_keys()


@pytest.mark.parametrize("key", TPCH_ORACLE_KEYS)
def test_null_tpch_parity(spark, null_tpch_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS"
                f" SELECT * FROM read_parquet('{null_tpch_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, null_tpch_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", TPCH_ORACLE_KEYS)
def test_extreme_date_tpch_parity(spark, extreme_date_tpch_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{extreme_date_tpch_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, extreme_date_tpch_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.fixture(scope="module")
def empty_tpch_dir(tmp_path_factory, sf_dir):
    """ZERO-ROW orders + lineitem + customer (round 9): the TPC-H side
    of the empty-partition corpus class. Dimensions (nation/region/
    part/supplier) stay intact — an empty DIM with an empty FACT is a
    different, rarer failure; the common lake shape is a fact partition
    with no rows against fully-populated dims."""
    d = tmp_path_factory.mktemp("emptytpch")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t in ("orders", "lineitem", "customer"):
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("key", TPCH_ORACLE_KEYS)
def test_empty_tpch_parity(spark, empty_tpch_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS"
                f" SELECT * FROM read_parquet('{empty_tpch_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, empty_tpch_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def _tpch_rows_only_keys():
    qs, os_ = all_queries(), all_oracles()
    out = []
    for k, fn in qs.items():
        if k in os_:
            continue
        try:
            src = inspect.getsource(fn)
        except Exception:
            src = ""
        if any(t in src for t in ("orders", "lineitem", "customer")):
            out.append(k)
    return out


TPCH_ROWS_ONLY_KEYS = _tpch_rows_only_keys()


@pytest.mark.parametrize("key", TPCH_ROWS_ONLY_KEYS)
def test_empty_tpch_rows_only_no_crash(spark, empty_tpch_dir, key):
    n = all_queries()[key](spark, empty_tpch_dir).count()
    assert n >= 0


@pytest.fixture(scope="module")
def empty_dims_dir(tmp_path_factory, sf_dir):
    """ZERO-ROW dimensions (nation/region/part/supplier) against
    populated facts — the inverse of empty_tpch_dir. Inner joins to an
    empty dim drop everything (trivially agreed), but the interesting
    seams are driver-side: pivot-value discovery over an empty distinct
    scan, broadcast of an empty build side, dim-derived literals."""
    d = tmp_path_factory.mktemp("emptydims")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t in ("nation", "region", "part", "supplier"):
            tbl = tbl.slice(0, 0)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def _dim_reading_oracle_keys():
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
        if any(t in blob for t in ("nation", "region", '"part"', "supplier")):
            out.append(k)
    return out


DIM_READING_ORACLE_KEYS = _dim_reading_oracle_keys()


@pytest.mark.parametrize("key", DIM_READING_ORACLE_KEYS)
def test_empty_dims_parity(spark, empty_dims_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS"
                f" SELECT * FROM read_parquet('{empty_dims_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, empty_dims_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def test_sweep_surface_is_stable():
    """The parametrized key list is derived from the registry; if it
    ever shrinks below the wave-6 surface, keys silently left the
    gate."""
    assert len(TPCH_ORACLE_KEYS) >= 92, len(TPCH_ORACLE_KEYS)


@pytest.fixture(scope="module")
def hostile_csv_dir(tmp_path_factory, sf_dir):
    """Supplier names containing embedded newlines, commas, doubled
    quotes, tabs, and semicolons (round 8) — the CSV-quoting seams.
    Finds fixed by this corpus: the sink_csv_roundtrip reader needed
    multiLine=true (Spark's writer quotes embedded newlines but the
    default reader splits records on every newline), and the
    ingest_csv_malformed reader needed escape='"' to parse the Python
    csv module's RFC 4180 doubled-quote output (Spark's default escape
    is backslash)."""
    d = tmp_path_factory.mktemp("hostilecsv")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "supplier":
            df = tbl.to_pandas()
            base = df.iloc[:3].copy()
            mk = int(df["s_suppkey"].max())
            base["s_suppkey"] = [mk + 1, mk + 2, mk + 3]
            base.loc[base.index[0], "s_name"] = "line one\nline two"
            base.loc[base.index[1], "s_name"] = 'comma, and "quotes" here'
            base.loc[base.index[2], "s_name"] = "tab\there;semicolon"
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


CSV_KEYS = ["sink_csv_roundtrip", "ingest_csv_header", "ingest_csv_malformed"]


@pytest.fixture(scope="module")
def giant_supplier_dir(tmp_path_factory, sf_dir):
    """GIANT CSV fields (round 11, VERDICT item 3): ~10 MB supplier
    names through both CSV paths — ingest_csv_malformed's one-record-
    per-line quarantine layout (the giant field must stay on its line:
    embedded newlines are atomized by the writer and mirrored by the
    oracle) and sink_csv_roundtrip's Spark-written quoted CSV under the
    multiLine reader (the 10 MB quoted field spans real newlines; record
    resync must not split it, or per-nation counts diverge). Supplier
    keys are chosen mod 7 so one giant-name row rides the QUARANTINE
    path (700003 % 7 == 3 — the mangled line replaces the name) and two
    ride the clean path. Spark 4's univocity config parses unbounded
    fields (probed: a 17 MB quoted field with doubled quotes parses
    exactly); this corpus pins that domain."""
    d = tmp_path_factory.mktemp("giantsupplier")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "supplier":
            df = tbl.to_pandas()
            base = df.iloc[:3].copy()
            chunk = 'comma, "quote" then\na newline and \\backslash; '
            base["s_suppkey"] = [700001, 700002, 700003]
            base.loc[base.index[0], "s_name"] = chunk * 220_000  # ~10 MB
            base.loc[base.index[1], "s_name"] = (
                '"' + "y," * 3_000_000 + '"'  # ~6 MB, quote-delimited text
            )
            base.loc[base.index[2], "s_name"] = chunk * 200_000  # quarantined
            df = pd.concat([df, base], ignore_index=True)
            tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                       preserve_index=False)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "key", ["sink_csv_roundtrip", "ingest_csv_malformed"]
)
def test_giant_csv_field_parity(spark, giant_supplier_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{giant_supplier_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, giant_supplier_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", CSV_KEYS)
def test_hostile_csv_parity(spark, hostile_csv_dir, key):
    from adlspark.testing import compare

    con = duckdb.connect()
    try:
        for t in adl_tables.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{hostile_csv_dir}/{t}.parquet')"
            )
        df = all_queries()[key](spark, hostile_csv_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()
