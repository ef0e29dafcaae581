"""Null/tie robustness gates for the EVENTS-reading keys (round-7
wave 4 — the events twin of tests/test_null_robustness.py's document
corpora).

The standard fixtures carry no NULL user_id / ts / value / event_type
/ props and no duplicate timestamps, so none of the following seams
were load-bearing until this sweep built corpora that contain them:

- Spark's F.window / session_window silently DROP null-ts rows where
  DuckDB's date_trunc(NULL) keeps a NULL bucket (ts_tumbling /
  ts_sliding / ts_session pin the drop as the documented domain).
- Spark ASC ordering is NULLS FIRST; DuckDB's is NULLS LAST — and in
  DuckDB 1.0 a NULL window PARTITION/ORDER key is outright
  NONDETERMINISTIC (the parallel window sort splits null groups per
  chunk and can corrupt neighboring partitions; reproduced at 200k
  rows with partition counts varying per run). The oracles therefore
  coalesce every nullable window key to an out-of-domain sentinel
  (user -1, chr(1), 1900 timestamps) — ALWAYS wrapping the RAW column
  (coalesce over a date_trunc RESULT hits a second DuckDB 1.0 bug: the
  derived vector's validity mask is corrupted and coalesce returns
  NULL for NULL input even with a constant fallback).
- ANSI Spark aborts the job where DuckDB yields NULL: get_json_object
  + cast on a non-numeric extract (fn_json), element_at on an empty
  map/array (fn_map), element_at index 0 on an all-null rolling frame
  (ts_rolling_median), and x/0 for degenerate drift / variance /
  slope denominators (agg_ks_test, ts_anomaly_zscore, ts_trend_slope
  — the ties corpus makes x-variance exactly 0). try_divide /
  try_element_at / try_cast give DuckDB's NULL semantics.
- groupBy treats NULL keys as equal but an equi-join drops them: the
  win_distinct_running rewrite joins day-grids back on event_type and
  needs eqNullSafe or the NULL type's running count is zeroed.

Each test re-runs the EXACT driver compare (hash parity vs the DuckDB
oracle) on a corpus that contains the hostile rows, so the fixed
semantics stay load-bearing.

The fourth corpus (round 8) is JSON EXTREMES in props: int64
boundary/overflow numbers, exponent notation, string-typed numbers,
floats, booleans, nested values, unicode escapes, duplicate keys.
Extraction agrees token-for-token (both take the FIRST duplicate key
and serialize 2e2 as '200.0'), but DuckDB's TRY_CAST ROUNDS varchar
floats to BIGINT ('1.5' -> 2) where Spark's try_cast is NULL — the
fn_json/fn_map oracles now guard the cast with an integral regex.

The third corpus (round 8) is TIMESTAMP EXTREMES: pre-epoch dates
(negative unix microseconds), the epoch boundary ± 1 µs, a leap day,
far-future, and session/lag deltas spanning the sign change. Result:
55/55 oracle keys agree ×3 runs with zero kernel changes — both
engines run proleptic-Gregorian µs timestamps and agree on window
bucketing, date_trunc, dayofweek, and epoch arithmetic across every
seam. The gates stay so a future kernel using truncating division on
epoch arithmetic (which disagrees with floor for negative µs) fails
loudly.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adlspark import tables as adl_tables
from adlspark.registry import all_oracles, all_queries

SLICE = 400  # base event rows kept (oracle cost control)


def _corpus(tmp_path_factory, sf_dir, name, mutate_events):
    d = tmp_path_factory.mktemp(name)
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "events":
            df = tbl.to_pandas().iloc[:SLICE].reset_index(drop=True)
            df = mutate_events(df)
            tbl = pa.Table.from_pandas(
                df, schema=tbl.schema, preserve_index=False
            )
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_events_dir(tmp_path_factory, sf_dir):
    """NULL user_id / ts / event_type / value / props rows, including a
    user whose events are ALL null-ts (99) and a user mixing real and
    null timestamps (7, 8) — the shapes that flipped window frames,
    dropped join keys, and crashed ANSI expressions. NOTE pandas→arrow
    degrades float('nan') cells to NULL here (the documented fixture
    trap), so this corpus exercises NULL values, not true NaN."""

    def mut(df):
        base_ts = df["ts"].iloc[0]
        extra = pd.DataFrame({
            "event_id": [990001, 990002, 990003, 990011, 990012,
                         990021, 990022, 990031, 990032, 990041,
                         990042, 990051, 990052],
            "ts": [base_ts + pd.Timedelta(seconds=s) for s in
                   (11, 22, 33, 44, 55, 66, 77)] + [pd.NaT] * 6,
            "user_id": [None, None, 7, 7, 8, 9, 9, 7, None, 8, 8,
                        99, 99],
            "event_type": [None, "", "click", None, "", "view", "view",
                           "click", "view", None, "click", "view",
                           "view"],
            "value": [1.5, 2.5, None, None, 3.5, None, None,
                      4.5, 5.5, None, 6.5, 7.5, 8.5],
            "props": [None, "", "{not json", '{"k": null}', '{"k": 1}',
                      None, "{}", '{"k": "v"}', None, "{broken",
                      '{"k": 2}', "{}", '{"k": 3}'],
        })
        extra["user_id"] = extra["user_id"].astype("object")
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "nullevents", mut)


@pytest.fixture(scope="module")
def tie_events_dir(tmp_path_factory, sf_dir):
    """Exact-duplicate timestamps within a user (3-way and 2-way ties,
    the 2-way with equal values too) — every ordered operator must
    resolve them by the event_id tiebreaker identically on both
    engines, and zero x-variance groups must yield NULL statistics,
    not a division error."""

    def mut(df):
        base_ts = df["ts"].iloc[0]
        t1 = base_ts + pd.Timedelta(seconds=101)
        t2 = base_ts + pd.Timedelta(seconds=202)
        extra = pd.DataFrame({
            "event_id": [991001, 991002, 991003, 991011, 991012],
            "ts": [t1, t1, t1, t2, t2],
            "user_id": [41, 41, 41, 42, 42],
            "event_type": ["click", "view", "click", "buy", "buy"],
            "value": [1.0, 2.0, 3.0, 4.0, 4.0],
            "props": ["{}"] * 5,
        })
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "tieevents", mut)


@pytest.fixture(scope="module")
def extreme_ts_dir(tmp_path_factory, sf_dir):
    """Calendar-seam timestamps (round 8 — the last unswept events
    input class): pre-epoch (negative unix microseconds, where C-style
    truncating division and floor division disagree on bucket
    alignment), the exact epoch boundary and the microsecond before it,
    a leap day, a far-future date, and two events one second apart
    ACROSS the epoch so lag/session deltas span the sign change. Both
    engines use the proleptic Gregorian calendar and µs precision; the
    gates prove window bucketing, date_trunc, dayofweek, and epoch
    arithmetic agree on every seam. 1900-01-01 itself is EXCLUDED —
    it is the oracles' null-ts sentinel (fixture-invariant-guarded);
    the pre-epoch rows use 1901/1969 instead."""

    def mut(df):
        extra = pd.DataFrame({
            "event_id": [992001, 992002, 992003, 992004, 992005,
                         992006, 992007, 992008],
            "ts": [
                pd.Timestamp("1901-06-15 12:00:00"),
                pd.Timestamp("1969-12-31 23:59:59.999999"),
                pd.Timestamp("1970-01-01 00:00:00"),
                pd.Timestamp("1970-01-01 00:00:00.999999"),
                pd.Timestamp("2024-02-29 23:30:00"),
                pd.Timestamp("2100-01-01 00:00:01"),
                pd.Timestamp("1969-12-31 23:59:30"),
                pd.Timestamp("1970-01-01 00:00:29"),
            ],
            "user_id": [61, 61, 61, 61, 62, 62, 63, 63],
            "event_type": ["click", "view", "click", "view", "buy",
                           "click", "view", "view"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
            "props": ["{}"] * 8,
        })
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "extremets", mut)


@pytest.fixture(scope="module")
def json_extreme_dir(tmp_path_factory, sf_dir):
    """JSON extremes in props (round 8): int64 boundary and overflow
    numbers, exponent notation, string-typed numbers, floats,
    booleans, nested objects/arrays at $.k, unicode keys/values,
    duplicate keys, and whitespace variants — the seams where Spark's
    get_json_object + try_cast and DuckDB's json_extract_string +
    TRY_CAST could disagree on number tokenization."""

    def mut(df):
        base_ts = df["ts"].iloc[0]
        props = [
            '{"k": 9223372036854775807}',    # int64 max — exact
            '{"k": 9223372036854775808}',    # int64+1 — overflow
            '{"k": -9223372036854775808}',   # int64 min
            '{"k": 2e2}',                    # exponent notation
            '{"k": "123"}',                  # string-typed number
            '{"k": 1.5}',                    # non-integer float
            '{"k": true}',                   # boolean
            '{"k": {"x": 1}}',               # nested object
            '{"k": [1, 2]}',                 # array
            '{"k": "12\\u0033"}',            # unicode escape -> "123"
            '{"k": 7, "k": 8}',              # duplicate key
            '{ "k" :\t42 }',                 # whitespace variants
            '{"к": 5, "k": 005}',            # unicode key + leading zeros (invalid JSON number)
            '{"k": " 7 "}',                  # whitespace-padded string number (both engines trim-then-cast)
            '{"k": "\\t8\\n"}',              # tab/newline-padded string number
            # giant-JSON rows (round 10), inside the declared JSON
            # domain: Jackson (Spark's parser) enforces a 50,000-char
            # name limit — a 49,999-char sibling key parses on BOTH
            # engines; >50k keys NULL the whole extract in Spark only
            # and are out of domain (documented in fn_json). Values
            # are unbounded far beyond this (maxStringLength 20M).
            '{"' + "K" * 49_999 + '": 1, "k": 7}',
            '{"k": 6, "big": "' + "v" * 500_000 + '"}',
        ]
        extra = pd.DataFrame({
            "event_id": [993000 + i for i in range(len(props))],
            "ts": [base_ts + pd.Timedelta(seconds=i) for i in range(len(props))],
            "user_id": [71 + (i % 3) for i in range(len(props))],
            "event_type": ["click"] * len(props),
            "value": [float(i) for i in range(len(props))],
            "props": props,
        })
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "jsonextreme", mut)


@pytest.fixture(scope="module")
def float_extreme_dir(tmp_path_factory, sf_dir):
    """FLOAT EXTREMES in events.value (round 9): true NaN, ±Infinity,
    -0.0, DBL_MAX, a denormal, and ordinary values on the same users —
    the IEEE seams where aggregate propagation, ordering (both engines
    sort NaN greatest), groupBy key normalization (-0.0 vs 0.0), and
    round/percentile behavior could diverge. Built at the ARROW level:
    a pandas round-trip degrades float NaN cells to NULL (the
    documented fixture trap), which would silently test the null path
    instead.

    ROUND-10 SCOPE: the FULL list is the default — NaN, ±Inf, -0.0,
    DBL_MAX, the 5e-324 denormal. Round 9 staged NaN/±Inf/DBL_MAX
    behind FLOAT_EXTREME_FULL=1 because every failure was ONE shared
    seam — the decimal-exact-sum cast (dsum/o_dsum/the ts-module DEC
    casts) was not total over non-representable doubles. Round 10
    landed the totality swap (dsum_total/o_dsum_total + guarded
    TRY_CAST everywhere — see adlspark/ops/parity.py, convention:
    non-representable doubles are excluded from exact sums) plus the
    finite-observation domain for the order-statistic kernels
    (ts_ewma / ts_rolling_median / ts_outlier_mad) and ts_trend_slope's
    sxy try_cast, so the full corpus is now the permanent gate.

    Historical magnitude notes (still pinned by the 1e20/5e-324 rows):
    1e20 overflows DECIMAL(38,6) when SQUARED (variance kernels;
    excluded-as-NULL by the totality convention on both engines), and
    past 15 significant digits decimal→double diverges 1 ulp
    cross-engine (Java BigDecimal's correctly-rounded doubleValue vs
    DuckDB's int128/10^scale two-step) — the float discipline's
    documented precision domain."""
    import pyarrow as _pa

    d = tmp_path_factory.mktemp("floatextreme")
    for t in adl_tables.TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        if t == "events":
            df = tbl.to_pandas().iloc[:SLICE].reset_index(drop=True)
            base_ts = df["ts"].iloc[0]
            # row 9 (1e20): representable in DECIMAL(38,6) so it is IN
            # every plain exact sum, but its SQUARE (1e40) overflows —
            # the totality convention must exclude the square as NULL on
            # BOTH engines (variance kernels' sxx) while keeping the
            # value itself in sx. Row 10 re-pins -0.0 group-key
            # normalization next to the huge value.
            vals = [
                float("nan"), float("inf"), float("-inf"), -0.0,
                1.7976931348623157e308, 5e-324, 2.5, float("nan"),
                1e20, -0.0,
            ]
            extra_cols = {
                "event_id": _pa.array(
                    [994001 + i for i in range(len(vals))], tbl.schema.field("event_id").type
                ),
                "ts": _pa.array(
                    [base_ts + pd.Timedelta(seconds=7 * (i + 1)) for i in range(len(vals))],
                    tbl.schema.field("ts").type,
                ),
                "user_id": _pa.array(
                    [81, 81, 82, 82, 83, 83, 81, 82, 83, 81],
                    tbl.schema.field("user_id").type
                ),
                "event_type": _pa.array(
                    ["click", "view", "click", "view", "buy", "click",
                     "view", "buy", "purchase", "view"],
                    tbl.schema.field("event_type").type,
                ),
                "value": _pa.array(vals, _pa.float64()).cast(
                    tbl.schema.field("value").type
                ),
                "props": _pa.array(["{}"] * len(vals), tbl.schema.field("props").type),
            }
            base = _pa.Table.from_pandas(df, schema=tbl.schema, preserve_index=False)
            extra = _pa.Table.from_arrays(
                [extra_cols[f.name] for f in tbl.schema], schema=tbl.schema
            )
            tbl = _pa.concat_tables([base, extra])
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def test_float_extreme_fixture_contains_true_extremes(float_extreme_dir):
    """The corpus must actually CONTAIN the extremes (not NULLs) —
    guard against the pandas degradation trap regressing the fixture.
    It must hold a true NaN/Inf (the full list is the default now)."""
    import math

    col = (
        pq.read_table(
            os.path.join(float_extreme_dir, "events.parquet"), columns=["value"]
        )
        .column("value")
        .to_pylist()
    )
    nn = [v for v in col if v is not None]
    assert any(v == 5e-324 for v in nn)
    assert any(v == 0.0 and math.copysign(1.0, v) < 0 for v in nn)
    assert any(math.isnan(v) for v in nn)
    assert any(v == float("inf") for v in nn)
    assert any(v == 1e20 for v in nn)


@pytest.fixture(scope="module")
def empty_events_dir(tmp_path_factory, sf_dir):
    """ZERO-ROW events table (round 9): the routine lake shape — an
    empty date partition, a source with no arrivals yet — that no prior
    corpus covered. Every seam is a fold over nothing: global
    aggregates must emit their one NULL/0 row on both engines, grouped
    aggregates zero rows, ANSI scalar extractions must not be reached,
    and driver-side .collect()[0] scalars must tolerate the empty
    frame. Schema is preserved (0-row parquet keeps the footer), so
    schema-on-read paths still resolve."""

    def mut(df):
        return df.iloc[:0]

    return _corpus(tmp_path_factory, sf_dir, "emptyevents", mut)


@pytest.fixture(scope="module")
def giant_line_events_dir(tmp_path_factory, sf_dir):
    """GIANT single LINES through the text-ingest path (round 11,
    VERDICT item 3): the round-10 giant-doc class covered documents and
    events.props, but a multi-MB event_type flowing into
    ingest_validate_json's JSON-LINES batch is a different seam —
    Spark's Hadoop line reader + Jackson parse one multi-megabyte
    record per line while the oracle derives its counts from the
    parquet original, so any parser limit shows up as a quarantine
    divergence, not a crash. Rows carry NEGATIVE event_ids so they
    sort into the first-200 batch (ORDER BY event_id ASC NULLS FIRST).

    Probed domain boundary (pinned here at 19,999,999 chars, one under
    the limit): Jackson's StreamReadConstraints caps a JSON string
    value at 20,000,000 chars — a 20,000,001-char event_type
    quarantines in Spark while DuckDB would parse it; string values
    >20M chars are OUT of the engine's JSON-ingest domain (sibling of
    the 50k name-length domain in fn_json). The 5 MB row exercises
    json.dumps escaping (quotes, backslashes, newlines, unicode) at
    volume; CSV's seam is gated on the supplier side
    (test_tpch_null_robustness's giant_supplier_dir)."""

    def mut(df):
        five_mb = ('He said "hi\\there",\nnew line; ' + "x" * 95) * 40_000
        boundary = "y" * 19_999_999
        extra = pd.DataFrame({
            "event_id": [-901, -902],
            "ts": [df["ts"].iloc[0]] * 2,
            "user_id": [1, 2],
            "event_type": [five_mb, boundary],
            "value": [1.5, 2.5],
            "props": ["{}", "{}"],
        })
        return pd.concat([df, extra], ignore_index=True)

    return _corpus(tmp_path_factory, sf_dir, "giantline", mut)


# the keys that serialize events through a TEXT file and re-parse it
# (the line-reader seam); the other ingest keys stage parquet
GIANT_LINE_KEYS = ["ingest_validate_json"]


@pytest.mark.parametrize("key", GIANT_LINE_KEYS)
def test_giant_line_ingest_parity(spark, giant_line_events_dir, key):
    from adlspark.testing import compare

    con = _ddb(giant_line_events_dir)
    try:
        df = all_queries()[key](spark, giant_line_events_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


JSON_KEYS = ["fn_json", "fn_map", "catalog_search_tokens", "stream_file_source"]


@pytest.mark.parametrize("key", JSON_KEYS)
def test_json_extreme_parity(spark, json_extreme_dir, key):
    from adlspark.testing import compare

    con = _ddb(json_extreme_dir)
    try:
        df = all_queries()[key](spark, json_extreme_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def _ddb(corpus_dir):
    con = duckdb.connect()
    for t in adl_tables.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{corpus_dir}/{t}.parquet')"
        )
    return con


# Every events-reading key with a value oracle — derived from the
# registry so a NEW events key automatically enters these gates the
# day it is registered (a static list silently exempted new keys).
def _events_oracle_keys():
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
        if "events" in (src + " " + os_[k]):
            out.append(k)
    return out


EVENTS_ORACLE_KEYS = _events_oracle_keys()

# Order/tie-sensitive subset for the ties corpus (keys with windows,
# ordered aggregation, as-of semantics, or variance denominators).
TIE_SENSITIVE_KEYS = [
    "ts_ewma", "ts_dedup", "ts_session", "ts_resample_ohlc",
    "ts_rolling_median", "ts_pattern_match", "ts_event_paths",
    "ts_attribution", "ts_velocity_features", "ts_funnel",
    "ts_anomaly_zscore", "ts_trend_slope", "ts_autocorr",
    "ts_cusum_changepoint", "ts_rolling_corr", "ts_burst_detect",
    "join_asof", "join_asof_forward", "join_asof_nearest",
    "join_asof_tolerance", "agg_collect_sorted", "agg_first_last_by",
    "agg_ks_test", "win_lag_lead", "win_streak", "win_time_range",
    "win_distinct_running",
]


def test_events_surface_is_stable():
    """If the derived key list shrinks below the wave-4 surface, keys
    silently left the gate."""
    assert len(EVENTS_ORACLE_KEYS) >= 55, len(EVENTS_ORACLE_KEYS)


@pytest.mark.parametrize("key", EVENTS_ORACLE_KEYS)
def test_null_events_parity(spark, null_events_dir, key):
    from adlspark.testing import compare

    con = _ddb(null_events_dir)
    try:
        df = all_queries()[key](spark, null_events_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", TIE_SENSITIVE_KEYS)
def test_tie_events_parity(spark, tie_events_dir, key):
    from adlspark.testing import compare

    con = _ddb(tie_events_dir)
    try:
        df = all_queries()[key](spark, tie_events_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", EVENTS_ORACLE_KEYS)
def test_extreme_ts_parity(spark, extreme_ts_dir, key):
    from adlspark.testing import compare

    con = _ddb(extreme_ts_dir)
    try:
        df = all_queries()[key](spark, extreme_ts_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", EVENTS_ORACLE_KEYS)
def test_float_extreme_parity(spark, float_extreme_dir, key):
    from adlspark.testing import compare

    con = _ddb(float_extreme_dir)
    try:
        df = all_queries()[key](spark, float_extreme_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


@pytest.mark.parametrize("key", EVENTS_ORACLE_KEYS)
def test_empty_events_parity(spark, empty_events_dir, key):
    from adlspark.testing import compare

    con = _ddb(empty_events_dir)
    try:
        df = all_queries()[key](spark, empty_events_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()


def test_ewma_domain_excludes_null_rows(spark, null_events_dir):
    """Direct statement of the ts_ewma domain: rows lacking user_id,
    ts, or value are not observations — absent from the output, and
    the all-null-ts user (99) contributes no series at all."""
    rows = all_queries()["ts_ewma"](spark, null_events_dir).collect()
    uids = {r.user_id for r in rows}
    assert None not in uids
    assert 99 not in uids
    eids = {r.event_id for r in rows}
    assert eids.isdisjoint({990001, 990002, 990031, 990032,
                            990041, 990051, 990052})


@pytest.fixture(scope="module")
def tiny_events_dir(tmp_path_factory, sf_dir):
    """THREE-row events table (round 10): the 1-7-row class where a
    repartition(8)-staged backlog yields fewer than 8 part files —
    stream_rate_limited_backfill's old oracle hardcoded ceil(8/3)=3
    batches and diverged here; the ntile-bucketed staging + the
    least(count, 8) oracle must agree on ceil(3/3)=1 batch."""

    def mut(df):
        return df.iloc[:3]

    return _corpus(tmp_path_factory, sf_dir, "tinyevents", mut)


@pytest.mark.parametrize("key", ["stream_rate_limited_backfill",
                                 "ingest_idempotent"])
def test_tiny_events_parity(spark, tiny_events_dir, key):
    from adlspark.testing import compare

    con = _ddb(tiny_events_dir)
    try:
        df = all_queries()[key](spark, tiny_events_dir)
        compare(df, con, all_oracles()[key], key=key)
    finally:
        con.close()
