"""SparkSession factory with the engine's baseline configuration.

Config rationale (SURVEY.md §4 baseline):
- ``spark.sql.legacy.parquet.nanosAsLong=true``: in driver rounds 1-2 the
  ``events.ts`` fixture was a nanosecond parquet timestamp, illegal in
  Spark 4.x without this flag (SURVEY.md §1.3); it arrived as LongType
  ns-since-epoch and ``tables.py`` converted it. The round-3 regeneration
  made ``ts`` a native µs timestamp (FIXTURES.md), which this flag does not
  affect — it stays set so the engine still reads the older fixture layout.
- UTC session timezone: timestamp parity with the DuckDB oracle.
- Low shuffle partitions locally + AQE: at sf0.1 the data is small; AQE
  coalescing keeps task overhead down. On a real cluster these are raised
  via ``ADLSPARK_SHUFFLE_PARTITIONS`` / submitted conf — every operator is
  written to be partition-count agnostic.
- Arrow enabled: all pandas-UDF paths transfer via Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(app_name: str = "adlspark", master: str | None = None) -> SparkSession:
    master = master or os.environ.get("ADLSPARK_MASTER", "local[*]")
    shuffle = os.environ.get("ADLSPARK_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("ADLSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def _ship_package(spark: SparkSession) -> None:
    """Make ``adlspark`` importable on executor Python workers regardless
    of their CWD/sys.path: zip the package once and addPyFile it.
    Closures are written to avoid module-reference pickling anyway; this
    is the defensive second layer."""
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    )
    # Content-hash-named zip under a per-user 0700 directory whose
    # ownership and mode are verified before any reuse: a name-only check
    # in the shared world-writable tmp dir would let another local user
    # pre-plant the predictable path and have their code shipped to
    # executors via addPyFile. Reuse is safe only because the parent dir
    # is provably ours and not writable by anyone else; if the dir fails
    # that check we fall back to a fresh private mkdtemp. Concurrent
    # sessions build to a private temp name then os.replace (atomic) —
    # no torn archives.
    import stat

    digest = hashlib.sha256()
    for src in sources:
        digest.update(os.path.relpath(src, pkg_dir).encode())
        with open(src, "rb") as fh:
            digest.update(fh.read())
    uid = os.getuid() if hasattr(os, "getuid") else 0
    base = os.path.join(tempfile.gettempdir(), f"adlspark_pkg_{uid}")
    try:
        os.makedirs(base, mode=0o700, exist_ok=True)
        st = os.lstat(base)
        trusted = (
            stat.S_ISDIR(st.st_mode)
            and st.st_uid == uid
            and not (st.st_mode & 0o077)
        )
    except OSError:
        trusted = False
    if not trusted:
        base = tempfile.mkdtemp(prefix=f"adlspark_pkg_{uid}_")
    zip_path = os.path.join(base, f"{digest.hexdigest()[:16]}.zip")
    if not os.path.exists(zip_path):
        fd, tmp_path = tempfile.mkstemp(suffix=".zip", prefix="build_", dir=base)
        os.close(fd)
        with zipfile.ZipFile(tmp_path, "w") as zf:
            for full in sources:
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
        os.replace(tmp_path, zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added in this context, or context shutting down


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime confs to an externally-built
    session (the driver passes its own SparkSession to ``entry``)."""
    _ship_package(spark)
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        (
            "spark.sql.shuffle.partitions",
            os.environ.get("ADLSPARK_SHUFFLE_PARTITIONS", "32"),
        ),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            # static confs can't be set post-start on some builds; the
            # nanosAsLong flag is the only critical one and IS settable.
            pass
    return spark
