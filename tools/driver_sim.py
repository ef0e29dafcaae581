"""Simulate the external driver: plain SparkSession, full key sweep vs DuckDB.

Usage: python tools/driver_sim.py [key_substring ...]
With args, only keys containing one of the substrings run (entry() always).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    filters = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    n = len(e.entry(spark).collect())
    assert n > 0, "entry() flagship query returned 0 rows"
    print(f"entry() ok: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        # Spark-written fixtures are DIRECTORIES of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    from adlspark.testing import compare

    qs = e.queries()
    oracles = e.oracle_sql()
    keys = list(qs)
    if filters:
        keys = [k for k in keys if any(f in k for f in filters)]
    print(f"sweeping {len(keys)} keys at {SF_DIR}", flush=True)

    failed = []
    for i, k in enumerate(keys):
        t0 = time.time()
        try:
            df = qs[k](spark, SF_DIR)
            if k in oracles:
                compare(df, con, oracles[k], key=k)
                verdict = "HASH-PASS"
            else:
                # Mirror the driver's rows-only path: it canonicalizes
                # toPandas() output with sort_values across ALL columns,
                # which crashes on ndarray/dict cells (the
                # agg_approx_percentile r6 ERROR) — df.count() alone
                # would miss that whole failure class.
                pdf = df.toPandas()
                pdf.sort_values(list(pdf.columns), ignore_index=True)
                rows = len(pdf)
                assert rows > 0, f"[{k}] rows-only key returned 0 rows"
                verdict = f"rows-only ({rows})"
        except Exception as ex:
            failed.append(k)
            verdict = f"FAIL: {type(ex).__name__}: {ex}"
            traceback.print_exc()
        print(f"[{i+1}/{len(keys)}] {k}: {verdict} ({time.time()-t0:.1f}s)", flush=True)

    print(f"\n{len(keys)-len(failed)}/{len(keys)} clean", flush=True)
    if failed:
        print("FAILED:", failed, flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
