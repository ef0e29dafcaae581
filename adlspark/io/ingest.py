"""Ingestion / validation / staging — the engine's analogue of the
reference's staging pipeline (S3-event → validate → stage/quarantine →
catalog), re-expressed as one Spark job per arriving batch:

    read (explicit schema, PERMISSIVE) → validate required columns →
    split good/quarantine → write staged parquet (partitioned) →
    append a catalog entry

Control crosses a process boundary once (driver → executors), vs the
reference's per-state Lambda hops. At 100 TB the staged write is the
only shuffle-free full pass; validation predicates are Catalyst columns
so they fuse into the scan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class SourceConfig:
    """Per-source ingestion config (the reference's DataSources entry)."""

    name: str
    fmt: str  # 'json' | 'csv' | 'parquet'
    schema: StructType
    required: list[str] = field(default_factory=list)
    options: dict = field(default_factory=dict)


def read_raw(spark: SparkSession, cfg: SourceConfig, path: str) -> DataFrame:
    """Schema-on-read with corrupt-record capture (PERMISSIVE)."""
    if cfg.fmt == "json":
        # StructType.add mutates in place — copy so a SourceConfig can be
        # reused across ingest calls (at-least-once delivery re-uses cfgs)
        read_schema = StructType(list(cfg.schema.fields)).add(
            "_corrupt_record", "string"
        )
    else:
        read_schema = cfg.schema
    reader = spark.read.schema(read_schema)
    for k, v in cfg.options.items():
        reader = reader.option(k, v)
    if cfg.fmt == "json":
        return reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        ).json(path)
    if cfg.fmt == "csv":
        return reader.option("mode", "PERMISSIVE").csv(path)
    return reader.parquet(path)


def split_valid(df: DataFrame, cfg: SourceConfig) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): corrupt rows + required-column nulls quarantine."""
    has_corrupt = "_corrupt_record" in df.columns
    bad_pred = F.lit(False)
    if has_corrupt:
        bad_pred = bad_pred | F.col("_corrupt_record").isNotNull()
    for col in cfg.required:
        bad_pred = bad_pred | F.col(col).isNull()
    good = df.where(~bad_pred)
    bad = df.where(bad_pred)
    if has_corrupt:
        good = good.drop("_corrupt_record")
    return good, bad


def stage(
    good: DataFrame,
    staged_dir: str,
    partition_by: list[str] | None = None,
) -> None:
    writer = good.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staged_dir)


def ingest(
    spark: SparkSession,
    cfg: SourceConfig,
    raw_path: str,
    staged_dir: str,
    quarantine_dir: str | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Full staging pipeline; returns the catalog entry for the batch."""
    df = read_raw(spark, cfg, raw_path)
    good, bad = split_valid(df, cfg)
    stage(good, staged_dir, partition_by)
    n_bad = bad.count()
    if quarantine_dir and n_bad:
        bad.write.mode("overwrite").json(quarantine_dir)
    n_good = spark.read.parquet(staged_dir).count()
    return {
        "source": cfg.name,
        "raw_path": raw_path,
        "staged_path": staged_dir,
        "n_good": n_good,
        "n_quarantined": n_bad,
        "status": "STAGED" if n_good else "FAILED",
    }


def work_dir(sf_dir: str, name: str) -> str:
    """Deterministic scratch dir per (sf, operator) under /tmp."""
    tag = sf_dir.strip("/").replace("/", "_")
    d = f"/tmp/adlspark_work/{tag}/{name}"
    os.makedirs(d, exist_ok=True)
    return d
