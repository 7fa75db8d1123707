"""Deterministic stratified sampling and split assignment — the
dataset-mixing step of a training-data pipeline.

Mixing weights ("keep 90% of English, 10% of Spanish, 5% of the rest")
must be REPRODUCIBLE across reruns, retries, and engines, so the
sample decision is a pure function of (salt, doc_id): a salted md5
bucket in [0, RESOLUTION), compared against a per-stratum integer
threshold.  No RNG state, no ``df.sample`` (whose output depends on
partitioning), no driver coordination — the predicate is a column
expression, fully pushable and shuffle-free.

Rates are converted to integer thresholds ON THE DRIVER
(``round(rate * RESOLUTION)``) so an engine replaying the logic (the
DuckDB oracle, a downstream audit) compares the same exact integers
— float literals like 0.9 are not exactly representable and
DECIMAL-vs-DOUBLE literal semantics differ between engines.

100 TB posture: one narrow projection + filter, no shuffle, no UDF;
Catalyst pushes the md5/conv expressions into the scan stage.  The
same bucket with a different salt yields an independent split
(train/holdout), so sampling and splitting compose without
correlation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESOLUTION = 1_000_000


def sample_bucket_col(id_col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, RESOLUTION): first 12 hex digits
    (48 bits) of md5(salt || id) mod RESOLUTION.  Portable: Spark and
    DuckDB produce byte-identical md5 over the same UTF-8 bytes (same
    trick as dedup.simhash_portable)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), id_col.cast("string")).cast("binary")),
            1, 12),
        16, 10).cast("long")
    return h % F.lit(RESOLUTION)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "mix-v1",
                      default_rate: float = 0.0,
                      bucket_col: str = "sample_bucket") -> DataFrame:
    """Keep each row iff its deterministic bucket falls under the
    stratum's threshold.  ``rates`` maps stratum value -> keep
    fraction in [0, 1]; strata absent from the map use
    ``default_rate``.  The bucket rides along in ``bucket_col`` for
    auditability."""
    thresholds = {k: int(round(v * RESOLUTION)) for k, v in rates.items()}
    default_thr = int(round(default_rate * RESOLUTION))
    if thresholds:
        thr = reduce(
            lambda acc, kv: acc.when(F.col(strata_col) == kv[0], F.lit(kv[1])),
            sorted(thresholds.items()),
            F).otherwise(F.lit(default_thr))
    else:
        thr = F.lit(default_thr)
    out = df.withColumn(bucket_col, sample_bucket_col(F.col(id_col), salt))
    return out.where(F.col(bucket_col) < thr)


def assign_split(df: DataFrame, holdout_rate: float = 0.1,
                 id_col: str = "doc_id", salt: str = "split-v1",
                 split_col: str = "split") -> DataFrame:
    """Deterministic train/holdout labeling via an independently
    salted bucket (uncorrelated with any sampling salt)."""
    thr = int(round(holdout_rate * RESOLUTION))
    b = sample_bucket_col(F.col(id_col), salt)
    return df.withColumn(
        split_col, F.when(b < F.lit(thr), F.lit("holdout")).otherwise(F.lit("train")))
