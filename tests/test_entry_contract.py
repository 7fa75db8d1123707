"""Driver-contract pre-flight: every queries() entry runs at sf0.001 and
matches its oracle_sql() via DuckDB — the same compare the driver's
correctness gate performs (row count + columns + exact sorted values).

The full sweep lives in tools/check_oracle.py; this test keeps the gate
inside `python -m pytest` per BASELINE.json input_hint.
"""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e
    return e


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


# the fast, high-signal subset (full sweep = tools/check_oracle.py)
SUBSET = ["tile_assign", "cell_rollup", "spatial_join_nations",
          "knn_cellring", "dedup_exact", "token_stats", "lang_id",
          "similarity_topk", "raster_rollup", "extract_parity"]


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, entrymod, spark, sf_dir, duck):
    got = entrymod.queries()[name](spark, sf_dir).toPandas()
    want = duck.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        a, b = g[c], w[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            ok = (a.astype(np.float64).to_numpy() == b.astype(np.float64).to_numpy()) \
                 | (a.isna().to_numpy() & b.isna().to_numpy())
        else:
            ok = a.astype(str).to_numpy() == b.astype(str).to_numpy()
        assert ok.all(), f"{name}.{c}: first mismatch row {int(np.argmin(ok))}"


def test_entry_smoke(entrymod, spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"z", "x", "y", "n_features"} <= set(df.columns)


def test_every_query_declares_oracle_or_is_documented(entrymod):
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    rows_only = qs - os_
    # rows-only set is intentional and bounded: binary tile blobs
    # (their counts ARE oracled via mvt_point_counts/mvt_line_counts),
    # blake2b fingerprints (portable twin oracled), stub media decode
    assert rows_only <= {"mvt_tiles", "mvt_tiles_hier", "mvt_layer_metrics",
                         "simhash_fingerprints", "multimodal_decode"}
