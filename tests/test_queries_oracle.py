"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.001 and compare row count + schema + an
order-insensitive value hash against its ``oracle_sql()`` via DuckDB."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return c


def _sql_checked():
    from searchengine_ray.pipelines import queries as Q

    oracle = Q.oracle_sql()
    return sorted(oracle.keys())


@pytest.mark.parametrize("name", _sql_checked())
def test_query_matches_oracle(ray_session, con, name):
    from searchengine_ray.pipelines import queries as Q

    got = _canon(_to_pandas(Q.queries()[name](SF_DIR)))
    want = _canon(con.execute(Q.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        got.columns,
        want.columns,
    )
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


ROWS_ONLY = [
    "q17_simhash",
    "q20_phash_dedup",
    "q24_multimodal",
    "q28_ivf_topk",
    "q29_embedding_neardup",
    "q30_fingerprint",
    "q53_kmeans_clusters",
    "q54_weighted_sample",
    "q64_image_funnel",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    from searchengine_ray.pipelines import queries as Q

    got = _to_pandas(Q.queries()[name](SF_DIR))
    # empty results legitimately lose their schema through Ray Data
    assert got is not None and (len(got) == 0 or len(got.columns) > 0)
