"""End-to-end curation funnel (pipelines/curate.py): the written
corpus agrees with the funnel counts (which the oracle suite checks
against the six-stage DuckDB CTE chain via q63), the manifest's stage
counts are a monotone funnel, and every written row passes its own
stage gates (clean, unique text, uncontaminated, split = hash rule)."""

import json
import os

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel_out(ray_session, tmp_path_factory):
    from searchengine_ray.pipelines.curate import curation_funnel

    out = str(tmp_path_factory.mktemp("curated"))
    counts = curation_funnel(SF, out_dir=out)
    return out, counts


def test_written_corpus_matches_counts(funnel_out):
    out, counts = funnel_out
    df = duckdb.sql(
        f"SELECT split, source, COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens"
        f" FROM '{out}/*.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    got = counts.sort_values(["split", "source"]).reset_index(drop=True)
    assert len(df) == len(got)
    assert (df["n_docs"].to_numpy(np.int64) == got["n_docs"].to_numpy()).all()
    assert (
        df["n_tokens"].to_numpy(np.int64) == got["n_tokens"].to_numpy()
    ).all()


def test_manifest_funnel_monotone(funnel_out):
    out, counts = funnel_out
    m = json.load(open(os.path.join(out, "MANIFEST.json")))
    st = m["stages"]
    assert st["cleaned"] >= st["exact_dedup"] >= st["final"]
    assert st["final"] == int(counts["n_docs"].sum())
    assert st["neardup_dropped"] >= 0 and m["bench_ngrams"] > 0
    assert sum(m["splits"].values()) == st["final"]


def test_written_rows_pass_stage_invariants(funnel_out):
    out, _counts = funnel_out
    df = duckdb.sql(
        f"SELECT doc_id, text, n_tokens, split FROM '{out}/*.parquet'"
    ).df()
    # no benchmark docs, no exact dups, split matches the hash rule
    ids = df["doc_id"].to_numpy(np.int64)
    assert (ids % 7 != 0).all()
    assert df["text"].nunique() == len(df)
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    want = np.where(
        h < np.uint64(int(0.8 * (1 << 32))),
        "train",
        np.where(h < np.uint64(int(0.9 * (1 << 32))), "val", "test"),
    )
    assert (df["split"].to_numpy() == want).all()
    # decontamination: no written doc shares an 8-gram with the holdout
    from searchengine_ray.stages.dedup import _distinct_shingles

    bench = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet' WHERE doc_id % 7 = 0"
    ).df()
    _d, bh, _l = _distinct_shingles(bench["text"], 8, short_fallback=False)
    bh = np.unique(bh)
    didx, sh, _l = _distinct_shingles(df["text"], 8, short_fallback=False)
    if len(sh) and len(bh):
        pos = np.searchsorted(bh, sh)
        hit = (pos < len(bh)) & (bh[np.minimum(pos, len(bh) - 1)] == sh)
        assert not hit.any()
