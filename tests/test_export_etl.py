"""Resumable partitioned-output ETL (pipelines/export.py): parts match
the oracle-checked q37 gate, committed parts are skipped on resume,
torn .tmp writes are ignored."""

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def multi_frag_input(tmp_path_factory):
    """documents table re-written with small row groups → 5 fragments."""
    d = tmp_path_factory.mktemp("etl_in")
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(src, str(d / "documents.parquet"), row_group_size=100)
    return str(d)


def test_etl_matches_q37_and_resumes(ray_session, multi_frag_input, tmp_path):
    from searchengine_ray.pipelines.export import corpus_etl
    from searchengine_ray.pipelines.queries import q37_clean_corpus

    out = str(tmp_path / "corpus")
    r1 = corpus_etl(multi_frag_input, out)
    assert r1["parts"] == 5 and r1["skipped"] == 0
    parts = sorted(p for p in os.listdir(out) if p.endswith(".parquet"))
    assert len(parts) == 5

    # content parity with the oracle-checked q37 gate (plus text col)
    got = pq.read_table(out).to_pandas().sort_values("doc_id")
    want = (
        q37_clean_corpus(multi_frag_input)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_tokens"]) == list(want["n_tokens"])
    assert "text" in got.columns
    assert r1["rows_total"] == len(want)

    # resume: delete one part, leave a torn tmp for another — only the
    # missing part is re-done, committed parts untouched
    victim = os.path.join(out, parts[2])
    os.remove(victim)
    with open(os.path.join(out, parts[3]) + ".tmp", "w") as f:
        f.write("torn")
    mtimes = {
        p: os.path.getmtime(os.path.join(out, p))
        for p in parts
        if p != parts[2]
    }
    r2 = corpus_etl(multi_frag_input, out)
    assert r2["skipped"] == 4
    assert r2["rows_total"] == r1["rows_total"]
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, p)) == m, p
    got2 = pq.read_table(out).to_pandas().sort_values("doc_id")
    assert list(got2["doc_id"]) == list(got["doc_id"])
