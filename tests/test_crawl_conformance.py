"""Engine-vs-oracle conformance: crawl order + URL-seen set must match
exactly, independent of actor-pool sizes (north rule / SURVEY.md §7.5#1)."""

import numpy as np
import pytest

from searchengine_ray.pipelines.oracle import CrawlConfig, simulate
from searchengine_ray.sources import synth


@pytest.fixture(scope="module")
def fixture_small():
    images, truth = synth.gen_images(120, seed=42)
    store = synth.gen_web(900, 120, seed=42)
    synth.attach_captions(store, images)
    seeds = synth.gen_seeds(store, 12, seed=42)
    cfg = CrawlConfig(shard_count=8, per_shard_batch=60, seen_shards=4)
    golden = simulate(seeds, store, cfg)
    return images, truth, store, seeds, cfg, golden


def _order_tuples(tbl):
    return list(
        zip(
            tbl["fetch_seq"].to_pylist(),
            tbl["url"].to_pylist(),
            tbl["url_hash"].to_pylist(),
            tbl["t_sched"].to_pylist(),
            tbl["epoch"].to_pylist(),
        )
    )


def _run_engine(fixture, tmpdir, n_host_actors, n_fetch_actors, **kw):
    from searchengine_ray.pipelines.crawl import run_crawl

    images, truth, store, seeds, cfg, golden = fixture
    return run_crawl(
        seeds,
        store,
        images,
        truth,
        cfg=cfg,
        out_dir=str(tmpdir),
        n_host_actors=n_host_actors,
        n_fetch_actors=n_fetch_actors,
        **kw,
    )


@pytest.mark.parametrize("n_host,n_fetch", [(1, 1), (4, 3)])
def test_engine_matches_oracle(ray_session, fixture_small, tmp_path, n_host, n_fetch):
    images, truth, store, seeds, cfg, golden = fixture_small
    res = _run_engine(fixture_small, tmp_path / f"e{n_host}", n_host, n_fetch)
    got = _order_tuples(res.crawl_order)
    want = golden.crawl_order
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (g, w)
    assert res.seen == golden.seen
    # content set matches too (url_hash, image_id, caption)
    got_content = sorted(
        zip(
            res.content["url_hash"].to_pylist(),
            res.content["image_id"].to_pylist(),
            res.content["caption"].to_pylist(),
        )
    )
    want_content = sorted((h, img, cap) for h, u, img, cap, e in golden.content)
    assert got_content == want_content
    # payload invariants held for every fetched row
    assert all(res.content["invariant_ok"].to_pylist())


def test_budget_cutoff_matches(ray_session, fixture_small, tmp_path):
    images, truth, store, seeds, cfg, golden = fixture_small
    import dataclasses

    cfg2 = dataclasses.replace(cfg, max_fetches=137)
    golden2 = simulate(seeds, store, cfg2)
    from searchengine_ray.pipelines.crawl import run_crawl

    res = run_crawl(
        seeds, store, images, truth, cfg=cfg2, out_dir=str(tmp_path / "b"),
        n_host_actors=3, n_fetch_actors=2,
    )
    assert len(res.crawl_order) == len(golden2.crawl_order) == 137
    assert _order_tuples(res.crawl_order) == golden2.crawl_order
    assert res.seen == golden2.seen


def test_checkpoint_resume_equivalence(ray_session, fixture_small, tmp_path):
    """Kill after epoch k, resume from checkpoint → identical final
    crawl order + seen set (north rule resumability)."""
    from searchengine_ray.pipelines.crawl import RayCrawl

    images, truth, store, seeds, cfg, golden = fixture_small
    out = str(tmp_path / "ck")
    eng = RayCrawl(store, images, truth, cfg, out, n_host_actors=2,
                   n_fetch_actors=2, checkpoint=True)
    eng.admit_seeds(seeds)
    eng.run(max_epochs=3)  # "crash" after 3 epochs

    eng2 = RayCrawl.resume(store, images, truth, cfg, out,
                           n_host_actors=2, n_fetch_actors=2)
    res = eng2.run()
    assert _order_tuples(res.crawl_order) == golden.crawl_order
    assert res.seen == golden.seen


def test_payload_parquet_integrity(ray_session, fixture_small, tmp_path):
    """Payload partitions written by fetch actors decode back to the
    exact bytes/phash recorded in the content metadata."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.crawl import run_crawl
    from searchengine_ray.sources.codec import decode_image, phash64

    images, truth, store, seeds, cfg, golden = fixture_small
    out = str(tmp_path / "pay")
    res = _run_engine(fixture_small, out, 2, 2, write_payload=True)
    parts = sorted(glob.glob(f"{out}/payload/epoch=*/part-*.parquet"))
    assert parts, "payload partitions missing"
    pay = pq.read_table(parts[0])
    meta = {
        int(s): (img, ph)
        for s, img, ph in zip(
            res.content["fetch_seq"].to_pylist(),
            res.content["image_id"].to_pylist(),
            res.content["phash"].to_pylist(),
        )
    }
    for i in range(min(20, len(pay))):
        seq = int(pay["fetch_seq"][i].as_py())
        img_id, ph = meta[seq]
        assert pay["image_id"][i].as_py() == img_id
        px, _ = decode_image(pay["bytes"][i].as_py())
        assert phash64(px) == ph


def test_conformance_medium_scale(ray_session, tmp_path):
    """Engine == oracle on a ~3.6k-URL crawl (larger politeness/skew
    interleavings than the small fixture)."""
    from searchengine_ray.pipelines.crawl import run_crawl

    images, truth = synth.gen_images(200, seed=5)
    store = synth.gen_web(2500, 200, seed=5)
    synth.attach_captions(store, images)
    seeds = synth.gen_seeds(store, 40, seed=5)
    cfg = CrawlConfig(shard_count=12, per_shard_batch=400, seen_shards=4)
    golden = simulate(seeds, store, cfg)
    res = run_crawl(
        seeds, store, images, truth, cfg=cfg,
        out_dir=str(tmp_path / "med"), n_host_actors=4, n_fetch_actors=4,
    )
    assert _order_tuples(res.crawl_order) == golden.crawl_order
    assert res.seen == golden.seen


def test_get_page_indexed_lookup(ray_session, fixture_small, tmp_path, monkeypatch):
    """get_page is an indexed point lookup: besides the tiny per-epoch
    hash indexes it reads exactly ONE content-log fragment and ONE
    payload part file per hit (S4 — the reference's O(1) RAM index,
    KeyValueDB.hpp:384-396)."""
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines import crawl as crawl_mod
    from searchengine_ray.pipelines.crawl import RayCrawl, get_page
    from searchengine_ray.sources import storage as storage_mod

    images, truth, store, seeds, cfg, golden = fixture_small
    out = str(tmp_path / "gp")
    eng = RayCrawl(store, images, truth, cfg, out, n_host_actors=2,
                   n_fetch_actors=2, checkpoint=True)
    eng.admit_seeds(seeds)
    res = eng.run(max_epochs=4)
    # pick a page fetched in a late epoch so early-epoch indexes miss
    ok = res.content.to_pylist()
    target = max(ok, key=lambda r: r["fetch_seq"])

    reads = []
    real_read = pq.read_table

    def counting_read(path, *a, **kw):
        reads.append(str(path))
        return real_read(path, *a, **kw)

    monkeypatch.setattr(crawl_mod.pq, "read_table", counting_read)
    monkeypatch.setattr(storage_mod.pq, "read_table", counting_read)
    row = get_page(out, "http://" + target["url"])
    assert row is not None and row["url_hash"] == target["url_hash"]
    assert row["caption"] == target["caption"]
    assert "bytes" in row and len(row["bytes"]) > 0
    frag_reads = [p for p in reads if "content_log" in p]
    pay_reads = [p for p in reads if "payload" in p]
    idx_reads = [p for p in reads if "index.parquet" in p]
    assert len(frag_reads) == 1, frag_reads
    assert len(pay_reads) == 1, pay_reads
    assert len(reads) == len(frag_reads) + len(pay_reads) + len(idx_reads)


def test_robots_disallow_enforced(ray_session, tmp_path):
    """Explicit robots coverage (north-rule addition): with every host
    carrying a disallow prefix, no blocked URL is ever fetched, the
    rejects are counted, and engine == oracle on order + membership."""
    images, truth = synth.gen_images(60, seed=5)
    store = synth.gen_web(600, 60, seed=5, robots_host_rate=1.0)
    synth.attach_captions(store, images)
    seeds = synth.gen_seeds(store, 10, seed=5)
    cfg = CrawlConfig(shard_count=4, per_shard_batch=60, seen_shards=2)
    golden = simulate(seeds, store, cfg)
    assert any(r[1] == "robots" for r in golden.rejects)  # fixture bites

    from searchengine_ray.pipelines.crawl import run_crawl

    res = run_crawl(
        seeds, store, images, truth, cfg=cfg,
        out_dir=str(tmp_path / "robots"), n_host_actors=2, n_fetch_actors=2,
    )
    assert _order_tuples(res.crawl_order) == golden.crawl_order
    assert res.seen == golden.seen

    # no fetched URL may fall under its host's disallow prefix
    for u in res.crawl_order["url"].to_pylist():
        row = int(store.lookup(np.array(
            [__import__("searchengine_ray.functions.urlkernel",
                        fromlist=["url_hash"]).url_hash(u)],
            np.uint64))[0])
        if row >= 0:
            assert not store.robots_disallowed(row), u

    # the admission ladder counted robots/quota rejects
    assert res.metrics is not None
    total_rej = sum(res.metrics["rejected_robots_quota"].to_pylist())
    assert total_rej > 0
