"""Engine-vs-oracle conformance when the admission limits BIND:
per-host quota, per-shard frontier cap, global URL budget.  Final
membership (seen set) and crawl order must match; reject *reasons* may
differ on cap-vs-dup edges (documented in pipelines/crawl.py)."""

import dataclasses

import pytest

from searchengine_ray.pipelines.oracle import CrawlConfig, simulate
from searchengine_ray.sources import synth


@pytest.fixture(scope="module")
def small_world():
    images, truth = synth.gen_images(60, seed=7)
    store = synth.gen_web(600, 60, seed=7)
    synth.attach_captions(store, images)
    seeds = synth.gen_seeds(store, 10, seed=7)
    return images, truth, store, seeds


def _run_both(small_world, tmp_path, cfg, tag):
    from searchengine_ray.pipelines.crawl import run_crawl

    images, truth, store, seeds = small_world
    golden = simulate(seeds, store, cfg)
    res = run_crawl(
        seeds, store, images, truth, cfg=cfg,
        out_dir=str(tmp_path / tag), n_host_actors=3, n_fetch_actors=2,
    )
    return golden, res


def _assert_match(golden, res):
    got = list(
        zip(
            res.crawl_order["fetch_seq"].to_pylist(),
            res.crawl_order["url"].to_pylist(),
            res.crawl_order["url_hash"].to_pylist(),
            res.crawl_order["t_sched"].to_pylist(),
            res.crawl_order["epoch"].to_pylist(),
        )
    )
    assert got == golden.crawl_order
    assert res.seen == golden.seen


def test_host_quota_binding(ray_session, small_world, tmp_path):
    cfg = CrawlConfig(
        shard_count=6, per_shard_batch=40, seen_shards=3, max_urls_per_host=5
    )
    golden, res = _run_both(small_world, tmp_path, cfg, "quota")
    assert any(r == "quota" for _, r in golden.rejects)  # actually binds
    _assert_match(golden, res)


def test_shard_cap_binding(ray_session, small_world, tmp_path):
    cfg = CrawlConfig(
        shard_count=6, per_shard_batch=40, seen_shards=3,
        max_frontier_per_shard=25,
    )
    golden, res = _run_both(small_world, tmp_path, cfg, "cap")
    assert any(r == "shard_full" for _, r in golden.rejects)
    _assert_match(golden, res)


def test_global_budget_binding(ray_session, small_world, tmp_path):
    cfg = CrawlConfig(
        shard_count=6, per_shard_batch=40, seen_shards=3, max_crawl_urls=150
    )
    golden, res = _run_both(small_world, tmp_path, cfg, "budget")
    assert any(r == "budget" for _, r in golden.rejects)
    assert len(golden.seen) <= 150
    _assert_match(golden, res)


def test_all_binding_together(ray_session, small_world, tmp_path):
    cfg = CrawlConfig(
        shard_count=6, per_shard_batch=30, seen_shards=3,
        max_urls_per_host=6, max_frontier_per_shard=20, max_crawl_urls=200,
        per_host_epoch_cap=3,
    )
    golden, res = _run_both(small_world, tmp_path, cfg, "all")
    _assert_match(golden, res)


def test_binding_limits_dynamic_dispatch(
    ray_session, small_world, tmp_path, monkeypatch
):
    """The work-stealing fetch dispatch (CRAWL_DISPATCH=dynamic) must
    obey the same admission semantics as the static path — its waves
    reset the sequencer's per-epoch shard-cap accounting too
    (first_of_epoch on the epoch's first flushed wave)."""
    monkeypatch.setenv("CRAWL_DISPATCH", "dynamic")
    cfg = CrawlConfig(
        shard_count=6, per_shard_batch=30, seen_shards=3,
        max_urls_per_host=6, max_frontier_per_shard=20, max_crawl_urls=200,
        per_host_epoch_cap=3,
    )
    golden, res = _run_both(small_world, tmp_path, cfg, "dyn")
    _assert_match(golden, res)


def test_max_fetches_midepoch_state_conformance(ray_session, small_world, tmp_path):
    """When max_fetches binds mid-epoch, host fail-counters must stop
    exactly at the budget (oracle's early break) — the sliced-off picks
    must leave NO trace in checkpointed host state, so a resumed run
    with a raised limit starts from oracle-equal state."""
    import ray

    from searchengine_ray.pipelines.crawl import RayCrawl
    from searchengine_ray.pipelines.oracle import simulate

    images, truth, store, seeds = small_world
    cfg = CrawlConfig(
        shard_count=6, per_shard_batch=40, seen_shards=3, max_fetches=130
    )
    golden, st = simulate(seeds, store, cfg, return_state=True)
    eng = RayCrawl(
        store, images, truth, cfg=cfg, out_dir=str(tmp_path / "mf"),
        n_host_actors=3, n_fetch_actors=2,
    )
    eng.admit_seeds(seeds)
    res = eng.run()
    _assert_match(golden, res)
    # engine host fail-counter state == oracle state at the cutoff
    fails = {}
    for _, hs in ray.get([a.snapshot.remote() for a in eng.host_actors]):
        for hh, fc in zip(hs["host_hash"].to_pylist(), hs["fail_count"].to_pylist()):
            if fc:
                fails[hh] = fc
    assert fails == st.host_fail


def test_dns_cache_populated_and_checkpointed(ray_session, small_world, tmp_path):
    """m_okHosts analog (SearchEngine.h:526): hosts that connected
    successfully get a cached address; the cache survives snapshot →
    restore."""
    import ray

    from searchengine_ray.pipelines.crawl import RayCrawl
    from searchengine_ray.state.host import HostShards

    images, truth, store, seeds = small_world
    cfg = CrawlConfig(shard_count=6, per_shard_batch=40, seen_shards=3)
    eng = RayCrawl(
        store, images, truth, cfg=cfg, out_dir=str(tmp_path / "dns"),
        n_host_actors=2, n_fetch_actors=2,
    )
    eng.admit_seeds(seeds)
    eng.run(max_epochs=3)
    snaps = ray.get([a.snapshot.remote() for a in eng.host_actors])
    dns = {}
    for _, hs in snaps:
        for hh, addr in zip(
            hs["host_hash"].to_pylist(), hs["dns_addr"].to_pylist()
        ):
            if addr >= 0:
                dns[hh] = addr
    assert dns, "no DNS cache entries after a successful crawl"
    # restore round-trips the cache
    h2 = HostShards(cfg, [0, 2, 4], store)
    fr, hs = snaps[0]
    h2.restore(fr, hs)
    want = {
        hh: a
        for hh, a in zip(hs["host_hash"].to_pylist(), hs["dns_addr"].to_pylist())
        if a >= 0
    }
    assert h2.host_dns == want
