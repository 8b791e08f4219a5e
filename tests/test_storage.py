import pyarrow as pa
import pytest

from searchengine_ray.sources.storage import VersionedTable


def test_append_versions_timetravel(tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    assert t.latest() is None
    v1 = t.append(pa.table({"x": [1, 2]}))
    v2 = t.append(pa.table({"x": [3]}))
    assert t.versions() == [v1, v2]
    assert t.read(v1)["x"].to_pylist() == [1, 2]
    assert sorted(t.read(v2)["x"].to_pylist()) == [1, 2, 3]
    assert t.read()["x"].to_pylist() == t.read(v2)["x"].to_pylist()
    assert t.count(v1) == 2 and t.count() == 3


def test_reopen_resumes(tmp_path):
    p = str(tmp_path / "tbl")
    t = VersionedTable(p)
    t.append(pa.table({"x": [1]}))
    t2 = VersionedTable(p)  # fresh handle, same directory
    assert t2.latest() == 1
    t2.append(pa.table({"x": [2]}))
    assert t2.count() == 2


def test_to_ray(ray_session, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.append(pa.table({"x": list(range(100))}))
    t.append(pa.table({"x": list(range(100, 150))}))
    ds = t.to_ray()
    assert ds.count() == 150
    assert t.to_ray(1).count() == 100


def test_version_delta_and_truncate(tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    v1 = t.append(pa.table({"x": [1, 2]}))
    v2 = t.append(pa.table({"x": [3]}))
    v3 = t.append(pa.table({"x": [4, 5]}))
    assert t.version_delta(v1)["x"].to_pylist() == [1, 2]
    assert t.version_delta(v2)["x"].to_pylist() == [3]
    assert t.version_delta(v3)["x"].to_pylist() == [4, 5]
    # drop dangling versions (crash between append and commit)
    t.truncate_to(v2)
    assert t.versions() == [v1, v2]
    assert sorted(t.read()["x"].to_pylist()) == [1, 2, 3]
    # appends continue cleanly after truncation
    v4 = t.append(pa.table({"x": [9]}))
    assert v4 == v2 + 1
    assert sorted(t.read()["x"].to_pylist()) == [1, 2, 3, 9]


def test_resume_truncates_dangling_log_versions(ray_session, tmp_path):
    """A crash between the log append and the epoch dir's atomic
    publish leaves dangling versions; resume must truncate them so the
    continued run's logs match an uninterrupted run."""
    from searchengine_ray.pipelines.crawl import RayCrawl
    from searchengine_ray.pipelines.oracle import CrawlConfig, simulate
    from searchengine_ray.sources import synth

    images, truth = synth.gen_images(60, seed=7)
    store = synth.gen_web(600, 60, seed=7)
    synth.attach_captions(store, images)
    seeds = synth.gen_seeds(store, 10, seed=7)
    cfg = CrawlConfig(shard_count=6, per_shard_batch=40, seen_shards=3)
    golden = simulate(seeds, store, cfg)

    out = str(tmp_path / "crash")
    eng = RayCrawl(store, images, truth, cfg, out, n_host_actors=2,
                   n_fetch_actors=2, checkpoint=True)
    eng.admit_seeds(seeds)
    eng.run(max_epochs=3)
    # simulate the crash: dangling appends with no committed epoch dir
    eng.order_log.append(pa.table({"junk": [1]}))
    eng.content_log.append(pa.table({"junk": [1]}))

    eng2 = RayCrawl.resume(store, images, truth, cfg, out,
                           n_host_actors=2, n_fetch_actors=2)
    res = eng2.run()
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
