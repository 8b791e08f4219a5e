import numpy as np
import pytest

from searchengine_ray.state.cuckoo import CuckooFilter, SeenShard


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives():
    f = CuckooFilter(capacity=5000, seed=1)
    h = np.unique(_hashes(4000, 7))
    f.add_batch(h)
    assert f.contains_batch(h).all()


def test_false_positive_rate_low():
    f = CuckooFilter(capacity=5000, seed=1)
    ins = np.unique(_hashes(4000, 7))
    f.add_batch(ins)
    probe = _hashes(20000, 99)
    probe = np.setdiff1d(probe, ins)
    fp_rate = f.contains_batch(probe).mean()
    assert fp_rate < 0.01, fp_rate


def test_filter_state_roundtrip():
    f = CuckooFilter(capacity=1000, seed=3)
    h = np.unique(_hashes(800, 5))
    f.add_batch(h)
    g = CuckooFilter.from_state(f.to_state())
    assert g.count == f.count
    assert (g.table == f.table).all()
    assert g.contains_batch(h).all()
    # post-restore inserts behave identically (deterministic evict RNG)
    more = np.unique(_hashes(50, 11)) + np.uint64(1)
    f.add_batch(more)
    g.add_batch(more)
    assert (g.table == f.table).all()


def test_seen_shard_semantics():
    s = SeenShard(capacity=1000)
    a = np.array([1, 2, 3, 2, 1], np.uint64)
    new = s.test_and_add(a)
    assert new.tolist() == [True, True, True, False, False]
    new2 = s.test_and_add(np.array([3, 4], np.uint64))
    assert new2.tolist() == [False, True]
    assert len(s) == 4
    assert s.contains(np.array([1, 4, 99], np.uint64)).tolist() == [True, True, False]


def test_seen_shard_roundtrip():
    s = SeenShard(capacity=2000, seed=2)
    h = np.unique(_hashes(1500, 13))
    s.test_and_add(h)
    t = SeenShard.from_state(s.to_state())
    assert (t.dump_hashes() == s.dump_hashes()).all()
    assert not t.test_and_add(h[:100]).any()


def test_seen_shard_sorted_store_paths():
    """Exercise the sorted-array exact store across merges: inserts
    past the buffer bound, rollback of merged AND unmerged hashes,
    membership after both."""
    s = SeenShard(capacity=1 << 15, seed=4)
    h1 = np.unique(_hashes(6000, 31))
    s.test_and_add(h1)
    s._merge_buf()  # force h1 into the sorted store
    h2 = np.unique(_hashes(100, 37)) + np.uint64(1)
    h2 = np.setdiff1d(h2, h1)
    s.test_and_add(h2)  # stays in the buffer
    assert len(s) == len(h1) + len(h2)
    # rollback one merged and one unmerged hash
    s.remove(np.array([h1[10], h2[0]], np.uint64))
    assert len(s) == len(h1) + len(h2) - 2
    assert not s.contains(np.array([h1[10], h2[0]], np.uint64)).any()
    assert s.contains(np.array([h1[11], h2[1]], np.uint64)).all()
    # re-add after rollback works (the crawl's cap-reject → later re-admit)
    assert s.test_and_add(np.array([h1[10]], np.uint64)).all()
    assert s.nbytes() >= 8 * len(h1)


def test_overflow_raises():
    f = CuckooFilter(capacity=64, seed=1)
    with pytest.raises(RuntimeError):
        # way past capacity → eventually fails to place
        f.add_batch(np.unique(_hashes(5000, 21)))


def test_seen_shard_grows_past_capacity():
    """Capacity is a startup hint: inserting far beyond it triggers
    deterministic grow-and-rebuild instead of RuntimeError."""
    import numpy as np

    from searchengine_ray.state.cuckoo import SeenShard

    sh = SeenShard(capacity=1024, seed=3)
    rng = np.random.default_rng(12)
    hashes = rng.integers(1, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
    mask = sh.test_and_add(hashes)
    uniq = np.unique(hashes)
    assert mask.sum() == len(uniq)
    assert len(sh) == len(uniq)
    # all inserted values are still members after the rebuilds
    assert sh.contains(uniq).all()
    # and a state round-trip preserves membership
    sh2 = SeenShard.from_state(sh.to_state())
    assert sh2.contains(uniq).all()
    assert len(sh2) == len(sh)
