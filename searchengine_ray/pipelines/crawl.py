"""Distributed crawl engine (Ray) — deterministic epoch pipeline.

Per epoch (SURVEY.md §7.0):

    host actors: politeness-greedy dequeue + outcome resolve   (control)
      → fetch/decode actor pool (payload, parallel, order-free) (data)
      → candidate prep: explode links → canonicalize → filter   (vector)
      → host actors: robots + quota (per-host order preserved)  (control)
      → seen actors: cuckoo test_and_add (per-hash order)       (control)
      → sequencer actor: shard caps + budget + enqueue_seq      (control)
      → host actors: frontier append                            (control)
      → parquet: content / crawl order / metrics / checkpoint   (sink)

The admission ladder is a fully actor-chained DAG: fetch candidate
chunks flow fetch→host(phase1)→seen(phase2)→sequencer(phase3)→
host(append) as plasma objects, the driver only SUBMITS tasks (it
blocks per epoch on exactly two things: the dequeue picks and the
content metadata).  Actor-mailbox FIFO gives the ordering the oracle
semantics need: phase1(wave w+1) queues behind append(wave w) on each
host actor, the next epoch's dequeue queues behind the last append,
and seen-shard rollbacks are pulled by the next wave's phase-2 (or an
idempotent epoch-end flush).  Epoch metrics are object refs resolved
lazily at result().

Determinism: all control-plane state (politeness clocks, fail
counters, quotas, seen membership) is partitioned so that every state
cell is owned by exactly one actor and receives its inputs in a
canonical order (global candidate order = (fetch_seq, link position)),
making results independent of parallelism (SURVEY.md §7.5#1) — the
property the oracle-conformance tests assert at multiple ``num_cpus``.

The fetch pool is a *persistent* set of ``ray.remote`` actors reused
across epochs (broadcast store/images deserialized once per actor —
``ray.put`` once, read in ``__init__``), rather than a fresh
``map_batches`` actor pool per epoch whose spin-up would dominate
small epochs; content post-processing at scale (phash dedup, ANN,
analytics) flows through Ray Data over the written content table
(``pipelines/queries.py``).

Ordering-edge notes vs the oracle (membership-equal, reason strings
may differ): a shard-cap rejection happens before dedup in the oracle
but after dedup here, so cap-rejected candidates are rolled back out
of the seen filters (``SeenShard.remove``); within an epoch a later
duplicate of a cap-rejected candidate reports ``dup`` here vs
``shard_full`` there.

Reference lifecycle being reimplemented: ``runCrawling``
(``SearchEngine.cpp:842-907``); admission ``Model::pushPending``
(``SearchEngine.h:800-836``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources import synth
from ..sources.storage import VersionedTable
from ..state.cuckoo import SeenShard
from ..state.host import HostShards
from ..stages.fetch import CAND_SCHEMA, CONTENT_SCHEMA, FetchDecode, make_candidates
from .oracle import CrawlConfig

METRICS_SCHEMA = pa.schema(
    [
        ("epoch", pa.int32()),
        ("picked", pa.int64()),
        ("fetched_ok", pa.int64()),
        ("fetch_failed", pa.int64()),
        ("candidates", pa.int64()),
        ("admitted", pa.int64()),
        ("rejected_static", pa.int64()),
        ("rejected_robots_quota", pa.int64()),
        ("rejected_dup", pa.int64()),
        ("frontier_size", pa.int64()),
        ("seen_size", pa.int64()),
    ]
)


@dataclass
class EngineResult:
    crawl_order: pa.Table = None
    content: pa.Table = None
    metrics: pa.Table = None
    seen: set = field(default_factory=set)
    epochs: int = 0


def _as_ref(ray, x):
    """ray.put unless already an ObjectRef (lets callers broadcast the
    web store / images once and share the ref across engine layers)."""
    if x is None or isinstance(x, ray.ObjectRef):
        return x
    return ray.put(x)


def _order_keys(fseq: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Pack the global candidate order (fetch_seq, pos) into one sortable
    int64 key (fetch_seq may be -1 for seeds; pos < 2^31)."""
    return (fseq.astype(np.int64) + 1) * (1 << 32) + pos.astype(np.int64)


_EMPTY_RB = pa.table({"url_hash": pa.array([], pa.uint64())})


def _empty_admitted() -> pa.Table:
    cols = {k.name: pa.array([], k.type) for k in CAND_SCHEMA}
    cols["enqueue_seq"] = pa.array([], pa.int64())
    return pa.table(cols)


class _Sequencer:
    """Phase-3 actor: per-shard caps + global budget + enqueue_seq
    assignment (the reference's pushPending steps 1/6/8,
    SearchEngine.h:800-836).  A single actor processing waves in
    submission order keeps the admission sequence deterministic without
    a driver hop — the driver never blocks inside the ladder."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.enqueue_seq = 0
        # per-shard admits since the epoch started: frontier appends are
        # deferred to the next epoch's dequeue, so the host actors'
        # piggybacked sizes stay pre-epoch — the sequencer adds its own
        # running admissions to keep the cap math identical
        self.shard_add: dict[int, int] = {}

    def get_seq(self) -> int:
        return self.enqueue_seq

    def set_seq(self, v: int) -> None:
        self.enqueue_seq = int(v)

    def process(self, reset_sizes: bool, n_chunks: int, n_hosts: int, *refs):
        """(cand chunks ×n_chunks, phase1 outputs ×n_hosts, phase2
        outputs ×rest) → (admitted table, rollback table, stats)."""
        cfg = self.cfg
        if reset_sizes:
            self.shard_add = {}
        chunks = refs[:n_chunks]
        p1s = refs[n_chunks : n_chunks + n_hosts]
        p2s = refs[n_chunks + n_hosts :]
        stats = {
            "candidates": 0,
            "admitted": 0,
            "rejected_robots_quota": 0,
            "rejected_dup": 0,
        }
        cand_parts = [c for c in chunks if len(c)]
        if not cand_parts:
            return _empty_admitted(), _EMPTY_RB, stats
        cand = pa.concat_tables(cand_parts)  # ascending (fetch_seq, pos)
        stats["candidates"] = len(cand)
        keys = _order_keys(
            cand["fetch_seq"].to_numpy(zero_copy_only=False),
            cand["pos"].to_numpy(zero_copy_only=False),
        )
        ok1 = np.zeros(len(cand), bool)
        sizes: dict[int, int] = {}
        for chain, sz in p1s:
            sizes.update(sz)
            if len(chain):
                ck = _order_keys(
                    chain["fetch_seq"].to_numpy(zero_copy_only=False),
                    chain["pos"].to_numpy(zero_copy_only=False),
                )
                ok1[np.searchsorted(keys, ck)] = chain["ok"].to_numpy(
                    zero_copy_only=False
                )
        new_full = np.zeros(len(cand), bool)
        total_seen = 0
        for k2, mask, cnt in p2s:
            total_seen += cnt
            if len(k2):
                new_full[np.searchsorted(keys, k2)] = mask
        stats["rejected_robots_quota"] = int((~ok1).sum())
        stats["rejected_dup"] = int(ok1.sum()) - int(new_full.sum())
        surv2 = np.nonzero(new_full)[0]
        if len(surv2) == 0:
            return _empty_admitted(), _EMPTY_RB, stats
        sub2 = cand.take(pa.array(surv2))
        shard2 = sub2["shard"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(sub2), bool)
        room = {
            s: max(
                0,
                cfg.max_frontier_per_shard
                - sizes.get(s, 0)
                - self.shard_add.get(s, 0),
            )
            for s in set(shard2.tolist())
        }
        if any(r < len(sub2) for r in room.values()):  # cap can bind → in-order scan
            for i in range(len(sub2)):
                s = int(shard2[i])
                if room[s] <= 0:
                    keep[i] = False
                else:
                    room[s] -= 1
        if cfg.max_crawl_urls < (1 << 40):  # budget can bind
            # phase-2 counts include every insert of this wave; discount
            # the cap-rejected ones (rolled back) before the budget check
            over = (total_seen - int((~keep).sum())) - cfg.max_crawl_urls
            if over > 0:
                kept_idx = np.nonzero(keep)[0]
                for i in kept_idx[::-1][:over]:
                    keep[i] = False
        rollback = np.nonzero(~keep)[0]
        rb_tbl = (
            pa.table({"url_hash": sub2.take(pa.array(rollback))["url_hash"]})
            if len(rollback)
            else _EMPTY_RB
        )
        surv3 = np.nonzero(keep)[0]
        if len(surv3) == 0:
            return _empty_admitted(), rb_tbl, stats
        final = sub2.take(pa.array(surv3))
        seqs = np.arange(
            self.enqueue_seq, self.enqueue_seq + len(final), dtype=np.int64
        )
        self.enqueue_seq += len(final)
        final = final.append_column("enqueue_seq", pa.array(seqs))
        stats["admitted"] = len(final)
        fshard = final["shard"].to_numpy(zero_copy_only=False)
        uniq, cnts = np.unique(fshard, return_counts=True)
        for s, c in zip(uniq.tolist(), cnts.tolist()):
            self.shard_add[s] = self.shard_add.get(s, 0) + c
        return final, rb_tbl, stats



def _plan_chunks(n_ok: int, nf: int, waves: int) -> list[tuple[int, int]]:
    """(start, length) fetch-chunk spans: waves 1..W-1 uniform, the
    LAST wave half-volume — every actor still gets equal total work
    (W-1 big chunks + 1 half chunk), but the epoch-boundary admission
    ladder (phase1→phase2→sequencer on the final wave) processes half
    the candidates, directly shrinking the serial tail the next
    dequeue waits on.  Falls back to one uniform wave for tiny epochs."""
    if n_ok <= 0:
        return []
    denom = max(1, nf * (2 * waves - 1))  # half-chunks
    half = max(32, -(-n_ok // denom))
    big = 2 * half
    spans = []
    i = 0
    # W-1 uniform rounds of big chunks
    for _ in range(max(0, waves - 1) * nf):
        if i >= n_ok:
            break
        c = min(big, n_ok - i)
        spans.append((i, c))
        i += c
    # final half-size round (remainder spread over nf chunks)
    rem = n_ok - i
    if rem > 0:
        c = -(-rem // nf)
        while i < n_ok:
            spans.append((i, min(c, n_ok - i)))
            i += min(c, n_ok - i)
    return spans


class _Dispatcher:
    """Merge+dispatch actor: turns the per-host-actor dequeue tables
    into the epoch's globally ordered picks AND submits the fetch chunk
    tasks itself, chained directly behind the dequeue refs — the fetch
    pool starts the epoch before the engine-loop process even wakes.
    The engine pulls only ((n, n_ok), [(content_ref, key_ref), ...])
    per epoch; the order part and the pick table stay in plasma.

    An actor (not a task) so the chunk-task return refs it owns live
    for the engine's lifetime (a reused task worker could be reaped
    while content refs are still pending resolution at result())."""

    def __init__(self, fetch_actors):
        self.fetch_actors = fetch_actors

    def merge_dispatch(
        self,
        fetch_seq_start: int,
        epoch: int,
        waves: int,
        dispatch: bool,
        *tables,
    ):
        import ray

        picks = pa.concat_tables(tables).sort_by(
            [("t_sched", "ascending"), ("enqueue_seq", "ascending")]
        )
        n = len(picks)
        fseq = np.arange(fetch_seq_start, fetch_seq_start + n, dtype=np.int64)
        picks = picks.append_column("fetch_seq", pa.array(fseq)).append_column(
            "epoch", pa.array(np.full(n, epoch, np.int32))
        )
        order = picks.select(
            ["fetch_seq", "url", "url_hash", "t_sched", "epoch"]
        )
        ok = picks.filter(pc.greater_equal(picks["content_row"], 0))
        n_ok = len(ok)
        rets = []
        if n_ok:
            ok_ref = ray.put(ok)  # one plasma object, sliced in-actor
            if not dispatch:
                # dynamic-dispatch mode: the engine loop submits spans
                # itself — hand it the pick table's ref instead
                rets = ok_ref
            else:
                nf = len(self.fetch_actors)
                spans = _plan_chunks(n_ok, nf, waves)
                rets = [
                    self.fetch_actors[k % nf]
                    .__call__.options(num_returns=2)
                    .remote(ok_ref, i, c)
                    for k, (i, c) in enumerate(spans)
                ]
        return order, ((n, n_ok), rets)


class RayCrawl:
    def __init__(
        self,
        store: synth.WebStore,
        images: pa.Table,
        truth: pa.Table | None,
        cfg: CrawlConfig | None = None,
        out_dir: str = "/tmp/raycrawl",
        n_host_actors: int = 4,
        n_fetch_actors: int = 4,
        checkpoint: bool = False,
        write_payload: bool = True,
    ):
        import ray

        self.ray = ray
        self.cfg = cfg or CrawlConfig()
        self.out_dir = out_dir
        self.ckpt_dir = os.path.join(out_dir, "ckpt")
        self.checkpoint = checkpoint
        os.makedirs(out_dir, exist_ok=True)
        # append-only versioned logs (Lance when the wheel exists,
        # parquet+manifest otherwise — sources/storage.py): one version
        # per checkpointed epoch, committed by the epoch dir's atomic
        # rename; resume truncates uncommitted (crashed) appends
        self.content_log = (
            VersionedTable(os.path.join(out_dir, "content_log"))
            if checkpoint
            else None
        )
        self.order_log = (
            VersionedTable(os.path.join(out_dir, "order_log"))
            if checkpoint
            else None
        )
        self.n_host_actors = min(n_host_actors, self.cfg.shard_count)
        self.n_seen = self.cfg.seen_shards
        self.store_ref = _as_ref(ray, store)
        self.images_ref = _as_ref(ray, images)
        self.truth_ref = _as_ref(ray, truth)

        HostActor = ray.remote(num_cpus=0)(HostShards)
        SeenActor = ray.remote(num_cpus=0)(_SeenActor)
        SeqActor = ray.remote(num_cpus=0)(_Sequencer)
        FetchActor = ray.remote(num_cpus=1)(FetchDecode)
        shard_of_actor = {
            a: [
                s
                for s in range(self.cfg.shard_count)
                if s % self.n_host_actors == a
            ]
            for a in range(self.n_host_actors)
        }
        self.host_actors = [
            HostActor.remote(self.cfg, shard_of_actor[a], self.store_ref)
            for a in range(self.n_host_actors)
        ]
        self.owner_of_shard = {
            s: a for a, ss in shard_of_actor.items() for s in ss
        }
        self._owner_lut = np.array(
            [self.owner_of_shard[s] for s in range(self.cfg.shard_count)],
            np.int64,
        )
        self.seen_actors = [
            # start each shard's cuckoo filter SMALL and let the 0.90-load
            # doubling rebuild grow it with fill — resident memory then
            # tracks the URL count (~8 B/URL exact + ~2.4 B/URL filter at
            # capacity) instead of paying a 10^10-sized table up front;
            # rebuild re-inserts are vectorized and amortize O(1)/URL
            SeenActor.remote(1 << 14, k, self.n_seen) for k in range(self.n_seen)
        ]
        self.seq_actor = SeqActor.remote(self.cfg)
        self.payload_dir = (
            os.path.join(out_dir, "payload") if write_payload else None
        )
        if self.payload_dir:
            os.makedirs(self.payload_dir, exist_ok=True)
        self.fetch_actors = [
            FetchActor.remote(
                self.store_ref,
                self.images_ref,
                self.truth_ref,
                self.cfg.shard_count,
                self.payload_dir,
            )
            for _ in range(n_fetch_actors)
        ]
        self.disp_actor = ray.remote(num_cpus=0)(_Dispatcher).remote(
            self.fetch_actors
        )
        self.fetch_seq = 0
        self.epoch = 0
        self._order_parts: list[pa.Table] = []
        self._content_parts: list[pa.Table] = []
        self._metric_refs: list[dict] = []
        self._pending_rb: tuple = (None, None)  # (tag, rollback table ref)
        self._wave_tag = 0
        self._append_refs: list = []
        self._unappended: list = []  # admitted-table refs awaiting append
        self._prefetched_dequeue: tuple | None = None
        self._seed_stats_ref = None
        self._prof: list[dict] = []  # CRAWL_PROFILE=1 per-epoch timings

    # ------------------------------------------------------------ seeding
    def admit_seeds(self, seeds: list[str]) -> None:
        cand = make_candidates(
            seeds,
            [-1] * len(seeds),
            list(range(len(seeds))),
            self.cfg.shard_count,
        )
        self._seed_stats_ref = self._submit_wave([cand], first_of_epoch=True)

    # ---------------------------------------------------------- admission
    def _submit_wave(
        self,
        cand_refs: list,
        first_of_epoch: bool = False,
        defer_append: bool = False,
    ):
        """Submit one wave's admission ladder — fetch candidate chunks
        (object refs or tables, in ascending fetch_seq order) chained
        through phase1 (host actors) → phase2 (seen actors, pulling the
        previous wave's rollback) → sequencer.  Frontier appends are
        DEFERRED: the admitted-table refs accumulate and ride into the
        next epoch's ``append_and_dequeue`` (one hop less at the epoch
        boundary; the sequencer tracks per-shard admits so cap math
        stays exact).  Pure submission; returns the wave's stats ref."""
        self._wave_tag += 1
        tag = self._wave_tag
        p1 = [
            a.admit_phase1_chunks.remote(*cand_refs) for a in self.host_actors
        ]
        rb_tag, rb_ref = self._pending_rb
        p2 = [
            a.test_and_add_wave.remote(k, self.n_seen, rb_tag, rb_ref, *p1)
            for k, a in enumerate(self.seen_actors)
        ]
        adm_ref, rb_new, stats_ref = self.seq_actor.process.options(
            num_returns=3
        ).remote(first_of_epoch, len(cand_refs), len(p1), *cand_refs, *p1, *p2)
        # incremental appends (round 4): each wave's admitted table is
        # appended as soon as the sequencer emits it — waves 1..W-1
        # apply DURING the epoch, so the boundary append is only the
        # last wave's share.  Cap math stays exact because phase1 now
        # piggybacks the post-dequeue size SNAPSHOT, not live sizes.
        # The LAST wave of an epoch defers instead: its admitted table
        # rides INTO the prefetched append_and_dequeue (one actor-task
        # hop less on the boundary critical path).
        if defer_append:
            self._unappended.append(adm_ref)
        else:
            self._append_refs.extend(
                a.append_many.remote(adm_ref) for a in self.host_actors
            )
        self._pending_rb = (tag, rb_new)
        return stats_ref

    def _flush_appends(self) -> None:
        """Submit any still-deferred appends (normally only the epoch's
        LAST wave — earlier waves append incrementally); used by the
        non-prefetched dequeue paths, checkpoint snapshots, and
        result()."""
        if self._unappended:
            self._append_refs.extend(
                a.append_many.remote(*self._unappended)
                for a in self.host_actors
            )
            self._unappended = []

    def _flush_rollback(self) -> None:
        """Idempotently apply the last wave's pending seen-set rollback
        (pulled by the next wave's phase-2 otherwise)."""
        tag, rb = self._pending_rb
        if rb is not None:
            for a in self.seen_actors:
                a.apply_rollback.remote(tag, rb)
            self._pending_rb = (None, None)

    # -------------------------------------------------------------- epoch
    def run_epoch(self, prefetch_next: bool = False) -> bool:
        """One epoch; returns False when the crawl is finished.

        Driver blocks on exactly one thing per epoch: the dequeue picks
        (prefetched behind the previous epoch's appends when
        ``prefetch_next`` allows, so the get is usually instant); the
        admission ladder is an actor-chained DAG (module docstring) and
        content metadata refs are resolved lazily at result()/
        checkpoint."""
        ray = self.ray
        cfg = self.cfg
        if cfg.max_fetches is not None and self.fetch_seq >= cfg.max_fetches:
            return False
        prof = os.environ.get("CRAWL_PROFILE") == "1"
        t_ep = time.perf_counter() if prof else 0.0
        epoch = self.epoch
        remaining = (
            None if cfg.max_fetches is None else cfg.max_fetches - self.fetch_seq
        )
        pick_bound = cfg.per_shard_batch * cfg.shard_count
        if self._prefetched_dequeue is not None:
            pf_epoch, pf_futs = self._prefetched_dequeue
            self._prefetched_dequeue = None
        else:
            pf_epoch, pf_futs = None, None
        if remaining is not None and remaining < pick_bound:
            # budget may bind mid-epoch: select first, slice to budget,
            # THEN resolve outcomes — so host fail-counters never record
            # picks the budget cut off (oracle's early break; keeps a
            # checkpointed run resumable past a raised limit)
            self._flush_appends()
            sel = pa.concat_tables(
                ray.get([a.dequeue_select.remote(epoch) for a in self.host_actors])
            ).sort_by([("t_sched", "ascending"), ("enqueue_seq", "ascending")])
            sel = sel.slice(0, remaining)
            sel = sel.append_column(
                "order", pa.array(np.arange(len(sel), dtype=np.int64))
            )
            owner = self._owner_lut[sel["shard"].to_numpy(zero_copy_only=False)]
            futs, orders = [], []
            for a, actor in enumerate(self.host_actors):
                idx = np.nonzero(owner == a)[0]
                if len(idx) == 0:
                    continue
                part = sel.take(pa.array(idx))
                futs.append(actor.resolve_outcomes.remote(part.drop_columns(["order"])))
                orders.append(part["order"].to_numpy(zero_copy_only=False))
            resolved = ray.get(futs)
            if resolved:
                glued = pa.concat_tables(resolved).append_column(
                    "order", pa.array(np.concatenate(orders))
                )
                picks = glued.sort_by("order").drop_columns(["order"])
            else:
                from ..state.host import PICKS_SCHEMA

                picks = pa.table(
                    {k.name: [] for k in PICKS_SCHEMA}, schema=PICKS_SCHEMA
                )
            picks_local = picks
        else:
            if pf_futs is not None and pf_epoch == epoch:
                futs = pf_futs
            else:
                self._flush_appends()
                futs = [a.dequeue_epoch.remote(epoch) for a in self.host_actors]
            if not self.checkpoint:
                # plain path: merge/sort/fetch_seq assignment AND the
                # fetch chunk submission happen in the dispatcher actor,
                # chained behind the dequeue refs — the fetch pool is
                # already working before this process wakes; only the
                # (n, n_ok) tuple plus the chunk refs land here
                mode = os.environ.get("CRAWL_DISPATCH", "static")
                waves = int(os.environ.get("CRAWL_WAVES", "4"))
                order_ref, payload_ref = self.disp_actor.merge_dispatch.options(
                    num_returns=2
                ).remote(
                    self.fetch_seq, epoch, waves, mode != "dynamic", *futs
                )
                picks_local = None
                (n, n_ok), rets_or_ref = ray.get(payload_ref)
            else:
                # checkpoint runs materialize picks locally — the epoch's
                # order part feeds the versioned log write below
                picks_local = pa.concat_tables(ray.get(futs)).sort_by(
                    [("t_sched", "ascending"), ("enqueue_seq", "ascending")]
                )
        t_picks = time.perf_counter() if prof else 0.0
        if picks_local is not None:
            n = len(picks_local)
            if n == 0:
                return False  # empty frontier (dequeue is the emptiness probe)
            fseq = np.arange(self.fetch_seq, self.fetch_seq + n, dtype=np.int64)
            picks_local = picks_local.append_column(
                "fetch_seq", pa.array(fseq)
            ).append_column("epoch", pa.array(np.full(n, epoch, np.int32)))
            self._order_parts.append(
                picks_local.select(
                    ["fetch_seq", "url", "url_hash", "t_sched", "epoch"]
                )
            )
            ok_picks = picks_local.filter(
                pc.greater_equal(picks_local["content_row"], 0)
            )
            n_ok = len(ok_picks)
            picks_ref = ray.put(ok_picks) if n_ok else None
        else:
            if n == 0:
                return False  # empty frontier (dequeue is the emptiness probe)
            self._order_parts.append(order_ref)
            # dynamic mode receives the pick table's plasma ref; static
            # mode receives the already-submitted chunk task refs
            picks_ref = rets_or_ref if not isinstance(rets_or_ref, list) else None
        self.fetch_seq += n
        t_prep = time.perf_counter() if prof else 0.0
        stat_refs: list = []
        content_refs: list = []
        if n_ok:
            # Round-robin chunk waves over the persistent fetch pool;
            # each actor returns (content metadata, candidate chunk) as
            # TWO object refs — content comes back to the driver, the
            # candidate chunk chains straight into the admission DAG.
            # Everything below is submission-only; the fetch pool,
            # the admission actors, and the driver all run concurrently.
            nf = len(self.fetch_actors)
            mode = os.environ.get("CRAWL_DISPATCH", "static")
            if mode == "dynamic":
                # work-stealing dispatch: guided (decaying) spans; each
                # completion hands the next span to the actor that
                # finished — a slow actor never strands queued chunks.
                # Costs one driver reaction per span, so it pays off
                # only when per-actor speed skew is large.
                min_chunk = int(os.environ.get("CRAWL_MIN_CHUNK", "128"))
                spans = []
                i, rem = 0, n_ok
                while rem > 0:
                    c = min(rem, max(min_chunk, rem // (2 * nf)))
                    spans.append((i, c))
                    i += c
                    rem -= c
                rets: list = []
                owner_of: dict = {}
                outstanding: list = []
                next_span = 0
                flushed = 0

                def submit(actor_idx: int) -> None:
                    nonlocal next_span
                    s, c = spans[next_span]
                    cref, kref = (
                        self.fetch_actors[actor_idx]
                        .__call__.options(num_returns=2)
                        .remote(picks_ref, s, c)
                    )
                    rets.append((cref, kref))
                    owner_of[cref] = actor_idx
                    outstanding.append(cref)
                    next_span += 1

                def flush_waves() -> None:
                    nonlocal flushed
                    while next_span - flushed >= nf or (
                        next_span == len(spans) and flushed < len(spans)
                    ):
                        wave = rets[flushed : flushed + nf]
                        content_refs.extend(c for c, _k in wave)
                        stat_refs.append(
                            self._submit_wave(
                                [k for _c, k in wave],
                                first_of_epoch=(flushed == 0),
                                defer_append=(
                                    next_span == len(spans)
                                    and flushed + len(wave) >= len(spans)
                                ),
                            )
                        )
                        flushed += len(wave)

                depth = 3  # outstanding spans per actor
                for a in range(nf):
                    for _ in range(depth):
                        if next_span < len(spans):
                            submit(a)
                flush_waves()
                while next_span < len(spans):
                    done, outstanding = ray.wait(
                        outstanding, num_returns=1, fetch_local=False
                    )
                    submit(owner_of.pop(done[0]))
                    flush_waves()
            else:
                # static pre-submission: every span queued upfront (no
                # driver in the loop — actors chain chunk to chunk with
                # zero reaction latency); uniform spans over `waves`
                # rounds per actor.  4 rounds beat 2 consistently at 32
                # CPUs (smaller last-wave tail before the next dequeue
                # can fire) and are neutral at 8 — sweep in BASELINE.md.
                # A geometrically-decaying (LPT-style) schedule was A/B
                # tested and LOST to uniform at 32 CPUs (~+1.2 s/run,
                # interleaved fresh processes) — the larger first-wave
                # chunks straggle worse than the uniform tail saves.
                # On the plain path the dispatcher actor has ALREADY
                # submitted these chunk tasks (same spans, same actor
                # round-robin); only the ladder waves are grouped here.
                if picks_local is None:
                    rets = rets_or_ref
                else:
                    waves = int(os.environ.get("CRAWL_WAVES", "4"))
                    spans = _plan_chunks(n_ok, nf, waves)
                    rets = [
                        self.fetch_actors[k % nf]
                        .__call__.options(num_returns=2)
                        .remote(picks_ref, i, c)
                        for k, (i, c) in enumerate(spans)
                    ]
                # Ladder grouping: one group per fetch round (nf
                # chunks).  Tapering the final round into halving
                # subgroups (nf/2 ... 1, so the last ladder walk is
                # one chunk) was A/B tested and LOST by 0.3-0.5 s/run
                # at 32 CPUs — the extra sequencer hops serialize and
                # cost more than the smaller data tail saves.
                for w0 in range(0, len(rets), nf):
                    wave = rets[w0 : w0 + nf]
                    content_refs.extend(c for c, _k in wave)
                    stat_refs.append(
                        self._submit_wave(
                            [k for _c, k in wave],
                            first_of_epoch=(w0 == 0),
                            defer_append=(w0 + nf >= len(rets)),
                        )
                    )
        t_submit = time.perf_counter() if prof else 0.0
        self._flush_rollback()
        # prefetch the NEXT epoch's dequeue, carrying this epoch's
        # deferred appends in the same task (one boundary hop): the task
        # queues behind this epoch's phase-1s (actor FIFO) and computes
        # while the driver is between epochs.  Only on the plain path
        # (no binding budget, no checkpoint snapshots which must observe
        # appended-but-not-dequeued state).
        if prefetch_next and cfg.max_fetches is None and not self.checkpoint:
            # waves 1..W-1 appended incrementally (actor FIFO runs them
            # first); the LAST wave's admitted table rides in the
            # prefetched append_and_dequeue — one hop on the boundary
            adm = self._unappended
            self._unappended = []
            self._prefetched_dequeue = (
                epoch + 1,
                [
                    a.append_and_dequeue.remote(epoch + 1, *adm)
                    for a in self.host_actors
                ],
            )
        # metrics are refs resolved lazily at result(); seen/frontier
        # sizes are derived arithmetically there (seen == Σ admitted,
        # frontier == Σ admitted − Σ picked) — no per-epoch RPCs
        self._metric_refs.append(
            {
                "epoch": epoch,
                "picked": n,
                "fetched_ok": None,  # resolved with the content refs
                "stats": stat_refs,
            }
        )
        # content metadata stays as refs — resolved off the epoch
        # critical path (result(), or write_checkpoint below)
        self._content_parts.append((epoch, content_refs))
        if prof:
            t_end = time.perf_counter()
            self._prof.append(
                {
                    "epoch": epoch,
                    "picked": n,
                    "picks_wait_ms": round((t_picks - t_ep) * 1e3, 2),
                    "prep_ms": round((t_prep - t_picks) * 1e3, 2),
                    "submit_ms": round((t_submit - t_prep) * 1e3, 2),
                    "tail_ms": round((t_end - t_submit) * 1e3, 2),
                }
            )
        self.epoch += 1
        if self.checkpoint:
            self.write_checkpoint()
        if cfg.max_fetches is not None and self.fetch_seq >= cfg.max_fetches:
            return False
        return True

    def _resolve_content(self) -> None:
        """Materialize any pending per-epoch content refs (in place)."""
        ray = self.ray
        for i, part in enumerate(self._content_parts):
            if not isinstance(part, tuple):
                continue
            ep, refs = part
            cparts = [c for c in ray.get(refs) if len(c)] if refs else []
            content = (
                pa.concat_tables(cparts).sort_by("fetch_seq")
                if cparts
                else pa.table(
                    {k.name: [] for k in CONTENT_SCHEMA}, schema=CONTENT_SCHEMA
                )
            )
            self._content_parts[i] = content
            for m in self._metric_refs:
                if m["epoch"] == ep:
                    m["fetched_ok"] = len(content)

    def warmup(self) -> None:
        """Block until every fetch actor finished deserializing its
        broadcast state — otherwise each early epoch's gather barrier
        stalls on whichever actor is still cold.  Also spins up the
        worker process for the picks-merge task (a cold first call costs
        ~1 s of full-pool idle on epoch 0)."""
        from ..state.host import PICKS_SCHEMA

        empty = pa.table({k.name: [] for k in PICKS_SCHEMA}, schema=PICKS_SCHEMA)
        disp_warm = self.disp_actor.merge_dispatch.options(num_returns=2).remote(
            0, -1, 1, True, empty
        )
        self.ray.get([a.warm.remote() for a in self.fetch_actors])
        self.ray.get(disp_warm[1])

    def run(self, max_epochs: int | None = None) -> EngineResult:
        self.warmup()
        limit = max_epochs if max_epochs is not None else self.cfg.max_epochs
        while self.epoch < limit:
            if not self.run_epoch(prefetch_next=self.epoch + 1 < limit):
                break
        return self.result()

    def _metrics_rows(self) -> list[dict]:
        """Resolve the lazily-collected per-epoch metric refs.  The
        seen/frontier sizes derive arithmetically from the admission
        counters (seen == Σ admitted incl. seeds; frontier == seen −
        Σ picked) — every admit inserted into the seen set survives
        (rollbacks never count as admitted) and every pick permanently
        leaves the frontier."""
        ray = self.ray
        rows = []
        seen_cum = 0
        if self._seed_stats_ref is not None:
            seen_cum += ray.get(self._seed_stats_ref)["admitted"]
        picked_cum = 0
        for m in self._metric_refs:
            stats = {
                "candidates": 0,
                "admitted": 0,
                "rejected_robots_quota": 0,
                "rejected_dup": 0,
            }
            for s in ray.get(list(m["stats"])):
                for k in stats:
                    stats[k] += s[k]
            seen_cum += stats["admitted"]
            picked_cum += m["picked"]
            rows.append(
                {
                    "epoch": m["epoch"],
                    "picked": m["picked"],
                    "fetched_ok": m["fetched_ok"],
                    "fetch_failed": m["picked"] - m["fetched_ok"],
                    "candidates": stats["candidates"],
                    "admitted": stats["admitted"],
                    "rejected_static": 0,
                    "rejected_robots_quota": stats["rejected_robots_quota"],
                    "rejected_dup": stats["rejected_dup"],
                    "frontier_size": seen_cum - picked_cum,
                    "seen_size": seen_cum,
                }
            )
        return rows

    def _drain_prefetch(self) -> None:
        """A prefetched append_and_dequeue has already consumed frontier
        picks and advanced politeness clocks; if no further epoch runs
        those picks would silently vanish.  result()/checkpoint drain it
        through the normal epoch path so state stays exact."""
        if self._prefetched_dequeue is not None:
            self.run_epoch(prefetch_next=False)

    def result(self) -> EngineResult:
        ray = self.ray
        self._drain_prefetch()
        self._flush_appends()  # frontier state complete for any later use
        if self._append_refs:  # surface any admission-chain errors
            ray.get(self._append_refs)
            self._append_refs = []
        self._resolve_content()
        # plain-path epochs store the order part as the merge task's
        # object ref (never pulled during the run) — resolve them now
        self._order_parts = [
            ray.get(p) if isinstance(p, ray.ObjectRef) else p
            for p in self._order_parts
        ]
        res = EngineResult()
        res.epochs = self.epoch
        res.crawl_order = (
            pa.concat_tables(self._order_parts)
            if self._order_parts
            else pa.table({"fetch_seq": []})
        )
        parts = [t for t in self._content_parts if len(t)]
        res.content = pa.concat_tables(parts) if parts else None
        rows = self._metrics_rows()
        res.metrics = (
            pa.Table.from_pylist(rows, schema=METRICS_SCHEMA) if rows else None
        )
        for hs in ray.get([a.dump_hashes.remote() for a in self.seen_actors]):
            res.seen.update(int(x) for x in hs)
        return res

    # --------------------------------------------------------- checkpoint
    def write_checkpoint(self) -> None:
        ray = self.ray
        self._flush_appends()  # snapshots must include deferred appends
        self._resolve_content()
        epoch = self.epoch  # state AFTER epoch-1 completed
        d = os.path.join(self.ckpt_dir, f"epoch={epoch}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        snaps = ray.get([a.snapshot.remote() for a in self.host_actors])
        for a, (fr, hs) in enumerate(snaps):
            pq.write_table(fr, os.path.join(tmp, f"frontier-{a}.parquet"))
            pq.write_table(hs, os.path.join(tmp, f"hoststate-{a}.parquet"))
        for k, st in enumerate(ray.get([a.to_state.remote() for a in self.seen_actors])):
            pq.write_table(
                pa.table(
                    {
                        "nbuckets": [st["nbuckets"]],
                        "count": [st["count"]],
                        "evict_state": [st["evict_state"]],
                        "table": [st["table"]],
                        "exact": [st["exact"]],
                        "seed": [st["seed"]],
                        "parent_epoch": [epoch - 1],
                    }
                ),
                os.path.join(tmp, f"seen-{k}.parquet"),
            )
        # per-epoch result partitions go to the versioned append-only
        # logs (S2/S3 KeyValDB analog — KeyValueDB.hpp:154-306); the
        # epoch dir's atomic rename below is the commit point, so a
        # crash between append and publish leaves only a dangling
        # version that resume truncates
        order_v = self.order_log.append(self._order_parts[-1])
        content_v = self.content_log.append(self._content_parts[-1])
        # tiny per-epoch point-lookup index (url_hash → fetch_seq):
        # get_page reads these 2-column files instead of scanning every
        # epoch's full content table (S4/S12 — KeyValueDB.hpp:384-396)
        cpart = self._content_parts[-1]
        pq.write_table(
            cpart.select(["url_hash", "fetch_seq"]),
            os.path.join(tmp, "index.parquet"),
        )
        with open(os.path.join(tmp, "driver.json"), "w") as f:
            json.dump(
                {
                    "epoch": self.epoch,
                    "enqueue_seq": ray.get(self.seq_actor.get_seq.remote()),
                    "fetch_seq": self.fetch_seq,
                    "parent_epoch": epoch - 1,
                    "order_version": order_v,
                    "content_version": content_v,
                },
                f,
            )
        shutil.rmtree(d, ignore_errors=True)
        os.replace(tmp, d)  # atomic publish = the epoch's commit point

    @classmethod
    def resume(
        cls,
        store,
        images,
        truth,
        cfg,
        out_dir,
        n_host_actors=4,
        n_fetch_actors=4,
    ) -> "RayCrawl":
        ckpt_dir = os.path.join(out_dir, "ckpt")
        epochs = sorted(
            int(e.split("=")[1])
            for e in os.listdir(ckpt_dir)
            if e.startswith("epoch=") and not e.endswith(".tmp")
        )
        if not epochs:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        last = epochs[-1]
        d = os.path.join(ckpt_dir, f"epoch={last}")
        eng = cls(
            store,
            images,
            truth,
            cfg,
            out_dir,
            n_host_actors=n_host_actors,
            n_fetch_actors=n_fetch_actors,
            checkpoint=True,
        )
        ray = eng.ray
        with open(os.path.join(d, "driver.json")) as f:
            drv = json.load(f)
        eng.epoch = drv["epoch"]
        eng.fetch_seq = drv["fetch_seq"]
        futs = [eng.seq_actor.set_seq.remote(drv["enqueue_seq"])]
        for a, actor in enumerate(eng.host_actors):
            fr = pq.read_table(os.path.join(d, f"frontier-{a}.parquet"))
            hs = pq.read_table(os.path.join(d, f"hoststate-{a}.parquet"))
            futs.append(actor.restore.remote(fr, hs))
        for k, actor in enumerate(eng.seen_actors):
            st = pq.read_table(os.path.join(d, f"seen-{k}.parquet")).to_pylist()[0]
            futs.append(actor.restore.remote(st))
        ray.get(futs)
        # truncate any log versions past the last committed epoch
        # (appends whose epoch dir never published — crashed run), then
        # reload prior outputs from the logs so result() is complete
        eng.order_log.truncate_to(drv.get("order_version"))
        eng.content_log.truncate_to(drv.get("content_version"))
        order_all = eng.order_log.read(drv.get("order_version"))
        content_all = eng.content_log.read(drv.get("content_version"))
        if len(order_all):
            eng._order_parts.append(order_all)
        if len(content_all):
            eng._content_parts.append(content_all)
        return eng


class _SeenActor:
    """Seen-filter shard actor: cuckoo + exact store (state/cuckoo.py)."""

    def __init__(self, capacity: int, shard_id: int, n_seen: int = 1):
        self.shard = SeenShard(capacity=capacity, seed=shard_id)
        self.k = shard_id
        self.n_seen = n_seen
        self._applied_rb: set[int] = set()

    def test_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.shard.test_and_add(hashes)

    def test_and_add_wave(
        self, k: int, n_seen: int, rb_tag, rb_tbl, *phase1_outputs
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """Chained phase 2: first pull-apply the previous wave's pending
        rollback (sequencer cap/budget rejections — idempotent by tag),
        then consume the host actors' phase-1 chain OBJECTS directly (no
        driver hop), restoring global candidate order from the
        (fetch_seq, pos) keys.  → (order keys, new-mask, post-insert
        count — piggybacked for the sequencer's budget check)."""
        if rb_tbl is not None:
            self.apply_rollback(rb_tag, rb_tbl)
        parts = []
        for chain, _sizes in phase1_outputs:
            if len(chain) == 0:
                continue
            ok = chain["ok"].to_numpy(zero_copy_only=False)
            uh = chain["url_hash"].to_numpy(zero_copy_only=False)
            mine = ok & ((uh % np.uint64(n_seen)).astype(np.int64) == k)
            idx = np.nonzero(mine)[0]
            if len(idx):
                keys = _order_keys(
                    chain["fetch_seq"].to_numpy(zero_copy_only=False)[idx],
                    chain["pos"].to_numpy(zero_copy_only=False)[idx],
                )
                parts.append((keys, uh[idx]))
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, bool), len(self.shard)
        keys = np.concatenate([p[0] for p in parts])
        uh = np.concatenate([p[1] for p in parts])
        o = np.argsort(keys, kind="stable")
        keys, uh = keys[o], uh[o]
        mask = self.shard.test_and_add(uh)
        return keys, mask, len(self.shard)

    def apply_rollback(self, tag, rb_tbl: pa.Table) -> None:
        """Un-see this shard's slice of a sequencer rollback (cap/budget
        rejections).  Idempotent by wave tag — safe to arrive both via
        the next wave's phase-2 pull AND the epoch-end flush."""
        if tag in self._applied_rb:
            return
        self._applied_rb.add(tag)
        uh = rb_tbl["url_hash"].to_numpy(zero_copy_only=False)
        mine = uh[(uh % np.uint64(self.n_seen)).astype(np.int64) == self.k]
        if len(mine):
            self.shard.remove(mine)

    def remove(self, hashes: np.ndarray) -> None:
        self.shard.remove(hashes)

    def count(self) -> int:
        return len(self.shard)

    def mem_bytes(self) -> tuple[int, int]:
        """(resident bytes, member count) — cuckoo table + exact store.
        Bench probe for the bytes/URL budget (reference: ~40 B/URL,
        README.md:9 48 MB / 1M pages)."""
        return (
            int(self.shard.filter.table.nbytes) + self.shard.nbytes(),
            len(self.shard),
        )

    def dump_hashes(self) -> np.ndarray:
        return self.shard.dump_hashes()

    def to_state(self) -> dict:
        return self.shard.to_state()

    def restore(self, state: dict) -> None:
        self.shard = SeenShard.from_state(state)


_DISPATCH_ENV = (
    "CRAWL_DISPATCH",
    "CRAWL_WAVES",
    "CRAWL_MIN_CHUNK",
    "CRAWL_COORD",
    "CRAWL_PROFILE",
)


class _EngineHost:
    """Dispatcher-actor body: hosts a complete ``RayCrawl`` so ALL
    per-epoch control logic — dequeue gather, global pick sort,
    fetch_seq assignment, chunk planning, fetch/admission wave
    submission — executes in one dedicated actor process.  The driver
    never participates in an epoch boundary (it blocks once, on
    ``run``); the boundary chain is ladder → this actor → fetch pool
    (the round-2 scaling postmortem's remaining structural cut,
    NOTES_ROUND2.md)."""

    def __init__(self, refs: dict, kw: dict, dispatch_env: dict):
        import os as _os

        # dispatch-mode env vars are read by run_epoch at call time in
        # THIS process; worker processes don't inherit driver env
        for k, v in dispatch_env.items():
            _os.environ[k] = v
        self.eng = RayCrawl(
            refs["store"], refs["images"], refs.get("truth"), **kw
        )

    def admit_seeds(self, seeds: list[str]) -> None:
        self.eng.admit_seeds(seeds)

    def warmup(self) -> None:
        self.eng.warmup()

    def run(self, max_epochs: int | None = None) -> EngineResult:
        return self.eng.run(max_epochs=max_epochs)

    def result(self) -> EngineResult:
        return self.eng.result()

    def profile(self) -> list[dict]:
        return self.eng._prof

    def actor_handles(self) -> tuple:
        return (
            self.eng.fetch_actors,
            self.eng.host_actors,
            self.eng.seen_actors,
        )


class RemoteCrawl:
    """Driver facade over the dispatcher-hosted engine (plain path:
    no checkpointing).  Same surface as ``RayCrawl`` for the methods
    callers use (admit_seeds / warmup / run / actor handles); epoch
    boundaries cost zero driver round-trips."""

    def __init__(
        self,
        store,
        images,
        truth=None,
        cfg: CrawlConfig | None = None,
        out_dir: str = "/tmp/raycrawl",
        n_host_actors: int = 4,
        n_fetch_actors: int = 4,
        write_payload: bool = True,
    ):
        import ray

        self.ray = ray
        dispatch_env = {
            k: os.environ[k] for k in _DISPATCH_ENV if k in os.environ
        }
        # broadcast the fixture once; refs ride inside a dict so Ray
        # does NOT auto-resolve them into the actor (RayCrawl accepts
        # refs directly — one plasma copy total)
        refs = {
            "store": _as_ref(ray, store),
            "images": _as_ref(ray, images),
            "truth": _as_ref(ray, truth),
        }
        kw = dict(
            out_dir=out_dir,
            cfg=cfg,
            n_host_actors=n_host_actors,
            n_fetch_actors=n_fetch_actors,
            checkpoint=False,
            write_payload=write_payload,
        )
        Host = ray.remote(num_cpus=0)(_EngineHost)
        self._host = Host.remote(refs, kw, dispatch_env)
        self._handles = None

    def admit_seeds(self, seeds: list[str]) -> None:
        self.ray.get(self._host.admit_seeds.remote(seeds))

    def warmup(self) -> None:
        self.ray.get(self._host.warmup.remote())

    def run(self, max_epochs: int | None = None) -> EngineResult:
        return self.ray.get(self._host.run.remote(max_epochs))

    def result(self) -> EngineResult:
        return self.ray.get(self._host.result.remote())

    def profile(self) -> list[dict]:
        return self.ray.get(self._host.profile.remote())

    def actor_handles(self) -> tuple:
        if self._handles is None:
            self._handles = self.ray.get(self._host.actor_handles.remote())
        return self._handles

    @property
    def fetch_actors(self):
        return self.actor_handles()[0]

    @property
    def host_actors(self):
        return self.actor_handles()[1]

    @property
    def seen_actors(self):
        return self.actor_handles()[2]

    def shutdown(self) -> None:
        """Kill the host actor (its child actors die with their owner)."""
        self.ray.kill(self._host)


def run_crawl(
    seeds: list[str],
    store: synth.WebStore,
    images: pa.Table,
    truth: pa.Table | None = None,
    cfg: CrawlConfig | None = None,
    out_dir: str = "/tmp/raycrawl",
    n_host_actors: int = 4,
    n_fetch_actors: int = 4,
    checkpoint: bool = False,
    max_epochs: int | None = None,
    write_payload: bool = True,
) -> EngineResult:
    # plain path → dispatcher-hosted loop (CRAWL_COORD=driver forces
    # the in-driver loop); checkpointing stays driver-side (filesystem
    # writes + VersionedTable commits belong to the caller's process)
    if not checkpoint and os.environ.get("CRAWL_COORD", "actor") == "actor":
        eng = RemoteCrawl(
            store,
            images,
            truth,
            cfg,
            out_dir,
            n_host_actors=n_host_actors,
            n_fetch_actors=n_fetch_actors,
            write_payload=write_payload,
        )
        try:
            eng.admit_seeds(seeds)
            return eng.run(max_epochs=max_epochs)
        finally:
            eng.shutdown()
    eng = RayCrawl(
        store,
        images,
        truth,
        cfg,
        out_dir,
        n_host_actors=n_host_actors,
        n_fetch_actors=n_fetch_actors,
        checkpoint=checkpoint,
        write_payload=write_payload,
    )
    eng.admit_seeds(seeds)
    return eng.run(max_epochs=max_epochs)


def get_page(out_dir: str, url: str):
    """S12 `#get` analog (PageSearcher.cpp:119-138): fetch one crawled
    page's record — content metadata + payload bytes — from a crawl
    output directory (checkpointed run), by raw URL.

    Indexed point lookup (S4 — the reference's O(1) RAM index,
    KeyValueDB.hpp:384-396): per-epoch 2-column hash indexes locate the
    epoch + fetch_seq, then exactly ONE content-log fragment and ONE
    payload part file are read (payload parts are named by their first
    fetch_seq, so the owning file is found by name alone)."""
    import glob
    import json as _json

    from ..functions import urlkernel as uk

    canon = uk.truncate_url(url)
    if canon is None:
        return None
    h = uk.url_hash(canon)
    for idx_file in sorted(
        glob.glob(os.path.join(out_dir, "ckpt", "epoch=*", "index.parquet"))
    ):
        idx = pq.read_table(idx_file)  # (url_hash, fetch_seq) only — tiny
        m = pc.equal(idx["url_hash"], pa.scalar(h, pa.uint64()))
        hits = idx.filter(m)
        if len(hits) == 0:
            continue
        seq = int(hits["fetch_seq"][0].as_py())
        epoch_dir = os.path.dirname(idx_file)
        with open(os.path.join(epoch_dir, "driver.json")) as f:
            drv = _json.load(f)
        # one content fragment read (this epoch's appended version)
        frag = VersionedTable(
            os.path.join(out_dir, "content_log")
        ).version_delta(drv["content_version"])
        hit = frag.filter(pc.equal(frag["url_hash"], pa.scalar(h, pa.uint64())))
        if len(hit) == 0:
            continue
        row = {k: hit[k][0].as_py() for k in hit.column_names if k != "links"}
        # one payload part read: parts are part-<first_seq>.parquet with
        # non-overlapping ascending seq ranges per epoch
        pdir = os.path.join(out_dir, "payload", f"epoch={row['epoch']}")
        firsts = sorted(
            int(os.path.basename(p)[5:-8])
            for p in glob.glob(os.path.join(pdir, "part-*.parquet"))
        )
        owner = None
        for fs in firsts:
            if fs <= seq:
                owner = fs
            else:
                break
        if owner is not None:
            p = pq.read_table(os.path.join(pdir, f"part-{owner:010d}.parquet"))
            ph = p.filter(pc.equal(p["fetch_seq"], pa.scalar(seq, pa.int64())))
            if len(ph):
                row["bytes"] = ph["bytes"][0].as_py()
        return row
    return None
