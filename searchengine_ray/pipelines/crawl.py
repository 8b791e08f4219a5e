"""Distributed crawl engine (Ray) — deterministic epoch pipeline.

Per epoch (SURVEY.md §7.0):

    host actors: politeness-greedy dequeue + outcome resolve   (control)
      → fetch/decode actor pool (payload, parallel, order-free) (data)
      → candidate prep: explode links → canonicalize → filter   (vector)
      → host actors: robots + quota (per-host order preserved)  (control)
      → seen actors: cuckoo test_and_add (per-hash order)       (control)
      → driver: shard caps + global budget + enqueue_seq        (control)
      → host actors: frontier append                            (control)
      → parquet: content / crawl order / metrics / checkpoint   (sink)

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
        self.store_ref = ray.put(store)
        self.images_ref = ray.put(images)
        self.truth_ref = ray.put(truth) if truth is not None else None

        HostActor = ray.remote(num_cpus=0)(HostShards)
        SeenActor = ray.remote(num_cpus=0)(_SeenActor)
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
            SeenActor.remote(1 << 18, k) for k in range(self.n_seen)
        ]
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
        self.enqueue_seq = 0
        self.fetch_seq = 0
        self.epoch = 0
        self._order_parts: list[pa.Table] = []
        self._content_parts: list[pa.Table] = []
        self._metrics_rows: list[dict] = []

    # ------------------------------------------------------------ seeding
    def admit_seeds(self, seeds: list[str]) -> None:
        cand = make_candidates(
            seeds,
            [-1] * len(seeds),
            list(range(len(seeds))),
            self.cfg.shard_count,
        )
        self._admit(cand)

    # ---------------------------------------------------------- admission
    def _admit(self, cand: pa.Table) -> dict:
        """Run the admission ladder on candidates already in global
        order; returns counters."""
        ray = self.ray
        stats = {"candidates": len(cand), "admitted": 0,
                 "rejected_robots_quota": 0, "rejected_dup": 0}
        if len(cand) == 0:
            return stats
        # phase 1 (robots + quota, host actors) chained straight into
        # phase 2 (seen filters): each seen actor consumes the host
        # actors' output OBJECTS directly (plasma-shared, no driver
        # round-trip between the phases) — the driver blocks ONCE on
        # both phases.  Global candidate order rides along as an
        # explicit `order` column so the chained actors can restore it.
        cand = cand.append_column(
            "order", pa.array(np.arange(len(cand), dtype=np.int64))
        )
        shard_np = cand["shard"].to_numpy(zero_copy_only=False)
        owner = self._owner_lut[shard_np]
        futs1, idxs = [], []
        for a, actor in enumerate(self.host_actors):
            sel = np.nonzero(owner == a)[0]
            if len(sel) == 0:
                continue
            futs1.append(actor.admit_phase1.remote(cand.take(pa.array(sel))))
            idxs.append(sel)
        futs2 = [
            actor.test_and_add_chained.remote(k, self.n_seen, *futs1)
            for k, actor in enumerate(self.seen_actors)
        ]
        got1 = ray.get(futs1)
        got2 = ray.get(futs2)
        ok1 = np.zeros(len(cand), bool)
        sizes: dict[int, int] = {}
        for sel, (ok, _chain, sz) in zip(idxs, got1):
            ok1[sel] = ok
            sizes.update(sz)
        stats["rejected_robots_quota"] = int((~ok1).sum())
        new_full = np.zeros(len(cand), bool)
        for order_idx, mask in got2:
            new_full[order_idx] = mask
        stats["rejected_dup"] = int(ok1.sum()) - int(new_full.sum())
        surv2 = np.nonzero(new_full)[0]
        if len(surv2) == 0:
            return stats
        sub2 = cand.take(pa.array(surv2))
        # phase 3 (driver): per-shard caps + global budget, in order
        # (sizes piggybacked on phase 1 — pre-append state, as required)
        shard2 = sub2["shard"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(sub2), bool)
        room = {
            s: max(0, self.cfg.max_frontier_per_shard - sizes.get(s, 0))
            for s in set(shard2.tolist())
        }
        if any(r < len(sub2) for r in room.values()):  # cap can bind → in-order scan
            for i in range(len(sub2)):
                s = int(shard2[i])
                if room[s] <= 0:
                    keep[i] = False
                else:
                    room[s] -= 1
        if self.cfg.max_crawl_urls < (1 << 40):  # budget can bind → query
            total_seen = sum(
                ray.get([a.count.remote() for a in self.seen_actors])
            )
            # seen currently includes every phase-2 insert; discount the
            # cap-rejected ones (rolled back below) before the budget check
            total_seen -= int((~keep).sum())
            over = total_seen - self.cfg.max_crawl_urls
            if over > 0:
                kept_idx = np.nonzero(keep)[0]
                for i in kept_idx[::-1][:over]:
                    keep[i] = False
        rollback = np.nonzero(~keep)[0]
        if len(rollback):
            rb = sub2.take(pa.array(rollback))
            uh_rb = rb["url_hash"].to_numpy(zero_copy_only=False)
            so = (uh_rb % np.uint64(self.n_seen)).astype(np.int64)
            ray.get(
                [
                    self.seen_actors[k].remove.remote(uh_rb[so == k])
                    for k in set(so.tolist())
                ]
            )
        surv3 = np.nonzero(keep)[0]
        if len(surv3) == 0:
            return stats
        final = sub2.take(pa.array(surv3))
        seqs = np.arange(self.enqueue_seq, self.enqueue_seq + len(final), dtype=np.int64)
        self.enqueue_seq += len(final)
        final = final.append_column("enqueue_seq", pa.array(seqs))
        stats["admitted"] = len(final)
        fshard = final["shard"].to_numpy(zero_copy_only=False)
        fowner = self._owner_lut[fshard]
        ray.get(
            [
                self.host_actors[a].append_frontier.remote(
                    final.take(pa.array(np.nonzero(fowner == a)[0]))
                )
                for a in set(fowner.tolist())
            ]
        )
        return stats

    # -------------------------------------------------------------- epoch
    def run_epoch(self) -> bool:
        """One epoch; returns False when the crawl is finished."""
        ray = self.ray
        cfg = self.cfg
        fsizes = ray.get([a.frontier_size.remote() for a in self.host_actors])
        if sum(fsizes) == 0:
            return False
        if cfg.max_fetches is not None and self.fetch_seq >= cfg.max_fetches:
            return False
        epoch = self.epoch
        remaining = (
            None if cfg.max_fetches is None else cfg.max_fetches - self.fetch_seq
        )
        pick_bound = cfg.per_shard_batch * cfg.shard_count
        if remaining is not None and remaining < pick_bound:
            # budget may bind mid-epoch: select first, slice to budget,
            # THEN resolve outcomes — so host fail-counters never record
            # picks the budget cut off (oracle's early break; keeps a
            # checkpointed run resumable past a raised limit)
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
        else:
            picks = pa.concat_tables(
                ray.get([a.dequeue_epoch.remote(epoch) for a in self.host_actors])
            ).sort_by(
                [("t_sched", "ascending"), ("enqueue_seq", "ascending")]
            )
        n = len(picks)
        fseq = np.arange(self.fetch_seq, self.fetch_seq + n, dtype=np.int64)
        self.fetch_seq += n
        picks = picks.append_column("fetch_seq", pa.array(fseq)).append_column(
            "epoch", pa.array(np.full(n, epoch, np.int32))
        )
        self._order_parts.append(
            picks.select(["fetch_seq", "url", "url_hash", "t_sched", "epoch"])
        )
        ok_picks = picks.filter(pc.greater_equal(picks["content_row"], 0))
        content = pa.table(
            {k.name: [] for k in CONTENT_SCHEMA}, schema=CONTENT_SCHEMA
        )
        cand = pa.table({k.name: [] for k in CAND_SCHEMA}, schema=CAND_SCHEMA)
        stats = {"candidates": 0, "admitted": 0,
                 "rejected_robots_quota": 0, "rejected_dup": 0}
        if len(ok_picks):
            # Round-robin chunk waves over the persistent fetch pool;
            # each actor returns (content metadata, prepped candidates)
            # and writes its payload parquet partition itself.  ~4
            # waves per actor bound the straggler cost of the barrier.
            # Admission OVERLAPS fetch: chunks are consumed strictly in
            # submission order (= fetch_seq order), so running the
            # admission ladder on each chunk as it completes preserves
            # the deterministic global candidate order while the pool
            # keeps fetching later chunks.
            nf = len(self.fetch_actors)
            waves = 2
            chunk = max(64, (len(ok_picks) + nf * waves - 1) // (nf * waves))
            futs = [
                self.fetch_actors[(i // chunk) % nf].__call__.remote(
                    ok_picks.slice(i, chunk)
                )
                for i in range(0, len(ok_picks), chunk)
            ]
            cparts = []
            # consume per WAVE (nf chunks): one admission ladder per
            # wave keeps the driver↔actor RPC rounds independent of
            # pool size while still overlapping with later waves' fetch
            for w0 in range(0, len(futs), nf):
                got = ray.get(futs[w0 : w0 + nf])  # in-order
                kparts = []
                for c, k in got:
                    if len(c):
                        cparts.append(c)
                    if len(k):
                        kparts.append(k)
                if kparts:
                    s = self._admit(pa.concat_tables(kparts))
                    for key in stats:
                        stats[key] += s[key]
            if cparts:
                content = pa.concat_tables(cparts).sort_by("fetch_seq")
        self._content_parts.append(content)
        seen_size = sum(ray.get([a.count.remote() for a in self.seen_actors]))
        frontier_size = sum(ray.get([a.frontier_size.remote() for a in self.host_actors]))
        self._metrics_rows.append(
            {
                "epoch": epoch,
                "picked": n,
                "fetched_ok": len(content),
                "fetch_failed": n - len(content),
                "candidates": stats["candidates"],
                "admitted": stats["admitted"],
                "rejected_static": 0,
                "rejected_robots_quota": stats["rejected_robots_quota"],
                "rejected_dup": stats["rejected_dup"],
                "frontier_size": frontier_size,
                "seen_size": seen_size,
            }
        )
        self.epoch += 1
        if self.checkpoint:
            self.write_checkpoint()
        if cfg.max_fetches is not None and self.fetch_seq >= cfg.max_fetches:
            return False
        return True

    def warmup(self) -> None:
        """Block until every fetch actor finished deserializing its
        broadcast state — otherwise each early epoch's gather barrier
        stalls on whichever actor is still cold."""
        self.ray.get([a.ready.remote() for a in self.fetch_actors])

    def run(self, max_epochs: int | None = None) -> EngineResult:
        self.warmup()
        limit = max_epochs if max_epochs is not None else self.cfg.max_epochs
        while self.epoch < limit:
            if not self.run_epoch():
                break
        return self.result()

    def result(self) -> EngineResult:
        ray = self.ray
        res = EngineResult()
        res.epochs = self.epoch
        res.crawl_order = (
            pa.concat_tables(self._order_parts)
            if self._order_parts
            else pa.table({"fetch_seq": []})
        )
        parts = [t for t in self._content_parts if len(t)]
        res.content = pa.concat_tables(parts) if parts else None
        res.metrics = (
            pa.Table.from_pylist(self._metrics_rows, schema=METRICS_SCHEMA)
            if self._metrics_rows
            else None
        )
        for hs in ray.get([a.dump_hashes.remote() for a in self.seen_actors]):
            res.seen.update(int(x) for x in hs)
        return res

    # --------------------------------------------------------- checkpoint
    def write_checkpoint(self) -> None:
        ray = self.ray
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
                    "enqueue_seq": self.enqueue_seq,
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
        eng.enqueue_seq = drv["enqueue_seq"]
        eng.fetch_seq = drv["fetch_seq"]
        futs = []
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

    def __init__(self, capacity: int, shard_id: int):
        self.shard = SeenShard(capacity=capacity, seed=shard_id)

    def test_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.shard.test_and_add(hashes)

    def test_and_add_chained(
        self, k: int, n_seen: int, *phase1_outputs
    ) -> tuple[np.ndarray, np.ndarray]:
        """Chained phase 2: consume the host actors' phase-1 outputs
        directly (Ray resolves the object refs in-actor — no driver
        hop).  Keeps this shard's survivors in global candidate order
        via the `order` column.  → (order indices, new-mask)."""
        parts = []
        for _ok, tbl, _sizes in phase1_outputs:
            ok = tbl["ok"].to_numpy(zero_copy_only=False)
            uh = tbl["url_hash"].to_numpy(zero_copy_only=False)
            mine = ok & ((uh % np.uint64(n_seen)).astype(np.int64) == k)
            idx = np.nonzero(mine)[0]
            if len(idx):
                parts.append(
                    (
                        tbl["order"].to_numpy(zero_copy_only=False)[idx],
                        uh[idx],
                    )
                )
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, bool)
        order = np.concatenate([p[0] for p in parts])
        uh = np.concatenate([p[1] for p in parts])
        o = np.argsort(order, kind="stable")
        order, uh = order[o], uh[o]
        mask = self.shard.test_and_add(uh)
        return order, mask

    def remove(self, hashes: np.ndarray) -> None:
        self.shard.remove(hashes)

    def count(self) -> int:
        return len(self.shard)

    def dump_hashes(self) -> np.ndarray:
        out = np.fromiter(self.shard.exact, np.uint64, len(self.shard.exact))
        out.sort()
        return out

    def to_state(self) -> dict:
        return self.shard.to_state()

    def restore(self, state: dict) -> None:
        self.shard = SeenShard.from_state(state)


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
