"""Host-shard state: frontier shards + politeness clocks + host health.

One ``HostShards`` instance owns a *set* of collision-domain shards
(the reference's pending DBs, ``SearchEngine.h:449-513``) plus all
per-host mutable state whose serialization order matters:

* politeness clocks (``hostLastTime``/``nextDownloadTime``,
  ``SearchEngine.cpp:731-761``) — logical ms, token-bucket style,
* bad-host fail counters (``m_badHosts``, ``SearchEngine.cpp:575-604``),
* per-host candidate quota (``m_hostsCount``, ``SearchEngine.h:746-756``),
* robots rules (north-rule addition; resolved from the web store).

Every host maps to exactly one collision shard
(``hostCollisionHash % shard_count``, ``SearchEngine.h:759``) and every
shard to exactly one instance, so per-host ordering is preserved with
no cross-actor coordination.  Wrapped in ``ray.remote`` by
``pipelines/crawl.py``; kept Ray-free here for unit testing.

Determinism contract: ``dequeue_epoch`` and the admission phases are
pure functions of (owned state, sorted input batch) — results are
independent of actor-pool size or scheduling (SURVEY.md §7.5#1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import synth

OUT_OK = 0
OUT_SKIP_BADHOST = 1
OUT_CONNECT_FAIL = 2
OUT_TIMEOUT = 3
OUT_NOTFOUND = 4
OUT_REDIRECT_FAIL = 5

PICKS_SCHEMA = pa.schema(
    [
        ("t_sched", pa.int64()),
        ("enqueue_seq", pa.int64()),
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host_hash", pa.uint64()),
        ("shard", pa.int32()),
        ("content_row", pa.int64()),
        ("outcome", pa.int8()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("enqueue_seq", pa.int64()),
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host_hash", pa.uint64()),
        ("host", pa.string()),
    ]
)

HOSTSTATE_SCHEMA = pa.schema(
    [
        ("host_hash", pa.uint64()),
        ("next_time", pa.int64()),
        ("fail_count", pa.int32()),
        ("cand_count", pa.int64()),
    ]
)


class HostShards:
    def __init__(self, cfg, shard_ids, store: synth.WebStore):
        self.cfg = cfg
        self.shard_ids = list(shard_ids)
        self.frontier: dict[int, list] = {s: [] for s in self.shard_ids}
        self.host_next: dict[int, int] = {}
        self.host_fail: dict[int, int] = {}
        self.host_cand: dict[int, int] = {}
        self.store = store

    # ------------------------------------------------------------ dequeue
    def dequeue_epoch(self, epoch: int) -> pa.Table:
        """Politeness-greedy per-shard selection + fetch-outcome
        resolution, in (t_sched, enqueue_seq) order per shard (host
        health updates are host-local, so per-shard order suffices)."""
        cfg = self.cfg
        t0 = epoch * cfg.epoch_ms
        picks = []  # (t, seq, url, url_hash, host_hash, shard)
        for shard in self.shard_ids:
            entries = self.frontier[shard]
            if not entries:
                continue
            t = t0
            host_picks: dict[int, int] = {}
            remaining = list(range(len(entries)))
            taken: set[int] = set()
            while len(taken) < cfg.per_shard_batch and remaining:
                best = None
                best_sleep = None
                for ri in remaining:
                    seq, url, h, hh, host = entries[ri]
                    if host_picks.get(hh, 0) >= cfg.per_host_epoch_cap:
                        continue
                    nxt = self.host_next.get(hh)
                    sleep = max(0, nxt - t) if nxt is not None else 0
                    if best_sleep is None or sleep < best_sleep:
                        best_sleep, best = sleep, ri
                        if sleep == 0:
                            break
                if best is None:
                    break
                seq, url, h, hh, host = entries[best]
                t += best_sleep
                self.host_next[hh] = t + cfg.politeness_ms
                host_picks[hh] = host_picks.get(hh, 0) + 1
                picks.append((t, seq, url, h, hh, shard))
                taken.add(best)
                remaining.remove(best)
            if taken:
                self.frontier[shard] = [
                    e for i, e in enumerate(entries) if i not in taken
                ]
        picks.sort(key=lambda p: (p[0], p[1]))

        # resolve fetch outcomes (bad-host gate → store lookup → redirect)
        rows = {k.name: [] for k in PICKS_SCHEMA}
        for t, seq, url, h, hh, shard in picks:
            outcome, content_row = self._resolve(h, hh)
            rows["t_sched"].append(t)
            rows["enqueue_seq"].append(seq)
            rows["url"].append(url)
            rows["url_hash"].append(h)
            rows["host_hash"].append(hh)
            rows["shard"].append(shard)
            rows["content_row"].append(content_row)
            rows["outcome"].append(outcome)
        return pa.table(rows, schema=PICKS_SCHEMA)

    def _resolve(self, h: int, hh: int) -> tuple[int, int]:
        cfg = self.cfg
        fails = self.host_fail.get(hh, 0)
        if fails > cfg.max_host_fails and (h % 10) != 0:
            return OUT_SKIP_BADHOST, -1
        row = int(self.store.lookup(np.array([h], np.uint64))[0])
        if row < 0:
            self.host_fail[hh] = fails + 1
            return OUT_CONNECT_FAIL, -1
        status = int(self.store.status[row])
        if status == synth.STATUS_TIMEOUT:
            self.host_fail[hh] = fails + 1
            return OUT_TIMEOUT, -1
        self.host_fail.pop(hh, None)
        if status == synth.STATUS_NOTFOUND:
            return OUT_NOTFOUND, -1
        if status == synth.STATUS_REDIRECT:
            tgt = int(self.store.redirect[row])
            if tgt < 0 or int(self.store.status[tgt]) != synth.STATUS_OK:
                return OUT_REDIRECT_FAIL, -1
            return OUT_OK, tgt
        return OUT_OK, row

    # ---------------------------------------------------------- admission
    def admit_phase1(self, cand: pa.Table) -> pa.Table:
        """robots + per-host quota for THIS actor's shards.

        ``cand`` must arrive sorted by global candidate order; quota
        counters increment per candidate that passes robots, matching
        the reference's filterURL side effect (SearchEngine.h:746-756).
        Returns cand + (ok: bool, reason: string) columns.
        """
        hhs = cand["host_hash"].to_numpy(zero_copy_only=False)
        uhs = cand["url_hash"].to_numpy(zero_copy_only=False)
        rows = self.store.lookup(uhs)
        ok = np.ones(len(cand), bool)
        reason = np.full(len(cand), "", dtype=object)
        for i in range(len(cand)):
            row = int(rows[i])
            if row >= 0 and self.store.robots_disallowed(row):
                ok[i] = False
                reason[i] = "robots"
                continue
            hh = int(hhs[i])
            c = self.host_cand.get(hh, 0)
            if c >= self.cfg.max_urls_per_host:
                ok[i] = False
                reason[i] = "quota"
                continue
            self.host_cand[hh] = c + 1
        return cand.append_column("ok", pa.array(ok)).append_column(
            "reason", pa.array(reason, type=pa.string())
        )

    def shard_sizes(self) -> dict[int, int]:
        return {s: len(v) for s, v in self.frontier.items()}

    def append_frontier(self, admitted: pa.Table) -> None:
        """Append admitted rows (already seq-assigned, cap-filtered by
        the driver) to the owned shards, in enqueue_seq order."""
        order = np.argsort(admitted["enqueue_seq"].to_numpy(zero_copy_only=False))
        cols = {
            name: admitted[name].to_pylist()
            for name in ("shard", "enqueue_seq", "url", "url_hash", "host_hash", "host")
        }
        for i in order:
            s = cols["shard"][i]
            self.frontier[s].append(
                (
                    cols["enqueue_seq"][i],
                    cols["url"][i],
                    cols["url_hash"][i],
                    cols["host_hash"][i],
                    cols["host"][i],
                )
            )

    def frontier_size(self) -> int:
        return sum(len(v) for v in self.frontier.values())

    # --------------------------------------------------------- checkpoint
    def snapshot(self) -> tuple[pa.Table, pa.Table]:
        f = {k.name: [] for k in FRONTIER_SCHEMA}
        for s in self.shard_ids:
            for seq, url, h, hh, host in self.frontier[s]:
                f["shard"].append(s)
                f["enqueue_seq"].append(seq)
                f["url"].append(url)
                f["url_hash"].append(h)
                f["host_hash"].append(hh)
                f["host"].append(host)
        hosts_all = sorted(
            set(self.host_next) | set(self.host_fail) | set(self.host_cand)
        )
        hstate = {
            "host_hash": hosts_all,
            "next_time": [self.host_next.get(k, 0) for k in hosts_all],
            "fail_count": [self.host_fail.get(k, 0) for k in hosts_all],
            "cand_count": [self.host_cand.get(k, 0) for k in hosts_all],
        }
        return (
            pa.table(f, schema=FRONTIER_SCHEMA),
            pa.table(hstate, schema=HOSTSTATE_SCHEMA),
        )

    def restore(self, frontier: pa.Table, hoststate: pa.Table) -> None:
        self.frontier = {s: [] for s in self.shard_ids}
        fr = frontier.sort_by("enqueue_seq")
        for s, seq, url, h, hh, host in zip(
            fr["shard"].to_pylist(),
            fr["enqueue_seq"].to_pylist(),
            fr["url"].to_pylist(),
            fr["url_hash"].to_pylist(),
            fr["host_hash"].to_pylist(),
            fr["host"].to_pylist(),
        ):
            self.frontier[s].append((seq, url, h, hh, host))
        self.host_next = dict(
            zip(hoststate["host_hash"].to_pylist(), hoststate["next_time"].to_pylist())
        )
        self.host_fail = {
            k: v
            for k, v in zip(
                hoststate["host_hash"].to_pylist(),
                hoststate["fail_count"].to_pylist(),
            )
            if v
        }
        self.host_cand = {
            k: v
            for k, v in zip(
                hoststate["host_hash"].to_pylist(),
                hoststate["cand_count"].to_pylist(),
            )
            if v
        }
