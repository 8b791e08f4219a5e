"""PageRank over a link-edge Dataset (reference J3/A5 semantics).

The reference streams a flat edge file single-threaded, accumulating
``cur[dst] += (0.85·prev[src] + 0.15) / out_degree`` per edge, then
refines ``r = 0.85·r + 0.15`` clamped to ≤ 100
(``SearchEngine.cpp:1200-1281``).  Here each iteration is:

    map_batches(contribution, prev-ranks broadcast)   # map side
      → per-batch partial sums per dst (combiner)
      → groupby(dst).sum()                            # the shuffle

Rank state is broadcast via ``ray.put`` once per iteration (small
side: one float per node).  At 10^9+ nodes the broadcast would become
a hash-bucket join of a ranks Dataset against edges on ``src`` —
partition key choice documented in SURVEY.md §7.4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EDGE_COLS = ("src", "dst", "out_degree")


def edges_from_content(content, seen_hashes: set[int] | None = None):
    """Build (src, dst, out_degree) edge rows from crawled content
    (link liveness semi-join J2: keep edges whose dst was crawled —
    ``SearchEngine.cpp:1034-1043``)."""
    from ..functions import urlkernel as uk

    rows = {"src": [], "dst": [], "out_degree": []}
    urls = content["url_hash"].to_pylist()
    links = content["links"].to_pylist()
    crawled = set(urls) if seen_hashes is None else seen_hashes
    for src, lv in zip(urls, links):
        targets = []
        for raw in lv:
            canon = uk.truncate_url(raw)
            if canon is None:
                continue
            h = uk.url_hash(canon)
            if h in crawled:
                targets.append(h)
        n = len(targets)
        for t in targets:
            rows["src"].append(src)
            rows["dst"].append(t)
            rows["out_degree"].append(n)
    return pd.DataFrame(rows)


def pagerank(
    edges_ds,
    nodes: np.ndarray,
    n_iters: int = 5,
    damping: float = 0.85,
    small_graph_threshold: int = 200_000,
):
    """→ pandas (node, rank) after n_iters + final refine/clamp.

    Small graphs (≤ threshold edges) iterate with driver-side numpy
    scatter-adds — a per-iteration Ray Data pipeline costs ~2s of
    fixed overhead, which dwarfs tiny graphs.  Above the threshold the
    distributed path runs (map-side combiner → groupby(dst).sum)."""
    import ray
    from ray.data.aggregate import Sum

    nodes = np.asarray(nodes, np.uint64)
    n_edges = edges_ds.count()
    if n_edges <= small_graph_threshold:
        pdf = edges_ds.to_pandas()
        node_ids = np.sort(nodes)
        idx_of = {int(n): i for i, n in enumerate(node_ids)}
        src = np.array([idx_of[int(s)] for s in pdf["src"]], np.int64)
        dst = np.array([idx_of[int(d)] for d in pdf["dst"]], np.int64)
        deg = pdf["out_degree"].to_numpy(np.float64)
        r = np.ones(len(node_ids))
        for _ in range(n_iters):
            contrib = (damping * r[src] + (1 - damping)) / deg
            nxt = np.zeros(len(node_ids))
            np.add.at(nxt, dst, contrib)
            r = nxt
        r = np.minimum(damping * r + (1 - damping), 100.0)
        return pd.DataFrame({"node": node_ids.astype(np.uint64), "rank": r})

    ranks = {int(n): 1.0 for n in nodes}
    for _ in range(n_iters):
        ref = ray.put(ranks)

        class Contrib:
            def __init__(self):
                self.prev = ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                src = batch["src"].to_numpy()
                prev = self.prev
                r = np.array([prev.get(int(s), 0.0) for s in src])
                c = (damping * r + (1 - damping)) / batch["out_degree"].to_numpy()
                part = (
                    pd.DataFrame({"dst": batch["dst"], "c": c})
                    .groupby("dst", as_index=False)["c"]
                    .sum()
                )  # per-batch combiner before the shuffle
                return part

        sums = (
            edges_ds.map_batches(Contrib, batch_format="pandas", concurrency=2)
            .groupby("dst")
            .aggregate(Sum("c", alias_name="rank"))
            .to_pandas()
        )
        ranks = {int(n): 0.0 for n in nodes}
        for d, r in zip(sums["dst"], sums["rank"]):
            ranks[int(d)] = float(r)
    out = pd.DataFrame(
        {"node": list(ranks.keys()), "rank": list(ranks.values())}
    )
    out["rank"] = np.minimum(damping * out["rank"] + (1 - damping), 100.0)
    return out.sort_values("node").reset_index(drop=True)
