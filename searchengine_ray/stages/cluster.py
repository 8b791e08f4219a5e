"""Connected components over a pair list — the closure step a real
dedup pipeline needs after near-dup PAIR detection (pairs alone don't
dedup: {A~B, B~C} must collapse to ONE surviving doc, so components,
not edges, are the dedup unit).

Algorithm: distributed min-label propagation with pointer-jumping.
Every node starts labeled with itself; each round computes
label(n) ← min(label(n), min label of n's neighbors,
label(label(n))) in ONE fused gather, so convergence is
O(log diameter) rounds at two sort-shuffles per round.  Labels only decrease and
are bounded below by the component minimum, so the fixpoint is exact;
a cheap Sum(label) aggregate detects convergence (labels monotone ⇒
unchanged sum ⇔ no change).

Implementation note: both steps are *lookups* (label-of-dst,
label-of-label), but they are expressed as ONE kind-tagged
union+groupby gather each, NOT as `Dataset.join` — Ray's hash-shuffle
join intermittently fails on the empty partitions these small keyed
tables produce (`ArrowInvalid: No match ... FieldRef`), while the
sort-based groupby handles them.  Within a key's group: the kind-0 row
carries the key's own label; kind-1 rows carry the nodes asking for
it — one vectorized emit per group.  Nothing lands on the driver but
the one-row convergence aggregate per round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_OUT_DTYPES = {"node": "int64", "label": "int64"}


def _empty(cols: dict) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})


def _gather(g: pd.DataFrame) -> pd.DataFrame:
    """One key's group: kind-0 row = the key's current label; kind-1
    rows = nodes requesting it.  Emits (node, label) for every
    requester plus the key itself (so its label survives the min)."""
    own = g.loc[g["kind"] == 0, "label"]
    if not len(own):
        return _empty(_OUT_DTYPES)
    lab = np.int64(own.min())
    req = g.loc[g["kind"] == 1, "node"].to_numpy(np.int64)
    key = np.int64(g["key"].iloc[0])
    return pd.DataFrame(
        {
            "node": np.concatenate([req, [key]]),
            "label": np.full(len(req) + 1, lab, np.int64),
        }
    )


def connected_components(
    pairs_ds,
    col_a: str = "ia",
    col_b: str = "ib",
    max_rounds: int = 25,
):
    """pairs (col_a, col_b int64) → Dataset (doc_id, cluster_id,
    cluster_size); cluster_id = the component's minimum doc_id.
    Only nodes that appear in some pair are emitted (singletons are
    trivially their own cluster and need no shuffle)."""
    from ray.data.aggregate import Min, Sum

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        a = b[col_a].to_numpy(np.int64)
        c = b[col_b].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": np.concatenate([c, a]),  # lookup label of dst
                "node": np.concatenate([a, c]),  # ... on behalf of src
                "label": np.full(2 * len(a), -1, np.int64),
                "kind": np.ones(2 * len(a), np.int8),
            }
        )

    def as_kind0(b: pd.DataFrame) -> pd.DataFrame:
        if "node" not in b.columns or not len(b):
            return _empty(
                {"key": "int64", "node": "int64", "label": "int64", "kind": "int8"}
            )
        return pd.DataFrame(
            {
                "key": b["node"].astype("int64"),
                "node": b["node"].astype("int64"),
                "label": b["label"].astype("int64"),
                "kind": np.zeros(len(b), np.int8),
            }
        )

    def as_jump_req(b: pd.DataFrame) -> pd.DataFrame:
        # ask key=label(n) for ITS label, on behalf of n
        if "node" not in b.columns or not len(b):
            return _empty(
                {"key": "int64", "node": "int64", "label": "int64", "kind": "int8"}
            )
        return pd.DataFrame(
            {
                "key": b["label"].astype("int64"),
                "node": b["node"].astype("int64"),
                "label": np.full(len(b), -1, np.int64),
                "kind": np.ones(len(b), np.int8),
            }
        )

    def stab(b: pd.DataFrame) -> pd.DataFrame:
        if "node" not in b.columns or not len(b):
            return _empty(_OUT_DTYPES)
        return pd.DataFrame(
            {
                "node": b["node"].astype("int64"),
                "label": b["label"].astype("int64"),
            }
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pandas")
    labels = (
        edges.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["key"], "label": b["key"]}
            )
            if len(b)
            else _empty(_OUT_DTYPES),
            batch_format="pandas",
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .map_batches(stab, batch_format="pandas")
        .materialize()
    )

    prev_sum = None
    for _ in range(max_rounds):
        # one fused gather answers BOTH request kinds against the
        # pre-round labels: neighbor requests (key=dst, for src) and
        # jump requests (key=label(n), for n) — new_label(n) =
        # min(label(n), min-neighbor label, label(label(n))), a
        # monotone contraction whose fixpoint is the component
        # minimum; fusing halves the sort-shuffles per round
        labels = (
            labels.map_batches(as_kind0, batch_format="pandas")
            .union(edges)
            .union(labels.map_batches(as_jump_req, batch_format="pandas"))
            .groupby("key")
            .map_groups(_gather, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(stab, batch_format="pandas")
            .materialize()
        )
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _empty(
                {"doc_id": "int64", "cluster_id": "int64", "cluster_size": "int64"}
            )
        return pd.DataFrame(
            {
                "doc_id": g["node"].astype("int64"),
                "cluster_id": g["label"].astype("int64"),
                "cluster_size": np.full(len(g), len(g), np.int64),
            }
        )

    return labels.groupby("label").map_groups(finalize, batch_format="pandas")
