"""Versioned table storage — Lance when available, else a
parquet+manifest layout with the same semantics.

The north rule stores content/frontier/seen state in **Lance** tables
(append + random access + versioning), replacing the reference's
hand-rolled append-only KV logs (``KeyValueDB.hpp:68-504`` — key log +
value log + in-RAM index rebuilt by replay).  This container has no
``lance`` wheel, so the backend is gated behind a try-import:

* ``lance`` importable → ``lance.write_dataset(mode="append")`` /
  ``dataset.checkout_version`` drive the exact same API;
* fallback → each version is a parquet fragment plus a JSON manifest
  (``_versions/v{n}.json`` listing its fragment lineage), committed by
  atomic rename — append-only, time-travelable, resumable, identical
  call signatures.

Both backends expose: ``append(table) -> version``, ``read(version) ->
pa.Table``, ``to_ray(version) -> ray.data.Dataset`` (streaming read of
the fragment files — the 100 TB path), ``versions()``, ``latest()``.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance absent in this container
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


class VersionedTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        if not HAVE_LANCE:
            os.makedirs(self._vdir, exist_ok=True)
            os.makedirs(os.path.join(path, "fragments"), exist_ok=True)

    # ------------------------------------------------------------ common
    @property
    def _vdir(self) -> str:
        return os.path.join(self.path, "_versions")

    def versions(self) -> list[int]:
        if HAVE_LANCE:
            ds = lance.dataset(self.path)
            return list(range(1, ds.version + 1))
        out = []
        for f in os.listdir(self._vdir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # ------------------------------------------------------------ append
    def append(self, table: pa.Table) -> int:
        if HAVE_LANCE:
            lance.write_dataset(table, self.path, mode="append")
            return lance.dataset(self.path).version
        prev = self.latest()
        version = (prev or 0) + 1
        frag = f"fragments/{version:08d}-{uuid.uuid4().hex[:8]}.parquet"
        pq.write_table(table, os.path.join(self.path, frag))
        manifest = {
            "version": version,
            "parent": prev,
            "fragment": frag,
            "num_rows": len(table),
            "fragments": (
                self._manifest(prev)["fragments"] if prev else []
            )
            + [frag],
        }
        tmp = os.path.join(self._vdir, f".v{version}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self._vdir, f"v{version}.json"))
        return version

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._vdir, f"v{version}.json")) as f:
            return json.load(f)

    # -------------------------------------------------------------- read
    def _fragment_paths(self, version: int | None) -> list[str]:
        version = version or self.latest()
        if version is None:
            return []
        return [
            os.path.join(self.path, fr)
            for fr in self._manifest(version)["fragments"]
        ]

    def read(self, version: int | None = None) -> pa.Table:
        if HAVE_LANCE:
            ds = lance.dataset(self.path, version=version)
            return ds.to_table()
        paths = self._fragment_paths(version)
        if not paths:
            return pa.table({})
        return pa.concat_tables(pq.read_table(p) for p in paths)

    def to_ray(self, version: int | None = None, columns=None):
        """Streaming Ray Data read over the version's fragments."""
        import ray.data

        if HAVE_LANCE:
            if version is not None and version != self.latest():
                # honor the time-travel contract (mirrors read()):
                # ray.data.read_lance has no version pin, so a
                # historical snapshot goes through the versioned
                # checkout (materialized — snapshots are read for
                # resume/audit, not the 100 TB streaming path)
                ds = lance.dataset(self.path, version=version)
                tbl = ds.to_table(columns=columns)
                return ray.data.from_arrow(tbl)
            return ray.data.read_lance(self.path, columns=columns)
        paths = self._fragment_paths(version)
        if not paths:
            return ray.data.from_arrow(pa.table({}))
        return ray.data.read_parquet(paths, columns=columns)

    def version_delta(self, version: int) -> pa.Table:
        """Rows appended BY this version (its own fragment) — the unit
        a per-epoch point-lookup index refers to."""
        if HAVE_LANCE:
            ds = lance.dataset(self.path, version=version)
            start = 0
            if version > 1:
                start = lance.dataset(
                    self.path, version=version - 1
                ).count_rows()
            return ds.take(list(range(start, ds.count_rows())))
        m = self._manifest(version)
        return pq.read_table(os.path.join(self.path, m["fragment"]))

    def truncate_to(self, version: int | None) -> None:
        """Drop versions AFTER ``version`` (crash-recovery: appends that
        were never committed by the caller's atomic publish step).  With
        Lance this is ``checkout + restore``; the fallback deletes the
        dangling manifests (their fragments become unreferenced)."""
        if HAVE_LANCE:
            cur = lance.dataset(self.path)
            if version is not None and cur.version > version:
                cur.checkout_version(version).restore()
            return
        for v in self.versions():
            if version is None or v > version:
                os.remove(os.path.join(self._vdir, f"v{v}.json"))

    def count(self, version: int | None = None) -> int:
        version = version or self.latest()
        if version is None:
            return 0
        if HAVE_LANCE:
            return lance.dataset(self.path, version=version).count_rows()
        total = 0
        for p in self._fragment_paths(version):
            total += pq.read_metadata(p).num_rows
        return total
