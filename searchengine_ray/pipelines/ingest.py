"""External-source ingest: CSV / JSONL / parquet files → the canonical
``documents`` table shape, resumable per input file.

The reference engine only ever reads its own KV store; a user moving a
pipeline onto this engine needs a way to LAND external corpora first.
This is that on-ramp: each input file becomes one committed output
part (tmp + atomic rename, exactly the ``export.corpus_etl`` sink
rule), so a failed 100 TB ingest resumes by skipping committed parts —
never one giant file, never a whole-job restart.

Schema normalization (the canonical documents contract —
``TESTDATA.md``: doc_id:int64, source:string, text:string):

* ``text``       — required; any of text/content/body is accepted.
* ``source``     — taken from the file if present, else the file stem.
* ``doc_id``     — taken from the file if present (cast to int64),
                   else derived deterministically as
                   ``fnv1a64(relative_file_name) XOR row_index``
                   (stable across re-runs and cluster sizes — ingest
                   twice, get identical ids).

Per-file tasks are raw ``ray.remote`` calls — the same documented
Dataset-API exception as ``export.py``: the unit of COMMIT is the
file, and Ray Data sinks have no per-input-file commit hook.  Reads
are pyarrow-native (``pyarrow.csv`` / ``pyarrow.json`` block readers),
so a worker never holds more than one file's columns.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_TEXT_ALIASES = ("text", "content", "body")

DOC_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("source", pa.string()), ("text", pa.string())]
)


def _read_any(path: str) -> pa.Table:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".csv", ".tsv"):
        import pyarrow.csv as pc_csv

        opts = pc_csv.ParseOptions(delimiter="\t" if ext == ".tsv" else ",")
        return pc_csv.read_csv(path, parse_options=opts)
    if ext in (".json", ".jsonl", ".ndjson"):
        import pyarrow.json as pc_json

        return pc_json.read_json(path)
    if ext in (".parquet", ".pq"):
        return pq.read_table(path)
    raise ValueError(f"unsupported ingest format: {path}")


def normalize_documents(tbl: pa.Table, file_name: str) -> pa.Table:
    """Normalize an arbitrary table to the canonical documents schema
    (vectorized; deterministic doc_id derivation when absent)."""
    from ..functions.hashing import fnv1a64

    cols = {c.lower(): c for c in tbl.column_names}
    text_col = next((cols[a] for a in _TEXT_ALIASES if a in cols), None)
    if text_col is None:
        raise ValueError(
            f"{file_name}: no text column (accepted: {_TEXT_ALIASES})"
        )
    n = len(tbl)
    text = tbl[text_col].cast(pa.string())

    if "source" in cols:
        source = tbl[cols["source"]].cast(pa.string())
    else:
        stem = os.path.splitext(os.path.basename(file_name))[0]
        source = pa.array(np.repeat(stem, n), pa.string())

    if "doc_id" in cols:
        doc_id = tbl[cols["doc_id"]].cast(pa.int64())
    else:
        base = np.uint64(fnv1a64(os.path.basename(file_name)))
        ids = (base ^ np.arange(n, dtype=np.uint64)).astype(np.int64)
        doc_id = pa.array(ids, pa.int64())

    return pa.table(
        {"doc_id": doc_id, "source": source, "text": text}, schema=DOC_SCHEMA
    )


def _ingest_file(path: str, out_dir: str, k: int) -> int:
    tbl = normalize_documents(_read_any(path), path)
    part = os.path.join(out_dir, f"part-{k:05d}.parquet")
    tmp = part + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, part)  # commit point
    return len(tbl)


def ingest_documents(inputs: list[str] | str, out_dir: str) -> dict:
    """Run (or resume) an ingest of ``inputs`` (a directory or an
    explicit file list) into ``out_dir`` as canonical documents
    parts.  Returns {files, skipped, rows_written, rows_total}."""
    import ray

    if isinstance(inputs, str):
        inputs = sorted(
            os.path.join(inputs, f)
            for f in os.listdir(inputs)
            if os.path.splitext(f)[1].lower()
            in (".csv", ".tsv", ".json", ".jsonl", ".ndjson", ".parquet", ".pq")
        )
    os.makedirs(out_dir, exist_ok=True)
    for p in os.listdir(out_dir):
        if p.endswith(".tmp"):  # torn writes from a crashed run
            os.remove(os.path.join(out_dir, p))
    from .export import check_worklist

    check_worklist(out_dir, list(inputs))
    task = ray.remote(num_cpus=1)(_ingest_file)
    futs, skipped = [], 0
    for k, f in enumerate(inputs):
        if os.path.exists(os.path.join(out_dir, f"part-{k:05d}.parquet")):
            skipped += 1
            continue
        futs.append(task.remote(f, out_dir, k))
    written = sum(ray.get(futs)) if futs else 0
    total = sum(
        pq.ParquetFile(os.path.join(out_dir, p)).metadata.num_rows
        for p in sorted(os.listdir(out_dir))
        if p.startswith("part-") and p.endswith(".parquet")
    )
    return {
        "files": len(inputs),
        "skipped": skipped,
        "rows_written": written,
        "rows_total": total,
    }
