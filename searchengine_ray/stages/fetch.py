"""Fetch + decode + verify stage (actor pool over zero-copy Arrow).

The reference fetches with one OS thread per connection
(``SearchEngine.cpp:884-888``, ``httpDownload.h:77-140``); here fetch
is a ``map_batches`` actor-pool stage: the synthetic web store and the
images payload table are broadcast ONCE via ``ray.put`` and read in
``__init__`` (once per actor) — never re-shipped per batch.

Per page the actor: renders the page HTML deterministically, shortens
it (M8/M9), extracts link candidates (M10), materializes the image
payload, decodes it and checks the per-row invariants (decoded-pixel
sha vs truth — exact because truth is derived from post-codec pixels,
with the lossy codec's PSNR ≥ 40 dB bound asserted by codec tests —
plus caption equality and phash consistency).

With a live network this class would swap the store lookup for an
async HTTP client behind the same interface; everything downstream is
unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.urlkernel import split_host
from ..sources import synth
from ..sources.codec import decode_image, phash64
from .extract import extract_links, get_title, shorten_html

CONTENT_SCHEMA = pa.schema(
    [
        ("fetch_seq", pa.int64()),
        ("epoch", pa.int32()),
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("title", pa.string()),
        ("image_id", pa.string()),
        ("caption", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
        ("invariant_ok", pa.bool_()),
        ("links", pa.list_(pa.string())),
    ]
)


class FetchDecode:
    """Callable class for ``map_batches(..., concurrency=N)``."""

    def __init__(self, store_ref, images_ref, truth_ref=None):
        import ray

        def _get(r):
            return ray.get(r) if isinstance(r, ray.ObjectRef) else r

        self.store: synth.WebStore = _get(store_ref)
        images: pa.Table = _get(images_ref)
        self.img_bytes = images.column("bytes").to_pylist()
        self.img_caption = images.column("caption").to_pylist()
        self.img_fmt = images.column("fmt").to_pylist()
        self.img_w = images.column("w").to_pylist()
        self.img_h = images.column("h").to_pylist()
        self.img_phash = images.column("phash").to_pylist()
        truth = _get(truth_ref) if truth_ref is not None else None
        self.truth_sha = truth.column("pixels_sha256").to_pylist() if truth else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        store = self.store
        out = {k.name: [] for k in CONTENT_SCHEMA}
        content_rows = batch["content_row"].to_numpy(zero_copy_only=False)
        for i in range(len(batch)):
            row = int(content_rows[i])
            if row < 0:
                continue
            url = store.urls[row]
            https = url.startswith("https://")
            host = split_host(url)
            img = int(store.image_idx[row])
            caption = store.captions[row]
            html = synth.render_html(
                url, host, https, caption, store.image_ids[row], store.links_of(row)
            )
            short = shorten_html(html)
            links = extract_links(short, host, https)
            data = self.img_bytes[img]
            pixels, fmt = decode_image(data)
            ph = phash64(pixels)
            ok = (
                ph == self.img_phash[img]
                and caption == self.img_caption[img]
                and fmt == self.img_fmt[img]
            )
            if ok and self.truth_sha is not None:
                ok = (
                    hashlib.sha256(pixels.tobytes()).hexdigest()
                    == self.truth_sha[img]
                )
            out["fetch_seq"].append(int(batch["fetch_seq"][i].as_py()))
            out["epoch"].append(int(batch["epoch"][i].as_py()))
            out["url"].append(batch["url"][i].as_py())
            out["url_hash"].append(int(batch["url_hash"][i].as_py()))
            out["title"].append(get_title(html))
            out["image_id"].append(store.image_ids[row])
            out["caption"].append(caption)
            out["bytes"].append(data)
            out["w"].append(pixels.shape[1])
            out["h"].append(pixels.shape[0])
            out["fmt"].append(fmt)
            out["phash"].append(ph)
            out["invariant_ok"].append(bool(ok))
            out["links"].append(links)
        return pa.table(out, schema=CONTENT_SCHEMA)
