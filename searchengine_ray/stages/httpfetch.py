"""Real-HTTP fetch stage behind the FetchDecode interface.

The synthetic-store ``stages/fetch.FetchDecode`` resolves pages from a
broadcast web store (the charter-sanctioned test path — the sandbox
has no network).  This module is the live-network variant with the
reference's fetch semantics (``httpDownload.h:77-140``,
``winHttpDownload.cpp:25-127``):

* hard timeout per request (reference default 12 s),
* exactly ONE redirect hop honored (301/302/303/307/308) — a redirect
  landing on another redirect fails the fetch,
* content-type gate: only ``text/html`` bodies are parsed for links
  and titles; ``image/*`` bodies are kept as payload rows; everything
  else is dropped (the reference's mime gate),
* concurrent connections via a thread pool inside the actor (the
  reference runs one OS thread per connection; a pool per fetch actor
  is the same model with a bound).

Outputs use the exact CONTENT/PAYLOAD/CAND schemas of the synthetic
stage, so the downstream pipeline (admission ladder, payload writer,
indexer) is unchanged.  A failed fetch (timeout, connect error,
second redirect, gated mime) contributes no content row — the same
contract as a ``content_row < 0`` pick never reaching the synthetic
fetch.  Unit tests drive this against an in-process loopback
``http.server`` (no external network).
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.urlkernel import split_host
from .extract import extract_links, get_title, shorten_html
from .fetch import CAND_SCHEMA, CONTENT_SCHEMA, PAYLOAD_SCHEMA, make_candidates

_REDIRECT_CODES = (301, 302, 303, 307, 308)


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """Surface redirects as HTTPError so the caller controls hops."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


_OPENER = urllib.request.build_opener(_NoRedirect)


def fetch_once(
    url: str, timeout_s: float, user_agent: str
) -> tuple[int, str, bytes, str | None]:
    """One GET with no auto-redirect → (status, content_type, body,
    redirect_location|None)."""
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with _OPENER.open(req, timeout=timeout_s) as resp:
            ctype = (resp.headers.get("Content-Type") or "").split(";")[0].strip()
            return resp.status, ctype.lower(), resp.read(), None
    except urllib.error.HTTPError as e:
        if e.code in _REDIRECT_CODES:
            loc = e.headers.get("Location")
            if loc:
                return e.code, "", b"", urllib.parse.urljoin(url, loc)
        return e.code, "", b"", None


class HttpFetchDecode:
    """Live-HTTP fetch/decode actor — drop-in for ``FetchDecode``.

    ``__call__(batch, start, length) -> (content, candidates)`` with
    identical schemas.  ``batch`` needs only (fetch_seq, epoch, url,
    url_hash); ``content_row`` is ignored when present (there is no
    store to pre-resolve against — the fetch IS the outcome)."""

    def __init__(
        self,
        shard_count: int = 8,
        payload_dir: str | None = None,
        timeout_s: float = 12.0,
        max_threads: int = 32,
        user_agent: str = "searchengine-ray/0.1",
    ):
        self.shard_count = shard_count
        self.payload_dir = payload_dir
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.pool = ThreadPoolExecutor(max_workers=max_threads)
        self._calls = 0
        self._pages = 0
        self._busy_s = 0.0

    def stats(self) -> dict:
        return {
            "calls": self._calls,
            "pages": self._pages,
            "busy_s": round(self._busy_s, 3),
        }

    def ready(self) -> bool:
        return True

    def warm(self) -> bool:
        return True

    def close(self) -> None:
        """Shut down the fetch thread pool (idempotent)."""
        self.pool.shutdown(wait=False, cancel_futures=True)

    def __del__(self):  # actor teardown — don't leak threads
        try:
            self.close()
        except Exception:
            pass

    def _fetch(self, url: str) -> tuple[str, int, str, bytes]:
        """GET with ONE redirect hop → (final_url, status, ctype, body).
        status < 0 encodes a transport failure (timeout/connect)."""
        try:
            status, ctype, body, loc = fetch_once(
                url, self.timeout_s, self.user_agent
            )
            if loc is not None:  # one hop, reference semantics
                status, ctype, body, loc2 = fetch_once(
                    loc, self.timeout_s, self.user_agent
                )
                if loc2 is not None:  # redirect → redirect: fail
                    return loc, -2, "", b""
                return loc, status, ctype, body
            return url, status, ctype, body
        except Exception:
            return url, -1, "", b""

    def __call__(
        self, batch: pa.Table, start: int | None = None, length: int | None = None
    ) -> tuple[pa.Table, pa.Table]:
        _t0 = time.perf_counter()
        if start is not None:
            batch = batch.slice(start, length)
        urls = batch["url"].to_pylist()
        fseqs = batch["fetch_seq"].to_pylist()
        epochs = batch["epoch"].to_pylist()
        uhashes = batch["url_hash"].to_pylist()
        results = list(self.pool.map(self._fetch, urls))

        out = {k.name: [] for k in CONTENT_SCHEMA}
        pay = {k.name: [] for k in PAYLOAD_SCHEMA}
        pay_epochs: list[int] = []  # per-row epoch for partition routing
        raw_links: list[str] = []
        link_seq: list[int] = []
        link_pos: list[int] = []
        for i, (final_url, status, ctype, body) in enumerate(results):
            if status != 200:
                continue  # timeout / connect / 4xx / second redirect
            fseq = int(fseqs[i])
            is_html = ctype in ("text/html", "application/xhtml+xml")
            is_image = ctype.startswith("image/")
            if not (is_html or is_image):
                continue  # mime gate
            title, links, fmt = "", [], ""
            if is_html:
                html = body.decode("utf-8", errors="replace")
                host = split_host(final_url)
                short = shorten_html(html)
                links = extract_links(
                    short, host, final_url.startswith("https://")
                )
                title = get_title(html)
            else:
                fmt = ctype.split("/", 1)[1]
                if self.payload_dir is not None:
                    pay["fetch_seq"].append(fseq)
                    pay["image_id"].append(final_url)
                    pay["bytes"].append(body)
                    pay_epochs.append(int(epochs[i]))
            out["fetch_seq"].append(fseq)
            out["epoch"].append(int(epochs[i]))
            out["url"].append(urls[i])
            out["url_hash"].append(int(uhashes[i]))
            out["title"].append(title)
            out["image_id"].append(final_url if is_image else "")
            out["caption"].append("")
            out["w"].append(-1)
            out["h"].append(-1)
            out["fmt"].append(fmt)
            out["phash"].append(0)
            out["invariant_ok"].append(True)
            out["links"].append(links)
            raw_links.extend(links)
            link_seq.extend([fseq] * len(links))
            link_pos.extend(range(len(links)))
        content = pa.table(out, schema=CONTENT_SCHEMA)
        if self.payload_dir is not None and pay["fetch_seq"]:
            # Partition payload rows by THEIR OWN epoch — a batch that
            # straddles an epoch boundary must not file rows under the
            # wrong partition (resume skips finished epoch dirs).
            tbl = pa.table(pay, schema=PAYLOAD_SCHEMA)
            ep = np.asarray(pay_epochs, dtype=np.int64)
            for e in np.unique(ep):
                d = os.path.join(self.payload_dir, f"epoch={int(e)}")
                os.makedirs(d, exist_ok=True)
                sub = tbl.filter(pa.array(ep == e))
                pq.write_table(
                    sub,
                    os.path.join(
                        d, f"part-{sub['fetch_seq'][0].as_py():010d}.parquet"
                    ),
                    compression="none",
                    use_dictionary=False,
                )
        cand = make_candidates(raw_links, link_seq, link_pos, self.shard_count)
        self._calls += 1
        self._pages += len(content)
        self._busy_s += time.perf_counter() - _t0
        return content, cand
