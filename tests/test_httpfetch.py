"""HttpFetchDecode against an in-process loopback HTTP server.

Reference fetch semantics under test (httpDownload.h:77-140): hard
timeout, exactly one redirect hop, content-type gate.  No external
network — the server runs on 127.0.0.1 in a daemon thread."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from searchengine_ray.stages.httpfetch import HttpFetchDecode

PAGE_HTML = b"""<html><head><title>Loopback Page</title></head>
<body><a href="/next">next</a>
<a href="http://example.com/offsite">off</a>
<script>ignored()</script>
</body></html>"""

IMG_BYTES = bytes(range(256)) * 4


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        if self.path == "/page":
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(PAGE_HTML)
        elif self.path == "/redirect":
            self.send_response(301)
            self.send_header("Location", "/page")
            self.end_headers()
        elif self.path == "/double":
            self.send_response(301)
            self.send_header("Location", "/redirect")
            self.end_headers()
        elif self.path == "/img":
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(IMG_BYTES)
        elif self.path == "/binary":
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            self.wfile.write(b"\x00\x01")
        elif self.path == "/slow":
            time.sleep(3)
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html>late</html>")
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _batch(urls):
    n = len(urls)
    return pa.table(
        {
            "fetch_seq": pa.array(list(range(n)), pa.int64()),
            "epoch": pa.array([0] * n, pa.int32()),
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array(list(range(n)), pa.uint64()),
            "content_row": pa.array([0] * n, pa.int64()),
        }
    )


def test_html_parse_and_links(server):
    f = HttpFetchDecode(shard_count=8, timeout_s=5)
    content, cand = f(_batch([f"{server}/page"]))
    assert len(content) == 1
    assert content["title"][0].as_py() == "Loopback Page"
    links = content["links"][0].as_py()
    assert any("next" in l for l in links)
    # candidates are canonicalized link rows
    assert len(cand) >= 1
    assert set(cand.schema.names) >= {"url", "url_hash", "host", "shard"}


def test_one_redirect_hop_followed(server):
    f = HttpFetchDecode(timeout_s=5)
    content, _ = f(_batch([f"{server}/redirect"]))
    assert len(content) == 1
    assert content["title"][0].as_py() == "Loopback Page"


def test_second_redirect_hop_fails(server):
    f = HttpFetchDecode(timeout_s=5)
    content, _ = f(_batch([f"{server}/double"]))
    assert len(content) == 0


def test_mime_gate(server):
    f = HttpFetchDecode(timeout_s=5)
    content, _ = f(_batch([f"{server}/binary", f"{server}/img"]))
    # octet-stream gated out; image kept as payload-bearing row
    assert len(content) == 1
    assert content["fmt"][0].as_py() == "png"
    assert content["links"][0].as_py() == []


def test_timeout_and_404_produce_no_rows(server):
    f = HttpFetchDecode(timeout_s=0.5)
    t0 = time.time()
    content, cand = f(_batch([f"{server}/slow", f"{server}/missing"]))
    assert len(content) == 0 and len(cand) == 0
    assert time.time() - t0 < 2.5  # timeout honored


def test_image_payload_written(server, tmp_path):
    f = HttpFetchDecode(timeout_s=5, payload_dir=str(tmp_path))
    f(_batch([f"{server}/img"]))
    import pyarrow.parquet as pq

    parts = list((tmp_path / "epoch=0").glob("*.parquet"))
    assert len(parts) == 1
    t = pq.read_table(str(parts[0]))
    assert t["bytes"][0].as_py() == IMG_BYTES


def test_batch_mixed_schema_compatible(server):
    """Output schemas are byte-identical to the synthetic FetchDecode
    contract — downstream ladder/payload code is agnostic."""
    from searchengine_ray.stages.fetch import CAND_SCHEMA, CONTENT_SCHEMA

    f = HttpFetchDecode(timeout_s=5)
    content, cand = f(_batch([f"{server}/page", f"{server}/img"]))
    assert content.schema.equals(CONTENT_SCHEMA)
    assert cand.schema.equals(CAND_SCHEMA)
