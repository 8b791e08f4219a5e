import hashlib

import numpy as np
import pyarrow as pa

from searchengine_ray.sources import synth
from searchengine_ray.sources.codec import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
)


def _pixels(seed=0, h=32, w=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_lossless_roundtrip():
    px = _pixels(1)
    for fmt in ("bmp", "png"):
        dec, f = decode_image(encode_image(px, fmt))
        assert f == fmt
        assert (dec == px).all()


def test_jpeg_lossy_psnr_floor():
    px = _pixels(2)
    dec, f = decode_image(encode_image(px, "jpeg"))
    assert f == "jpeg"
    assert psnr(px, dec) >= 40.0  # the north-rule invariant floor
    assert not (dec == px).all()  # actually lossy


def test_phash_dup_and_distance():
    a = _pixels(3)
    b = a.copy()
    assert phash64(a) == phash64(b)
    c = _pixels(4)
    d = hamming64(np.array([phash64(a)]), np.array([phash64(c)]))
    assert d[0] > 0


def test_gen_images_truth_consistency():
    images, truth = synth.gen_images(60, seed=42)
    assert images.schema.equals(synth.IMAGE_SCHEMA)
    shas = truth["pixels_sha256"].to_pylist()
    psnrs = truth["psnr_db"].to_pylist()
    for i in range(len(images)):
        dec, fmt = decode_image(images["bytes"][i].as_py())
        assert fmt == images["fmt"][i].as_py()
        assert hashlib.sha256(dec.tobytes()).hexdigest() == shas[i]
        assert phash64(dec) == images["phash"][i].as_py()
        assert psnrs[i] >= 40.0
    # some exact duplicates exist (dedup fixture requirement)
    ph = images["phash"].to_pylist()
    assert len(set(ph)) < len(ph)


def test_gen_web_deterministic():
    s1 = synth.gen_web(300, 50, seed=7)
    s2 = synth.gen_web(300, 50, seed=7)
    assert s1.urls == s2.urls
    assert (s1.status == s2.status).all()
    assert s1.links_flat_url == s2.links_flat_url
    # lookup roundtrip
    idx = s1.lookup(s1.url_hash[:20])
    assert (idx == np.arange(20)).all()
    assert s1.lookup(np.array([123456789], np.uint64))[0] == -1
