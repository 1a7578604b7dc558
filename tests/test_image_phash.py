"""Perceptual image hashing (aHash) + banded hamming pair join."""

from __future__ import annotations

import numpy as np

from id3c_spark import multimodal


def _gradient_png(w=32, h=32, noise=None, seed=0, invert=False):
    """RGB gradient test image, optionally noised/inverted."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)
    img = np.tile(x, (h, 1))
    if invert:
        img = 255 - img
    if noise:
        img = np.clip(img + rng.normal(scale=noise, size=img.shape), 0, 255)
    rgb = np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8)
    return multimodal.encode_png(w, h, 3, rgb.tobytes())


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, "image", "image/png", bytearray(c), (None, None, None)) for i, c in rows],
        multimodal.MEDIA_SCHEMA,
    )


def test_phash_identical_and_noised_and_inverted(spark):
    a = _gradient_png()
    b = _gradient_png(noise=6.0, seed=1)
    c = _gradient_png(invert=True)
    df = _media(spark, [(1, a), (2, a), (3, b), (4, c)])
    ph = {r["media_id"]: r["phash"] for r in multimodal.image_phash(df).collect()}
    assert ph[1] == ph[2]                                     # identical bytes
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(ph[1], ph[3]) <= 6                             # mild noise → close
    assert ham(ph[1], ph[4]) >= 40                            # inverted → far


def test_phash_invariant_across_png_and_bmp_encoding(spark):
    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    png = multimodal.encode_png(16, 16, 3, pix.tobytes())
    # BMP rows are stored bottom-up → feed them flipped so the decoded
    # picture matches; channel order (BGR vs RGB) is mean-invariant
    bmp = multimodal.encode_bmp(16, 16, pix[::-1].tobytes())
    df = _media(spark, [(1, png), (2, bmp)])
    ph = {r["media_id"]: r["phash"] for r in multimodal.image_phash(df).collect()}
    assert ph[1] == ph[2]


def test_phash_null_for_header_only_formats(spark):
    jpeg_ish = bytes.fromhex("ffd8ffe000104a46494600") + b"\x00" * 32
    df = _media(spark, [(1, jpeg_ish)])
    rows = multimodal.image_phash(df).collect()
    assert rows[0]["phash"] is None


def test_phash_pairs_complete_vs_bruteforce(spark):
    rows = [(1, _gradient_png()), (2, _gradient_png(noise=6.0, seed=5))]
    rows += [(3, _gradient_png(invert=True))]
    rows += [(i, _gradient_png(noise=3.0, seed=i)) for i in range(4, 10)]
    df = _media(spark, rows)
    ph = {r["media_id"]: r["phash"] for r in multimodal.image_phash(df).collect()}
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    brute = {
        (a, b): ham(ph[a], ph[b])
        for a in ph
        for b in ph
        if a < b and ham(ph[a], ph[b]) <= 7
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.image_phash_pairs(df, bands=8, max_hamming=7).collect()
    }
    assert got == brute
    assert brute, "fixture must produce close pairs"
