"""Baseline JPEG codec (pipeline/jpeg.py): encoder/decoder round trips
across quality, subsampling, restart intervals, and dimension padding;
honest refusals for non-baseline streams; Spark feature-extractor
integration through decode_media's magic dispatch."""

import numpy as np
import pytest

from net_spider_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
from net_spider_spark.pipeline.multimodal import decode_media, image_features


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 / max(w - 1, 1)).astype(np.uint8),
            (yy * 255 / max(h - 1, 1)).astype(np.uint8),
            ((xx + yy) * 255 / max(w + h - 2, 1)).astype(np.uint8),
        ],
        axis=2,
    )


def test_jpeg_roundtrip_quality_and_subsampling():
    img = gradient(40, 56)
    for q, sub, floor in [
        (95, False, 45), (85, False, 40), (95, True, 38), (75, True, 33),
    ]:
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert out.shape == img.shape
        assert psnr(img, out) > floor, (q, sub)
    # flat color at high quality reconstructs near-exactly
    flat = np.full((24, 24, 3), (200, 30, 90), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=95))
    assert np.max(np.abs(out.astype(int) - flat.astype(int))) <= 3
    # solid grayscale at quality 100 is EXACT (DC-only, unit quant)
    gray = np.full((20, 12, 3), 173, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(gray, quality=100)), gray)


def test_jpeg_odd_dimensions_and_gray_input():
    img = gradient(17, 19)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert out.shape == img.shape and psnr(img, out) > 33
    g2d = (np.arange(256) % 256).astype(np.uint8).reshape(16, 16)
    out = decode_jpeg(encode_jpeg(g2d, quality=90))
    assert out.shape == (16, 16, 3)


def test_jpeg_restart_intervals_bit_exact_with_plain():
    # RSTn resynchronization (DC predictors reset, byte-aligned
    # markers) must not change the decoded pixels at all
    img = gradient(48, 64)
    for sub in (False, True):
        plain = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        for ri in (1, 3, 5):
            with_rst = decode_jpeg(
                encode_jpeg(img, quality=90, subsample=sub,
                            restart_interval=ri)
            )
            assert np.array_equal(plain, with_rst), (sub, ri)


def test_jpeg_honest_refusals():
    base = encode_jpeg(gradient(8, 8), quality=90)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(base.replace(b"\xff\xc0", b"\xff\xc9", 1))  # arithmetic
    with pytest.raises(ValueError):
        # marker-swapped SOF2 with a baseline scan header is malformed
        # (a progressive scan may not span Ss=0..Se=63)
        decode_jpeg(base.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8garbage-without-markers")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_jpeg_through_spark_feature_extractor(spark):
    # decode_media magic-dispatches JPEG; means of a near-flat image
    # survive the lossy round trip within a unit
    flat = np.full((16, 24, 3), (60, 180, 240), dtype=np.uint8)
    rows = [
        (1, "application/octet-stream",
         bytearray(encode_jpeg(flat, quality=95)), None),
        (2, "image/jpeg", bytearray(b"\xff\xd8\xff\xe0 truncated"), None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, "
        "meta map<string,string>"
    )
    got = {r["media_id"]: r for r in image_features(df, thumb_size=2).collect()}
    ok = got[1]
    assert ok["error"] is None
    assert (ok["width"], ok["height"]) == (24, 16)
    assert abs(ok["mean_r"] - 60) <= 1.5
    assert abs(ok["mean_g"] - 180) <= 1.5
    assert abs(ok["mean_b"] - 240) <= 1.5
    assert got[2]["error"] is not None

    arr = decode_media(encode_jpeg(flat, quality=95), None)
    assert arr.shape == (16, 24, 3)


def test_jpeg_fill_bytes_and_multiscan_refusal():
    # T.81 B.1.1.2: any run of 0xFF fill bytes may precede a marker
    img = np.full((16, 16, 3), 99, np.uint8)
    jp = encode_jpeg(img, quality=100, restart_interval=1)
    padded = bytearray()
    i = 0
    while i < len(jp):
        if jp[i] == 0xFF and i + 1 < len(jp) and 0xD0 <= jp[i + 1] <= 0xD7:
            padded += b"\xff\xff"  # two fill bytes before each RSTn
        padded.append(jp[i])
        i += 1
    assert np.array_equal(decode_jpeg(bytes(padded)), img)

    # a non-interleaved multi-scan stream refuses honestly instead of
    # returning a color-cast first-component-only image
    base = encode_jpeg(gradient(8, 8), quality=90)
    i = base.find(b"\xff\xda")
    # rewrite the SOS to claim a single-component scan
    hacked = bytearray(base)
    hacked[i + 2 : i + 4] = (8).to_bytes(2, "big")   # new length
    hacked[i + 4] = 1                                # ns = 1
    # (cid, table sel) for component 1, then spectral bytes
    hacked[i + 5 : i + 14] = bytes([1, 0, 0, 63, 0]) + base[i + 14 : i + 18]
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(bytes(hacked[: i + 10]) + bytes([0, 63, 0]) + base[i + 14 :])


def test_jpeg_progressive_bit_exact_with_baseline():
    # The progressive scan script transmits the same quantized
    # coefficients as the baseline encoder, fully refined to Al=0 —
    # so decoded pixels must be IDENTICAL, not merely close.
    from net_spider_spark.pipeline.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, size=(37, 51, 3), dtype=np.uint8)
    for img in (gradient(48, 64), gradient(17, 23), noise):
        for sub in (False, True):
            for q in (50, 85, 95):
                base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
                prog = decode_jpeg(
                    encode_jpeg_progressive(img, quality=q, subsample=sub)
                )
                assert np.array_equal(base, prog), (img.shape, sub, q)


def test_jpeg_progressive_psnr_and_gray():
    from net_spider_spark.pipeline.jpeg import encode_jpeg_progressive

    img = gradient(40, 56)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=92))
    assert psnr(img, out) > 30
    gray = np.arange(0, 240, dtype=np.uint8).reshape(12, 20)
    out = decode_jpeg(encode_jpeg_progressive(gray, quality=95))
    assert out.shape == (12, 20, 3)
    assert psnr(np.repeat(gray[:, :, None], 3, axis=2), out) > 30


def test_jpeg_progressive_through_decode_media():
    # decode_media's magic dispatch routes SOF2 streams through the
    # same JPEG entry point; features must come back identical to the
    # baseline encoding of the same pixels.
    from net_spider_spark.pipeline.jpeg import encode_jpeg_progressive

    img = gradient(24, 32)
    a = decode_media(bytes(encode_jpeg(img, quality=90)), "image/jpeg")
    b = decode_media(bytes(encode_jpeg_progressive(img, quality=90)),
                     "image/jpeg")
    assert np.array_equal(a, b)
