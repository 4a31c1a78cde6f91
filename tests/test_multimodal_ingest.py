"""Multimodal plumbing + partitioned ingest layout tests."""

import glob

from pyspark.sql import functions as F

from net_spider_spark.findings import FoundLink, FoundNode, findings_to_df
from net_spider_spark.ingest import clear_all, read_findings, write_findings
from net_spider_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    media_stats,
)


def _media(spark):
    rows = [
        (1, "image/png", b"\x89PNG fakebytes", {"width": "64", "height": "64"}),
        (2, "audio/wav", b"RIFF fakebytes", {"sample_rate": "16000"}),
        (3, "video/mp4", b"\x00mp4 fakebytes", {"duration_ms": "3500"}),
        (4, "image/png", None, {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_with_error_channel(spark):
    out = {r["media_id"]: r.asDict() for r in extract_features(_media(spark)).collect()}
    assert len(out[1]["feature"]) == 8
    assert out[1]["error"] is None
    assert out[1]["digest"] is not None and out[1]["n_bytes"] == 14
    # None payload -> error channel, not a task failure
    assert out[4]["feature"] is None
    assert "ValueError" in out[4]["error"]


def test_media_stats_and_frame_plan(spark):
    stats = {r["mime"]: r["n_items"] for r in media_stats(_media(spark)).collect()}
    assert stats == {"image/png": 2, "audio/wav": 1, "video/mp4": 1}
    frames = frame_sample_plan(_media(spark), every_n_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [
        (3, 0), (3, 1000), (3, 2000), (3, 3000)
    ]


def test_partitioned_ingest_roundtrip(spark, tmp_path):
    findings = [
        FoundNode("a", 1_700_000_000_000, [FoundLink("b")]),   # 2023-11-14
        FoundNode("b", 1_700_100_000_000, []),                 # 2023-11-16
    ]
    path = str(tmp_path / "history")
    write_findings(findings_to_df(spark, findings), path)
    # layout: one dir per observation day
    days = sorted(p.split("found_day=")[1] for p in glob.glob(f"{path}/found_day=*"))
    assert days == ["2023-11-14", "2023-11-16"]
    back = read_findings(spark, path)
    assert back.count() == 2 and "found_day" not in back.columns
    # interval-driven partition pruning: only the matching day is read
    from net_spider_spark.interval import Interval

    pruned = read_findings(spark, path, Interval.since(1_700_050_000_000))
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "2023-11-14" not in plan  # pruned partition absent from scan
    clear_all(spark, path)
    assert read_findings(spark, path).count() == 0


def test_bucketed_table_skips_shuffle(spark, tmp_path):
    from net_spider_spark.ingest import write_findings_bucketed
    from net_spider_spark.snapshot import latest_findings_per_node

    findings = findings_to_df(
        spark,
        [FoundNode(f"n{i % 7}", 1000 + i, [FoundLink("x")]) for i in range(50)],
    )
    spark.sql("DROP TABLE IF EXISTS findings_bucketed")
    write_findings_bucketed(findings, "findings_bucketed", n_buckets=4)
    table = spark.table("findings_bucketed")
    assert table.count() == 50
    # the per-subject aggregate over the bucketed table plans NO shuffle
    agg = table.groupBy("subject_node").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and the policy dedup still computes correctly from it
    assert latest_findings_per_node(table).count() == 7
    spark.sql("DROP TABLE findings_bucketed")


def test_sniff_media_headers(spark):
    import struct

    from net_spider_spark.pipeline.multimodal import sniff_media_headers

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16))
    jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00"
    mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00"
    junk = b"not a media file at all"
    rows = [(1, png), (2, gif), (3, wav), (4, jpeg), (5, mp3), (6, junk)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in sniff_media_headers(df).collect()}
    assert got[1]["sniffed_format"] == "png"
    assert (got[1]["sniffed_width"], got[1]["sniffed_height"]) == (640, 480)
    assert got[2]["sniffed_format"] == "gif"
    assert (got[2]["sniffed_width"], got[2]["sniffed_height"]) == (320, 200)
    assert got[3]["sniffed_format"] == "wav"
    assert got[3]["sniffed_sample_rate"] == 44100
    assert got[3]["sniffed_channels"] == 2
    assert got[4]["sniffed_format"] == "jpeg"
    assert got[4]["sniffed_width"] is None  # SOF scan is the decoder's job
    assert got[5]["sniffed_format"] == "mp3"
    assert got[6]["sniffed_format"] is None
    # codegen-only: no Exchange in the plan
    plan = sniff_media_headers(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Real codec-free decoders (WAV PCM / BMP / PPM, pure numpy)
# ---------------------------------------------------------------------------

import math
import struct

import numpy as np

from net_spider_spark.pipeline.multimodal import (
    audio_features,
    decode_bmp,
    decode_media,
    decode_ppm,
    decode_wav,
    image_features,
    resize_nearest,
)


def make_wav(rate=8000, freq=440.0, secs=0.25, channels=1, bits=16):
    n = int(rate * secs)
    t = np.arange(n) / rate
    x = np.sin(2 * math.pi * freq * t)
    if bits == 16:
        frames = np.repeat((x * 32767).astype("<i2"), channels).tobytes()
        block, avg = channels * 2, rate * channels * 2
    else:
        frames = np.repeat(
            ((x * 127) + 128).astype(np.uint8), channels
        ).tobytes()
        block, avg = channels, rate * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, avg, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_bmp(pixels):
    """pixels: (h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    h, w = pixels.shape[:2]
    stride = ((w * 3) + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # BGR bottom-up
    data = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + info + data


def make_ppm(pixels, maxval=255):
    h, w = pixels.shape[:2]
    return f"P6\n# test\n{w} {h}\n{maxval}\n".encode() + pixels.tobytes()


def test_decode_ppm_rescales_small_maxval():
    # P6 allows maxval < 255: samples must rescale to full range, not
    # feed biased values into mean/thumb features.
    px = np.array([[[0, 7, 15]]], dtype=np.uint8)
    out = decode_ppm(make_ppm(px, maxval=15))
    assert out.tolist() == [[[0, 119, 255]]]


def test_decode_wav_sine_roundtrip():
    x, rate = decode_wav(make_wav(rate=8000, freq=440.0, secs=0.25))
    assert rate == 8000 and x.shape == (2000, 1)
    assert abs(float(np.abs(x).max()) - 1.0) < 0.01
    # 8-bit stereo too
    x8, _ = decode_wav(make_wav(bits=8, channels=2))
    assert x8.shape[1] == 2 and float(np.abs(x8).max()) <= 1.0


def test_decode_bmp_ppm_pixels():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_bmp(make_bmp(px)) == px).all()
    assert (decode_ppm(make_ppm(px)) == px).all()
    assert (decode_media(make_bmp(px), "image/bmp") == px).all()


def test_resize_nearest():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2) and small[0, 0] == img[0, 0]


def test_decode_media_honest_about_codecs():
    import pytest

    # mp3 genuinely needs a codec library; malformed PNG/JPEG payloads
    # are data errors (those decoders are real now) — all land in the
    # per-row error channel either way
    with pytest.raises(NotImplementedError):
        decode_media(b"ID3\x04\x00mp3data", "audio/mpeg")
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\nxxxx", "image/png")
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xffjpeg-without-markers", "image/jpeg")
    with pytest.raises(ValueError):
        decode_media(b"garbage!", None)


def test_png_roundtrip_all_filters_and_colortypes():
    # decode(encode(img)) == img for every scanline filter (0-4) and
    # gray/RGB/RGBA, on random pixels — a wrong Sub/Up/Average/Paeth
    # reconstruction cannot survive random data.
    from net_spider_spark.pipeline.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for channels in (1, 3, 4):
        for ft in range(5):
            img = rng.integers(0, 256, size=(9, 5, channels), dtype=np.uint8)
            got = decode_png(encode_png(img, filter_type=ft))
            want = (
                np.repeat(img, 3, axis=2) if channels == 1
                else img[:, :, :3]
            )
            assert np.array_equal(got, want), (channels, ft)


def test_png_matches_bmp_on_identical_pixels():
    # Same pixels through the PNG and BMP paths give identical arrays
    # (and identical decode_media dispatch results).
    from net_spider_spark.pipeline.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    from_png = decode_png(encode_png(px, filter_type=4))
    from_bmp = decode_bmp(make_bmp(px))
    assert np.array_equal(from_png, from_bmp)
    assert np.array_equal(decode_media(encode_png(px), "image/png"), px)


def test_png_palette_and_unsupported_variants():
    import zlib

    import pytest

    from net_spider_spark.pipeline.multimodal import decode_png

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # color type 3: palette lookup
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = bytes([0, 0, 1, 0, 2, 0])
    doc = (sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    assert decode_png(doc).tolist() == [
        [[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]]
    # 16-bit depth and Adam7 interlace honestly refuse
    for depth, interlace in ((16, 0), (8, 1)):
        ihdr_bad = struct.pack(">IIBBBBB", 1, 1, depth, 2, 0, 0, interlace)
        bad = (sig + chunk(b"IHDR", ihdr_bad)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
               + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            decode_png(bad)


def test_image_features_spark_png(spark):
    # PNG payloads flow through the same mapInPandas feature extractor
    # as BMP/PPM, magic-sniffed (the mime column is only a hint).
    from net_spider_spark.pipeline.multimodal import encode_png

    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :, 1] = 120  # green-ish
    rows = [
        (1, "application/octet-stream", bytearray(encode_png(px, 2)), None),
        (2, "image/png", bytearray(b"\x89PNG\r\n\x1a\ntruncated"), None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, "
        "meta map<string,string>"
    )
    got = {r["media_id"]: r for r in image_features(df, thumb_size=2).collect()}
    ok = got[1]
    assert ok["error"] is None and (ok["width"], ok["height"]) == (6, 4)
    assert ok["mean_g"] == 120.0 and ok["mean_r"] == 0.0
    assert got[2]["error"] is not None  # corrupt PNG -> error channel


def test_audio_features_spark(spark):
    rows = [
        (1, "audio/wav", bytearray(make_wav(rate=8000, freq=440.0)), None),
        (2, "audio/mpeg", bytearray(b"ID3garbage"), None),  # needs codec
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, "
        "meta map<string,string>"
    )
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    ok = got[1]
    assert ok["error"] is None and ok["sample_rate"] == 8000
    assert abs(ok["duration_s"] - 0.25) < 1e-6
    assert abs(ok["rms"] - 1 / math.sqrt(2)) < 0.01  # sine RMS
    assert abs(ok["spectral_centroid_hz"] - 440.0) < 15.0
    assert got[2]["error"] is not None  # needs-codec row -> error channel


def test_image_features_spark(spark):
    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # red-ish image
    rows = [
        (1, "image/bmp", bytearray(make_bmp(px)), None),
        (2, "image/x-portable-pixmap", bytearray(make_ppm(px)), None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, "
        "meta map<string,string>"
    )
    got = {r["media_id"]: r for r in image_features(df, thumb_size=2).collect()}
    for r in got.values():
        assert r["error"] is None
        assert (r["width"], r["height"]) == (6, 4)
        assert abs(r["mean_r"] - 200.0) < 1e-6 and r["mean_b"] == 0.0
        assert len(r["thumb"]) == 4


def _gif_lzw_encode(indices, mcs):
    """Dictionary-building GIF-LZW encoder (test-side reference
    implementation) so decode_gif round-trips real growing-width
    streams, not just clear-code-per-symbol degenerate ones."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(1 << mcs)}
    next_code, width = end + 1, mcs + 1
    emitted = [(clear, width)]
    buf = b""
    for s in indices:
        nxt = buf + bytes([s])
        if nxt in table:
            buf = nxt
            continue
        emitted.append((table[buf], width))
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        buf = nxt[-1:]
    if buf:
        emitted.append((table[buf], width))
    emitted.append((end, width))
    acc = bits = 0
    out = bytearray()
    for code, w in emitted:
        acc |= code << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(w, h, pal, indices, interlace=False):
    size_field = max(0, (len(pal) - 1).bit_length() - 1)
    n_entries = 2 << size_field
    pal_bytes = (b"".join(bytes(c) for c in pal)
                 + b"\x00\x00\x00" * (n_entries - len(pal)))
    mcs = max(2, (n_entries - 1).bit_length())
    hdr = (b"GIF89a"
           + struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
           + pal_bytes)
    img = (b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
           + bytes([0x40 if interlace else 0]))
    data = _gif_lzw_encode(indices, mcs)
    sub = b""
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        sub += bytes([len(chunk)]) + chunk
    return hdr + img + bytes([mcs]) + sub + b"\x00" + b"\x3B"


def test_gif_decode_roundtrip_and_interlace():
    import random

    from net_spider_spark.pipeline.multimodal import decode_gif

    rng = random.Random(9)
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    for (w, h) in [(2, 2), (17, 13), (40, 31)]:
        idx = [rng.randrange(4) for _ in range(w * h)]
        out = decode_gif(make_gif(w, h, pal, idx))
        want = np.array(pal, np.uint8)[np.array(idx, np.uint8).reshape(h, w)]
        assert out.shape == (h, w, 3) and np.array_equal(out, want)
    # 128-color palette + 8000 pixels pushes code width past 9 bits
    pal2 = [(i, 255 - i, i // 2) for i in range(128)]
    idx2 = [rng.randrange(128) for _ in range(100 * 80)]
    out = decode_gif(make_gif(100, 80, pal2, idx2))
    want = np.array(pal2, np.uint8)[np.array(idx2, np.uint8).reshape(80, 100)]
    assert np.array_equal(out, want)
    # interlaced: stored rows come in the 4-pass order
    rows = np.array([(x + y) % 4 for y in range(16) for x in range(8)],
                    np.uint8).reshape(16, 8)
    order = np.concatenate([np.arange(0, 16, 8), np.arange(4, 16, 8),
                            np.arange(2, 16, 4), np.arange(1, 16, 2)])
    stored = rows[order].ravel().tolist()
    out = decode_gif(make_gif(8, 16, pal, stored, interlace=True))
    assert np.array_equal(out, np.array(pal, np.uint8)[rows])
    import pytest

    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 20)  # no image data
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF")


def test_image_features_spark_gif(spark):
    from net_spider_spark.pipeline.multimodal import decode_media

    pal = [(0, 0, 200)]
    gif = make_gif(6, 4, pal, [0] * 24)
    assert np.array_equal(
        decode_media(gif, None),
        np.broadcast_to(np.array([0, 0, 200], np.uint8), (4, 6, 3)),
    )
    rows = [(1, "image/gif", bytearray(gif), None)]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, "
        "meta map<string,string>"
    )
    got = image_features(df, thumb_size=2).collect()[0]
    assert got["error"] is None
    assert (got["width"], got["height"]) == (6, 4)
    assert got["mean_b"] == 200.0 and got["mean_r"] == 0.0


def test_mpeg_audio_meta_parsing():
    import pytest

    from net_spider_spark.pipeline.multimodal import (
        encode_mp3_frames,
        parse_mpeg_audio_meta,
    )

    # CBR stream: duration is the exact single-division IEEE value
    m = parse_mpeg_audio_meta(
        encode_mp3_frames(25, bitrate_idx=9, rate_idx=0, channels=1)
    )
    assert m["n_frames"] == 25
    assert m["duration_s"] == (25 * 1152) / 44100
    assert m["bitrate_kbps"] == 128.0
    assert m["sample_rate"] == 44100 and m["channels"] == 1
    assert m["format"] == "mp3" and m["version"] == "1"

    # leading ID3v2 + trailing ID3v1 are skipped, not parsed as frames
    body = encode_mp3_frames(8, bitrate_idx=3, rate_idx=1, id3_bytes=137)
    tagged = body + b"TAG" + b"\x00" * 125
    m = parse_mpeg_audio_meta(tagged)
    assert m["n_frames"] == 8 and m["sample_rate"] == 48000
    assert m["channels"] == 2

    # a truncated final frame stops the walk instead of mis-reading
    cut = encode_mp3_frames(5, bitrate_idx=9, rate_idx=0)[:-10]
    assert parse_mpeg_audio_meta(cut)["n_frames"] == 4

    with pytest.raises(ValueError):
        parse_mpeg_audio_meta(b"\x00\x01\x02\x03 not audio")


def test_isobmff_meta_parsing():
    import pytest

    from net_spider_spark.pipeline.multimodal import (
        encode_mp4_skeleton,
        parse_isobmff_meta,
    )

    v = parse_isobmff_meta(
        encode_mp4_skeleton(1920, 1080, 90_500, with_audio=True)
    )
    assert (v["width"], v["height"]) == (1920, 1080)
    assert v["duration_s"] == 90.5
    assert v["n_tracks"] == 2 and v["has_video"] and v["has_audio"]
    assert v["brand"] == "isom" and v["format"] == "mp4"

    solo = parse_isobmff_meta(encode_mp4_skeleton(320, 240, 1000))
    assert solo["n_tracks"] == 1 and not solo["has_audio"]

    with pytest.raises(ValueError):
        parse_isobmff_meta(b"\x00\x00\x00\x08freeAAAA")  # no ftyp
    # malformed box size must raise, not loop or mis-walk
    bad = bytearray(encode_mp4_skeleton(320, 240, 1000))
    bad[0:4] = (2**31).to_bytes(4, "big")
    with pytest.raises(ValueError):
        parse_isobmff_meta(bytes(bad))


def test_media_metadata_spark_error_channel(spark):
    from net_spider_spark.pipeline.multimodal import (
        encode_mp3_frames,
        encode_mp4_skeleton,
        media_metadata,
        sniff_media_headers,
    )

    rows = [
        (1, None, bytearray(encode_mp3_frames(12, bitrate_idx=5,
                                              rate_idx=2)), None),
        (2, None, bytearray(encode_mp4_skeleton(640, 360, 2500)), None),
        (3, None, bytearray(b"garbage payload, not a container"), None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary, "
        "meta map<string,string>"
    )
    got = {r["media_id"]: r for r in media_metadata(df).collect()}
    mp3 = got[1]
    assert mp3["format"] == "mp3" and mp3["error"] is None
    assert mp3["n_frames"] == 12 and mp3["sample_rate"] == 32000
    assert mp3["duration_s"] == (12 * 1152) / 32000
    assert mp3["width"] is None  # n/a fields stay NULL in the operator
    mp4 = got[2]
    assert mp4["format"] == "mp4" and mp4["error"] is None
    assert (mp4["width"], mp4["height"]) == (640, 360)
    assert mp4["duration_s"] == 2.5 and mp4["bitrate_kbps"] is None
    assert got[3]["error"] is not None and got[3]["format"] is None

    # sniff now recognizes ftyp containers and any MPEG frame sync
    sniffed = {r["media_id"]: r["sniffed_format"]
               for r in sniff_media_headers(df).collect()}
    assert sniffed[1] == "mp3" and sniffed[2] == "mp4" and sniffed[3] is None


# ---------------------------------------------------------------------------
# Perceptual hash (pHash): re-encode invariance that byte digests lack,
# and the banded dedup operator built on it.
# ---------------------------------------------------------------------------

def _photo(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Photo-like test picture: smoothed random noise (rich spectrum,
    so the pHash low-frequency block has no near-median instability)."""
    from numpy.lib.stride_tricks import sliding_window_view

    r = np.random.RandomState(seed)
    n = r.rand(h // 4, w // 4) * 255
    big = np.kron(n, np.ones((4, 4)))
    pad = np.pad(big, 2, mode="edge")
    sm = sliding_window_view(pad, (5, 5)).reshape(h, w, 25) @ (
        np.ones(25) / 25
    )
    return (
        np.stack([sm, sm * 0.9 + 10, 255 - sm * 0.5], axis=2)
        .clip(0, 255)
        .astype(np.uint8)
    )


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_jpeg_reencode_recall():
    """The carried r6 requirement: a JPEG RE-ENCODE (every byte
    changes, digest dedup is blind) must stay within a tight pHash
    Hamming distance of the original, while different pictures are
    far — at quality 85 and a harsher 60."""
    from net_spider_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
    from net_spider_spark.pipeline.multimodal import phash64

    for seed in range(5):
        img = _photo(seed)
        p = phash64(img)
        assert _ham(p, phash64(decode_jpeg(encode_jpeg(img)))) <= 4
        assert _ham(p, phash64(decode_jpeg(encode_jpeg(img, quality=60)))) <= 4
        assert _ham(p, phash64(_photo(seed + 100))) > 10


def test_phash_format_invariance():
    # identical pixels through different containers -> identical hash
    from net_spider_spark.pipeline.multimodal import (
        decode_png, encode_png, phash64
    )

    img = _photo(1)
    assert phash64(decode_png(encode_png(img))) == phash64(img)


def test_image_phash_dedup_flags_reencodes(spark):
    """End-to-end through Spark: originals + JPEG re-encodes + PNG
    copies; the dominated rule must flag every copy and keep every
    original, with NULL-hash (undecodable) rows passing through."""
    from net_spider_spark.pipeline.dedup import image_phash_dedup
    from net_spider_spark.pipeline.jpeg import encode_jpeg
    from net_spider_spark.pipeline.multimodal import encode_png, image_phash

    rows = []
    for i in range(4):
        img = _photo(i)
        rows.append((i * 10, "image/png", bytearray(encode_png(img)), None))
        rows.append(
            (i * 10 + 1, "image/jpeg", bytearray(encode_jpeg(img)), None)
        )
    rows.append((99, "application/x-bogus", bytearray(b"????bogus"), None))
    media = spark.createDataFrame(
        rows,
        "media_id long, mime string, payload binary, meta map<string,string>",
    )
    hashes = image_phash(media)
    out = {
        r["media_id"]: r["is_dup"]
        for r in image_phash_dedup(hashes, max_hamming=4, bands=8).collect()
    }
    for i in range(4):
        assert out[i * 10] is False      # original kept
        assert out[i * 10 + 1] is True   # re-encode flagged
    assert out[99] is False              # decode error passes through


def test_phash_dedup_mass_copy_class_survives_bucket_cap(spark):
    """Regression (r8 advice): the headline use-case — thousands of
    exact re-encoded copies sharing one 64-bit hash — must ALL be
    flagged even with a small band-bucket cap, because dedup now
    collapses to one row per DISTINCT hash before banding (exact
    copies are handled by the class aggregate, never by the banded
    join). Also pins the near-class path: a 1-bit perturbation of the
    mass hash is still caught through banding under the cap."""
    from net_spider_spark.pipeline.dedup import image_phash_dedup

    base = (0x0123456789ABCDEF) & ((1 << 63) - 1)
    rows = [(i, base) for i in range(2000)]          # one huge class
    rows.append((5000, base ^ 1))                    # hamming-1 neighbor
    rows.append((5001, 0x7EDCBA9876543210))          # unrelated
    hashes = spark.createDataFrame(rows, "media_id long, phash long")
    out = {
        r["media_id"]: r["is_dup"]
        for r in image_phash_dedup(
            hashes, max_hamming=2, bands=4, max_bucket_size=10
        ).collect()
    }
    assert out[0] is False                           # class min kept
    assert all(out[i] for i in range(1, 2000))       # every copy flagged
    assert out[5000] is True                         # near-dup of id 0
    assert out[5001] is False


def test_phash_dedup_cross_class_min_dominates(spark):
    """A class MIN is itself a dup when a NEIGHBORING class holds a
    smaller id: the dominated rule factors through hash classes."""
    from net_spider_spark.pipeline.dedup import image_phash_dedup

    h = 0x00000000000000F0
    rows = [(1, h), (2, h ^ 1), (3, h ^ 1)]  # class {2,3} min=2, dominated by 1
    hashes = spark.createDataFrame(rows, "media_id long, phash long")
    out = {
        r["media_id"]: r["is_dup"]
        for r in image_phash_dedup(hashes, max_hamming=2, bands=4).collect()
    }
    assert out == {1: False, 2: True, 3: True}


def test_phash_dedup_rejects_loose_threshold():
    import pytest as _pytest

    from net_spider_spark.pipeline.dedup import image_phash_dedup

    with _pytest.raises(ValueError, match="max_hamming < bands"):
        image_phash_dedup(None, max_hamming=4, bands=4)
