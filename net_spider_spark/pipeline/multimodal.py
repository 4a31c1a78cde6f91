"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched transform plumbing.

A 100 TB training-data pipeline carries media as ``binary`` columns
beside typed metadata (mime, width/height, duration, sample rate). The
Spark-side contract here is real and tested — schema, partition-size
control, ``mapInPandas`` batch shape, error channels.

Decode is REAL for every common still-image + PCM format, implemented
in pure numpy (:func:`decode_wav` PCM 8/16-bit, :func:`decode_bmp`
uncompressed 24/32-bit, :func:`decode_ppm` binary P6,
:func:`decode_png` 8-bit non-interlaced via zlib inflate + per-row
unfilter, :func:`decode_gif` first frame via spec LZW + palette, and
baseline AND progressive JPEG via ``pipeline.jpeg``), as are
nearest-neighbor resize and the audio/image feature extractors built
on them. mp3/video raise ``NotImplementedError`` from
:func:`decode_media`; inside the Spark operators that lands in the
per-row ``error`` column, so a corpus with mixed formats still
processes everything decodable (point ``decoder=`` at a C codec for
bulk photographic data — the pure-Python Huffman loop is for
correctness and modest volumes, not throughput).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id BIGINT, mime STRING, n_bytes BIGINT, digest STRING, "
    "feature ARRAY<FLOAT>, error STRING"
)


# ---------------------------------------------------------------------------
# Real decoders for codec-free formats (pure numpy — no external libs).
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a canonical RIFF/WAVE payload with PCM samples.

    Supports 8-bit unsigned and 16-bit signed little-endian PCM (the
    codec-free encodings). Walks the chunk list (fmt /data may be
    preceded by LIST etc.), so non-canonical chunk order decodes too.

    Returns ``(samples, sample_rate)`` with ``samples`` float32 in
    [-1, 1], shape (n_frames, n_channels).
    """
    if payload is None or len(payload) < 12:
        raise ValueError("not a RIFF payload")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_format})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), sample_rate


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER) into an
    RGB uint8 array of shape (height, width, 3). Handles 4-byte row
    padding and bottom-up vs top-down row order (negative height)."""
    if payload is None or len(payload) < 54 or payload[0:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP")
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS-with-default-masks
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bpp BMP")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = ((width * bytes_pp) + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    return (rgb[::-1] if bottom_up else rgb).copy()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an RGB uint8 array (h, w, 3)."""
    if payload is None or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    px = (
        np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
        .reshape(height, width, 3)
        .copy()
    )
    if maxval != 255:
        # P6 allows maxval < 255; rescale so downstream mean/thumb
        # features see the full 0-255 range instead of biased samples.
        px = (px.astype(np.uint16) * 255 // maxval).clip(0, 255).astype(np.uint8)
    return px


def _png_paeth_predictor(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9, filter type 4)."""
    a32, b32, c32 = (x.astype(np.int32) for x in (a, b, c))
    p = a32 + b32 - c32
    pa, pb, pc = np.abs(p - a32), np.abs(p - b32), np.abs(p - c32)
    return np.where((pa <= pb) & (pa <= pc), a32, np.where(pb <= pc, b32, c32))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit-depth non-interlaced PNG into an RGB uint8 array
    of shape (height, width, 3) — pure stdlib + numpy (``zlib`` inflate
    of the IDAT stream, then per-row unfilter per PNG spec §9).

    Supported: color types 0 (gray, replicated to RGB), 2 (RGB),
    3 (palette via PLTE), 4 (gray+alpha) and 6 (RGBA) — alpha is
    dropped. 16-bit depth, sub-byte depths, and Adam7 interlacing raise
    ``NotImplementedError`` into the operators' per-row error channel.

    Filters 0-2 and the lane-wise Sub cumsum are vectorized; Average/
    Paeth reconstruction is inherently sequential along a row (each
    byte needs the already-reconstructed left neighbor), so those rows
    run a per-byte Python loop — fine for thumbnails and test corpora;
    point ``decoder=`` at a codec library for bulk photographic data.
    """
    import zlib

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + payload + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if comp != 0 or filt_method != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit-depth PNG")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    scan = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters, data = scan[:, 0], scan[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f, row = int(filters[y]), data[y]
        if f == 0:
            cur = row.copy()
        elif f == 1:  # Sub: cumulative sum along each bpp byte-lane
            cur = (
                np.cumsum(row.reshape(w, bpp).astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256 by construction
        elif f in (3, 4):  # Average / Paeth: sequential along the row
            vals = row.tolist()
            pr = prev.tolist()
            for x in range(stride):
                left = vals[x - bpp] if x >= bpp else 0
                if f == 3:
                    pred = (left + pr[x]) >> 1
                else:
                    up, ul = pr[x], (pr[x - bpp] if x >= bpp else 0)
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else ul
                    )
                vals[x] = (vals[x] + pred) & 0xFF
            cur = np.asarray(vals, dtype=np.uint8)
        else:
            raise ValueError(f"PNG filter type {f}")
        recon[y] = cur
        prev = cur
    if color == 2:
        return recon.reshape(h, w, 3).copy()
    if color == 6:
        return recon.reshape(h, w, 4)[:, :, :3].copy()
    if color == 0:
        return np.repeat(recon.reshape(h, w, 1), 3, axis=2)
    if color == 4:
        return np.repeat(recon.reshape(h, w, 2)[:, :, :1], 3, axis=2)
    # color == 3: palette lookup
    if plte is None:
        raise ValueError("palette PNG without PLTE")
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    idx = recon.reshape(h, w)
    if idx.max(initial=0) >= len(pal):
        raise ValueError("palette index out of range")
    return pal[idx].copy()


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array as an 8-bit non-interlaced PNG (corpus/test
    sink for :func:`decode_png`; also writes real thumbnails). Accepts
    (h, w) or (h, w, 1) for gray (color type 0), (h, w, 3) RGB (2),
    (h, w, 4) RGBA (6); ``filter_type`` 0-4 applies that filter to
    every scanline (encoding predictors use raw neighbor values, so all
    five vectorize)."""
    import zlib

    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, channels = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    bpp = channels
    flat = img.reshape(h, w * bpp).astype(np.int32)
    zero = np.zeros((h, w * bpp), dtype=np.int32)
    left = np.concatenate([zero[:, : bpp], flat[:, :-bpp]], axis=1)
    up = np.concatenate([zero[:1], flat[:-1]], axis=0)
    upleft = np.concatenate([zero[:, : bpp], up[:, :-bpp]], axis=1)
    if filter_type == 0:
        pred = zero
    elif filter_type == 1:
        pred = left
    elif filter_type == 2:
        pred = up
    elif filter_type == 3:
        pred = (left + up) // 2
    elif filter_type == 4:
        pred = _png_paeth_predictor(left, up, upleft)
    else:
        raise ValueError(f"PNG filter type {filter_type}")
    filtered = ((flat - pred) % 256).astype(np.uint8)
    scan = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), filtered], axis=1
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW decode (public spec, GIF89a appendix F): codes
    start at ``min_code_size + 1`` bits, the clear code resets the
    dictionary, code width grows to at most 12 bits. Returns the index
    stream (one byte per pixel), truncated/padded handling left to the
    caller."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = bits = pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while bits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: return what we have
            acc |= data[pos] << bits
            pos += 1
            bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/GIF89a payload into an RGB
    uint8 array (height, width, 3) — pure stdlib + numpy (LZW decode
    per the public spec, palette lookup, Adam-style interlace row
    reordering). Animation frames beyond the first, and transparency
    compositing, are out of scope (the first frame's palette colors are
    returned as-is)."""
    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    (screen_w, screen_h) = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _, _, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    payload, np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _gif_lzw_decode(b"".join(chunks), min_code_size, w * h)
            arr = np.zeros(w * h, dtype=np.uint8)
            got = np.frombuffer(idx, np.uint8, count=min(len(idx), w * h))
            arr[: len(got)] = got
            rows = arr.reshape(h, w)
            if ipacked & 0x40:  # interlaced: 4-pass row order
                order = np.concatenate(
                    [
                        np.arange(0, h, 8),
                        np.arange(4, h, 8),
                        np.arange(2, h, 4),
                        np.arange(1, h, 2),
                    ]
                )
                deinter = np.empty_like(rows)
                deinter[order] = rows
                rows = deinter
            if rows.max(initial=0) >= len(pal):
                raise ValueError("GIF palette index out of range")
            return pal[rows].copy()
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF payload has no image data")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows[:, None], cols[None, :]]


def decode_media(payload: bytes, mime: str):
    """Dispatch decode by sniffing payload magic (mime is a fallback
    hint only — corpus mime columns lie). Returns a numpy array (image)
    or (samples, rate) tuple (audio). Raises ``NotImplementedError``
    for formats that need a codec library — callers inside Spark
    operators turn that into the per-row error channel."""
    if payload is None or len(payload) < 4:
        raise ValueError("empty payload")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"\x89PNG":
        return decode_png(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from net_spider_spark.pipeline.jpeg import decode_jpeg

        return decode_jpeg(payload)
    for magic, name in (
        (b"ID3", "mp3"),
        (b"\xff\xfb", "mp3"),
    ):
        if payload.startswith(magic):
            raise NotImplementedError(
                f"{name} needs a codec library (pass decoder=)"
            )
    raise ValueError(f"unrecognized payload (mime hint: {mime})")


def deterministic_fake_decoder(payload: bytes, mime: str) -> list[float]:
    """Stand-in decode+feature-extract: a deterministic 8-dim feature
    from the payload digest. Replace with a real codec in production —
    the pipeline shape (batching, schema, error channel) is identical.
    """
    if payload is None:
        raise ValueError("empty payload")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(
    media: DataFrame,
    decoder: Optional[Callable[[bytes, str], list[float]]] = None,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode/feature-extract media payloads via ``mapInPandas``.

    * Arrow batches keep payload bytes off the Python heap until the
      batch arrives; ``spark.sql.execution.arrow.maxRecordsPerBatch``
      (or ``batch_rows`` here) bounds peak memory for large blobs.
    * Per-row failures land in the ``error`` column instead of killing
      the task — corrupt media is data, not an exception, at corpus
      scale.
    """
    decode = decoder or deterministic_fake_decoder

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = {
                    "media_id": [], "mime": [], "n_bytes": [],
                    "digest": [], "feature": [], "error": [],
                }
                for _, row in chunk.iterrows():
                    payload = row["payload"]
                    out["media_id"].append(row["media_id"])
                    out["mime"].append(row["mime"])
                    out["n_bytes"].append(
                        len(payload) if payload is not None else 0
                    )
                    out["digest"].append(
                        hashlib.sha256(payload).hexdigest()
                        if payload is not None
                        else None
                    )
                    try:
                        out["feature"].append(decode(payload, row["mime"]))
                        out["error"].append(None)
                    except Exception as e:  # error channel, not task failure
                        out["feature"].append(None)
                        out["error"].append(f"{type(e).__name__}: {e}")
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def _be(payload, pos: int, length: int):
    """Big-endian unsigned int from payload bytes [pos, pos+length)."""
    return F.conv(F.hex(F.substring(payload, pos + 1, length)), 16, 10).cast(
        "long"
    )


def _le(payload, pos: int, length: int):
    """Little-endian unsigned int: reverse the bytes, then read BE."""
    swapped = F.concat(
        *[F.substring(payload, pos + length - i, 1) for i in range(length)]
    )
    return F.conv(F.hex(swapped), 16, 10).cast("long")


def sniff_media_headers(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Detect container format and basic dimensions from header bytes —
    magic numbers and fixed-offset fields only, so this is REAL (not a
    stub): pure Catalyst byte arithmetic, no codec library, runs in
    whole-stage codegen over the binary column.

    Returns the input plus ``sniffed_format`` (png/jpeg/gif/wav/mp3 —
    ID3v2 or any MPEG frame sync — /mp4 via the ftyp box, else null)
    and, where the format stores them at fixed offsets,
    ``sniffed_width``/``sniffed_height`` (PNG IHDR big-endian, GIF
    logical screen little-endian) and ``sniffed_sample_rate``/
    ``sniffed_channels`` (canonical RIFF/WAVE fmt chunk). JPEG
    dimensions live in variable-position SOF markers — that genuinely
    needs a scan, so they stay null here (the `decoder=` hook's job).
    """
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 12))
    fmt = (
        F.when(head.startswith("89504E470D0A1A0A"), "png")
        .when(head.startswith("FFD8FF"), "jpeg")
        .when(
            head.startswith("474946383761") | head.startswith("474946383961"),
            "gif",
        )
        .when(
            head.startswith("52494646")
            & (F.hex(F.substring(p, 9, 4)) == "57415645"),
            "wav",
        )
        .when(
            head.startswith("494433")
            | ((_be(p, 0, 1) == 255) & (_be(p, 1, 1) >= 224)),
            "mp3",
        )
        .when(F.hex(F.substring(p, 5, 4)) == "66747970", "mp4")  # ftyp
        .otherwise(F.lit(None).cast("string"))
    )
    out = media.withColumn("sniffed_format", fmt)
    is_png = F.col("sniffed_format") == "png"
    is_gif = F.col("sniffed_format") == "gif"
    is_wav = F.col("sniffed_format") == "wav"
    return (
        out.withColumn(
            "sniffed_width",
            F.when(is_png, _be(p, 16, 4)).when(is_gif, _le(p, 6, 2)),
        )
        .withColumn(
            "sniffed_height",
            F.when(is_png, _be(p, 20, 4)).when(is_gif, _le(p, 8, 2)),
        )
        .withColumn("sniffed_sample_rate", F.when(is_wav, _le(p, 24, 4)))
        .withColumn("sniffed_channels", F.when(is_wav, _le(p, 22, 2)))
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id BIGINT, sample_rate BIGINT, n_frames BIGINT, n_channels INT, "
    "duration_s DOUBLE, rms DOUBLE, peak DOUBLE, zero_cross_rate DOUBLE, "
    "spectral_centroid_hz DOUBLE, error STRING"
)


def audio_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """REAL audio decode + features over PCM WAV payloads: duration,
    RMS, peak, zero-crossing rate, and spectral centroid (numpy rFFT on
    the mono mix). Non-WAV / non-PCM rows land in the error column."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for _, row in chunk.iterrows():
                    rec = {
                        "media_id": row["media_id"], "sample_rate": None,
                        "n_frames": None, "n_channels": None,
                        "duration_s": None, "rms": None, "peak": None,
                        "zero_cross_rate": None,
                        "spectral_centroid_hz": None, "error": None,
                    }
                    try:
                        x, rate = decode_wav(row["payload"])
                        mono = x.mean(axis=1)
                        n = len(mono)
                        rec.update(
                            sample_rate=rate, n_frames=n,
                            n_channels=x.shape[1],
                            duration_s=n / rate if rate else None,
                            rms=float(np.sqrt(np.mean(mono**2))) if n else 0.0,
                            peak=float(np.abs(mono).max()) if n else 0.0,
                            zero_cross_rate=float(
                                np.mean(np.diff(np.signbit(mono)) != 0)
                            ) if n > 1 else 0.0,
                        )
                        if n > 1:
                            mag = np.abs(np.fft.rfft(mono))
                            freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                            tot = mag.sum()
                            rec["spectral_centroid_hz"] = (
                                float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                            )
                    except Exception as e:
                        rec["error"] = f"{type(e).__name__}: {e}"
                    rows.append(rec)
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "media_id BIGINT, width INT, height INT, aspect DOUBLE, "
    "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE, std_gray DOUBLE, "
    "thumb ARRAY<FLOAT>, error STRING"
)


def image_features(
    media: DataFrame, thumb_size: int = 4, batch_rows: int = 64
) -> DataFrame:
    """REAL image decode + features over BMP/PPM payloads: dimensions,
    per-channel means, grayscale std, and a ``thumb_size``² grayscale
    thumbnail (nearest-neighbor resize) usable as an embedding for
    near-dup search. Codec-needing formats land in the error column."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for _, row in chunk.iterrows():
                    rec = {
                        "media_id": row["media_id"], "width": None,
                        "height": None, "aspect": None, "mean_r": None,
                        "mean_g": None, "mean_b": None, "std_gray": None,
                        "thumb": None, "error": None,
                    }
                    try:
                        img = decode_media(row["payload"], row["mime"])
                        if not isinstance(img, np.ndarray):
                            raise ValueError("payload is audio, not image")
                        h, w = img.shape[:2]
                        gray = img.astype(np.float32).mean(axis=2)
                        thumb = resize_nearest(gray, thumb_size, thumb_size)
                        rec.update(
                            width=w, height=h, aspect=w / h,
                            mean_r=float(img[:, :, 0].mean()),
                            mean_g=float(img[:, :, 1].mean()),
                            mean_b=float(img[:, :, 2].mean()),
                            std_gray=float(gray.std()),
                            thumb=[float(v) for v in (thumb / 255.0).ravel()],
                        )
                    except Exception as e:
                        rec["error"] = f"{type(e).__name__}: {e}"
                    rows.append(rec)
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def phash64(
    img: np.ndarray, hash_size: int = 8, img_size: int = 32
) -> int:
    """64-bit perceptual hash (pHash): grayscale -> ``img_size``²
    resize -> 2-D DCT-II -> threshold the ``hash_size``² low-frequency
    block against its median (the classic imagehash/pHash recipe:
    dctlowfreq = dct[:8, :8]; bit = coeff > median). Lossy re-encodes
    of the same picture (JPEG quality changes, format conversions)
    keep low-frequency structure, so their hashes differ in few bits —
    compare with Hamming distance, unlike byte digests which any
    re-encode defeats.

    Deviations from the PIL-based imagehash, both deterministic and
    irrelevant to thresholding: nearest-neighbor resize (no antialias
    dependency) and an unnormalized DCT (thresholding against the
    block median is scale-invariant). Returned as a SIGNED 64-bit int
    so it round-trips a Spark ``long`` column exactly."""
    gray = (
        img.astype(np.float64).mean(axis=2)
        if img.ndim == 3
        else img.astype(np.float64)
    )
    small = resize_nearest(gray, img_size, img_size)
    n = img_size
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * m + 1) * k / (2 * n))  # DCT-II basis rows
    d = c @ small @ c.T
    low = d[:hash_size, :hash_size]
    med = float(np.median(low))
    bits = (low > med).ravel()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


PHASH_SCHEMA = "media_id bigint, phash bigint, error string"


def image_phash(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Perceptual hash per image: (media_id, phash, error) — the
    near-dup key byte digests cannot provide (a re-encode changes
    every byte but few pHash bits). Same Arrow-batch ``mapInPandas``
    shape and per-row error channel as :func:`image_features`; pair
    with ``pipeline.dedup.image_phash_dedup`` for the banded
    candidate join."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for _, row in chunk.iterrows():
                    rec = {
                        "media_id": row["media_id"],
                        "phash": None,
                        "error": None,
                    }
                    try:
                        img = decode_media(row["payload"], row["mime"])
                        if not isinstance(img, np.ndarray):
                            raise ValueError("payload is audio, not image")
                        rec["phash"] = phash64(img)
                    except Exception as e:
                        rec["error"] = f"{type(e).__name__}: {e}"
                    rows.append(rec)
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst media accounting (no decode): size and digest per
    mime class — the cheap pre-pass that sizes the decode job."""
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length(F.col("payload"))).alias("total_bytes"),
        F.avg(F.length(F.col("payload"))).alias("avg_bytes"),
    )


def frame_sample_plan(
    media: DataFrame, every_n_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts) from
    the duration metadata — the explode that fans a video into frame
    work items before the decoder runs (decode itself is the stubbed
    step)."""
    duration = F.col("meta").getItem("duration_ms").cast("long")
    return media.where(duration.isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), duration - 1, F.lit(every_n_ms))
        ).alias("frame_ts_ms"),
    )


# ---------------------------------------------------------------------------
# MP3 / MP4 metadata extraction (public specs: ISO 11172-3 / 13818-3
# frame headers, ISO 14496-12 box structure). Full DECODE of these
# formats stays behind the ``decoder=`` hook — what a corpus-triage
# pipeline needs from them is duration / bitrate / sample rate / video
# dimensions, and those live in headers a pure-Python walk can read.
# ---------------------------------------------------------------------------

# bitrate (kbps) by [version_group][layer][index]; index 0 = "free",
# 15 = invalid. version_group 0 = MPEG1, 1 = MPEG2/2.5.
_MPEG_BITRATES = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample rate (Hz) by [version][index]; version 3=MPEG1, 2=MPEG2, 0=MPEG2.5
_MPEG_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = (
        ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14)
        | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
    )
    footer = 10 if payload[5] & 0x10 else 0
    return 10 + size + footer


def parse_mpeg_audio_meta(payload: bytes) -> dict:
    """Walk MPEG audio (MP3/MP2/MP1) frame headers — no decode — and
    return ``{format, n_frames, duration_s, bitrate_kbps, sample_rate,
    channels, layer, version}``. Duration accumulates per frame
    (samples_per_frame / sample_rate), so VBR streams report true
    duration and ``bitrate_kbps`` is the frame-weighted average.
    Leading ID3v2 and trailing ID3v1 tags are skipped."""
    if payload is None or len(payload) < 4:
        raise ValueError("empty payload")
    pos = _id3v2_size(payload)
    end = len(payload)
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 tail
    n_frames = 0
    # integer sample counts per rate: duration is computed with ONE
    # division per distinct rate at the end, so it is an exact IEEE
    # function of the frame headers (bit-reproducible by any engine),
    # not a rounding-order-dependent running float sum
    samples_by_rate: dict[int, int] = {}
    kbps_sum = 0
    rate = channels = None
    layer_out = version_out = None
    while pos + 4 <= end:
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # lost sync
        version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = 4 - ((b1 >> 1) & 0x03)  # 1..3; 4 = reserved
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        padding = (b2 >> 1) & 0x01
        mode = (b3 >> 6) & 0x03
        if version == 1 or layer == 4 or br_idx in (0, 15) or sr_idx == 3:
            break  # reserved/free-format: stop rather than guess
        vgrp = 0 if version == 3 else 1
        kbps = _MPEG_BITRATES[(vgrp, layer)][br_idx]
        sr = _MPEG_RATES[version][sr_idx]
        if layer == 1:
            frame_len = (12 * kbps * 1000 // sr + padding) * 4
            samples = 384
        elif layer == 2:
            frame_len = 144 * kbps * 1000 // sr + padding
            samples = 1152
        else:  # layer III
            if vgrp == 0:
                frame_len = 144 * kbps * 1000 // sr + padding
                samples = 1152
            else:
                frame_len = 72 * kbps * 1000 // sr + padding
                samples = 576
        if frame_len <= 4 or pos + frame_len > end:
            break  # truncated final frame
        n_frames += 1
        samples_by_rate[sr] = samples_by_rate.get(sr, 0) + samples
        kbps_sum += kbps
        rate = sr
        channels = 1 if mode == 3 else 2
        layer_out = layer
        version_out = {3: "1", 2: "2", 0: "2.5"}[version]
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    dur = sum(s / r for r, s in sorted(samples_by_rate.items()))
    return {
        "format": "mp3" if layer_out == 3 else f"mp{layer_out}",
        "n_frames": n_frames,
        "duration_s": dur,
        "bitrate_kbps": kbps_sum / n_frames,
        "sample_rate": rate,
        "channels": channels,
        "layer": layer_out,
        "version": version_out,
    }


_BMFF_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _walk_bmff(payload: bytes, pos: int, end: int, out: dict) -> None:
    while pos + 8 <= end:
        size = struct.unpack_from(">I", payload, pos)[0]
        btype = payload[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                break
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos  # box extends to end of file
        if size < hdr or pos + size > end:
            raise ValueError("malformed ISO-BMFF box size")
        body = pos + hdr
        if btype == b"ftyp":
            out["brand"] = payload[body : body + 4].decode("latin-1")
        elif btype == b"mvhd":
            ver = payload[body]
            if ver == 1:
                out["timescale"] = struct.unpack_from(">I", payload, body + 20)[0]
                out["duration"] = struct.unpack_from(">Q", payload, body + 24)[0]
            else:
                out["timescale"] = struct.unpack_from(">I", payload, body + 12)[0]
                out["duration"] = struct.unpack_from(">I", payload, body + 16)[0]
        elif btype == b"trak":
            out["n_tracks"] = out.get("n_tracks", 0) + 1
        elif btype == b"tkhd":
            w = struct.unpack_from(">I", payload, pos + size - 8)[0] / 65536
            hgt = struct.unpack_from(">I", payload, pos + size - 4)[0] / 65536
            if w and hgt:  # video tracks carry dims; audio tkhd has 0x0
                out["width"] = int(w)
                out["height"] = int(hgt)
        elif btype == b"hdlr":
            handler = payload[body + 8 : body + 12]
            if handler == b"vide":
                out["has_video"] = True
            elif handler == b"soun":
                out["has_audio"] = True
        if btype in _BMFF_CONTAINERS:
            _walk_bmff(payload, body, pos + size, out)
        pos += size


def parse_isobmff_meta(payload: bytes) -> dict:
    """Walk ISO-BMFF (MP4/MOV/M4A) boxes — no decode — and return
    ``{format, brand, duration_s, n_tracks, width, height, has_video,
    has_audio}`` from ftyp / moov / mvhd / tkhd / hdlr."""
    if payload is None or len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    out: dict = {"n_tracks": 0, "has_video": False, "has_audio": False}
    _walk_bmff(payload, 0, len(payload), out)
    ts = out.get("timescale")
    out["duration_s"] = (out.get("duration", 0) / ts) if ts else None
    out["format"] = "mp4"
    return out


MEDIA_META_SCHEMA = (
    "media_id BIGINT, format STRING, duration_s DOUBLE, "
    "bitrate_kbps DOUBLE, sample_rate BIGINT, channels INT, "
    "n_frames BIGINT, width INT, height INT, n_tracks INT, "
    "brand STRING, error STRING"
)


def media_metadata(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Container-level metadata for MP3 and MP4 payloads via
    ``mapInPandas`` with the standard per-row error channel. This is
    the corpus-triage operator: duration, bitrate, sample rate, and
    video dimensions WITHOUT decoding — frame-header and box walks
    only, so throughput is bounded by I/O, not codecs. Unrecognized
    payloads land in ``error``, not in a task failure."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for _, row in chunk.iterrows():
                    rec = {
                        "media_id": row["media_id"], "format": None,
                        "duration_s": None, "bitrate_kbps": None,
                        "sample_rate": None, "channels": None,
                        "n_frames": None, "width": None, "height": None,
                        "n_tracks": None, "brand": None, "error": None,
                    }
                    payload = row["payload"]
                    try:
                        p = bytes(payload) if payload is not None else b""
                        if len(p) >= 12 and p[4:8] == b"ftyp":
                            m = parse_isobmff_meta(p)
                            rec.update(
                                format=m["format"], brand=m.get("brand"),
                                duration_s=m["duration_s"],
                                n_tracks=m["n_tracks"],
                                width=m.get("width"), height=m.get("height"),
                            )
                        else:
                            m = parse_mpeg_audio_meta(p)
                            rec.update(
                                format=m["format"],
                                duration_s=m["duration_s"],
                                bitrate_kbps=m["bitrate_kbps"],
                                sample_rate=m["sample_rate"],
                                channels=m["channels"],
                                n_frames=m["n_frames"],
                            )
                    except Exception as e:
                        rec["error"] = f"{type(e).__name__}: {e}"
                    rows.append(rec)
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def encode_mp3_frames(
    n_frames: int,
    bitrate_idx: int = 9,
    rate_idx: int = 0,
    channels: int = 2,
    id3_bytes: int = 0,
) -> bytes:
    """Synthesize a CBR MPEG1 Layer III header stream (zero-filled
    frame bodies — valid headers, silent garbage audio) for metadata
    tests and corpus fixtures; optionally prefixed with a minimal
    ID3v2 tag of ``id3_bytes`` padding."""
    out = bytearray()
    if id3_bytes:
        size = id3_bytes
        out += b"ID3\x04\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        ) + b"\x00" * size
    kbps = _MPEG_BITRATES[(0, 3)][bitrate_idx]
    sr = _MPEG_RATES[3][rate_idx]
    mode = 3 if channels == 1 else 0
    for _ in range(n_frames):
        frame_len = 144 * kbps * 1000 // sr  # padding bit 0
        hdr = bytes([
            0xFF,
            0xFB,  # MPEG1, Layer III, no CRC
            (bitrate_idx << 4) | (rate_idx << 2),
            mode << 6,
        ])
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


def encode_mp4_skeleton(
    width: int,
    height: int,
    duration_ms: int,
    timescale: int = 1000,
    with_audio: bool = False,
    brand: str = "isom",
) -> bytes:
    """Synthesize a minimal valid ISO-BMFF skeleton (ftyp + moov with
    mvhd and video/audio trak boxes carrying tkhd + hdlr) for metadata
    tests and corpus fixtures. No media data — triage metadata only."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        b"\x00" + b"\x00" * 3 + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur) + b"\x00" * 80,
    )

    def trak(handler: bytes, w: int, hgt: int) -> bytes:
        tkhd = box(
            b"tkhd",
            b"\x00" + b"\x00" * 3 + struct.pack(">IIII", 0, 0, 1, 0)
            + struct.pack(">I", dur) + b"\x00" * 52
            + struct.pack(">II", w << 16, hgt << 16),
        )
        hdlr = box(
            b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00"
        )
        mdia = box(b"mdia", hdlr)
        return box(b"trak", tkhd + mdia)

    traks = trak(b"vide", width, height)
    if with_audio:
        traks += trak(b"soun", 0, 0)
    ftyp = box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0)
               + b"isomiso2")
    return ftyp + box(b"moov", mvhd + traks)
