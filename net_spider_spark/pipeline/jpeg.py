"""JPEG (ITU-T T.81 / JFIF) codec in pure numpy — no codec library.

Public-spec implementation: the DECODER handles single-interleaved-scan
baseline (SOF0, 8-bit, Huffman) JPEG — the overwhelmingly common JFIF
shape — building its entropy and quantization tables from the stream's
own DHT/DQT markers, with arbitrary 1-2× component sampling factors
(4:4:4 / 4:2:2 / 4:2:0), restart intervals, 0xFF fill bytes, and byte
unstuffing; plus PROGRESSIVE (SOF2) streams per T.81 Annex G —
spectral-selection bands, successive-approximation DC/AC refinement
scans, EOB runs, interleaved-DC and single-component-AC ordering —
accumulating coefficients across scans and reconstructing at EOI.
Arithmetic coding, 12-bit precision, and the rare non-interleaved
multi-scan BASELINE layout raise ``NotImplementedError`` into the
operators' per-row error channel. The ENCODERS exist for tests and
corpus generation: baseline (4:4:4 or 4:2:0, quality-scaled
Annex-K-style quantization, simple canonical Huffman tables embedded
via DHT) and a progressive twin whose scan script transmits the same
quantized coefficients — so its decode is bit-identical to baseline.

Entropy (de)coding is per-symbol Python over the bitstream — JPEG's
Huffman stream is inherently sequential — while DCT/IDCT, color
transforms, quantization and upsampling are vectorized numpy over
whole planes. Used from ``multimodal.decode_media`` inside Arrow-batch
``mapInPandas`` operators; for bulk photographic corpora point the
``decoder=`` hook at a C codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The standard 8x8 zigzag scan, generated (not hardcoded)."""
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )
    flat = np.empty(64, dtype=np.int64)
    for i, (r, c) in enumerate(order):
        flat[i] = r * 8 + c
    return flat


ZIGZAG = _zigzag_order()          # zigzag index -> raster index
UNZIGZAG = np.argsort(ZIGZAG)     # raster index -> zigzag index


def _dct_basis() -> np.ndarray:
    n = np.arange(8)
    k = n[:, None]
    c = np.cos((2 * n[None, :] + 1) * k * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c


_C = _dct_basis()

# Annex-K-style base quantization tables (values are embedded in DQT,
# so stream correctness does not depend on these exact numbers).
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * scale + 50) // 100
    return np.clip(out, 1, 255)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


class _HuffDecoder:
    """Canonical Huffman decoder built from a DHT (bits, values) spec."""

    def __init__(self, bits: list[int], values: bytes):
        # map (length, code) -> symbol
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[vi]
                vi += 1
                code += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _simple_huff_spec(symbols: list[int]) -> tuple[list[int], bytes]:
    """A valid canonical table giving every symbol the same length L
    with 2^L > len(symbols) (the all-ones code stays unused, as T.81
    recommends). Embedded via DHT, so any decoder reads it."""
    n = len(symbols)
    length = max(2, (n + 1).bit_length())
    bits = [0] * 16
    bits[length - 1] = n
    return bits, bytes(symbols)


class _HuffEncoder:
    def __init__(self, bits: list[int], values: bytes):
        self.codes: dict[int, tuple[int, int]] = {}
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[values[vi]] = (length, code)
                vi += 1
                code += 1
            code <<= 1


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at (and reports) RSTn / other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.bits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("unexpected end of entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
            elif nxt == 0xFF:
                self.pos += 1  # 0xFF fill byte run (T.81 B.1.1.2)
                return self._fill()
            else:
                # stay positioned ON the marker; pad bits read as zero
                self.marker = nxt
                b = 0
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop pad bits; if positioned at a marker (possibly preceded
        by 0xFF fill bytes, T.81 B.1.1.2), consume and return its
        second byte."""
        self.bits = 0
        self.acc = 0
        d = self.data
        # skip fill: any run of 0xFF bytes collapses to one marker
        while (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and d[self.pos + 1] == 0xFF
        ):
            self.pos += 1
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF:
            m = d[self.pos + 1]
            if m != 0x00:
                self.pos += 2
                self.marker = None
                return m
        return None


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.bits += length
        while self.bits >= 8:
            self.bits -= 8
            b = (self.acc >> self.bits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (the pre-marker fill)."""
        if self.bits:
            pad = 8 - self.bits
            self.write(pad, (1 << pad) - 1)

    def raw_marker(self, second: int) -> None:
        self.align()
        self.out += bytes([0xFF, second])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (category bits, appended magnitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG payload to RGB uint8 (h, w, 3)."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, components)
    progressive = False
    coeffs: dict[int, np.ndarray] | None = None  # per comp id, zigzag order
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected in JPEG stream")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization table")
                tbl = np.frombuffer(
                    seg, np.uint8, count=64, offset=sp + 1
                ).astype(np.int64)
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = tbl
                qtables[tq] = raster.reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = bytes(seg[sp + 17 : sp + 17 + nv])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                sp += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                tq = seg[8 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs = seg[1 + 2 * si]
                tdta = seg[2 + 2 * si]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            data_pos = pos + seg_len
            if progressive:
                # Ss, Se, Ah/Al follow the component specs (T.81 B.2.3)
                band = (
                    seg[1 + 2 * ns],
                    seg[2 + 2 * ns],
                    seg[3 + 2 * ns] >> 4,
                    seg[3 + 2 * ns] & 0x0F,
                )
                if coeffs is None:
                    coeffs = _alloc_coeffs(frame)
                pos = _decode_progressive_scan(
                    payload, data_pos, frame, scan, band, coeffs,
                    huff_dc, huff_ac, restart_interval,
                )
                continue
            if ns != len(frame[2]):
                # spec-legal but rare: non-interleaved per-component
                # scans; decoding only the first would silently return
                # a color-cast image, so refuse honestly instead
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG"
                )
            return _decode_scan(
                payload, data_pos, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    if progressive and coeffs is not None:
        h, w, comps = frame
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        planes = _idct_coeff_planes(comps, coeffs, qtables)
        return _planes_to_rgb(planes, h, w, comps, hmax, vmax)
    raise ValueError("JPEG payload has no scan data")


def _decode_scan(
    payload, data_pos, frame, scan, qtables, huff_dc, huff_ac,
    restart_interval,
):
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = {}
    for c in comps:
        pw = mcus_x * 8 * c["h"]
        ph = mcus_y * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)

    order = []  # (component, block_x_in_mcu, block_y_in_mcu, dc, ac)
    for cs, td, ta in scan:
        c = by_id[cs]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("scan references undeclared Huffman table")
        order.append((c, huff_dc[td], huff_ac[ta]))

    reader = _BitReader(payload, data_pos)
    dc_pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected restart marker")
                dc_pred = {c["id"]: 0 for c in comps}
            for c, hdc, hac in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = hdc.decode(reader)
                        diff = _extend(reader.receive(t), t)
                        dc_pred[c["id"]] += diff
                        coeffs[0] = dc_pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = hac.decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coeffs[k] = _extend(reader.receive(s), s)
                            k += 1
                        q = qtables[c["tq"]]
                        block = np.empty(64, dtype=np.int64)
                        block[ZIGZAG] = coeffs
                        block = block.reshape(8, 8) * q
                        pix = _C.T @ block.astype(np.float64) @ _C
                        py0 = (my * c["v"] + by) * 8
                        px0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][py0 : py0 + 8, px0 : px0 + 8] = pix
            mcu_count += 1

    return _planes_to_rgb(planes, h, w, comps, hmax, vmax)


def _planes_to_rgb(planes, h, w, comps, hmax, vmax):
    """Upsample component planes to full resolution, crop, and
    color-convert (shared by the baseline and progressive paths)."""
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0] + 128.0, 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    y, cb, cr = (p + 128.0 for p in full)
    cb -= 128.0
    cr -= 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 Annex G spectral selection +
# successive approximation. Coefficients accumulate across scans in
# zigzag order per component; pixels are reconstructed at EOI.
# ---------------------------------------------------------------------------


def _comp_block_dims(frame, c):
    """((blocks_y, blocks_x) over the component's true sample dims,
    (alloc_y, alloc_x) over the MCU-padded grid)."""
    h, w, comps = frame
    hmax = max(k["h"] for k in comps)
    vmax = max(k["v"] for k in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_w = (w * c["h"] + hmax - 1) // hmax
    comp_h = (h * c["v"] + vmax - 1) // vmax
    return (
        ((comp_h + 7) // 8, (comp_w + 7) // 8),
        (mcus_y * c["v"], mcus_x * c["h"]),
    )


def _alloc_coeffs(frame):
    out = {}
    for c in frame[2]:
        _, (ay, ax) = _comp_block_dims(frame, c)
        out[c["id"]] = np.zeros((ay, ax, 64), dtype=np.int64)
    return out


def _idct_coeff_planes(comps, coeffs, qtables):
    """Dequantize + IDCT every accumulated block, vectorized per
    component plane."""
    planes = {}
    for c in comps:
        arr = coeffs[c["id"]]  # (nby, nbx, 64) zigzag order
        raster = np.zeros_like(arr)
        raster[:, :, ZIGZAG] = arr
        blocks = raster.reshape(arr.shape[0], arr.shape[1], 8, 8)
        blocks = blocks * qtables[c["tq"]][None, None]
        pix = np.einsum("kn,bckl,lm->bcnm", _C, blocks.astype(np.float64), _C)
        planes[c["id"]] = pix.transpose(0, 2, 1, 3).reshape(
            arr.shape[0] * 8, arr.shape[1] * 8
        )
    return planes


def _scan_entropy_end(payload, pos):
    """Index of the next real marker after a scan's entropy data
    (stuffed 0x00, fill 0xFF runs, and RSTn belong to the scan)."""
    n = len(payload)
    while pos + 1 < n:
        if (
            payload[pos] == 0xFF
            and payload[pos + 1] not in (0x00, 0xFF)
            and not (0xD0 <= payload[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return n


def _decode_progressive_scan(
    payload, data_pos, frame, scan, band, coeffs, huff_dc, huff_ac,
    restart_interval,
):
    """Decode one progressive scan into ``coeffs``; returns the stream
    position of the marker following the scan's entropy data."""
    h, w, comps = frame
    ss, se, ah, al = band
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if not is_dc and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if se > 63 or ss > 63:
        raise ValueError("spectral band out of range")
    by_id = {c["id"]: c for c in comps}
    units = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError("scan references undeclared component")
        hdc = huff_dc.get(td)
        hac = huff_ac.get(ta)
        if is_dc and ah == 0 and hdc is None:
            raise ValueError("scan references undeclared DC Huffman table")
        if not is_dc and hac is None:
            raise ValueError("scan references undeclared AC Huffman table")
        units.append((c, hdc, hac))

    reader = _BitReader(payload, data_pos)
    dc_pred = {c["id"]: 0 for c in comps}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def dc_first(c, hdc, blk):
        t = hdc.decode(reader)
        dc_pred[c["id"]] += _extend(reader.receive(t), t)
        blk[0] = dc_pred[c["id"]] << al

    def dc_refine(blk):
        if reader.read_bit():
            blk[0] = int(blk[0]) | p1

    def ac_first(hac, blk):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = hac.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                return
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1

    def _correct(blk, k):
        # Correction bit for an already-nonzero coefficient: a 1 bit
        # grows the magnitude by 1<<Al if that bit is not already set.
        v = int(blk[k])
        if reader.read_bit() and (v & p1) == 0:
            blk[k] = v + (p1 if v >= 0 else m1)

    def ac_refine(hac, blk):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = hac.decode(reader)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    # r == 15: ZRL — pass 16 zero-history coefficients
                elif s == 1:
                    newval = p1 if reader.read_bit() else m1
                else:
                    raise ValueError("refinement magnitude must be 1")
                while k <= se:
                    if blk[k] != 0:
                        _correct(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            # End-of-band: remaining positions only carry correction
            # bits for already-nonzero coefficients.
            while k <= se:
                if blk[k] != 0:
                    _correct(blk, k)
                k += 1
            eobrun -= 1

    def decode_block(c, hdc, hac, blk):
        if is_dc:
            if ah == 0:
                dc_first(c, hdc, blk)
            else:
                dc_refine(blk)
        else:
            if ah == 0:
                ac_first(hac, blk)
            else:
                ac_refine(hac, blk)

    def restart():
        nonlocal eobrun, dc_pred
        m = reader.align_to_marker()
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError("expected restart marker")
        dc_pred = {c["id"]: 0 for c in comps}
        eobrun = 0

    if len(units) == 1:
        # non-interleaved: block raster order over the component's
        # true (un-MCU-padded) dimensions; restart counts blocks
        c, hdc, hac = units[0]
        (nby, nbx), _ = _comp_block_dims(frame, c)
        arr = coeffs[c["id"]]
        count = 0
        for byy in range(nby):
            for bxx in range(nbx):
                if restart_interval and count and (
                    count % restart_interval == 0
                ):
                    restart()
                decode_block(c, hdc, hac, arr[byy, bxx])
                count += 1
    else:
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    restart()
                for c, hdc, hac in units:
                    arr = coeffs[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                c, hdc, hac,
                                arr[my * c["v"] + by, mx * c["h"] + bx],
                            )
                mcu_count += 1

    return _scan_entropy_end(payload, reader.pos)


# ---------------------------------------------------------------------------
# encoder (tests / corpus generation)
# ---------------------------------------------------------------------------


def _prepare_quantized(img, quality, subsample):
    """Shared encoder front half: color transform, optional 4:2:0
    chroma downsample, MCU padding, DCT + quantization. Returns
    (h, w, comps, samp, blocks, ql, qc, mcus_x, mcus_y) where blocks
    is per-comp (by, bx, 8, 8) quantized ints."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # box-filter chroma 2x2 (pad to even first)
        def down(p):
            ph = (p.shape[0] + 1) // 2 * 2
            pw = (p.shape[1] + 1) // 2 * 2
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                        mode="edge")
            return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                    + pp[1::2, 1::2]) / 4.0
        comps = [(1, y, ql, 0), (2, down(cb), qc, 1), (3, down(cr), qc, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        comps = [(1, y, ql, 0), (2, cb, qc, 1), (3, cr, qc, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # pad each plane to its MCU grid and pre-quantize all blocks
    blocks = []  # per comp: array (by, bx, 8, 8) of quantized ints
    for (cid, plane, q, _), (sh, sv) in zip(comps, samp):
        pw, ph = mcus_x * 8 * sh, mcus_y * 8 * sv
        pp = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        nby, nbx = ph // 8, pw // 8
        tiles = pp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("kn,bcnm,lm->bckl", _C, tiles, _C)
        quant = np.round(dct / q[None, None]).astype(np.int64)
        blocks.append(quant)
    return h, w, comps, samp, blocks, ql, qc, mcus_x, mcus_y


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode RGB uint8 (h, w, 3) as baseline JFIF. ``subsample=True``
    uses 4:2:0 chroma (2×2 MCUs), else 4:4:4; ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs (resynchronization
    points, T.81 §B.2.4.4)."""
    h, w, comps, samp, blocks, ql, qc, mcus_x, mcus_y = _prepare_quantized(
        img, quality, subsample
    )

    # Huffman specs: DC categories 0..11, AC run/size symbols
    dc_bits, dc_vals = _simple_huff_spec(list(range(12)))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_bits, ac_vals = _simple_huff_spec(ac_syms)
    enc_dc = _HuffEncoder(dc_bits, dc_vals)
    enc_ac = _HuffEncoder(ac_bits, ac_vals)

    writer = _BitWriter()
    dc_pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.raw_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                dc_pred = {c[0]: 0 for c in comps}
            mcu_count += 1
            for (cid, _, _, _), (sh, sv), quant in zip(comps, samp, blocks):
                for by in range(sv):
                    for bx in range(sh):
                        blk = quant[my * sv + by, mx * sh + bx]
                        zz = blk.reshape(64)[ZIGZAG]
                        diff = int(zz[0]) - dc_pred[cid]
                        dc_pred[cid] = int(zz[0])
                        t, mag = _magnitude(diff)
                        ln, code = enc_dc.codes[t]
                        writer.write(ln, code)
                        if t:
                            writer.write(t, mag)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = enc_ac.codes[0xF0]
                                writer.write(ln, code)
                                run -= 16
                            s, mag = _magnitude(v)
                            ln, code = enc_ac.codes[(run << 4) | s]
                            writer.write(ln, code)
                            writer.write(s, mag)
                            run = 0
                        if run:
                            ln, code = enc_ac.codes[0x00]
                            writer.write(ln, code)
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, q: np.ndarray) -> bytes:
        return seg(
            0xDB,
            bytes([tq]) + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8)),
        )

    def dht(tc: int, th: int, bits: list[int], vals: bytes) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)

    sof_comps = b"".join(
        bytes([cid, (sh << 4) | sv, tq])
        for (cid, _, _, tq), (sh, sv) in zip(comps, samp)
    )
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([3]) + sof_comps)
    sos = seg(
        0xDA,
        bytes([3]) + b"".join(bytes([cid, 0]) for (cid, _, _, _) in comps)
        + bytes([0, 63, 0]),
    )
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + b"\x00\x00")
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt(0, ql) + dqt(1, qc)
        + dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals)
        + dri + sof + sos + entropy + b"\xff\xd9"
    )

# ---------------------------------------------------------------------------
# progressive encoder (tests / corpus generation)
# ---------------------------------------------------------------------------


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode RGB uint8 (h, w, 3) as a progressive (SOF2) JFIF stream
    with a full spectral-selection + successive-approximation scan
    script: DC first at Al=1, two AC bands (1-5, 6-63) per component
    at Al=1, then DC and per-band AC refinement scans down to Al=0.
    Transmits exactly the same quantized coefficients as
    :func:`encode_jpeg` at the same (quality, subsample), so decoding
    both yields bit-identical pixels — which the tests assert."""
    h, w, comps, samp, blocks, ql, qc, mcus_x, mcus_y = _prepare_quantized(
        img, quality, subsample
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # zigzag-order coefficient arrays per component: (nby, nbx, 64)
    zz = [
        q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG] for q in blocks
    ]

    dc_bits, dc_vals = _simple_huff_spec(list(range(12)))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_bits, ac_vals = _simple_huff_spec(ac_syms)
    enc_dc = _HuffEncoder(dc_bits, dc_vals)
    enc_ac = _HuffEncoder(ac_bits, ac_vals)

    def sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int,
            entropy: bytes) -> bytes:
        body = bytes([len(scan_comps)])
        for ci in scan_comps:
            body += bytes([comps[ci][0], 0])  # tables 0/0
        body += bytes([ss, se, (ah << 4) | al])
        return (bytes([0xFF, 0xDA]) + struct.pack(">H", len(body) + 2)
                + body + entropy)

    def ceil_block_dims(ci: int) -> tuple[int, int]:
        sh, sv = samp[ci]
        comp_w = (w * sh + hmax - 1) // hmax
        comp_h = (h * sv + vmax - 1) // vmax
        return (comp_h + 7) // 8, (comp_w + 7) // 8

    def dc_first_scan(al: int) -> bytes:
        wtr = _BitWriter()
        pred = [0] * len(comps)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(zz[ci][my * sv + by, mx * sh + bx, 0])
                            v >>= al  # arithmetic point transform
                            t, mag = _magnitude(v - pred[ci])
                            pred[ci] = v
                            ln, code = enc_dc.codes[t]
                            wtr.write(ln, code)
                            if t:
                                wtr.write(t, mag)
        return wtr.flush()

    def dc_refine_scan(al: int) -> bytes:
        wtr = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(zz[ci][my * sv + by, mx * sh + bx, 0])
                            wtr.write(1, (v >> al) & 1)
        return wtr.flush()

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        nby, nbx = ceil_block_dims(ci)
        for by in range(nby):
            for bx in range(nbx):
                blk = zz[ci][by, bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    tv = abs(v) >> al
                    if tv == 0:
                        r += 1
                        continue
                    while r > 15:
                        ln, code = enc_ac.codes[0xF0]
                        wtr.write(ln, code)
                        r -= 16
                    s, mag = _magnitude(tv if v > 0 else -tv)
                    ln, code = enc_ac.codes[(r << 4) | s]
                    wtr.write(ln, code)
                    wtr.write(s, mag)
                    r = 0
                if r:  # EOB0: end-of-band for just this block
                    ln, code = enc_ac.codes[0x00]
                    wtr.write(ln, code)
        return wtr.flush()

    def ac_refine_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        wtr = _BitWriter()
        nby, nbx = ceil_block_dims(ci)
        for by in range(nby):
            for bx in range(nbx):
                blk = zz[ci][by, bx]
                # last newly-visible coefficient in this scan's band
                eob_idx = -1
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    if (abs(v) >> ah) == 0 and (abs(v) >> al) != 0:
                        eob_idx = k
                r = 0
                pending: list[int] = []
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    t_lo = abs(v) >> al
                    if t_lo == 0:
                        r += 1
                        continue
                    # ZRLs are needed only if a new coefficient lies
                    # ahead; trailing zeros fold into the EOB
                    while r > 15 and k <= eob_idx:
                        ln, code = enc_ac.codes[0xF0]
                        wtr.write(ln, code)
                        r -= 16
                        for bit in pending:
                            wtr.write(1, bit)
                        pending = []
                    if (abs(v) >> ah) != 0:
                        # history-nonzero: one correction bit, buffered
                        # until the next symbol (decoder reads it while
                        # walking the run)
                        pending.append(t_lo & 1)
                        continue
                    # newly visible: magnitude is exactly 1 at this Al
                    ln, code = enc_ac.codes[(r << 4) | 1]
                    wtr.write(ln, code)
                    wtr.write(1, 1 if v > 0 else 0)
                    for bit in pending:
                        wtr.write(1, bit)
                    pending = []
                    r = 0
                if r or pending:
                    ln, code = enc_ac.codes[0x00]  # EOB0
                    wtr.write(ln, code)
                    for bit in pending:
                        wtr.write(1, bit)
        return wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof_comps = b"".join(
        bytes([cid, (sh << 4) | sv, tq])
        for (cid, _, _, tq), (sh, sv) in zip(comps, samp)
    )
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + b"\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w)
               + bytes([len(comps)]) + sof_comps)
    all_ci = list(range(len(comps)))
    out += sos(all_ci, 0, 0, 0, 1, dc_first_scan(1))
    for ci in all_ci:
        out += sos([ci], 1, 5, 0, 1, ac_first_scan(ci, 1, 5, 1))
    for ci in all_ci:
        out += sos([ci], 6, 63, 0, 1, ac_first_scan(ci, 6, 63, 1))
    out += sos(all_ci, 0, 0, 1, 0, dc_refine_scan(0))
    for ci in all_ci:
        out += sos([ci], 1, 5, 1, 0, ac_refine_scan(ci, 1, 5, 1, 0))
    for ci in all_ci:
        out += sos([ci], 6, 63, 1, 0, ac_refine_scan(ci, 6, 63, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)
