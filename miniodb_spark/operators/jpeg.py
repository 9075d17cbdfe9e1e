"""Baseline JPEG codec — pure python + numpy, no codec libraries.

Retires the last "unsupported format" in the media pipeline: a real
ITU T.81 baseline DCT implementation (SOI/DQT/DHT/SOF0/SOS/EOI marker
stream, canonical Huffman entropy coding, zigzag + quantization,
orthonormal 8×8 DCT via numpy matrix products, byte stuffing, restart
markers on decode). Scope, stated plainly:

- **decode**: baseline sequential (SOF0), 8-bit, grayscale or
  3-component with any T.81 sampling factors (1..4) — 4:4:4, 4:2:2
  and the camera-standard 4:2:0 all decode; subsampled chroma is
  upsampled by sample replication. DRI/RSTn supported. Progressive
  (SOF2) returns None — the header parser still reports dimensions.
- **encode**: grayscale, 4:4:4 YCbCr, or 4:2:0 YCbCr
  (``subsample=True``: 2x2 box-averaged chroma, 16x16 MCUs),
  quality-fixed quantization.
  Huffman tables are OUR canonical tables written into DHT (the spec
  lets every file carry its own tables — that is what DHT is for), so
  any conforming decoder reads these files; transcribing the optional
  Annex K "typical" tables is unnecessary.

JPEG is lossy by design: round-trip tests assert bounded error (flat
blocks are near-exact — DC-only; smooth content within a few levels),
never bit equality. The Spark-side integration mirrors the PNG/GIF
decoders: per-image work inside a streamed mapInPandas pass.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

# quantization tables — libjpeg's quality-50 base tables scaled to ~q75
# (public constants from ITU T.81 Annex K.1, halved then clamped)
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64) / 2.0
_QT_LUMA = np.clip(np.round(_QT_LUMA), 1, 255)
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64) / 2.0
_QT_CHROMA = np.clip(np.round(_QT_CHROMA), 1, 255)


def _zigzag_pairs() -> list[tuple[int, int]]:
    """The 64 (row, col) coordinates in JPEG zigzag order, generated
    from the diagonal-walk definition (T.81 figure 5) rather than
    transcribed."""
    out = []
    for s in range(15):
        diag = [(s - c, c) for c in range(s + 1)
                if 0 <= s - c < 8 and 0 <= c < 8]
        out.extend(diag if s % 2 else list(reversed(diag)))
    return out


_ZIGZAG = _zigzag_pairs()

# orthonormal DCT-II basis: fdct F = C @ B @ C.T ; idct B = C.T @ F @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )

# our canonical Huffman tables (written into DHT): 12 DC categories as
# 4-bit codes, all 162 AC symbols as 8-bit codes. Kraft-valid
# (12/16 < 1; 162/256 < 1) so canonical assignment works; every
# conforming decoder reads them from the DHT marker.
_DC_SYMBOLS = list(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 codes of length 4
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8  # all length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG algorithm
    (T.81 Annex C): codes of increasing length, value incrementing."""
    out: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("marker inside entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _amplitude_encode(v: int) -> tuple[int, int]:
    """(size, bits): JPEG magnitude category coding (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _amplitude_decode(size: int, bits: int) -> int:
    if size == 0:
        return 0
    if bits >> (size - 1):  # leading 1 -> positive
        return bits
    return bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_block(block: np.ndarray, qt: np.ndarray, dc_prev: int,
                  w: _BitWriter) -> int:
    """FDCT + quantize + zigzag + entropy-code one 8×8 block; returns
    the new DC predictor."""
    coeffs = _C @ (block - 128.0) @ _C.T
    q = np.round(coeffs / qt).astype(np.int32)
    dc = int(q[0, 0])
    size, bits = _amplitude_encode(dc - dc_prev)
    code, length = _DC_CODES[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    zz = [int(q[r, c]) for r, c in _ZIGZAG[1:]]
    run = 0
    last_nz = -1
    for i, v in enumerate(zz):
        if v:
            last_nz = i
    for i, v in enumerate(zz):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _amplitude_encode(v)
        code, length = _AC_CODES[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63 - 1:
        code, length = _AC_CODES[0x00]  # EOB
        w.write(code, length)
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], symbols: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, qt: np.ndarray) -> bytes:
    zz = bytes(int(qt[r, c]) for r, c in _ZIGZAG)
    body = bytes([tq]) + zz
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def jpeg_bytes(pixels: bytes, width: int, height: int,
               channels: int = 1, subsample: bool = False) -> bytes:
    """Encode raw 8-bit pixels (row-major, interleaved channels) into a
    baseline JPEG. ``channels`` 1 (grayscale) or 3 (RGB — converted to
    YCbCr). ``subsample=True`` emits 4:2:0 (Y at 2x2 sampling, chroma
    box-averaged 2x2 — the layout of most camera JPEGs); default is
    full-resolution 4:4:4."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    subsample = bool(subsample) and channels == 3
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(np.float64)
    img = img.reshape(height, width, channels)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qts = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
    else:
        planes = [img[..., 0]]
        qts = [_QT_LUMA]

    w = _BitWriter()
    if subsample:
        # MCU = 16x16 px: 4 Y blocks + 1 Cb + 1 Cr. Pad with edge
        # replication to MCU multiples, box-average chroma 2x2.
        mcux = (width + 15) // 16
        mcuy = (height + 15) // 16
        y = np.pad(planes[0], ((0, mcuy * 16 - height),
                               (0, mcux * 16 - width)), mode="edge")
        chroma = [
            np.pad(p, ((0, mcuy * 16 - height), (0, mcux * 16 - width)),
                   mode="edge").reshape(mcuy * 8, 2, mcux * 8, 2)
            .mean(axis=(1, 3))
            for p in planes[1:]
        ]
        dc_prev = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):
                    for bx in range(2):
                        ys, xs = (my * 2 + by) * 8, (mx * 2 + bx) * 8
                        dc_prev[0] = _encode_block(
                            y[ys:ys + 8, xs:xs + 8], _QT_LUMA,
                            dc_prev[0], w)
                for ci, cp in enumerate(chroma, start=1):
                    ys, xs = my * 8, mx * 8
                    dc_prev[ci] = _encode_block(
                        cp[ys:ys + 8, xs:xs + 8], _QT_CHROMA,
                        dc_prev[ci], w)
    else:
        bw, bh = (width + 7) // 8, (height + 7) // 8
        dc_prev = [0] * channels
        for by in range(bh):
            for bx in range(bw):
                for ci, plane in enumerate(planes):
                    block = np.full((8, 8), 128.0)
                    ys, xs = by * 8, bx * 8
                    sub = plane[ys:ys + 8, xs:xs + 8]
                    block[:sub.shape[0], :sub.shape[1]] = sub
                    # edge replication keeps partial blocks smooth
                    if sub.shape[0] < 8:
                        block[sub.shape[0]:, :] = block[sub.shape[0] - 1, :]
                    if sub.shape[1] < 8:
                        block[:, sub.shape[1]:] = block[:, sub.shape[1] - 1:sub.shape[1]]
                    dc_prev[ci] = _encode_block(block, qts[ci], dc_prev[ci], w)
    entropy = w.flush()

    ncomp = channels
    y_sampling = 0x22 if subsample else 0x11
    sof_comps = b"".join(
        bytes([cid + 1, y_sampling if cid == 0 else 0x11,
               0 if cid == 0 else 1])
        for cid in range(ncomp)
    )
    sof = (b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height,
                                     width, ncomp) + sof_comps)
    sos_comps = b"".join(
        bytes([cid + 1, (0 if cid == 0 else 1) * 0x11]) for cid in range(ncomp)
    )
    sos = (b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
           + sos_comps + b"\x00\x3f\x00")
    out = b"\xff\xd8" + _dqt_segment(0, _QT_LUMA)
    dht = (_dht_segment(0, 0, _DC_BITS, _DC_SYMBOLS)
           + _dht_segment(1, 0, _AC_BITS, _AC_SYMBOLS))
    if ncomp == 3:
        out += _dqt_segment(1, _QT_CHROMA)
        dht += (_dht_segment(0, 1, _DC_BITS, _DC_SYMBOLS)
                + _dht_segment(1, 1, _AC_BITS, _AC_SYMBOLS))
    return out + dht + sof + sos + entropy + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    def __init__(self, bits: list[int], symbols: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code, idx = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = symbols[idx]
                code += 1
                idx += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def decode_jpeg_pixels(payload: bytes) -> dict | None:
    """Full baseline JPEG decode (scope in the module docstring).
    Returns the same dict shape as the PNG/GIF decoders or None for
    anything malformed / outside scope — never raises on junk."""
    try:
        return _decode_jpeg(payload)
    except Exception:  # noqa: BLE001 - junk-tolerant by contract
        return None


def _decode_jpeg(b: bytes) -> dict | None:
    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            return None  # EOI before SOS
        (seglen,) = struct.unpack_from(">H", b, pos)
        body = b[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables out of scope
                vals = body[p + 1:p + 65]
                qt = np.zeros((8, 8))
                for (r, c), v in zip(_ZIGZAG, vals):
                    qt[r, c] = v
                qts[tq] = qt
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                symbols = list(body[p + 17:p + 17 + n])
                table = _HuffTable(bits, symbols)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                off = 6 + 3 * i  # per-component triple after B,H,H,B header
                cid, sampling, tq = body[off], body[off + 1], body[off + 2]
                comps.append({"id": cid, "h": sampling >> 4,
                              "v": sampling & 0x0F, "tq": tq})
            if any(not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4)
                   for c in comps):
                return None  # sampling factors outside T.81's 1..4
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types out of scope
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan.append({"cs": cs, "dc": tables >> 4,
                             "ac": tables & 0x0F})
            data_start = pos + seglen
            return _decode_scan(b, data_start, frame, scan, qts,
                                dc_tables, ac_tables, restart_interval)
        pos += seglen
    return None


def _decode_scan(b, pos, frame, scan, qts, dc_tables, ac_tables,
                 restart_interval):
    """Interleaved-scan entropy decode, generalized over sampling
    factors: each MCU carries h_i x v_i blocks per component (T.81
    A.2.3), so 4:4:4 (1x1 everywhere), 4:2:2 (Y 2x1) and 4:2:0
    (Y 2x2) all take this path; subsampled chroma planes are
    upsampled by sample replication at the end."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    nc = len(comps)
    if not w or not h or len(scan) != nc:
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # MCU grid: ceil over the MCU pixel footprint (8*hmax x 8*vmax)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps]
    # split entropy data from trailing markers; restart markers are
    # consumed inline
    br = _BitReader(b[pos:])
    dc_prev = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align and consume RSTn
                br.nbits = 0
                d = br.data
                p = br.pos
                if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                    br.pos = p + 2
                dc_prev = [0] * nc
            for ci, comp in enumerate(comps):
                sc = scan[ci]
                dct = dc_tables.get(sc["dc"])
                act = ac_tables.get(sc["ac"])
                qt = qts.get(comp["tq"])
                if dct is None or act is None or qt is None:
                    return None
                # h_i x v_i blocks per MCU, left-to-right then
                # top-to-bottom (T.81 A.2.3 ordering)
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        q = np.zeros((8, 8))
                        size = dct.decode(br)
                        diff = _amplitude_decode(size, br.read_bits(size))
                        dc_prev[ci] += diff
                        q[0, 0] = dc_prev[ci]
                        k = 1
                        while k < 64:
                            sym = act.decode(br)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k >= 64:
                                return None
                            r, c = _ZIGZAG[k]
                            q[r, c] = _amplitude_decode(size, br.read_bits(size))
                            k += 1
                        block = _C.T @ (q * qt) @ _C + 128.0
                        ys = (my * comp["v"] + by) * 8
                        xs = (mx * comp["h"] + bx) * 8
                        planes[ci][ys:ys + 8, xs:xs + 8] = block
            mcu += 1
    # upsample each plane to full resolution by index-mapped sample
    # replication (exact for integer ratios, safe for the rest), then
    # crop to the frame dims
    full = []
    for comp, plane in zip(comps, planes):
        ys = (np.arange(h) * comp["v"]) // vmax
        xs = (np.arange(w) * comp["h"]) // hmax
        full.append(np.clip(np.round(plane[np.ix_(ys, xs)]), 0, 255))
    planes = full
    if nc == 1:
        out = planes[0].astype(np.uint8).tobytes()
        return {"width": w, "height": h, "channels": 1, "pixels": out}
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bch], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    return {"width": w, "height": h, "channels": 3, "pixels": out}
