"""Baseline JPEG codec — pure python + numpy, no codec libraries.

Retires the last "unsupported format" in the media pipeline: a real
ITU T.81 DCT implementation (SOI/DQT/DHT/SOF0/SOF2/SOS/EOI marker
stream, canonical Huffman entropy coding, zigzag + quantization,
orthonormal 8×8 DCT via numpy matrix products, byte stuffing, restart
markers on decode). Scope, stated plainly:

- **decode**: sequential baseline (SOF0) AND progressive (SOF2 —
  T.81 Annex G: spectral selection, successive approximation, EOBn
  end-of-band runs, DC/AC refinement scans), 8-bit, grayscale or
  3-component with any T.81 sampling factors (1..4) — 4:4:4, 4:2:2
  and the camera-standard 4:2:0 all decode; subsampled chroma is
  upsampled by sample replication. DRI/RSTn supported in both modes.
  Arithmetic-coded, hierarchical, and 12-bit frames return None —
  the header parser still reports dimensions.
- **encode**: grayscale, 4:4:4 YCbCr, or 4:2:0 YCbCr
  (``subsample=True``: 2x2 box-averaged chroma, 16x16 MCUs),
  quality-fixed quantization; ``jpeg_bytes_progressive`` writes the
  same quantized coefficients as a multi-scan SOF2 file (libjpeg-style
  scan script), so it decodes bit-identically to the baseline encode.
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

# progressive AC table: the baseline symbol set plus the EOBn
# run-length symbols (n<<4, n=0..14 — T.81 G.1.2.2 table G.1) that
# only exist in progressive scans. 176 codes, all length 8
# (176 < 255 so the all-ones code never occurs).
_AC_PROG_SYMBOLS = [(n << 4) for n in range(15)] + [0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_PROG_BITS = [0] * 7 + [len(_AC_PROG_SYMBOLS)] + [0] * 8


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
_AC_PROG_CODES = _canonical_codes(_AC_PROG_BITS, _AC_PROG_SYMBOLS)


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
    coefs = None  # progressive: per-component zigzag coefficient arrays
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if coefs is not None:  # progressive: all scans are in
                return _reconstruct_progressive(frame, coefs, qts)
            return None  # EOI before SOS
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if pos + 2 > len(b):
            return None
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
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
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic frames out of scope
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
            if not frame["progressive"]:
                return _decode_scan(b, data_start, frame, scan, qts,
                                    dc_tables, ac_tables, restart_interval)
            # progressive (T.81 Annex G): the scan header carries the
            # spectral band [Ss, Se] and successive-approximation
            # bit positions Ah/Al after the component list
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if coefs is None:
                coefs = _prog_coef_arrays(frame)
            end = _entropy_end(b, data_start)
            _decode_scan_progressive(
                b[data_start:end], frame, scan, dc_tables, ac_tables,
                restart_interval, coefs, ss, se, ahal >> 4, ahal & 0x0F)
            pos = end
            continue
        pos += seglen
    if coefs is not None:  # tolerate a missing EOI
        return _reconstruct_progressive(frame, coefs, qts)
    return None


def _entropy_end(b: bytes, start: int) -> int:
    """Index of the first marker that terminates an entropy-coded
    segment (anything FFxx except stuffed FF00 and restart FFD0-D7)."""
    p = start
    n = len(b)
    while p + 1 < n:
        if b[p] == 0xFF and b[p + 1] != 0x00 and not (0xD0 <= b[p + 1] <= 0xD7):
            return p
        p += 2 if b[p] == 0xFF else 1
    return n


def _prog_geometry(frame):
    """MCU grid plus per-component padded and actual block dims.
    Non-interleaved scans cover only ceil(comp_size/8) blocks per axis
    (T.81 A.2.2); interleaved DC scans cover the MCU-padded grid."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    dims = []
    for c in comps:
        cw = (-(-w * c["h"] // hmax) + 7) // 8
        ch = (-(-h * c["v"] // vmax) + 7) // 8
        dims.append({"bw": mcux * c["h"], "bh": mcuy * c["v"],
                     "cw": cw, "ch": ch})
    return mcux, mcuy, dims


def _prog_coef_arrays(frame):
    _, _, dims = _prog_geometry(frame)
    return [np.zeros((d["bh"], d["bw"], 64), dtype=np.int64) for d in dims]


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
    return _finish_planes(frame, planes)


def _finish_planes(frame, planes):
    """Upsample each plane to full resolution by index-mapped sample
    replication (exact for integer ratios, safe for the rest), crop to
    the frame dims, and color-convert — shared by the baseline and
    progressive reconstruction paths."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for comp, plane in zip(comps, planes):
        ys = (np.arange(h) * comp["v"]) // vmax
        xs = (np.arange(w) * comp["h"]) // hmax
        full.append(np.clip(np.round(plane[np.ix_(ys, xs)]), 0, 255))
    planes = full
    if len(comps) == 1:
        out = planes[0].astype(np.uint8).tobytes()
        return {"width": w, "height": h, "channels": 1, "pixels": out}
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bch], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    return {"width": w, "height": h, "channels": 3, "pixels": out}


# ---------------------------------------------------------------------------
# progressive decoder (T.81 Annex G)
# ---------------------------------------------------------------------------


def _decode_scan_progressive(data, frame, scan, dc_tables, ac_tables,
                             restart_interval, coefs, ss, se, ah, al):
    """Decode one progressive scan into the per-component coefficient
    arrays. DC scans (Ss=0) may be interleaved; AC scans are always
    single-component (T.81 G.1.1). Ah=0 scans establish coefficient
    values at bit position Al; Ah>0 scans refine one bit."""
    comps = frame["comps"]
    idx = []
    for s in scan:
        ci = next((i for i, c in enumerate(comps) if c["id"] == s["cs"]),
                  None)
        if ci is None:
            raise ValueError("scan references unknown component")
        idx.append(ci)
    mcux, mcuy, dims = _prog_geometry(frame)
    br = _BitReader(data)

    def _restart(state):
        br.nbits = 0  # byte-align
        d, p = br.data, br.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            br.pos = p + 2
        state["pred"] = dict.fromkeys(state["pred"], 0)
        state["eobrun"] = 0

    state = {"pred": dict.fromkeys(idx, 0), "eobrun": 0}

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan with nonzero Se")
        if len(scan) > 1:  # interleaved: MCU order over all scan comps
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for si, ci in enumerate(idx):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                mcu.append((si, ci, my * c["v"] + by,
                                            mx * c["h"] + bx))
                    units.append(mcu)
        else:
            ci = idx[0]
            d = dims[ci]
            units = [[(0, ci, by, bx)]
                     for by in range(d["ch"]) for bx in range(d["cw"])]
        for ui, mcu in enumerate(units):
            if restart_interval and ui and ui % restart_interval == 0:
                _restart(state)
            for si, ci, by, bx in mcu:
                coef = coefs[ci][by, bx]
                if ah == 0:
                    dct = dc_tables.get(scan[si]["dc"])
                    if dct is None:
                        raise ValueError("missing DC table")
                    size = dct.decode(br)
                    diff = _amplitude_decode(size, br.read_bits(size))
                    state["pred"][ci] += diff
                    coef[0] = state["pred"][ci] << al
                else:  # refinement: one bit per block (G.1.2.1)
                    if br.read_bit():
                        coef[0] |= 1 << al
        return

    # AC scan: single component, non-interleaved block order
    if len(scan) != 1:
        raise ValueError("interleaved AC scan is not allowed")
    ci = idx[0]
    act = ac_tables.get(scan[0]["ac"])
    if act is None:
        raise ValueError("missing AC table")
    d = dims[ci]
    blocks = [(by, bx) for by in range(d["ch"]) for bx in range(d["cw"])]
    for bi, (by, bx) in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            _restart(state)
        coef = coefs[ci][by, bx]
        if ah == 0:
            state["eobrun"] = _first_ac(coef, br, act, ss, se, al,
                                        state["eobrun"])
        else:
            state["eobrun"] = _refine_ac(coef, br, act, ss, se, al,
                                         state["eobrun"])


def _first_ac(coef, br, act, ss, se, al, eobrun):
    """First scan for an AC band (G.1.2.2): run/size coding with EOBn
    end-of-band runs; established values are scaled by 2^Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = act.decode(br)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC band overrun")
        coef[k] = _amplitude_decode(s, br.read_bits(s)) * (1 << al)
        k += 1
    return eobrun


def _refine_ac(coef, br, act, ss, se, al, eobrun):
    """Refinement scan for an AC band (G.1.2.3): newly nonzero
    coefficients arrive as run/1 symbols; history coefficients receive
    one correction bit each, applied away from zero."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = act.decode(br)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                newval = 0  # ZRL: 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad refinement symbol")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if br.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # this block belongs to the EOB run: correction bits only
        while k <= se:
            if coef[k] != 0:
                if br.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, qts):
    """Dequantize + IDCT every accumulated block (vectorized over the
    whole block grid), then reuse the shared upsample/color path."""
    planes = []
    for comp, carr in zip(frame["comps"], coefs):
        qt = qts.get(comp["tq"])
        if qt is None:
            return None
        bh, bw, _ = carr.shape
        blk = np.zeros((bh, bw, 8, 8))
        for k, (r, c) in enumerate(_ZIGZAG):
            blk[:, :, r, c] = carr[:, :, k]
        blk *= qt  # (8,8) broadcast over the grid
        px = np.einsum("ij,abjk,kl->abil", _C.T, blk, _C) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _finish_planes(frame, planes)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G) — spectral selection + successive
# approximation with a libjpeg-style scan script. Quantization math is
# byte-for-byte the baseline encoder's, so the progressive file decodes
# to EXACTLY the pixels of the baseline file for the same input — the
# round-trip tests assert bit equality between the two decodes.
# ---------------------------------------------------------------------------


def _prog_quantized_components(pixels, width, height, channels, subsample):
    """Per-component quantized-coefficient grids (zigzag order) using
    the identical padding + FDCT + rounding expressions as the baseline
    encoder. Returns (comps_meta, coef_arrays, mcux, mcuy, dims)."""
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
    if subsample:
        mcux, mcuy = (width + 15) // 16, (height + 15) // 16
        y = np.pad(planes[0], ((0, mcuy * 16 - height),
                               (0, mcux * 16 - width)), mode="edge")
        chroma = [
            np.pad(p, ((0, mcuy * 16 - height), (0, mcux * 16 - width)),
                   mode="edge").reshape(mcuy * 8, 2, mcux * 8, 2)
            .mean(axis=(1, 3))
            for p in planes[1:]
        ]
        grids = [(y, _QT_LUMA, 2, 2)] + [(c, _QT_CHROMA, 1, 1)
                                         for c in chroma]
    else:
        mcux, mcuy = (width + 7) // 8, (height + 7) // 8
        grids = [
            (np.pad(p, ((0, mcuy * 8 - height), (0, mcux * 8 - width)),
                    mode="edge"), qts[i], 1, 1)
            for i, p in enumerate(planes)
        ]
    hmax = max(g[2] for g in grids)
    vmax = max(g[3] for g in grids)
    comps_meta, coefs, dims = [], [], []
    for ci, (plane, qt, hh, vv) in enumerate(grids):
        bh, bw = mcuy * vv, mcux * hh
        carr = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                q = np.round((_C @ (block - 128.0) @ _C.T) / qt)
                carr[by, bx] = [int(q[rr, cc]) for rr, cc in _ZIGZAG]
        comps_meta.append({"id": ci + 1, "h": hh, "v": vv,
                           "tq": 0 if ci == 0 else 1})
        coefs.append(carr)
        cw = (-(-width * hh // hmax) + 7) // 8
        ch = (-(-height * vv // vmax) + 7) // 8
        dims.append({"cw": cw, "ch": ch})
    return comps_meta, coefs, mcux, mcuy, dims


def _emit_dc_first(coefs, comps, al, ri, mcux, mcuy):
    """Interleaved DC scan at successive-approximation level Al: the
    DC point transform is an arithmetic shift (G.1.2.1), diff-coded
    per component with predictor reset at restarts."""
    out = bytearray()
    w = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    u = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and u and u % ri == 0:
                out += w.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                w = _BitWriter()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = int(coefs[ci][my * c["v"] + by,
                                          mx * c["h"] + bx, 0]) >> al
                        size, bits = _amplitude_encode(v - pred[ci])
                        pred[ci] = v
                        code, ln = _DC_CODES[size]
                        w.write(code, ln)
                        if size:
                            w.write(bits, size)
            u += 1
    out += w.flush()
    return bytes(out)


def _emit_dc_refine(coefs, comps, al, ri, mcux, mcuy):
    """DC refinement scan: one raw bit (bit Al of the full-precision
    DC value, two's complement) per block."""
    out = bytearray()
    w = _BitWriter()
    rst = 0
    u = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and u and u % ri == 0:
                out += w.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                w = _BitWriter()
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = int(coefs[ci][my * c["v"] + by,
                                          mx * c["h"] + bx, 0])
                        w.write((v >> al) & 1, 1)
            u += 1
    out += w.flush()
    return bytes(out)


def _emit_ac_first(carr, ss, se, al, ri, cw, ch):
    """First AC scan for band [Ss,Se] at level Al: run/size coding of
    sign-magnitude point-transformed values, EOBn runs across blocks
    (flushed before restarts)."""
    out = bytearray()
    w = _BitWriter()
    rst = 0
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = _AC_PROG_CODES[n << 4]
            w.write(code, ln)
            if n:
                w.write(eobrun & ((1 << n) - 1), n)
            eobrun = 0

    u = 0
    for by in range(ch):
        for bx in range(cw):
            if ri and u and u % ri == 0:
                flush_eob()
                out += w.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                w = _BitWriter()
            row = carr[by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(row[k])
                t = (v if v >= 0 else -v) >> al
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    code, ln = _AC_PROG_CODES[0xF0]
                    w.write(code, ln)
                    r -= 16
                size, bits = _amplitude_encode(t if v > 0 else -t)
                code, ln = _AC_PROG_CODES[(r << 4) | size]
                w.write(code, ln)
                w.write(bits, size)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
            u += 1
    flush_eob()
    out += w.flush()
    return bytes(out)


def _emit_ac_refine(carr, ss, se, al, ri, cw, ch):
    """AC refinement scan (G.1.2.3): newly nonzero coefficients
    (|v|>>Al == 1) as run/1 symbols with a sign bit; history
    coefficients contribute one correction bit each, buffered and
    emitted after the next symbol (or with the pending EOB run)."""
    out = bytearray()
    w = _BitWriter()
    rst = 0
    eobrun = 0
    pending = []  # correction bits riding the EOB run

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = _AC_PROG_CODES[n << 4]
            w.write(code, ln)
            if n:
                w.write(eobrun & ((1 << n) - 1), n)
            eobrun = 0
        for bit in pending:
            w.write(bit, 1)
        pending = []

    u = 0
    for by in range(ch):
        for bx in range(cw):
            if ri and u and u % ri == 0:
                flush_eob()
                out += w.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                w = _BitWriter()
            row = carr[by, bx]
            absv = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
            eob = ss - 1  # after the last newly-nonzero coefficient
            for i, a in enumerate(absv):
                if a == 1:
                    eob = ss + i
            r = 0
            br_bits = []
            for i, a in enumerate(absv):
                k = ss + i
                if a == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    flush_eob()
                    code, ln = _AC_PROG_CODES[0xF0]
                    w.write(code, ln)
                    r -= 16
                    for bit in br_bits:
                        w.write(bit, 1)
                    br_bits = []
                if a > 1:
                    br_bits.append(a & 1)
                    continue
                flush_eob()
                code, ln = _AC_PROG_CODES[(r << 4) | 1]
                w.write(code, ln)
                w.write(1 if int(row[k]) > 0 else 0, 1)
                for bit in br_bits:
                    w.write(bit, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                pending.extend(br_bits)
                if eobrun == 0x7FFF:
                    flush_eob()
            u += 1
    flush_eob()
    out += w.flush()
    return bytes(out)


def jpeg_bytes_progressive(pixels: bytes, width: int, height: int,
                           channels: int = 1, subsample: bool = False,
                           restart_interval: int = 0) -> bytes:
    """Encode raw 8-bit pixels into a progressive (SOF2) JPEG using a
    libjpeg-style scan script: DC at Al=1, AC bands [1,5] and [6,63]
    at Al=2, two AC refinement passes, then the DC refinement bit.
    The script is complete (final Al=0 everywhere), so the file decodes
    bit-identically to the baseline encoding of the same pixels."""
    comps_meta, coefs, mcux, mcuy, dims = _prog_quantized_components(
        pixels, width, height, channels, subsample)
    ri = int(restart_interval)

    out = b"\xff\xd8" + _dqt_segment(0, _QT_LUMA)
    dht = (_dht_segment(0, 0, _DC_BITS, _DC_SYMBOLS)
           + _dht_segment(1, 0, _AC_PROG_BITS, _AC_PROG_SYMBOLS))
    if channels == 3:
        out += _dqt_segment(1, _QT_CHROMA)
        dht += _dht_segment(0, 1, _DC_BITS, _DC_SYMBOLS)
    sof_comps = b"".join(
        bytes([m["id"], (m["h"] << 4) | m["v"], m["tq"]])
        for m in comps_meta
    )
    out += dht + (b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * channels, 8, height, width, channels) + sof_comps)
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)

    def sos(comp_list, ss, se, ah, al):
        body = bytes([len(comp_list)]) + b"".join(
            bytes([cs, (td << 4) | ta]) for cs, td, ta in comp_list
        ) + bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    dc_list = [(m["id"], 0 if i == 0 else 1, 0)
               for i, m in enumerate(comps_meta)]
    out += sos(dc_list, 0, 0, 0, 1)
    out += _emit_dc_first(coefs, comps_meta, 1, ri, mcux, mcuy)
    for lo, hi in ((1, 5), (6, 63)):
        for ci, m in enumerate(comps_meta):
            out += sos([(m["id"], 0, 0)], lo, hi, 0, 2)
            out += _emit_ac_first(coefs[ci], lo, hi, 2, ri,
                                  dims[ci]["cw"], dims[ci]["ch"])
    for ah, al in ((2, 1), (1, 0)):
        for ci, m in enumerate(comps_meta):
            out += sos([(m["id"], 0, 0)], 1, 63, ah, al)
            out += _emit_ac_refine(coefs[ci], 1, 63, al, ri,
                                   dims[ci]["cw"], dims[ci]["ch"])
    out += sos(dc_list, 0, 0, 1, 0)
    out += _emit_dc_refine(coefs, comps_meta, 0, ri, mcux, mcuy)
    return out + b"\xff\xd9"
