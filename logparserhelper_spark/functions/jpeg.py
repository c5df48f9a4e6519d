"""JPEG (ITU-T T.81) decode — baseline AND progressive — plus a test
encoder, in pure stdlib + numpy.

Scope (the formats a real web/transcript corpus overwhelmingly carries):
sequential baseline DCT (SOF0/SOF1) and full progressive DCT (SOF2:
spectral selection, successive approximation with DC/AC first and
refinement scans, EOB runs, interleaved and non-interleaved block orders,
mid-stream DHT redefinition), 8-bit samples, grayscale or YCbCr with
sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals
(DRI/RSTn), multi-segment DQT/DHT. Arithmetic coding, 12-bit, lossless,
and hierarchical modes raise ValueError — ``auto_decode`` falls back to
the deterministic fake path for those.

Decode pipeline per MCU: Huffman-decode DC diff + AC run/length pairs ->
dequantize -> un-zigzag -> 8x8 IDCT (one numpy basis-matrix product pair
per block: A.T @ coef @ A) -> +128 level shift -> plane assembly ->
nearest-neighbor chroma upsample -> BT.601 YCbCr->RGB.

The encoder (``encode_jpeg``) exists so tests can verify the decoder
without any codec library in the sandbox: standard Annex K quantization
tables (quality-scaled, libjpeg formula) and Annex K Huffman tables,
4:4:4 or 4:2:0, optional restart intervals. JPEG is lossy, so tests
assert feature closeness (means/bands within quantization error), plus
near-exactness on DC-only (uniform color) images.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

# Cap frame allocation from untrusted SOF fields (65535x65535 would be
# ~34 GB/plane): 2^26 pixels = 8192x8192. Matches multimodal's
# MAX_DECODE_PIXELS; a crafted header raises -> callers fall back.
MAX_PIXELS = 1 << 26

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.intp,
)

# Annex K.1 luminance / chrominance quantization tables (natural order via
# zigzag application at use sites; stored here in zigzag order as in the spec)
STD_LUMA_QUANT = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

STD_CHROMA_QUANT = np.array(
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
    dtype=np.int32,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: A[u, x] = c(u) * cos((2x+1) u pi / 16) / 2.
# Forward: coef = A @ block @ A.T ; inverse: block = A.T @ coef @ A.
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list, values: list) -> dict:
    """(length, code) -> value map, canonical JPEG code assignment."""
    table: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list, values: list) -> dict:
    """value -> (code, length)."""
    out: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing removed on the fly; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad with zeros past the end (spec 0-fill)
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                elif nxt == 0xFF:
                    self.pos += 1  # T.81 B.1.1.2 fill byte before a marker
                    continue
                else:
                    self.marker = nxt  # real marker: stop consuming
                    continue
            else:
                self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self):
        """Drop partial byte and consume an RST marker (for restart
        intervals)."""
        self.buf = 0
        self.nbits = 0
        if self.marker is None:
            # marker byte pair still ahead in the stream
            while self.pos + 1 < len(self.data):
                nxt = self.data[self.pos + 1]
                if self.data[self.pos] == 0xFF and nxt not in (0x00, 0xFF):
                    self.marker = nxt
                    break
                self.pos += 1  # data, stuffed pair, or 0xFF fill byte
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
        else:
            raise ValueError("expected JPEG restart marker")

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def exif_orientation(payload: bytes) -> int:
    """Read the EXIF orientation (tag 274) from a JPEG's APP1 segment —
    1 when absent/unparseable. Camera photos routinely store the sensor's
    native orientation and rely on this tag for display, so feature
    extraction that ignores it sees sideways images. The APP1 body is a
    little TIFF file ('Exif\\0\\0' + byte-order mark + IFD0)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return 1
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return 1
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):  # EOI / scan data: APPn must precede
            return 1
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xE1 and payload[pos + 2 : pos + 8] == b"Exif\x00\x00":
            t = payload[pos + 8 : pos + seglen]
            try:
                if t[:2] not in (b"II", b"MM"):
                    return 1
                fmt = "<" if t[:2] == b"II" else ">"
                ifd = struct.unpack_from(fmt + "I", t, 4)[0]
                n = struct.unpack_from(fmt + "H", t, ifd)[0]
                for i in range(n):
                    tag, typ, _cnt = struct.unpack_from(
                        fmt + "HHI", t, ifd + 2 + 12 * i
                    )
                    if tag == 274 and typ == 3:
                        o = struct.unpack_from(fmt + "H", t, ifd + 10 + 12 * i)[0]
                        return o if 1 <= o <= 8 else 1
            except (struct.error, IndexError):
                return 1
            return 1
        pos += seglen
    return 1


def apply_exif_orientation(rgb: np.ndarray, orientation: int) -> np.ndarray:
    """Apply the EXIF display transform (T.81 has no say here; the
    mapping is the TIFF/EXIF standard one viewers use)."""
    if orientation == 2:
        return rgb[:, ::-1]
    if orientation == 3:
        return rgb[::-1, ::-1]
    if orientation == 4:
        return rgb[::-1, :]
    if orientation == 5:
        return np.swapaxes(rgb, 0, 1)
    if orientation == 6:  # rotate 90 CW
        return np.swapaxes(rgb, 0, 1)[:, ::-1]
    if orientation == 7:
        return np.swapaxes(rgb, 0, 1)[::-1, ::-1]
    if orientation == 8:  # rotate 90 CCW
        return np.swapaxes(rgb, 0, 1)[::-1, :]
    return rgb


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to an
    (h, w, 3) float64 RGB array (grayscale replicated). Progressive support
    is complete: spectral selection, successive approximation (DC and AC
    first + refinement scans, EOB runs), interleaved and non-interleaved
    scans, subsampled components. Raises ValueError on anything outside the
    supported scope (arithmetic coding, lossless/hierarchical, >8-bit,
    sampling factors > 2)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) ; comps: list of (cid, hs, vs, tq)
    restart_interval = 0
    progressive = False
    coef = None  # progressive: per-comp (bh, bw, 64) zigzag coefficient bank
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # stray RST/TEM
            continue
        seglen = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tbl
                quant[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                n = sum(bits)
                values = list(seg[p : p + n])
                p += n
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, values
                )
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if h * w > MAX_PIXELS:
                raise ValueError(f"JPEG frame too large ({w}x{h})")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(f"unsupported sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if not progressive and ns == len(frame[2]) and coef is None:
                # fast path: a single interleaved scan covering every
                # component — the overwhelmingly common baseline layout
                scan_tables = {}
                for i in range(ns):
                    cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    scan_tables[cs] = (tt >> 4, tt & 0x0F)
                return _decode_scan(
                    payload,
                    pos + seglen,
                    frame,
                    quant,
                    huff_dc,
                    huff_ac,
                    scan_tables,
                    restart_interval,
                )
            scan_comps = []  # (frame comp index, td, ta) in scan order
            cids = [c[0] for c in frame[2]]
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in cids:
                    raise ValueError("scan references unknown component")
                scan_comps.append((cids.index(cs), tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if coef is None:
                coef = _alloc_coefs(frame)
            if progressive:
                pos = _progressive_scan(
                    payload,
                    pos + seglen,
                    frame,
                    coef,
                    huff_dc,
                    huff_ac,
                    scan_comps,
                    (ss, se, ah, al),
                    restart_interval,
                )
            else:
                # spec-legal multi-scan sequential baseline (ns < nc per
                # scan, e.g. three single-component scans): accumulate
                # full DC+AC coefficients per scan, reconstruct at EOI
                pos = _sequential_scan(
                    payload,
                    pos + seglen,
                    frame,
                    coef,
                    huff_dc,
                    huff_ac,
                    scan_comps,
                    restart_interval,
                )
            continue
        pos += seglen
    if coef is not None:
        return _progressive_reconstruct(frame, coef, quant)
    raise ValueError("no JPEG scan data")


def _decode_scan(
    data, pos, frame, quant, huff_dc, huff_ac, scan_tables, restart_interval
):
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError("bad JPEG dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for _cid, hs, vs, _tq in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    At = _A.T
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_to_marker()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            if cid not in scan_tables:
                raise ValueError("scan component missing")
            td, ta = scan_tables[cid]
            dc_tab = huff_dc.get(td)
            ac_tab = huff_ac.get(ta)
            q = quant.get(tq)
            if dc_tab is None or ac_tab is None or q is None:
                raise ValueError("JPEG table missing")
            for by in range(vs):
                for bx in range(hs):
                    coef = np.zeros(64, dtype=np.int32)
                    t = reader.decode_huff(dc_tab)
                    diff = _extend(reader.read_bits(t), t)
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[ZIGZAG] = coef
                    blk = blk.reshape(8, 8) * q
                    px = At @ blk @ _A + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def _planes_to_rgb(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample component planes to frame resolution, crop, and convert
    (BT.601) — shared by the baseline and progressive paths."""
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y])
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255)


# ---------------------------------------------------------------------------
# progressive mode (SOF2)
# ---------------------------------------------------------------------------


def _mcu_grid(frame):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _alloc_coefs(frame):
    """Per-component zigzag coefficient banks, allocated at MCU-aligned
    block dimensions (interleaved scans code the edge padding blocks too;
    non-interleaved scans address the smaller ceil(samples/8) sub-grid)."""
    _hmax, _vmax, mcux, mcuy = _mcu_grid(frame)
    return [
        np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
        for _cid, hs, vs, _tq in frame[2]
    ]


def _comp_block_grid(frame, ci):
    """Non-interleaved block grid of component ci: ceil(ceil(dim * s/smax) / 8)."""
    h, w, comps = frame
    hmax, vmax, _, _ = _mcu_grid(frame)
    _cid, hs, vs, _tq = comps[ci]
    samples_w = -(-(w * hs) // hmax)
    samples_h = -(-(h * vs) // vmax)
    return -(-samples_w // 8), -(-samples_h // 8)


def _decode_dc_block(reader, blk, dc_tab, pred, al):
    t = reader.decode_huff(dc_tab)
    diff = _extend(reader.read_bits(t), t)
    pred += diff
    blk[0] = pred << al
    return pred


def _decode_ac_first(reader, blk, ac_tab, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC index beyond band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(reader, blk, ac_tab, ss, se, al, eobrun):
    """T.81 G.1.2.3 successive-approximation AC refinement: every nonzero
    history coefficient passed costs a correction bit; new +/-1<<Al
    coefficients land after r zero-history positions; EOB runs refine the
    rest of the band."""
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(k):
        if reader.read_bit() and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # NOTE: unlike the first-scan convention, the refinement
                    # EOB run INCLUDES the current block — its remaining
                    # nonzero coefficients still consume correction bits in
                    # the tail below before the counter is decremented.
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad JPEG refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    data, pos, frame, coef, huff_dc, huff_ac, scan_comps, band, restart_interval
):
    """Decode one progressive scan into the coefficient banks; returns the
    byte offset of the next marker."""
    ss, se, ah, al = band
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = _mcu_grid(frame)
    reader = _BitReader(data, pos)
    eobrun = 0
    if ss == 0:  # DC scan (interleaved or single-component)
        if se != 0:
            raise ValueError("JPEG DC scan with nonzero Se")
        preds = [0] * len(scan_comps)
        if len(scan_comps) > 1:
            units = mcux * mcuy
        else:
            bw_n, bh_n = _comp_block_grid(frame, scan_comps[0][0])
            units = bw_n * bh_n
        for m in range(units):
            if restart_interval and m and m % restart_interval == 0:
                reader.align_to_marker()
                preds = [0] * len(scan_comps)
            if len(scan_comps) > 1:
                my, mx = divmod(m, mcux)
                for si, (ci, td, _ta) in enumerate(scan_comps):
                    _cid, hs, vs, _tq = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            blk = coef[ci][my * vs + by, mx * hs + bx]
                            if ah == 0:
                                tab = huff_dc.get(td)
                                if tab is None:
                                    raise ValueError("JPEG DC table missing")
                                preds[si] = _decode_dc_block(
                                    reader, blk, tab, preds[si], al
                                )
                            else:
                                blk[0] = int(blk[0]) | (reader.read_bit() << al)
            else:
                ci, td, _ta = scan_comps[0]
                by, bx = divmod(m, bw_n)
                blk = coef[ci][by, bx]
                if ah == 0:
                    tab = huff_dc.get(td)
                    if tab is None:
                        raise ValueError("JPEG DC table missing")
                    preds[0] = _decode_dc_block(reader, blk, tab, preds[0], al)
                else:
                    blk[0] = int(blk[0]) | (reader.read_bit() << al)
    else:  # AC scan: spec requires exactly one component
        if len(scan_comps) != 1:
            raise ValueError("JPEG interleaved AC scan")
        ci, _td, ta = scan_comps[0]
        tab = huff_ac.get(ta)
        if tab is None:
            raise ValueError("JPEG AC table missing")
        bw_n, bh_n = _comp_block_grid(frame, ci)
        for m in range(bw_n * bh_n):
            if restart_interval and m and m % restart_interval == 0:
                reader.align_to_marker()
                eobrun = 0
            by, bx = divmod(m, bw_n)
            blk = coef[ci][by, bx]
            if ah == 0:
                eobrun = _decode_ac_first(reader, blk, tab, ss, se, al, eobrun)
            else:
                eobrun = _decode_ac_refine(reader, blk, tab, ss, se, al, eobrun)
    # advance to the next marker (skipping pad bits / stuffed bytes / fill
    # bytes: the marker byte is the first non-0xFF after a 0xFF run)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
            break
        p += 1
    return p


def _sequential_scan(
    data, pos, frame, coef, huff_dc, huff_ac, scan_comps, restart_interval
):
    """Decode one SEQUENTIAL baseline scan (full DC+AC per block) into the
    coefficient banks — the path for spec-legal multi-scan baseline files
    whose scans cover a subset of the frame's components. Returns the byte
    offset of the next marker."""
    h, w, comps = frame
    _hmax, _vmax, mcux, mcuy = _mcu_grid(frame)
    reader = _BitReader(data, pos)
    preds = [0] * len(scan_comps)

    def decode_block(blk, si, td, ta):
        dc_tab = huff_dc.get(td)
        ac_tab = huff_ac.get(ta)
        if dc_tab is None or ac_tab is None:
            raise ValueError("JPEG table missing")
        t = reader.decode_huff(dc_tab)
        preds[si] += _extend(reader.read_bits(t), t)
        blk[0] = preds[si]
        k = 1
        while k < 64:
            rs = reader.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC index overflow")
            blk[k] = _extend(reader.read_bits(s), s)
            k += 1

    if len(scan_comps) > 1:
        units = mcux * mcuy
    else:
        bw_n, bh_n = _comp_block_grid(frame, scan_comps[0][0])
        units = bw_n * bh_n
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_to_marker()
            preds = [0] * len(scan_comps)
        if len(scan_comps) > 1:
            my, mx = divmod(m, mcux)
            for si, (ci, td, ta) in enumerate(scan_comps):
                _cid, hs, vs, _tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        decode_block(
                            coef[ci][my * vs + by, mx * hs + bx], si, td, ta
                        )
        else:
            ci, td, ta = scan_comps[0]
            by, bx = divmod(m, bw_n)
            decode_block(coef[ci][by, bx], 0, td, ta)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
            break
        p += 1
    return p


def _progressive_reconstruct(frame, coef, quant):
    """Dequantize + IDCT every accumulated block (vectorized per component)
    and assemble/convert exactly like the baseline path."""
    h, w, comps = frame
    hmax, vmax, _mcux, _mcuy = _mcu_grid(frame)
    planes = []
    for (cid, hs, vs, tq), bank in zip(comps, coef):
        q = quant.get(tq)
        if q is None:
            raise ValueError("JPEG quant table missing")
        bh, bw = bank.shape[:2]
        nat = np.zeros((bh * bw, 64), dtype=np.float64)
        nat[:, ZIGZAG] = bank.reshape(-1, 64)
        nat *= q.reshape(64)[None, :]
        blocks = nat.reshape(-1, 8, 8)
        px = _A.T @ blocks @ _A + 128.0  # broadcasts over the block axis
        plane = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        planes.append(plane)
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


# ---------------------------------------------------------------------------
# test encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _encode_block(bw, coef_zz, pred, dc_tab, ac_tab):
    diff = int(coef_zz[0]) - pred
    t = 0 if diff == 0 else max(1, int(abs(diff)).bit_length())
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(coef_zz[0])


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    scan_split: bool = False,
) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a baseline JPEG: 4:4:4
    (default) or 4:2:0 (``subsample``), Annex K tables at the given
    quality, optional DRI/RSTn restart intervals. Deterministic; exists so
    tests can exercise decode_jpeg without codec libraries.

    ``progressive`` emits the SAME quantized coefficients as a SOF2 stream
    (interleaved DC scan at Al=1 + DC refinement scan, then one full-band
    AC scan per component with EOBn run codes) — a transcoding writer, so
    tests can assert decode(progressive) == decode(baseline) bit-for-bit.
    ``scan_split`` emits a multi-scan SEQUENTIAL baseline stream instead
    (one single-component scan per component, spec-legal ns < nc), for the
    same kind of exact-equality test. (restart_interval applies to the
    single-scan baseline layout only.)"""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qy = _quality_scale(STD_LUMA_QUANT, quality)
    qc = _quality_scale(STD_CHROMA_QUANT, quality)

    def pad(p, mult):
        # pad to the MCU grid by replicating the last row/column
        ph = -(-p.shape[0] // mult) * mult
        pw = -(-p.shape[1] // mult) * mult
        out = np.empty((ph, pw))
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    if subsample:
        hs_y = vs_y = 2
        yp = pad(y, 16)
        cbp = pad(cb, 16)
        crp = pad(cr, 16)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [(yp, 2, 2, 0, qy), (cbs, 1, 1, 1, qc), (crs, 1, 1, 1, qc)]
    else:
        hs_y = vs_y = 1
        planes = [(pad(y, 8), 1, 1, 0, qy), (pad(cb, 8), 1, 1, 1, qc), (pad(cr, 8), 1, 1, 1, qc)]

    dc_l = _build_encode_table(*STD_DC_LUMA)
    ac_l = _build_encode_table(*STD_AC_LUMA)
    dc_c = _build_encode_table(*STD_DC_CHROMA)
    ac_c = _build_encode_table(*STD_AC_CHROMA)

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body)

    for tq, q in ((0, qy), (1, qc)):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes((tq,)) + zz.tobytes())
    comps = b"".join(
        bytes((cid, (hs << 4) | vs, tq))
        for cid, (plane, hs, vs, tq, q) in zip((1, 2, 3), planes)
    )
    sof_marker = 0xC2 if progressive else 0xC0
    seg(sof_marker, bytes((8,)) + struct.pack(">HH", h, w) + bytes((3,)) + comps)
    for tc, th, (bits, values) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        (0, 1, STD_DC_CHROMA),
        (1, 1, STD_AC_CHROMA),
    ):
        seg(0xC4, bytes(((tc << 4) | th,)) + bytes(bits) + bytes(values))
    if progressive:
        _emit_progressive_scans(out, seg, planes, h, w, hs_y, vs_y)
        out.extend(b"\xff\xd9")
        return bytes(out)
    if scan_split:
        # multi-scan sequential baseline: one non-interleaved scan per comp
        hmax = max(p[1] for p in planes)
        vmax = max(p[2] for p in planes)
        for ci, (plane, hs, vs, tq, q) in enumerate(planes):
            dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            seg(0xDA, bytes((1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0)))
            samples_w = -(-(w * hs) // hmax)
            samples_h = -(-(h * vs) // vmax)
            gw = -(-samples_w // 8)
            gh = -(-samples_h // 8)
            bw = _BitWriter()
            pred = 0
            for m in range(gw * gh):
                by, bx = divmod(m, gw)
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qz = np.round((_A @ blk @ _A.T) / q).astype(np.int32)
                pred = _encode_block(bw, qz.reshape(64)[ZIGZAG], pred, dct, act)
            bw.flush()
            out.extend(bw.out)
        out.extend(b"\xff\xd9")
        return bytes(out)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    seg(0xDA, bytes((3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)))

    bw = _BitWriter()
    mcux = planes[0][0].shape[1] // (8 * hs_y)
    mcuy = planes[0][0].shape[0] // (8 * vs_y)
    pred = [0, 0, 0]
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(bytes((0xFF, 0xD0 + (rst % 8))))
            rst += 1
            pred = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci, (plane, hs, vs, tq, q) in enumerate(planes):
            dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = _A @ blk @ _A.T
                    qz = np.round(coef / q).astype(np.int32)
                    pred[ci] = _encode_block(
                        bw, qz.reshape(64)[ZIGZAG], pred[ci], dct, act
                    )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _emit_progressive_scans(out, seg, planes, h, w, hs_y, vs_y):
    """Transcode the quantized coefficients into a 5-scan SOF2 stream:
    interleaved DC at Al=1, interleaved DC refinement (Ah=1, raw bits),
    then a full-band (Ss=1..Se=63) AC scan per component with EOBn runs.
    Exercises the decoder's interleaved/non-interleaved block orders, DC
    successive approximation, and EOB-run accumulation."""
    banks = []
    for plane, hs, vs, tq, q in planes:
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coefs = _A @ blocks @ _A.T
        qz = np.round(coefs / q).astype(np.int32)
        banks.append(qz.reshape(-1, 64)[:, ZIGZAG].reshape(bh, bw_, 64))

    dc_l = _build_encode_table(*STD_DC_LUMA)
    ac_l = _build_encode_table(*STD_AC_LUMA)
    dc_c = _build_encode_table(*STD_DC_CHROMA)
    ac_c = _build_encode_table(*STD_AC_CHROMA)
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = banks[0].shape[1] // hs_y
    mcuy = banks[0].shape[0] // vs_y

    def sos(comps_spec, ss, se, ah, al):
        body = (
            bytes((len(comps_spec),))
            + b"".join(bytes((cs, tt)) for cs, tt in comps_spec)
            + bytes((ss, se, (ah << 4) | al))
        )
        seg(0xDA, body)

    def mcu_blocks():
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (_p, hs, vs, _tq, _q) in enumerate(planes):
                for by in range(vs):
                    for bx in range(hs):
                        yield ci, banks[ci][my * vs + by, mx * hs + bx]

    # scan 1: interleaved DC at Al=1
    sos(((1, 0x00), (2, 0x10), (3, 0x10)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for ci, blk in mcu_blocks():
        v = int(blk[0]) >> 1
        diff = v - preds[ci]
        preds[ci] = v
        tab = dc_l if ci == 0 else dc_c
        t = 0 if diff == 0 else int(abs(diff)).bit_length()
        code, ln = tab[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    out.extend(bw.out)

    # scan 2: interleaved DC refinement (Ah=1, Al=0): one raw bit per block
    sos(((1, 0x00), (2, 0x10), (3, 0x10)), 0, 0, 1, 0)
    bw = _BitWriter()
    for _ci, blk in mcu_blocks():
        bw.write(int(blk[0]) & 1, 1)
    bw.flush()
    out.extend(bw.out)

    # scans 3-5: one full-band AC first scan per component, EOBn runs.
    # The Annex K baseline AC tables carry no EOBn symbols (r<<4, r>0), so
    # emit a custom near-flat table covering every (run,size) plus all EOBn
    # codes — 255 8-bit codes + one 9-bit (the all-ones 8-bit prefix stays
    # free, as T.81 requires). Also exercises the decoder's mid-stream DHT
    # redefinition path.
    prog_bits = [0] * 16
    prog_bits[7] = 255
    prog_bits[8] = 1
    prog_values = list(range(256))
    seg(0xC4, bytes(((1 << 4) | 0,)) + bytes(prog_bits) + bytes(prog_values))
    prog_ac = _build_encode_table(prog_bits, prog_values)
    for ci, (_p, hs, vs, _tq, _q) in enumerate(planes):
        # non-interleaved grid: ceil(ceil(dim*s/smax)/8) — smaller than the
        # MCU-padded bank when the frame doesn't fill the last MCU column
        samples_w = -(-(w * hs) // hmax)
        samples_h = -(-(h * vs) // vmax)
        gw = -(-samples_w // 8)
        gh = -(-samples_h // 8)
        ac_tab = prog_ac
        sos(((ci + 1, 0x00),), 1, 63, 0, 0)
        bw = _BitWriter()
        pending = 0

        def flush_eob():
            nonlocal pending
            while pending > 0:
                n = min(pending, 32767)
                r = n.bit_length() - 1
                code, ln = ac_tab[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(n - (1 << r), r)
                pending -= n

        for m in range(gw * gh):
            by, bx = divmod(m, gw)
            blk = banks[ci][by, bx]
            last_nz = 0
            for k in range(63, 0, -1):
                if blk[k]:
                    last_nz = k
                    break
            if last_nz == 0:
                pending += 1
                continue
            flush_eob()
            run = 0
            for k in range(1, last_nz + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = int(abs(v)).bit_length()
                code, ln = ac_tab[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                pending = 1  # EOB for this block can join a run
        flush_eob()
        bw.flush()
        out.extend(bw.out)
