"""Pure-stdlib WebP *lossless* (VP8L) codec: a real spec decoder plus a
compact spec-compliant encoder used by the test fixtures.

Scope (the accepted boundary, mirroring ``multimodal.py``'s per-container
decode table): VP8L — the lossless WebP bitstream (RFC 9649 §3, the
"WebP Lossless Bitstream Specification") — is decoded for real:

- canonical prefix (Huffman) codes, both the "simple" (1/2-symbol) and the
  normal code-length-coded form, including the 16/17/18 repeat symbols and
  the degenerate single-symbol zero-bit code;
- LZ77 backward references with the 24 length / 40 distance prefix codes
  and the 120-entry close-neighborhood distance map;
- the color cache (1..11 bit, 0x1e35a7bd multiplicative hash);
- meta-prefix (per-tile entropy group) images;
- all four transforms, inverted in reverse read order: PREDICTOR (14
  modes, contiguous scan-order edge semantics), COLOR (signed 3.5-bit
  cross-channel deltas), SUBTRACT_GREEN, and COLOR_INDEXING (palette with
  sub-byte pixel bundling at <=16 colors).

Lossy WebP (``VP8 `` chunks) needs a full VP8 intra decoder and stays on
the labeled fake-feature fallback, like the other documented codec gaps.

The reference project (MaksimBrezho/logparserhelper) has no media path at
all — this module exists for the LLM-training-pipeline surface (SURVEY.md
§2 "multimodal columns"), where crawl corpora carry WebP payloads.

Nothing here imports Spark: ``multimodal.auto_decode`` dispatches RIFF/WEBP
payloads to :func:`webp_decode_bgr` inside the same mapInPandas batches the
other image containers use.
"""

from __future__ import annotations

import struct

import numpy as np

# Decoded pixel budget shared with the other decoders' philosophy: never
# allocate from an untrusted header's claim beyond this.
MAX_WEBP_PIXELS = 1 << 26

# RFC 9649 §3.7.2.2: order in which code-length-code lengths are stored.
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_PREDICTOR, _COLOR, _SUBTRACT_GREEN, _COLOR_INDEXING = 0, 1, 2, 3

# RFC 9649 §3.6.2.3: distance codes 1..120 address a close neighborhood of
# the current pixel as (xoffset, yoffset) pairs; dist = x + y*xsize,
# clamped to >= 1. Codes > 120 mean (code - 120) directly.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _dist_code_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dx + dy * xsize
    return dist if dist >= 1 else 1


def _prefix_value(code: int, read_extra) -> int:
    """LZ77 prefix decode (RFC 9649 §3.6.2.2): codes 0..3 are the values
    1..4; above that, (prefix&1)-selected offset plus extra bits."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + read_extra(extra_bits) + 1


def _prefix_encode(value: int) -> tuple:
    """Inverse of :func:`_prefix_value`: (prefix_code, extra_bits, extra)."""
    m = value - 1
    if m < 4:
        return m, 0, 0
    n = m.bit_length() - 1
    if m < (1 << n) + (1 << (n - 1)):
        return 2 * n, n - 1, m - (1 << n)
    return 2 * n + 1, n - 1, m - 3 * (1 << (n - 1))


# ---------------------------------------------------------------------------
# bit IO (LSB-first within each byte, like DEFLATE)


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bits(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("vp8l: bitstream exhausted")
        v = 0
        data = self.data
        for i in range(n):
            v |= ((data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("vp8l: bitstream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, length: int) -> None:
        """Huffman codes go MSB-first (canonical DEFLATE bit order)."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes


class _Huffman:
    """Decode side: canonical code table from per-symbol lengths.

    A code with exactly one used symbol is the spec's degenerate case and
    consumes zero bits per read (libwebp's "trivial code").
    """

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            self.single = None
            self.table = None
            self.max_len = 0
            return
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        used.sort()
        table = {}
        code = 0
        prev_len = used[0][0]
        # Kraft completeness check while assigning canonical codes.
        for length, sym in used:
            code <<= length - prev_len
            if code >> length:
                raise ValueError("vp8l: over-subscribed prefix code")
            table[(length, code)] = sym
            code += 1
            prev_len = length
        if code != (1 << prev_len):
            raise ValueError("vp8l: incomplete prefix code")
        self.table = table
        self.max_len = prev_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.table is None:
            raise ValueError("vp8l: read from empty code")
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code word")


def _canonical_codes(lengths) -> dict:
    """Encode side: symbol -> (code, length) for nonzero lengths."""
    used = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out = {}
    code = 0
    prev_len = used[0][0] if used else 0
    for length, sym in used:
        code <<= length - prev_len
        out[sym] = (code, length)
        code += 1
        prev_len = length
    return out


def _package_merge(counts: dict, max_len: int) -> dict:
    """Optimal length-limited code lengths (package-merge): L rounds of
    pair-and-merge; a symbol's length = how many of the 2n-2 cheapest
    final items contain it. Always yields a COMPLETE Kraft code."""
    orig = sorted((c, (s,)) for s, c in counts.items())
    merged: list = []
    for _ in range(max_len):
        packaged = [
            (a[0] + b[0], a[1] + b[1]) for a, b in zip(merged[::2], merged[1::2])
        ]
        merged = sorted(orig + packaged)
    depth = dict.fromkeys(counts, 0)
    for _, group in merged[: 2 * len(orig) - 2]:
        for s in group:
            depth[s] += 1
    return depth


def _huffman_lengths(counts: dict, max_len: int = 15) -> dict:
    """Length-limited Huffman code lengths from a symbol histogram.

    Plain heap Huffman; on depth overflow (skewed histograms) fall back to
    package-merge, which is depth-bounded and Kraft-complete by
    construction.
    """
    import heapq

    syms = sorted(counts)
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(c, i, (s,)) for i, (s, c) in enumerate(sorted(counts.items()))]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    tick = len(heap)
    while len(heap) > 1:
        c1, _, g1 = heapq.heappop(heap)
        c2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, tick, g1 + g2))
        tick += 1
    if max(depth.values()) > max_len:
        return _package_merge(counts, max_len)
    return depth


# ---------------------------------------------------------------------------
# decoder


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.bit():  # simple code: 1 or 2 symbols, lengths implied
        lengths = [0] * alphabet_size
        num_symbols = br.bit() + 1
        sym0 = br.bits(8) if br.bit() else br.bit()
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise ValueError("vp8l: simple-code symbol out of range")
            lengths[sym1] = 1
        return _Huffman(lengths)

    num_code_lengths = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_huff = _Huffman(cl_lengths)

    if br.bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("vp8l: max_symbol out of range")
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_huff.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.bits(2)
            if symbol + rep > alphabet_size:
                raise ValueError("vp8l: code-length repeat overflow")
            for _ in range(rep):
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.bits(3)
        else:  # 18
            symbol += 11 + br.bits(7)
        if symbol > alphabet_size:
            raise ValueError("vp8l: code-length repeat overflow")
    return _Huffman(lengths)


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _BitReader, cache_size: int):
        self.green = _read_huffman_code(br, 256 + 24 + cache_size)
        self.red = _read_huffman_code(br, 256)
        self.blue = _read_huffman_code(br, 256)
        self.alpha = _read_huffman_code(br, 256)
        self.dist = _read_huffman_code(br, 40)


def _decode_entropy_image(br: _BitReader, xsize: int, ysize: int, level0: bool):
    """Decode one entropy-coded ARGB image (RFC 9649 §3.6) as a flat
    uint32 array of length xsize*ysize (scan order)."""
    if xsize <= 0 or ysize <= 0 or xsize * ysize > MAX_WEBP_PIXELS:
        raise ValueError("vp8l: bad entropy-image dimensions")
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    meta_xsize = 0
    n_groups = 1
    if level0 and br.bit():
        meta_bits = br.bits(3) + 2
        meta_xsize = (xsize + (1 << meta_bits) - 1) >> meta_bits
        meta_ysize = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, meta_xsize, meta_ysize, False)
        meta = [(int(p) >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta) + 1

    groups = [_Group(br, cache_size) for _ in range(n_groups)]
    cache = [0] * cache_size

    npix = xsize * ysize
    out = np.zeros(npix, dtype=np.uint32)
    pos = 0
    x = 0
    group = groups[0]
    while pos < npix:
        if meta is not None:
            y = pos // xsize
            group = groups[meta[(y >> meta_bits) * meta_xsize + (x >> meta_bits)]]
        s = group.green.read(br)
        if s < 256:
            r = group.red.read(br)
            b = group.blue.read(br)
            a = group.alpha.read(br)
            pix = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = pix
            if cache_size:
                cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
            pos += 1
            x += 1
        elif s < 280:
            length = _prefix_value(s - 256, br.bits)
            dist_code = _prefix_value(group.dist.read(br), br.bits)
            dist = _dist_code_to_distance(dist_code, xsize)
            if dist > pos or pos + length > npix:
                raise ValueError("vp8l: backward reference out of range")
            for _ in range(length):
                pix = int(out[pos - dist])
                out[pos] = pix
                if cache_size:
                    cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
                pos += 1
            x = pos % xsize
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("vp8l: color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
            x += 1
        if x >= xsize:
            x -= xsize
    return out


def _avg2(a, b):
    return (a + b) // 2


def _predict(mode: int, left, top, topleft, topright):
    """One predictor-mode prediction (RFC 9649 §4.2.2), channels as
    length-4 int arrays [A, R, G, B]."""
    if mode == 0:
        return np.array([255, 0, 0, 0])
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        p = left.astype(np.int64) + top - topleft
        p_l = np.abs(p - left).sum()
        p_t = np.abs(p - top).sum()
        return left if p_l < p_t else top
    if mode == 12:
        return np.clip(left.astype(np.int64) + top - topleft, 0, 255)
    if mode == 13:
        a = _avg2(left, top).astype(np.int64)
        d = a - topleft
        # C-style truncation toward zero for (a - b) / 2
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255)
    raise ValueError("vp8l: bad predictor mode")


def _unpack_argb(flat: np.ndarray, w: int, h: int) -> np.ndarray:
    """flat uint32 scan-order -> (h, w, 4) uint8 channels [A, R, G, B]."""
    a = (flat >> 24) & 0xFF
    r = (flat >> 16) & 0xFF
    g = (flat >> 8) & 0xFF
    b = flat & 0xFF
    return np.stack([a, r, g, b], axis=-1).astype(np.uint8).reshape(h, w, 4)


def _pack_argb(img: np.ndarray) -> np.ndarray:
    c = img.astype(np.uint32)
    return ((c[..., 0] << 24) | (c[..., 1] << 16) | (c[..., 2] << 8) | c[..., 3]).reshape(-1)


def _inverse_predictor(img: np.ndarray, bits: int, pred_img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    sub_w = (w + (1 << bits) - 1) >> bits
    modes = ((pred_img >> 8) & 0xFF).astype(np.int64)
    out = np.zeros_like(img, dtype=np.int64)
    res = img.astype(np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                left = out[y, x - 1]
                top = out[y - 1, x]
                topleft = out[y - 1, x - 1]
                # scan-order contiguous addressing: TR of the last column
                # is the first pixel of the CURRENT row (already decoded)
                topright = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                mode = int(modes[(y >> bits) * sub_w + (x >> bits)])
                pred = _predict(mode, left, top, topleft, topright)
            out[y, x] = (res[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _inverse_color(img: np.ndarray, bits: int, cte_img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    sub_w = (w + (1 << bits) - 1) >> bits
    flat = cte_img.astype(np.uint32)
    g2r = flat & 0xFF
    g2b = (flat >> 8) & 0xFF
    r2b = (flat >> 16) & 0xFF
    bx = np.minimum(np.arange(w) >> bits, sub_w - 1)
    by = np.arange(h) >> bits
    tile = (by[:, None] * sub_w + bx[None, :]).reshape(h, w)

    def s8(v):
        v = v.astype(np.int64) & 0xFF
        return np.where(v >= 128, v - 256, v)

    t_g2r = s8(g2r[tile])
    t_g2b = s8(g2b[tile])
    t_r2b = s8(r2b[tile])
    a = img[..., 0].astype(np.int64)
    r = img[..., 1].astype(np.int64)
    g = img[..., 2].astype(np.int64)
    b = img[..., 3].astype(np.int64)
    sg = np.where(g >= 128, g - 256, g)
    tmp_red = r + ((t_g2r * sg) >> 5)
    new_red = tmp_red & 0xFF
    tmp_blue = b + ((t_g2b * sg) >> 5)
    sr = np.where(new_red >= 128, new_red - 256, new_red)
    tmp_blue = tmp_blue + ((t_r2b * sr) >> 5)
    return np.stack([a, new_red, g, tmp_blue & 0xFF], axis=-1).astype(np.uint8)


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    out = img.astype(np.int64)
    out[..., 1] = (out[..., 1] + out[..., 2]) & 0xFF
    out[..., 3] = (out[..., 3] + out[..., 2]) & 0xFF
    return out.astype(np.uint8)


def _palette_width_bits(n: int) -> int:
    if n <= 2:
        return 3
    if n <= 4:
        return 2
    if n <= 16:
        return 1
    return 0


def _inverse_color_indexing(img: np.ndarray, width_bits: int, palette: np.ndarray, full_w: int) -> np.ndarray:
    h = img.shape[0]
    n = palette.shape[0]
    idx_bits = 8 >> width_bits
    per = 1 << width_bits
    greens = img[..., 2].astype(np.int64)
    out = np.zeros((h, full_w, 4), dtype=np.uint8)
    mask = (1 << idx_bits) - 1
    for sub in range(per):
        xs = np.arange(img.shape[1]) * per + sub
        keep = xs < full_w
        if not keep.any():
            break
        idx = (greens[:, keep] >> (sub * idx_bits)) & mask
        valid = idx < n
        vals = np.where(valid, palette[np.minimum(idx, n - 1)], 0).astype(np.uint32)
        a = (vals >> 24) & 0xFF
        r = (vals >> 16) & 0xFF
        g = (vals >> 8) & 0xFF
        b = vals & 0xFF
        out[:, xs[keep]] = np.stack([a, r, g, b], axis=-1)
    return out


def vp8l_decode(data: bytes):
    """Decode a VP8L chunk payload -> (w, h, argb (h, w, 4) uint8 [A,R,G,B]).

    Raises ValueError on anything malformed, truncated, or over budget —
    callers (``auto_decode``) fall back to the labeled fake path.
    """
    if len(data) < 5 or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-is-used hint (advisory)
    if br.bits(3) != 0:
        raise ValueError("vp8l: unsupported version")
    if w * h > MAX_WEBP_PIXELS:
        raise ValueError("vp8l: image too large")

    transforms = []
    seen = set()
    cur_w = w
    palette = None
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype in (_PREDICTOR, _COLOR):
            bits = br.bits(3) + 2
            sub_w = (cur_w + (1 << bits) - 1) >> bits
            sub_h = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, sub_w, sub_h, False)
            transforms.append((ttype, bits, sub, cur_w))
        elif ttype == _SUBTRACT_GREEN:
            transforms.append((ttype, 0, None, cur_w))
        else:  # color indexing
            n = br.bits(8) + 1
            pal_img = _decode_entropy_image(br, n, 1, False)
            # palette entries are per-channel delta-coded left to right
            chans = np.stack(
                [(pal_img >> s) & 0xFF for s in (24, 16, 8, 0)], axis=-1
            ).astype(np.int64)
            pal = np.cumsum(chans, axis=0) & 0xFF
            palette = (
                (pal[:, 0].astype(np.uint32) << 24)
                | (pal[:, 1].astype(np.uint32) << 16)
                | (pal[:, 2].astype(np.uint32) << 8)
                | pal[:, 3].astype(np.uint32)
            )
            wb = _palette_width_bits(n)
            transforms.append((ttype, wb, palette, cur_w))
            cur_w = (cur_w + (1 << wb) - 1) >> wb

    flat = _decode_entropy_image(br, cur_w, h, True)
    img = _unpack_argb(flat, cur_w, h)
    for ttype, bits, aux, at_w in reversed(transforms):
        if ttype == _PREDICTOR:
            img = _inverse_predictor(img, bits, aux)
        elif ttype == _COLOR:
            img = _inverse_color(img, bits, aux)
        elif ttype == _SUBTRACT_GREEN:
            img = _inverse_subtract_green(img)
        else:
            img = _inverse_color_indexing(img, bits, aux, at_w)
    if img.shape[1] != w:
        raise ValueError("vp8l: transform width mismatch")
    return w, h, img


def webp_decode_bgr(payload: bytes) -> tuple:
    """REAL image decode for lossless WebP (RIFF/WEBP + VP8L) payloads:
    (w, h, bpp, bgr float64 (h, w, 3)), the shared ``_bgr_features``
    input shape. Walks the RIFF chunks (including a VP8X extended
    container) to the VP8L chunk; lossy ``VP8 `` raises (labeled fake
    fallback, like the other documented codec gaps). Alpha is decoded and
    sets bpp=32 but, as in the PNG/TIFF RGBA paths, does not premultiply
    the channel means."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    end = min(len(payload), 8 + riff_len)
    off = 12
    while off + 8 <= end:
        fourcc = payload[off : off + 4]
        size = struct.unpack("<I", payload[off + 4 : off + 8])[0]
        body = payload[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("webp: truncated chunk")
        if fourcc == b"VP8L":
            w, h, img = vp8l_decode(body)
            bgr = img[..., [3, 2, 1]].astype(np.float64)
            bpp = 32.0 if (img[..., 0] != 255).any() else 24.0
            return w, h, bpp, bgr
        if fourcc == b"VP8 ":
            raise ValueError("webp: lossy VP8 not supported (labeled gap)")
        off += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk")


# ---------------------------------------------------------------------------
# encoder (test fixtures; spec-compliant streams)


def _forward_predictor(img: np.ndarray, bits: int, mode) -> tuple:
    """Residual image + predictor sub-image. ``mode`` is a fixed mode
    (int) or 'auto' (per-block argmin of residual cost)."""
    h, w, _ = img.shape
    sub_w = (w + (1 << bits) - 1) >> bits
    sub_h = (h + (1 << bits) - 1) >> bits
    orig = img.astype(np.int64)
    res = np.zeros_like(orig)
    pred_modes = np.zeros((sub_h, sub_w), dtype=np.int64)

    def residual_for(by, bx, m):
        cost = 0
        y0, y1 = by << bits, min((by + 1) << bits, h)
        x0, x1 = bx << bits, min((bx + 1) << bits, w)
        vals = np.zeros((y1 - y0, x1 - x0, 4), dtype=np.int64)
        for y in range(y0, y1):
            for x in range(x0, x1):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0])
                elif y == 0:
                    pred = orig[0, x - 1]
                elif x == 0:
                    pred = orig[y - 1, 0]
                else:
                    tr = orig[y - 1, x + 1] if x + 1 < w else orig[y, 0]
                    pred = _predict(m, orig[y, x - 1], orig[y - 1, x], orig[y - 1, x - 1], tr)
                r = (orig[y, x] - pred) & 0xFF
                vals[y - y0, x - x0] = r
                cost += int(np.minimum(r, 256 - r).sum())
        return vals, cost

    for by in range(sub_h):
        for bx in range(sub_w):
            if mode == "auto":
                best = None
                for m in range(14):
                    vals, cost = residual_for(by, bx, m)
                    if best is None or cost < best[0]:
                        best = (cost, m, vals)
                _, m, vals = best
            else:
                m = int(mode)
                vals, _ = residual_for(by, bx, m)
            pred_modes[by, bx] = m
            y0, y1 = by << bits, min((by + 1) << bits, h)
            x0, x1 = bx << bits, min((bx + 1) << bits, w)
            res[y0:y1, x0:x1] = vals
    pred_img = (0xFF000000 | (pred_modes.astype(np.uint32) << 8)).reshape(-1)
    return res.astype(np.uint8), pred_img


def _forward_color(img: np.ndarray, cte: tuple) -> tuple:
    """Apply one uniform ColorTransformElement (g2r, g2b, r2b), all
    blocks identical — enough to exercise the signed-delta inverse."""
    g2r, g2b, r2b = (v & 0xFF for v in cte)

    def s8(v):
        return v - 256 if v >= 128 else v

    a = img[..., 0].astype(np.int64)
    r = img[..., 1].astype(np.int64)
    g = img[..., 2].astype(np.int64)
    b = img[..., 3].astype(np.int64)
    sg = np.where(g >= 128, g - 256, g)
    sr = np.where(r >= 128, r - 256, r)
    new_r = (r - ((s8(g2r) * sg) >> 5)) & 0xFF
    new_b = (b - ((s8(g2b) * sg) >> 5) - ((s8(r2b) * sr) >> 5)) & 0xFF
    out = np.stack([a, new_r, g, new_b], axis=-1).astype(np.uint8)
    cte_pix = np.uint32(0xFF000000 | (r2b << 16) | (g2b << 8) | g2r)
    return out, cte_pix


def _forward_subtract_green(img: np.ndarray) -> np.ndarray:
    out = img.astype(np.int64)
    out[..., 1] = (out[..., 1] - out[..., 2]) & 0xFF
    out[..., 3] = (out[..., 3] - out[..., 2]) & 0xFF
    return out.astype(np.uint8)


def _tokenize(flat: np.ndarray, xsize: int, cache_bits: int, use_lz77: bool, use_distance_map: bool):
    """Greedy LZ77 over dist-1 and dist-xsize runs + color-cache hits."""
    npix = len(flat)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    tokens = []

    def insert(pix):
        if cache_size:
            cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix

    pos = 0
    vals = [int(v) for v in flat]
    while pos < npix:
        best_len = 0
        best_dist = 0
        if use_lz77:
            for dist in (1, xsize):
                if dist == 0 or dist > pos:
                    continue
                cap = min(4096, npix - pos)
                l = 0
                while l < cap and vals[pos + l] == vals[pos + l - dist]:
                    l += 1
                if l > best_len:
                    best_len, best_dist = l, dist
        if best_len >= 3:
            tokens.append(("copy", best_len, best_dist))
            for i in range(best_len):
                insert(vals[pos + i])
            pos += best_len
            continue
        v = vals[pos]
        if cache_size:
            key = (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[key] == v:
                tokens.append(("cache", key))
                pos += 1
                continue
        tokens.append(("lit", v))
        insert(v)
        pos += 1

    def dist_to_code(dist):
        if use_distance_map:
            # invert the neighborhood map when the offset is in range
            dy, rem = divmod(dist, xsize)
            for dx, dyy in ((rem, dy), (rem - xsize, dy + 1)):
                if (dx, dyy) in _DIST_MAP_INDEX:
                    return _DIST_MAP_INDEX[(dx, dyy)] + 1
        return dist + 120

    return [
        ("copy", t[1], dist_to_code(t[2])) if t[0] == "copy" else t for t in tokens
    ]


_DIST_MAP_INDEX = {pair: i for i, pair in enumerate(_DIST_MAP)}


def _write_huffman_code(bw: _BitWriter, lengths_map: dict, alphabet_size: int):
    """Write one prefix code. Simple form when <=2 symbols all fit in 8
    bits; otherwise the normal code-length-coded form (plain lengths, no
    16/17/18 repeats — short and always valid)."""
    syms = sorted(lengths_map)
    if 1 <= len(syms) <= 2 and all(s <= 255 for s in syms):
        bw.put(1, 1)  # simple
        bw.put(len(syms) - 1, 1)
        if syms[0] <= 1:
            bw.put(0, 1)  # first symbol fits in 1 bit
            bw.put(syms[0], 1)
        else:
            bw.put(1, 1)
            bw.put(syms[0], 8)
        if len(syms) == 2:
            bw.put(syms[1], 8)
        return

    lengths = [0] * alphabet_size
    for s in syms:
        lengths[s] = lengths_map[s] if len(syms) > 1 else 1
    # histogram of the code-length symbols we will emit (plain, 0..15)
    cl_counts = {}
    for l in lengths:
        cl_counts[l] = cl_counts.get(l, 0) + 1
    cl_lengths_map = _huffman_lengths(cl_counts, max_len=7)
    cl_lengths = [0] * 19
    for s, l in cl_lengths_map.items():
        cl_lengths[s] = l
    # enough entries of the fixed order to cover every nonzero cl length
    need = 4
    for i, s in enumerate(_CL_ORDER):
        if cl_lengths[s]:
            need = max(need, i + 1)
    bw.put(0, 1)  # not simple
    bw.put(need - 4, 4)
    for i in range(need):
        bw.put(cl_lengths[_CL_ORDER[i]], 3)
    bw.put(0, 1)  # no explicit max_symbol: all alphabet_size lengths follow
    cl_codes = _canonical_codes(cl_lengths)
    single_cl = len(cl_codes) == 1
    for l in lengths:
        if not single_cl:
            code, ln = cl_codes[l]
            bw.put_code(code, ln)


def _encode_meta_entropy_image(bw: _BitWriter, flat: np.ndarray, xsize: int, meta_bits: int):
    """Level-0 stream with a meta-prefix image: one entropy group per
    (1<<meta_bits)-sized tile, literals only — exercises the decoder's
    per-tile group lookup."""
    bw.put(0, 1)  # no color cache
    bw.put(1, 1)  # meta-prefix image present
    bw.put(meta_bits - 2, 3)
    ysize = len(flat) // xsize
    mx = (xsize + (1 << meta_bits) - 1) >> meta_bits
    my = (ysize + (1 << meta_bits) - 1) >> meta_bits
    groups = np.arange(mx * my, dtype=np.uint32)
    if groups.max() > 0xFFFF:
        raise ValueError("too many meta groups")
    meta_flat = 0xFF000000 | ((groups >> 8) << 16) | ((groups & 0xFF) << 8)
    _encode_entropy_image(bw, meta_flat.astype(np.uint32), mx, False)

    vals = [int(v) for v in flat]
    group_of = [
        ((i // xsize) >> meta_bits) * mx + ((i % xsize) >> meta_bits)
        for i in range(len(vals))
    ]
    per = []
    for g in range(mx * my):
        counts = [dict(), dict(), dict(), dict()]
        for i, v in enumerate(vals):
            if group_of[i] != g:
                continue
            for d, sym in zip(
                counts,
                ((v >> 8) & 0xFF, (v >> 16) & 0xFF, v & 0xFF, (v >> 24) & 0xFF),
            ):
                d[sym] = d.get(sym, 0) + 1
        for d in counts:
            if not d:
                d[0] = 1
        lens = [_huffman_lengths(d) for d in counts]
        _write_huffman_code(bw, lens[0], 256 + 24)
        _write_huffman_code(bw, lens[1], 256)
        _write_huffman_code(bw, lens[2], 256)
        _write_huffman_code(bw, lens[3], 256)
        _write_huffman_code(bw, {0: 1}, 40)  # unused distance alphabet
        sizes = (256 + 24, 256, 256, 256)
        per.append(
            [
                (_canonical_codes([l.get(s, 0) for s in range(n)]), l)
                for l, n in zip(lens, sizes)
            ]
        )
    for i, v in enumerate(vals):
        codes = per[group_of[i]]
        for (cmap, used), sym in zip(
            codes, ((v >> 8) & 0xFF, (v >> 16) & 0xFF, v & 0xFF, (v >> 24) & 0xFF)
        ):
            if len(used) > 1:
                code, ln = cmap[sym]
                bw.put_code(code, ln)


def _encode_entropy_image(
    bw: _BitWriter,
    flat: np.ndarray,
    xsize: int,
    level0: bool,
    cache_bits: int = 0,
    use_lz77: bool = False,
    use_distance_map: bool = False,
    meta_bits: int = 0,
):
    if level0 and meta_bits:
        _encode_meta_entropy_image(bw, flat, xsize, meta_bits)
        return
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    if level0:
        bw.put(0, 1)  # no meta-prefix image

    tokens = _tokenize(flat, xsize, cache_bits, use_lz77, use_distance_map)

    green_c, red_c, blue_c, alpha_c, dist_c = {}, {}, {}, {}, {}

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            bump(green_c, (v >> 8) & 0xFF)
            bump(red_c, (v >> 16) & 0xFF)
            bump(blue_c, v & 0xFF)
            bump(alpha_c, (v >> 24) & 0xFF)
        elif t[0] == "copy":
            lc, _, _ = _prefix_encode(t[1])
            bump(green_c, 256 + lc)
            dc, _, _ = _prefix_encode(t[2])
            bump(dist_c, dc)
        else:
            bump(green_c, 280 + t[1])
    for d in (red_c, blue_c, alpha_c, dist_c):
        if not d:
            d[0] = 1  # unused alphabet still needs a valid (simple) code

    cache_size = (1 << cache_bits) if cache_bits else 0
    g_l = _huffman_lengths(green_c)
    r_l = _huffman_lengths(red_c)
    b_l = _huffman_lengths(blue_c)
    a_l = _huffman_lengths(alpha_c)
    d_l = _huffman_lengths(dist_c)
    _write_huffman_code(bw, g_l, 256 + 24 + cache_size)
    _write_huffman_code(bw, r_l, 256)
    _write_huffman_code(bw, b_l, 256)
    _write_huffman_code(bw, a_l, 256)
    _write_huffman_code(bw, d_l, 40)

    g_codes = _canonical_codes([g_l.get(s, 0) for s in range(256 + 24 + cache_size)])
    r_codes = _canonical_codes([r_l.get(s, 0) for s in range(256)])
    b_codes = _canonical_codes([b_l.get(s, 0) for s in range(256)])
    a_codes = _canonical_codes([a_l.get(s, 0) for s in range(256)])
    d_codes = _canonical_codes([d_l.get(s, 0) for s in range(40)])

    def emit(codes, used, sym):
        if len(used) == 1:
            return  # degenerate single-symbol code consumes zero bits
        code, ln = codes[sym]
        bw.put_code(code, ln)

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            emit(g_codes, g_l, (v >> 8) & 0xFF)
            emit(r_codes, r_l, (v >> 16) & 0xFF)
            emit(b_codes, b_l, v & 0xFF)
            emit(a_codes, a_l, (v >> 24) & 0xFF)
        elif t[0] == "copy":
            _, length, dist_code = t
            lc, eb, ex = _prefix_encode(length)
            emit(g_codes, g_l, 256 + lc)
            if eb:
                bw.put(ex, eb)
            dc, deb, dex = _prefix_encode(dist_code)
            emit(d_codes, d_l, dc)
            if deb:
                bw.put(dex, deb)
        else:
            emit(g_codes, g_l, 280 + t[1])


def encode_vp8l(
    pixels,
    use_subtract_green: bool = False,
    predictor=None,
    predictor_bits: int = 4,
    color_cte=None,
    color_bits: int = 4,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = False,
    use_distance_map: bool = False,
    meta_bits: int = 0,
) -> bytes:
    """Encode rows of (r, g, b) or (r, g, b, a) tuples as a VP8L chunk
    payload. Transform combos mirror real encoders: ``palette`` excludes
    the color/subtract-green transforms but may combine with
    ``predictor``; every path round-trips bit-exactly through
    :func:`vp8l_decode` (pinned in tests)."""
    h = len(pixels)
    w = len(pixels[0])
    img = np.zeros((h, w, 4), dtype=np.uint8)
    for y, row in enumerate(pixels):
        for x, px in enumerate(row):
            if len(px) == 3:
                r, g, b = px
                a = 255
            else:
                r, g, b, a = px
            img[y, x] = (a, r, g, b)

    bw = _BitWriter()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if (img[..., 0] != 255).any() else 0, 1)
    bw.put(0, 3)  # version

    # stream order [indexing][color][subtract-green][predictor] makes the
    # decoder's reverse-read inverse order pred^-1, sg^-1, color^-1, idx^-1
    sub_streams = []  # deferred: (flat, xsize) written before the main image
    cur = img
    cur_w = w
    if palette:
        if color_cte is not None or use_subtract_green:
            raise ValueError("palette excludes color/subtract-green here")
        flat = _pack_argb(cur)
        uniq = list(dict.fromkeys(int(v) for v in flat))
        if len(uniq) > 256:
            raise ValueError("too many colors for palette")
        lut = {v: i for i, v in enumerate(uniq)}
        wb = _palette_width_bits(len(uniq))
        idx_bits = 8 >> wb
        per = 1 << wb
        packed_w = (cur_w + per - 1) // per
        packed = np.zeros((h, packed_w, 4), dtype=np.uint8)
        packed[..., 0] = 255
        for y in range(h):
            for px in range(packed_w):
                gval = 0
                for sub in range(per):
                    x = px * per + sub
                    if x < cur_w:
                        gval |= lut[int(flat[y * cur_w + x])] << (sub * idx_bits)
                packed[y, px, 2] = gval
        bw.put(1, 1)
        bw.put(_COLOR_INDEXING, 2)
        bw.put(len(uniq) - 1, 8)
        pal = np.array(uniq, dtype=np.uint32)
        chans = np.stack([(pal >> s) & 0xFF for s in (24, 16, 8, 0)], axis=-1).astype(np.int64)
        deltas = np.diff(np.vstack([np.zeros((1, 4), np.int64), chans]), axis=0) & 0xFF
        dflat = (
            (deltas[:, 0].astype(np.uint32) << 24)
            | (deltas[:, 1].astype(np.uint32) << 16)
            | (deltas[:, 2].astype(np.uint32) << 8)
            | deltas[:, 3].astype(np.uint32)
        )
        _encode_entropy_image(bw, dflat, len(uniq), False)
        cur = packed
        cur_w = packed_w
    if color_cte is not None:
        cur, cte_pix = _forward_color(cur, color_cte)
        bw.put(1, 1)
        bw.put(_COLOR, 2)
        bw.put(color_bits - 2, 3)
        sub_w = (cur_w + (1 << color_bits) - 1) >> color_bits
        sub_h = (h + (1 << color_bits) - 1) >> color_bits
        _encode_entropy_image(bw, np.full(sub_w * sub_h, cte_pix, np.uint32), sub_w, False)
    if use_subtract_green:
        cur = _forward_subtract_green(cur)
        bw.put(1, 1)
        bw.put(_SUBTRACT_GREEN, 2)
    if predictor is not None:
        cur, pred_img = _forward_predictor(cur, predictor_bits, predictor)
        bw.put(1, 1)
        bw.put(_PREDICTOR, 2)
        bw.put(predictor_bits - 2, 3)
        sub_w = (cur_w + (1 << predictor_bits) - 1) >> predictor_bits
        _encode_entropy_image(bw, pred_img, sub_w, False)
    bw.put(0, 1)  # end of transforms

    _encode_entropy_image(
        bw,
        _pack_argb(cur),
        cur_w,
        True,
        cache_bits=cache_bits,
        use_lz77=use_lz77,
        use_distance_map=use_distance_map,
        meta_bits=meta_bits,
    )
    return bw.bytes()


def make_webp_lossless(width: int, height: int, pixels_rgb, **kw) -> bytes:
    """RIFF/WEBP container around :func:`encode_vp8l` (test fixture
    encoder, same role as ``make_png``/``make_gif``)."""
    if len(pixels_rgb) != height or any(len(r) != width for r in pixels_rgb):
        raise ValueError("pixel grid does not match dimensions")
    vp8l = encode_vp8l(pixels_rgb, **kw)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
