"""WebP-lossless (VP8L) codec in pure numpy + stdlib, from the public
bitstream specification (RFC 9649 / the WebP Lossless Bitstream
Specification).  No cv2/PIL/libwebp in this environment, so the format
is implemented from scratch — decode covers the full spec surface
(prefix codes incl. meta prefix images, color cache, LZ77 backward
references with the 120-entry distance neighbor map, and all four
transforms: predictor, color, subtract-green, color-indexing with
pixel bundling); a small deterministic encoder produces fixture
bitstreams for the golden tests (subtract-green + per-channel prefix
codes, or color-indexing with bundling for paletted images).

Parity note vs the reference loader (S1,
python/rapidocr_onnxruntime/utils.py:94-152): the reference decodes
WebP via cv2.imdecode; this engine decodes VP8L here and keeps VP8
(lossy) a NAMED typed stub — ``decode_webp`` raises
NotImplementedError("webp-lossy ...") for VP8 payloads so crawl triage
can count them, and ValueError for corrupt streams (LoadImageError
analog).

Bit order: VP8L reads bits LSB-first within each byte; prefix-code
bits accumulate MSB-first into the code value (spec §4).  Canonical
code assignment is deflate-style (shorter lengths first, ties by
symbol index).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (LSB-first — NOT the JPEG MSB-first reader in functions.jpeg)
# ---------------------------------------------------------------------------


class _LsbReader:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("vp8l: truncated bitstream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("vp8l: truncated bitstream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        v = self.acc & 1
        self.acc >>= 1
        self.n -= 1
        return v

    def peek(self, k: int) -> int:
        """Next k bits WITHOUT consuming, zero-filled past end-of-
        stream (the table-decode fast path may legitimately peek past
        the final symbol; ``consume`` still errors if a symbol's real
        bits extend past the stream)."""
        data = self.data
        while self.n < k and self.pos < len(data):
            self.acc |= data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        return self.acc & ((1 << k) - 1)

    def consume(self, k: int) -> None:
        if k > self.n:
            raise ValueError("vp8l: truncated bitstream")
        self.acc >>= k
        self.n -= k


class _LsbWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, k: int) -> None:
        self.acc |= (val & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a prefix code MSB-first (the decoder accumulates
        code = (code << 1) | next_bit)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

_MAX_LEN = 15
# order in which code-length-code lengths are stored (spec §5.2.1)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _Canon:
    """Canonical prefix code: decoded via a flat 2^maxlen lookup table
    (peek maxlen stream bits -> (symbol, length) in one indexed read —
    the classic deflate-style table decoder; the per-pixel hot loop
    cannot afford bit-by-bit walks in Python).  ``single``
    short-circuits 0-bit single-symbol codes (legal per spec: a code
    with one symbol consumes no bits)."""

    __slots__ = ("table", "maxlen", "single")

    def __init__(self, counts, symbols, single=None):
        self.single = single
        if single is not None:
            self.table = None
            self.maxlen = 0
            return
        maxlen = max(l for l in range(1, _MAX_LEN + 1) if counts[l])
        self.maxlen = maxlen
        table = np.zeros(1 << maxlen, np.int32)
        code = 0
        i = 0
        for l in range(1, maxlen + 1):
            for _ in range(counts[l]):
                sym = symbols[i]
                i += 1
                # stream bits arrive LSB-first while the code value is
                # MSB-first: index positions share the BIT-REVERSED
                # code in their low l bits
                rev = 0
                c = code
                for _b in range(l):
                    rev = (rev << 1) | (c & 1)
                    c >>= 1
                table[rev :: 1 << l] = sym | (l << 16)
                code += 1
            code <<= 1
        # plain list: python-int indexing in the per-pixel loop is
        # ~3x faster than numpy scalar extraction
        self.table = table.tolist()


def _build_canon(lengths: list[int]) -> _Canon:
    nonzero = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if not nonzero:
        raise ValueError("vp8l: empty prefix code")
    if len(nonzero) == 1:
        return _Canon(None, None, single=nonzero[0][1])
    counts = [0] * (_MAX_LEN + 1)
    for l, _ in nonzero:
        if l > _MAX_LEN:
            raise ValueError("vp8l: code length > 15")
        counts[l] += 1
    # completeness (kraft sum == 1) required for multi-symbol codes
    total = 0
    for l in range(1, _MAX_LEN + 1):
        total += counts[l] << (_MAX_LEN - l)
    if total != 1 << _MAX_LEN:
        raise ValueError("vp8l: incomplete prefix code")
    nonzero.sort()
    return _Canon(counts, [s for _, s in nonzero])


def _decode_sym(br: _LsbReader, c: _Canon) -> int:
    if c.single is not None:
        return c.single
    e = c.table[br.peek(c.maxlen)]
    if e == 0:
        raise ValueError("vp8l: invalid prefix code word")
    br.consume(e >> 16)
    return e & 0xFFFF


def _read_code_lengths(br: _LsbReader, clc: _Canon, num: int) -> list[int]:
    """Symbol code lengths via the code-length code (spec §5.2.1):
    0-15 literal lengths, 16 repeat-prev, 17/18 repeat-zero."""
    if br.read_bits(1):
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = num
    lengths = [0] * num
    prev = 8
    symbol = 0
    while symbol < num:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = _decode_sym(br, clc)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        else:
            if code_len == 16:
                repeat, val = br.read_bits(2) + 3, prev
            elif code_len == 17:
                repeat, val = br.read_bits(3) + 3, 0
            else:
                repeat, val = br.read_bits(7) + 11, 0
            if symbol + repeat > num:
                raise ValueError("vp8l: code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = val
                symbol += 1
    return lengths


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _Canon:
    if br.read_bits(1):  # simple code (spec §5.2.2)
        num_symbols = br.read_bits(1) + 1
        if br.read_bits(1):
            s0 = br.read_bits(8)
        else:
            s0 = br.read_bits(1)
        if s0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        if num_symbols == 1:
            return _Canon(None, None, single=s0)
        s1 = br.read_bits(8)
        if s1 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        counts = [0] * (_MAX_LEN + 1)
        counts[1] = 2
        # simple codes assign 0/1 in READ order, not sorted order
        return _Canon(counts, [s0, s1])
    num_codes = 4 + br.read_bits(4)
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read_bits(3)
    clc = _build_canon(clc_lengths)
    lengths = _read_code_lengths(br, clc, alphabet_size)
    return _build_canon(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _lz77_value(br: _LsbReader, prefix_code: int) -> int:
    """Prefix-coded LZ77 length/distance value (spec §5.2.2)."""
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.read_bits(extra_bits) + 1


# 120-entry distance neighbor map (spec §5.2.2): codes 1..120 address
# nearby pixels as (dy<<4 | 8-dx); codes >120 are plain distances - 120.
_CODE_TO_PLANE = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
)


def _plane_code_to_distance(xsize: int, dist_code: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    v = _CODE_TO_PLANE[dist_code - 1]
    yoffset = v >> 4
    xoffset = 8 - (v & 0xF)
    dist = yoffset * xsize + xoffset
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# image-stream decode (recursive: entropy/meta, transform sub-images)
# ---------------------------------------------------------------------------

_CACHE_MUL = 0x1E35A7BD


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _decode_image_stream(br: _LsbReader, w: int, h: int, is_level0: bool):
    """Returns (pixels uint32 ARGB ndarray shape (h, w'), transforms)
    where w' may shrink under a color-indexing transform and
    ``transforms`` is the read-order list (empty unless level0)."""
    transforms = []
    cur_w = w
    if is_level0:
        seen = set()
        while br.read_bits(1):
            ttype = br.read_bits(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read_bits(3) + 2
                sub, _ = _decode_image_stream(
                    br, _div_round_up(cur_w, bits), _div_round_up(h, bits), False
                )
                transforms.append(("pred", bits, sub))
            elif ttype == 1:  # color transform
                bits = br.read_bits(3) + 2
                sub, _ = _decode_image_stream(
                    br, _div_round_up(cur_w, bits), _div_round_up(h, bits), False
                )
                transforms.append(("color", bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append(("subg",))
            else:  # color indexing
                n_colors = br.read_bits(8) + 1
                deltas, _ = _decode_image_stream(br, n_colors, 1, False)
                palette = _palette_from_deltas(deltas.ravel())
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(("palette", wbits, palette, cur_w))
                cur_w = _div_round_up(cur_w, wbits)

    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: invalid color cache size")

    meta = None
    meta_bits = 0
    meta_w = 0
    num_groups = 1
    if is_level0 and br.read_bits(1):  # meta prefix codes (spec §5.6.3)
        meta_bits = br.read_bits(3) + 2
        meta_w = _div_round_up(cur_w, meta_bits)
        meta_h = _div_round_up(h, meta_bits)
        meta_img, _ = _decode_image_stream(br, meta_w, meta_h, False)
        meta = ((meta_img.ravel() >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    pix = _decode_pixels(
        br, cur_w, h, groups, meta, meta_bits, meta_w, cache_bits
    )
    return pix, transforms


def _palette_from_deltas(deltas: np.ndarray) -> np.ndarray:
    """Color-table entries are stored component-wise delta-coded
    against the previous entry (spec §4.2.4): cumulative sum mod 256
    per ARGB byte lane."""
    n = deltas.shape[0]
    comps = np.empty((n, 4), np.uint8)
    comps[:, 0] = (deltas >> 24) & 0xFF
    comps[:, 1] = (deltas >> 16) & 0xFF
    comps[:, 2] = (deltas >> 8) & 0xFF
    comps[:, 3] = deltas & 0xFF
    acc = np.cumsum(comps.astype(np.uint32), axis=0) & 0xFF
    return (
        (acc[:, 0] << 24) | (acc[:, 1] << 16) | (acc[:, 2] << 8) | acc[:, 3]
    ).astype(np.uint32)


def _decode_pixels(br, w, h, groups, meta, meta_bits, meta_w, cache_bits):
    n = w * h
    out = np.zeros(n, np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    x = 0
    y = 0
    single_group = groups[0] if meta is None else None
    green_c = red_c = blue_c = alpha_c = dist_c = None
    # fast path: when red/blue/alpha codes are all single-symbol (every
    # palette or subtract-green-grayscale stream), a literal pixel is
    # one green decode + an OR with a precomputed constant
    consts = [
        (a.single << 24) | (r.single << 16) | b.single
        if r.single is not None and b.single is not None and a.single is not None
        else None
        for _, r, b, a, _ in groups
    ]
    const = None
    group_row = -1
    if single_group is not None:
        green_c, red_c, blue_c, alpha_c, dist_c = single_group
        const = consts[0]
    while pos < n:
        if single_group is None:
            gy = y >> meta_bits
            if gy != group_row or (x & ((1 << meta_bits) - 1)) == 0:
                group_row = gy
                gi = meta[gy * meta_w + (x >> meta_bits)]
                green_c, red_c, blue_c, alpha_c, dist_c = groups[gi]
                const = consts[gi]
        s = _decode_sym(br, green_c)
        if s < 256:  # literal
            if const is not None:
                px = const | (s << 8)
            else:
                r = _decode_sym(br, red_c)
                b = _decode_sym(br, blue_c)
                a = _decode_sym(br, alpha_c)
                px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, _decode_sym(br, dist_c))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: backward reference out of range")
            if cache is None and dist >= length:
                out[pos : pos + length] = out[pos - dist : pos - dist + length]
                pos += length
            else:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    if cache is not None:
                        cache[((_CACHE_MUL * int(px)) & 0xFFFFFFFF) >> cache_shift] = int(px)
                    pos += 1
            x = pos % w
            y = pos // w
            group_row = -2  # force group re-lookup
        else:  # color cache hit
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# inverse transforms (applied in REVERSE read order, spec §4.2)
# ---------------------------------------------------------------------------


def _channels(pix: np.ndarray):
    return (
        (pix >> 24).astype(np.int32),
        ((pix >> 16) & 0xFF).astype(np.int32),
        ((pix >> 8) & 0xFF).astype(np.int32),
        (pix & 0xFF).astype(np.int32),
    )


def _pack(a, r, g, b) -> np.ndarray:
    return (
        ((a & 0xFF).astype(np.uint32) << 24)
        | ((r & 0xFF).astype(np.uint32) << 16)
        | ((g & 0xFF).astype(np.uint32) << 8)
        | (b & 0xFF).astype(np.uint32)
    )


def _inv_subtract_green(pix: np.ndarray) -> np.ndarray:
    a, r, g, b = _channels(pix)
    return _pack(a, r + g, g, b + g)


def _inv_color_transform(pix: np.ndarray, bits: int, cte_img: np.ndarray) -> np.ndarray:
    h, w = pix.shape
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    cte = cte_img[np.ix_(ys, xs)]
    # element layout (spec §4.2.2): blue lane = green_to_red,
    # green lane = green_to_blue, red lane = red_to_blue; all int8
    g2r = (cte & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
    g2b = ((cte >> 8) & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
    r2b = ((cte >> 16) & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
    a, r, g, b = _channels(pix)
    g8 = g.astype(np.uint8).astype(np.int8).astype(np.int32)
    new_r = (r + ((g2r * g8) >> 5)) & 0xFF
    r8 = new_r.astype(np.uint8).astype(np.int8).astype(np.int32)
    new_b = (b + ((g2b * g8) >> 5) + ((r2b * r8) >> 5)) & 0xFF
    return _pack(a, new_r, g, new_b)


def _inv_palette(pix: np.ndarray, wbits: int, palette: np.ndarray, orig_w: int) -> np.ndarray:
    h = pix.shape[0]
    idx = ((pix >> 8) & 0xFF).astype(np.int64)
    if wbits:
        per = 1 << wbits
        bpp = 8 >> wbits
        mask = (1 << bpp) - 1
        shifts = (np.arange(per) * bpp)[None, None, :]
        idx = ((idx[:, :, None] >> shifts) & mask).reshape(h, -1)[:, :orig_w]
    # out-of-range index -> 0x00000000 per spec
    valid = idx < palette.shape[0]
    out = np.zeros(idx.shape, np.uint32)
    out[valid] = palette[idx[valid]]
    return out


def _avg2(a: np.ndarray | int, b: np.ndarray | int):
    """Per-ARGB-channel (x + y) / 2 without unpacking (SWAR trick is
    avoided for clarity; operands are uint32 scalars here)."""
    out = 0
    for shift in (24, 16, 8, 0):
        ca = (int(a) >> shift) & 0xFF
        cb = (int(b) >> shift) & 0xFF
        out |= ((ca + cb) >> 1) << shift
    return out


def _clamp_add_subtract_full(a: int, b: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) - ((c >> shift) & 0xFF)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_subtract_half(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        ca = (a >> shift) & 0xFF
        cb = (b >> shift) & 0xFF
        # C integer division truncates toward zero: (ca - cb) / 2
        v = ca + int((ca - cb) / 2)
        out |= max(0, min(255, v)) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for shift in (24, 16, 8, 0):
        cl = (l >> shift) & 0xFF
        ct = (t >> shift) & 0xFF
        ctl = (tl >> shift) & 0xFF
        pred = cl + ct - ctl
        p_l += abs(pred - cl)
        p_t += abs(pred - ct)
    return l if p_l < p_t else t


def _add_pixels(a: int, b: int) -> int:
    """Per-channel modular add (residual + prediction)."""
    out = 0
    for shift in (24, 16, 8, 0):
        out |= (((a >> shift) + (b >> shift)) & 0xFF) << shift
    return out


def _inv_predictor(pix: np.ndarray, bits: int, mode_img: np.ndarray) -> np.ndarray:
    """Sequential scanline inverse of the predictor transform (spec
    §4.2.1).  Row 0 and column 0 use forced L/T/black predictors; the
    top-right pixel of the rightmost column is the leftmost pixel of
    the same row (contiguous-memory rule)."""
    h, w = pix.shape
    out = pix.astype(np.uint32).copy()
    modes = ((mode_img >> 8) & 0xFF).astype(np.int64)
    # (0, 0): opaque black
    out[0, 0] = _add_pixels(int(out[0, 0]), 0xFF000000)
    # row 0: left predictor == per-channel modular cumsum
    for xx in range(1, w):
        out[0, xx] = _add_pixels(int(out[0, xx]), int(out[0, xx - 1]))
    flat = out.ravel()
    for yy in range(1, h):
        base = yy * w
        # column 0: top predictor
        flat[base] = _add_pixels(int(flat[base]), int(flat[base - w]))
        mrow = modes[yy >> bits]
        for xx in range(1, w):
            mode = mrow[xx >> bits]
            t = int(flat[base + xx - w])
            if mode == 2:
                pred = t
            else:
                l = int(flat[base + xx - 1])
                if mode == 1:
                    pred = l
                elif mode == 0:
                    pred = 0xFF000000
                elif mode == 3:
                    pred = int(flat[base + xx - w + 1]) if xx + 1 < w else int(flat[base])
                elif mode == 4:
                    pred = int(flat[base + xx - w - 1])
                else:
                    tl = int(flat[base + xx - w - 1])
                    tr = int(flat[base + xx - w + 1]) if xx + 1 < w else int(flat[base])
                    if mode == 5:
                        pred = _avg2(_avg2(l, tr), t)
                    elif mode == 6:
                        pred = _avg2(l, tl)
                    elif mode == 7:
                        pred = _avg2(l, t)
                    elif mode == 8:
                        pred = _avg2(tl, t)
                    elif mode == 9:
                        pred = _avg2(t, tr)
                    elif mode == 10:
                        pred = _avg2(_avg2(l, tl), _avg2(t, tr))
                    elif mode == 11:
                        pred = _select(l, t, tl)
                    elif mode == 12:
                        pred = _clamp_add_subtract_full(l, t, tl)
                    elif mode == 13:
                        pred = _clamp_add_subtract_half(_avg2(l, t), tl)
                    else:
                        raise ValueError(f"vp8l: invalid predictor mode {mode}")
            flat[base + xx] = _add_pixels(int(flat[base + xx]), pred)
    return flat.reshape(h, w)


def _apply_inverse_transforms(pix: np.ndarray, transforms: list) -> np.ndarray:
    for t in reversed(transforms):
        kind = t[0]
        if kind == "subg":
            pix = _inv_subtract_green(pix)
        elif kind == "color":
            pix = _inv_color_transform(pix, t[1], t[2])
        elif kind == "pred":
            pix = _inv_predictor(pix, t[1], t[2])
        else:  # palette
            pix = _inv_palette(pix, t[1], t[2], t[3])
    return pix


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------


# decode size cap: crawl triage guard — a crafted ~30-byte payload can
# declare 16383x16383 (268 MP, >1 GiB of buffers) and OOM a decode
# worker with a MemoryError that escapes the typed-error contract.
# 67 MP covers any sane crawl image; oversized payloads become typed
# error rows.  Module-level so a non-crawl caller can raise it.
MAX_DECODE_PIXELS = 1 << 26


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) RGBA uint8."""
    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _LsbReader(payload[1:])
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"vp8l: declared size {w}x{h} exceeds the decode cap "
            f"({MAX_DECODE_PIXELS} px)"
        )
    br.read_bits(1)  # alpha-is-used hint (informative)
    if br.read_bits(3) != 0:
        raise ValueError("vp8l: unsupported version")
    pix, transforms = _decode_image_stream(br, w, h, True)
    pix = _apply_inverse_transforms(pix, transforms)
    if pix.shape != (h, w):
        raise ValueError("vp8l: decoded size mismatch")
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[:, :, 0] = (pix >> 16) & 0xFF
    rgba[:, :, 1] = (pix >> 8) & 0xFF
    rgba[:, :, 2] = pix & 0xFF
    rgba[:, :, 3] = pix >> 24
    return rgba


def _webp_chunks(data: bytes):
    """Iterate (fourcc, payload) chunks of a RIFF/WEBP container."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: bad RIFF/WEBP signature")
    pos = 12
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    while pos + 8 <= end:
        fourcc = bytes(data[pos : pos + 4])
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = bytes(data[pos + 8 : pos + 8 + size])
        if len(payload) < size:
            raise ValueError("webp: truncated chunk")
        yield fourcc, payload
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned


def is_webp_lossless(data: bytes) -> bool:
    """True when the container's image stream is VP8L (decodable here);
    False for VP8 lossy (the named stub)."""
    try:
        for fourcc, _ in _webp_chunks(bytes(data)):
            if fourcc == b"VP8L":
                return True
            if fourcc == b"VP8 ":
                return False
    except (ValueError, struct.error):
        return False
    return False


def decode_webp(data: bytes) -> np.ndarray:
    """WebP container bytes -> (h, w, 4) RGBA uint8 (VP8L lossless).
    VP8 lossy raises the NAMED typed stub; corrupt streams raise
    ValueError."""
    data = bytes(data)
    saw_chunk = False
    try:
        for fourcc, payload in _webp_chunks(data):
            saw_chunk = True
            if fourcc == b"VP8L":
                return decode_vp8l(payload)
            if fourcc == b"VP8 ":
                raise NotImplementedError(
                    "webp-lossy (VP8) codec not available in this environment (stub)"
                )
    except (struct.error, IndexError) as exc:
        raise ValueError(f"webp: truncated or corrupt container ({exc})") from exc
    if saw_chunk:
        # a well-formed container without a decodable still image
        # (animated ANIM/ANMF-only, or an unsupported feature set) is a
        # RECOGNIZED-but-undecodable payload: the crawl-triage contract
        # is the NAMED typed stub, not a "corrupt" ValueError
        raise NotImplementedError(
            "webp container without a VP8L still image "
            "(animated or unsupported feature set) (stub)"
        )
    raise ValueError("webp: no chunks in container")


# ---------------------------------------------------------------------------
# encoder (fixture writer): subtract-green literals, or color-indexing
# with pixel bundling for <=16-color images
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = _MAX_LEN) -> dict[int, int]:
    """Length-limited Huffman code lengths.  Plain heap Huffman, with a
    frequency-flattening retry if the depth limit is exceeded (glyph
    page histograms are bimodal, so the retry is all but unreachable)."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    f = dict(freqs)
    while True:
        heap = [(f[s], s, (s,)) for s in syms]
        heapq.heapify(heap)
        counter = max(syms) + 1
        depth = dict.fromkeys(syms, 0)
        while len(heap) > 1:
            fa, _, sa = heapq.heappop(heap)
            fb, _, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, counter, sa + sb))
            counter += 1
        if max(depth.values()) <= max_len:
            return depth
        f = {s: (v + 1) >> 1 for s, v in f.items()}


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with deflate-style canonical assignment."""
    order = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    codes = {}
    code = 0
    prev_len = 0
    for sym, length in order:
        code <<= length - prev_len
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


def _write_prefix_code(bw: _LsbWriter, freqs: dict[int, int], alphabet_size: int):
    """Emit a prefix-code definition from symbol FREQUENCIES; returns
    symbol -> (code, len).  <=2 low-valued symbols use the simple-code
    form; otherwise a Huffman code is built and its lengths written via
    the code-length code."""
    syms = sorted(freqs)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] <= 1:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal code
    lengths = _huffman_lengths(freqs)
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    clc_freq: dict[int, int] = {}
    for l in full:
        clc_freq[l] = clc_freq.get(l, 0) + 1
    clc_lengths = _huffman_lengths(clc_freq, max_len=7)
    if len(clc_lengths) == 1:
        # single-symbol code-length code: the decoder reads 0 bits per
        # entry (single-code rule), so emit 0 bits — NOT the declared
        # 1-bit canonical code
        clc_codes = {next(iter(clc_lengths)): (0, 0)}
    else:
        clc_codes = _canonical_codes(clc_lengths)
    num_codes = max(
        4, max(i for i, s in enumerate(_CLC_ORDER) if s in clc_lengths) + 1
    )
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut: all lengths follow
    for l in full:
        c, n = clc_codes[l]
        bw.write_code(c, n)
    return _canonical_codes(lengths)


def _emit_channel_streams(bw: _LsbWriter, a, r, g, b, green_alphabet=280):
    """Write the 5 prefix codes + per-pixel symbols for flat channel
    arrays (literal-only: no LZ77, no cache)."""
    def freqs(vals):
        u, c = np.unique(vals, return_counts=True)
        return {int(s): int(n) for s, n in zip(u, c)}

    green_codes = _write_prefix_code(bw, freqs(g), green_alphabet)
    red_codes = _write_prefix_code(bw, freqs(r), 256)
    blue_codes = _write_prefix_code(bw, freqs(b), 256)
    alpha_codes = _write_prefix_code(bw, freqs(a), 256)
    dist_codes = _write_prefix_code(bw, {0: 1}, 40)  # unused, single symbol
    del dist_codes
    for i in range(g.shape[0]):
        c, n = green_codes[int(g[i])]
        bw.write_code(c, n)
        c, n = red_codes[int(r[i])]
        bw.write_code(c, n)
        c, n = blue_codes[int(b[i])]
        bw.write_code(c, n)
        c, n = alpha_codes[int(a[i])]
        bw.write_code(c, n)


def encode_vp8l(img: np.ndarray) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 -> VP8L chunk
    payload.  Picks color-indexing (+ bundling) when the image has <=16
    distinct colors, else subtract-green + literal prefix codes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        rgba = np.stack([img, img, img, np.full_like(img, 255)], axis=-1)
    elif img.shape[2] == 3:
        rgba = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=-1
        )
    else:
        rgba = img
    h, w = rgba.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("vp8l: image dimensions out of range")
    argb = (
        (rgba[:, :, 3].astype(np.uint32) << 24)
        | (rgba[:, :, 0].astype(np.uint32) << 16)
        | (rgba[:, :, 1].astype(np.uint32) << 8)
        | rgba[:, :, 2].astype(np.uint32)
    )
    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((rgba[:, :, 3] != 255).any()), 1)
    bw.write(0, 3)  # version

    colors = np.unique(argb)
    if colors.shape[0] <= 16:
        _encode_palette_mode(bw, argb, colors, w, h)
    else:
        _encode_subtract_green_mode(bw, argb)
    return b"\x2f" + bw.getvalue()


def _encode_palette_mode(bw: _LsbWriter, argb: np.ndarray, colors: np.ndarray, w: int, h: int):
    n_colors = colors.shape[0]
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(n_colors - 1, 8)
    # palette stream: delta-coded entries as a (n, 1) image
    prev = np.concatenate([[0], colors[:-1].astype(np.uint64)]).astype(np.uint32)
    deltas = np.zeros(n_colors, np.uint32)
    for shift in (24, 16, 8, 0):
        d = (((colors >> shift) & 0xFF).astype(np.int64) - ((prev >> shift) & 0xFF).astype(np.int64)) & 0xFF
        deltas |= (d.astype(np.uint32)) << shift
    bw.write(0, 1)  # palette stream: no color cache
    _emit_channel_streams(
        bw,
        (deltas >> 24) & 0xFF,
        (deltas >> 16) & 0xFF,
        (deltas >> 8) & 0xFF,
        deltas & 0xFF,
    )
    bw.write(0, 1)  # no more transforms
    # main stream at packed width
    idx = np.searchsorted(colors, argb.ravel()).reshape(argb.shape).astype(np.int64)
    if n_colors <= 2:
        wbits = 3
    elif n_colors <= 4:
        wbits = 2
    else:
        wbits = 1
    per = 1 << wbits
    bpp = 8 >> wbits
    pw = _div_round_up(w, wbits)
    packed = np.zeros((h, pw), np.uint32)
    for k in range(per):
        cols = idx[:, k::per]
        packed[:, : cols.shape[1]] |= (cols << (k * bpp)).astype(np.uint32)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    flat = packed.ravel()
    zeros = np.zeros(flat.shape[0], np.int64)
    _emit_channel_streams(bw, zeros + 255, zeros, flat, zeros)


def _encode_subtract_green_mode(bw: _LsbWriter, argb: np.ndarray):
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract green
    bw.write(0, 1)  # no more transforms
    a = (argb >> 24).ravel().astype(np.int64)
    r = ((argb >> 16) & 0xFF).ravel().astype(np.int64)
    g = ((argb >> 8) & 0xFF).ravel().astype(np.int64)
    b = (argb & 0xFF).ravel().astype(np.int64)
    r = (r - g) & 0xFF
    b = (b - g) & 0xFF
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    _emit_channel_streams(bw, a, r, g, b)


def encode_webp(img: np.ndarray) -> bytes:
    """Image -> RIFF/WEBP container with a single VP8L chunk."""
    payload = encode_vp8l(img)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
