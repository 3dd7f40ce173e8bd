"""JPEG codec in pure numpy (ITU-T T.81 huffman DCT modes) — closes
the last codec stub in this environment.

Decoder: SOF0/SOF1 (baseline/extended sequential huffman, interleaved
or multi-scan non-interleaved) AND SOF2 (progressive: spectral
selection, successive approximation, EOB runs — T.81 Annex G, the
libjpeg decode_mcu_* control flow), 8-bit samples, grayscale or YCbCr
with sampling factors 1-4 (replicated chroma upsample), restart
intervals, multi-table DQT/DHT.  All huffman and quantization tables
are read FROM THE STREAM (nothing built-in is assumed about the file).
Arithmetic coding and 12-bit precision raise typed
``NotImplementedError``.

Encoders: ``encode_jpeg`` — single-component (grayscale) baseline with
the Annex-K-style luminance quantization table and canonical huffman
tables derived from the embedded counts/values (validity is asserted
at import; round-trip correctness depends only on the tables being a
valid prefix code, which the decoder reads back from the stream).
``encode_jpeg_progressive`` / ``encode_jpeg_sequential_multiscan`` —
gray or YCbCr (optionally 4:2:0), per-scan single-length huffman
tables; the quantized coefficients are identical to the sequential
encoding, so progressive files decode bit-identical to their baseline
twins.  Quality maps to table scaling the way libjpeg does (5000/q
below 50, 200-2q above); quality 100 yields an all-ones table, i.e.
only DCT rounding error.

The IDCT/FDCT are exact float64 separable transforms (one einsum over
all blocks of a component — no per-pixel python).

Reference path parity: the reference loads JPEG via PIL
(python/rapidocr_onnxruntime/utils.py:113-126); output here is the
grayscale collapse used by every other codec in this engine
(functions/codecs.py luma rules).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared transform pieces
# ---------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M[u, x]; IDCT is M.T @ F @ M."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return m


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks -> (n, 8, 8) samples
    (still level-shifted around 0)."""
    m = _dct_matrix()
    return np.einsum("ux,nuv,vy->nxy", m, coefs, m, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    m = _dct_matrix()
    return np.einsum("ux,nxy,vy->nuv", m, blocks, m, optimize=True)


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude-category decode."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers terminate the current interval."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"jpeg: unexpected marker 0x{nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_and_skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("jpeg: expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _Huffman:
    """Canonical huffman decode table from DHT counts + values."""

    def __init__(self, counts: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("jpeg: invalid huffman code")


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB uint8 -> (h, w) uint8 with cv2's exact BGR2GRAY
    fixed-point luma.  This is the engine's ONE definition — codecs.py
    re-exports it (the dependency direction is codecs -> jpeg, so
    defining it here keeps the modules cycle-free)."""
    r = rgb[:, :, 0].astype(np.uint32)
    g = rgb[:, :, 1].astype(np.uint32)
    b = rgb[:, :, 2].astype(np.uint32)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w) grayscale uint8 (single-component scans
    return the Y plane; YCbCr collapses through the engine's luma).
    Handles baseline/extended sequential (SOF0/SOF1, interleaved OR
    multi-scan non-interleaved) and progressive (SOF2: spectral
    selection + successive approximation, EOB runs, restart markers).
    Truncated / corrupt streams raise ValueError (LoadImageError
    analog); unsupported coding modes raise NotImplementedError."""
    try:
        return _decode_jpeg(data)
    except (struct.error, IndexError, KeyError, OverflowError) as exc:
        # KeyError: a scan referencing an undefined huffman/quant table
        # id (corrupt crawl bytes) must stay inside the module's
        # documented ValueError/NotImplementedError contract — stage
        # callers catch only those two (ADVICE r4).  OverflowError: a
        # corrupt stream can walk the DC predictor past int32 over
        # enough blocks even with per-block size validation.
        raise ValueError(f"jpeg: truncated or corrupt stream ({exc})") from exc


def _init_geometry(frame: dict) -> None:
    """Attach block-grid geometry to the frame: the MCU-aligned FULL
    grid (bw, bh — what interleaved scans and reconstruction use) and
    the component-dimension SCAN grid (sw, sh — what non-interleaved
    scans iterate, T.81 A.2.2: ceil(comp dims / 8), which can be
    smaller than the MCU-padded grid)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        raise ValueError("jpeg: invalid sampling factors")
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcus_x"] = -(-frame["w"] // (8 * hmax))
    frame["mcus_y"] = -(-frame["h"] // (8 * vmax))
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError("jpeg: invalid sampling factors")
        c["bw"] = frame["mcus_x"] * c["h"]
        c["bh"] = frame["mcus_y"] * c["v"]
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        c["sw"] = -(-cw // 8)
        c["sh"] = -(-ch // 8)


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None
    store: dict[int, np.ndarray] | None = None
    dc_seen: set[int] = set()
    restart_interval = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        while data[pos + 1] == 0xFF:  # fill bytes before a marker
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                values = seg[i + 17:i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(counts, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            if frame is not None:
                raise ValueError("jpeg: multiple SOF markers")
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
            _init_geometry(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF marker 0x{marker:02x} unsupported "
                "(sequential/progressive huffman only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if store is None:
                # one persistent int store per component: scans (several
                # in progressive / multi-scan sequential) accumulate
                # QUANTIZED coefficients here; dequantize + IDCT once at
                # the end
                store = {
                    c["id"]: np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
                    for c in frame["comps"]
                }
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(f"jpeg: scan references unknown component {cs}")
                scan.append((comp, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            elif ss > 0 and ns != 1:
                raise ValueError("jpeg: progressive AC scan must be non-interleaved")
            pos = _decode_scan(
                data, pos + seglen, frame, store, scan, huff_dc, huff_ac,
                restart_interval, ss, se, ah, al,
            )
            if ss == 0:
                dc_seen.update(c["id"] for c, _, _ in scan)
            continue
        pos += seglen
    if store is None:
        raise ValueError("jpeg: no scan found")
    missing = [c["id"] for c in frame["comps"] if c["id"] not in dc_seen]
    if missing:
        raise ValueError(f"jpeg: component(s) {missing} never coded in any scan")
    return _reconstruct(frame, store, qt)


def _decode_scan(
    data, pos, frame, store, scan, huff_dc, huff_ac, restart_interval,
    ss, se, ah, al,
):
    """Decode one scan's entropy data into the quantized-coefficient
    store; returns the stream position of the next marker.  Interleaved
    scans (ns > 1) walk MCUs over the full grid; non-interleaved scans
    walk the component's own sw x sh grid (T.81 A.2.2 — the grids can
    differ for subsampled components, which the round-2 baseline
    decoder got wrong for ns=1; ADVICE r3)."""
    br = _BitReader(data, pos)
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    state = {"eobrun": 0}
    progressive = frame["progressive"]
    interleaved = len(scan) > 1
    if interleaved:
        n_units = frame["mcus_x"] * frame["mcus_y"]
    else:
        comp0 = scan[0][0]
        n_units = comp0["sw"] * comp0["sh"]
    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            br.byte_align_and_skip_restart()
            for key in preds:
                preds[key] = 0
            state["eobrun"] = 0
        try:
            if interleaved:
                my, mx = divmod(unit, frame["mcus_x"])
                for comp, dc_id, ac_id in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            row = my * comp["v"] + by
                            col = mx * comp["h"] + bx
                            blk = store[comp["id"]][row * comp["bw"] + col]
                            _decode_block(
                                br, blk, comp["id"], dc_id, ac_id,
                                huff_dc, huff_ac, preds,
                                ss, se, ah, al, progressive, state,
                            )
            else:
                comp, dc_id, ac_id = scan[0]
                row, col = divmod(unit, comp["sw"])
                blk = store[comp["id"]][row * comp["bw"] + col]
                _decode_block(
                    br, blk, comp["id"], dc_id, ac_id, huff_dc, huff_ac,
                    preds, ss, se, ah, al, progressive, state,
                )
        except _RestartMarker:
            raise ValueError("jpeg: restart marker inside MCU")
    # advance to the next marker (skip any padding up to the FF)
    p = br.pos
    n = len(data)
    while p + 1 < n and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    return p


def _decode_block(
    br, blk, cid, dc_id, ac_id, huff_dc, huff_ac, preds,
    ss, se, ah, al, progressive, state,
):
    """One 8x8 block's contribution for the current scan kind.  ``blk``
    is an int32 view (zigzag order) into the component store."""
    if not progressive:  # sequential: full band, one scan
        size = huff_dc[dc_id].decode(br)
        if size > 16:  # T.81 F.1.2.1: DC magnitude category <= 16
            raise ValueError("jpeg: invalid DC size category")
        diff = _extend(br.read_bits(size), size)
        preds[cid] += diff
        blk[0] = preds[cid]
        ac_t = huff_ac[ac_id]
        k = 1
        while k < 64:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("jpeg: AC index overflow")
            blk[k] = _extend(br.read_bits(s), s)
            k += 1
        return
    if ss == 0 and ah == 0:  # progressive DC first (point transform Al)
        size = huff_dc[dc_id].decode(br)
        if size > 16:  # T.81 F.1.2.1: DC magnitude category <= 16
            raise ValueError("jpeg: invalid DC size category")
        diff = _extend(br.read_bits(size), size)
        preds[cid] += diff
        blk[0] = preds[cid] << al
        return
    if ss == 0:  # progressive DC refinement: one raw bit per block
        if br.read_bit():
            blk[0] = int(blk[0]) | (1 << al)
        return
    if ah == 0:  # progressive AC first (band ss..se, magnitudes << al)
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac_t = huff_ac[ac_id]
        k = ss
        while k <= se:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read_bits(r)
                break  # EOBn: this block done, eobrun more to skip
            k += r
            if k > se:
                raise ValueError("jpeg: AC index overflow")
            blk[k] = _extend(br.read_bits(s), s) << al
            k += 1
        return
    _refine_ac(br, blk, huff_ac[ac_id], ss, se, al, state)


def _refine_ac(br, blk, ac_t, ss, se, al, state):
    """Progressive AC successive-approximation refinement (T.81
    G.1.2.3 / the libjpeg decode_mcu_AC_refine control flow):
    correction bits for already-nonzero coefficients interleave with
    runs of zero-history coefficients and newly-nonzero +-1<<Al
    insertions; EOB runs carry correction bits for the block tails."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0x0F
            new_val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: invalid AC refinement symbol")
                new_val = p1 if br.read_bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if new_val:
                if k > se:
                    raise ValueError("jpeg: AC refinement overruns band")
                blk[k] = new_val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, store, qt):
    planes = {}
    for comp in frame["comps"]:
        zz = store[comp["id"]]
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("jpeg: missing quantization table")
        # int64 product (16-bit quant x 15-bit coef overflows int32)
        deq = zz.astype(np.int64) * q[None, :]
        nat = np.zeros(zz.shape, dtype=np.float64)
        nat[:, _ZIGZAG] = deq
        px = _idct_blocks(nat.reshape(-1, 8, 8)) + 128.0
        bh, bw = comp["bh"], comp["bw"]
        grid = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
        plane = np.clip(np.rint(grid.reshape(bh * 8, bw * 8)), 0, 255)
        planes[comp["id"]] = (plane.astype(np.uint8), comp)
    return _planes_to_gray(planes, frame, rgb_to_gray)


def _planes_to_gray(planes, frame, rgb_to_gray):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(planes) == 1:
        plane, _comp = next(iter(planes.values()))
        return plane[:h, :w]
    if len(planes) != 3:
        raise NotImplementedError("jpeg: only 1- or 3-component scans")
    full = []
    for cid, (plane, comp) in planes.items():
        plane = np.repeat(plane, vmax // comp["v"], axis=0)
        plane = np.repeat(plane, hmax // comp["h"], axis=1)
        full.append(plane[:h, :w].astype(np.float64))
    y, cb, cr = full  # component order as in SOF
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
    return rgb_to_gray(rgb)


# ---------------------------------------------------------------------------
# encoders: grayscale baseline (encode_jpeg), progressive + multi-scan
# sequential (encode_jpeg_progressive / encode_jpeg_sequential_multiscan)
# ---------------------------------------------------------------------------

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
)

_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = bytes(range(12))
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALUES = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)
assert sum(_DC_COUNTS) == len(_DC_VALUES)
assert sum(_AC_COUNTS) == len(_AC_VALUES)


def _canonical_codes(counts: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) grayscale uint8 -> baseline JPEG bytes (one component,
    no subsampling).  quality 100 => all-ones quant table."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    scale = 5000 // max(1, quality) if quality < 50 else 200 - 2 * quality
    # _Q_LUMA is in natural (row-major) order; DQT stores zigzag order
    q_nat = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255).astype(np.int64)
    q_zig = q_nat[_ZIGZAG]
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    coef = _fdct_blocks(blocks)
    quant = np.rint(coef / q_nat.reshape(8, 8)).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_VALUES)
    bwr = _BitWriter()
    pred = 0
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        size = _category(diff)
        length, code = dc_codes[size]
        bwr.write(length, code)
        if size:
            bwr.write(size, diff if diff >= 0 else diff + (1 << size) - 1)
        run = 0
        last_nz = np.flatnonzero(blk[1:])
        last = (last_nz[-1] + 1) if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_codes[0xF0]
                bwr.write(length, code)
                run -= 16
            size = _category(v)
            length, code = ac_codes[(run << 4) | size]
            bwr.write(length, code)
            bwr.write(size, v if v >= 0 else v + (1 << size) - 1)
            run = 0
        if last < 63:
            length, code = ac_codes[0x00]
            bwr.write(length, code)
    bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]
    out.append(seg(0xDB, b"\x00" + q_zig.astype(np.uint8).tobytes()))
    out.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])))
    out.append(seg(0xC4, bytes([0x00] + _DC_COUNTS) + _DC_VALUES))
    out.append(seg(0xC4, bytes([0x10] + _AC_COUNTS) + _AC_VALUES))
    out.append(seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])))
    out.append(bytes(bwr.out))
    out.append(b"\xff\xd9")
    return b"".join(out)


# ---------------------------------------------------------------------------
# progressive / multi-scan encoder (test-grade: correctness over
# compression — per-scan single-length huffman tables keep the table
# builder trivial while remaining a fully valid prefix code the decoder
# reads back from the stream)
# ---------------------------------------------------------------------------

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
)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    scale = 5000 // max(1, quality) if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> list[np.ndarray]:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return [
        np.clip(np.rint(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    ]


def _downsample2(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.float64)
    m = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    return np.clip(np.rint(m), 0, 255).astype(np.uint8)


def _component_coefs(plane: np.ndarray, bw: int, bh: int, q_nat: np.ndarray) -> np.ndarray:
    """plane -> (bh*bw, 64) int32 quantized coefficients in ZIGZAG order
    over the FULL MCU-aligned grid (edge padding)."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    coef = _fdct_blocks(blocks)
    quant = np.rint(coef / q_nat.reshape(8, 8)).astype(np.int64)
    return quant.reshape(-1, 64)[:, _ZIGZAG].astype(np.int32)


class _TokenSink:
    """Two-pass scan encoding: pass 1 emits symbol/bit tokens (and
    collects the symbol alphabet so the per-scan huffman table can be
    built), pass 2 writes the tokens through real codes."""

    def __init__(self):
        self.tokens: list[tuple] = []
        self.dc_syms: set[int] = set()
        self.ac_syms: set[int] = set()

    def sym(self, cls: str, s: int) -> None:
        self.tokens.append((cls, s))
        (self.dc_syms if cls == "dc" else self.ac_syms).add(s)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.tokens.append(("b", v & ((1 << n) - 1), n))

    def rst(self, i: int) -> None:
        self.tokens.append(("rst", i))


def _uniform_table(symbols: set[int]) -> tuple[list[int], bytes]:
    """Single-length canonical huffman table over a symbol set (the
    all-ones code stays unused because n <= 2^L - 1)."""
    syms = sorted(symbols)
    n = len(syms)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, bytes(syms)


def _write_tokens(bw: "_BitWriter", tokens: list[tuple], dc_codes: dict, ac_codes: dict) -> None:
    for t in tokens:
        kind = t[0]
        if kind == "b":
            bw.write(t[2], t[1])
        elif kind == "rst":
            bw.flush()
            bw.out.append(0xFF)
            bw.out.append(0xD0 + t[1])
        else:
            length, code = (dc_codes if kind == "dc" else ac_codes)[t[1]]
            bw.write(length, code)


def _units_for_scan(frame: dict, comps_in_scan: list[dict]) -> list[list[tuple[int, int]]]:
    """Block coding order for a scan, grouped per restart unit —
    mirrors the decoder's geometry exactly (interleaved MCU walk vs the
    component's own sw x sh grid for non-interleaved scans)."""
    if len(comps_in_scan) > 1:
        units = []
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                blocks = []
                for comp in comps_in_scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            row = my * comp["v"] + by
                            col = mx * comp["h"] + bx
                            blocks.append((comp["id"], row * comp["bw"] + col))
                units.append(blocks)
        return units
    comp = comps_in_scan[0]
    return [
        [(comp["id"], row * comp["bw"] + col)]
        for row in range(comp["sh"])
        for col in range(comp["sw"])
    ]


def _enc_seq_block(sink: _TokenSink, blk: np.ndarray, cid: int, preds: dict) -> None:
    dc = int(blk[0])
    diff = dc - preds[cid]
    preds[cid] = dc
    size = _category(diff)
    sink.sym("dc", size)
    if size:
        sink.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
    nz = np.flatnonzero(blk[1:])
    last = (nz[-1] + 1) if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            sink.sym("ac", 0xF0)
            run -= 16
        s = _category(v)
        sink.sym("ac", (run << 4) | s)
        sink.bits(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        sink.sym("ac", 0x00)


def _enc_ac_first(sink, blk, ss, se, al, state, flush_eob) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = (v >> al) if v >= 0 else -((-v) >> al)
        if t == 0:
            r += 1
            continue
        flush_eob()
        while r > 15:
            sink.sym("ac", 0xF0)
            r -= 16
        s = _category(t)
        sink.sym("ac", (r << 4) | s)
        sink.bits(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            flush_eob()


def _enc_ac_refine(sink, blk, ss, se, al, state, flush_eob) -> None:
    """libjpeg encode_mcu_AC_refine control flow: correction bits for
    history-nonzero coefficients buffer up and flush right after the
    next emitted symbol (or ride with the EOB run)."""
    absv = []
    eobpos = ss - 1  # last newly-nonzero position
    for k in range(ss, se + 1):
        t = abs(int(blk[k])) >> al
        absv.append(t)
        if t == 1:
            eobpos = k
    r = 0
    pend_block: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            flush_eob()
            sink.sym("ac", 0xF0)
            r -= 16
            for b in pend_block:
                sink.bits(b, 1)
            pend_block = []
        if t > 1:  # history-nonzero: buffered correction bit
            pend_block.append(t & 1)
            continue
        flush_eob()
        sink.sym("ac", (r << 4) | 1)
        sink.bits(1 if int(blk[k]) >= 0 else 0, 1)
        for b in pend_block:
            sink.bits(b, 1)
        pend_block = []
        r = 0
    if r > 0 or pend_block:
        state["eobrun"] += 1
        state["pend"].extend(pend_block)
        if state["eobrun"] == 0x7FFF:
            flush_eob()


def _encode_scan_tokens(
    sink, frame, store, comps_in_scan, ss, se, ah, al, progressive,
    restart_interval=0,
) -> None:
    units = _units_for_scan(frame, comps_in_scan)
    preds = {c["id"]: 0 for c in comps_in_scan}
    state = {"eobrun": 0, "pend": []}

    def flush_eob():
        if state["eobrun"] > 0:
            nbits = state["eobrun"].bit_length() - 1
            sink.sym("ac", nbits << 4)
            sink.bits(state["eobrun"] - (1 << nbits), nbits)
            state["eobrun"] = 0
        for b in state["pend"]:
            sink.bits(b, 1)
        state["pend"] = []

    rst_idx = 0
    for u, unit in enumerate(units):
        if restart_interval and u and u % restart_interval == 0:
            flush_eob()
            sink.rst(rst_idx % 8)
            rst_idx += 1
            for key in preds:
                preds[key] = 0
        for cid, idx in unit:
            blk = store[cid][idx]
            if not progressive:
                _enc_seq_block(sink, blk, cid, preds)
            elif ss == 0 and ah == 0:  # DC first
                v = int(blk[0]) >> al
                diff = v - preds[cid]
                preds[cid] = v
                size = _category(diff)
                sink.sym("dc", size)
                if size:
                    sink.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
            elif ss == 0:  # DC refine: one raw bit
                sink.bits((int(blk[0]) >> al) & 1, 1)
            elif ah == 0:
                _enc_ac_first(sink, blk, ss, se, al, state, flush_eob)
            else:
                _enc_ac_refine(sink, blk, ss, se, al, state, flush_eob)
    flush_eob()


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


_GRAY_PROG_SCANS = [
    ((1,), 0, 0, 0, 1),    # DC first, Al=1
    ((1,), 1, 5, 0, 2),    # AC low band first, Al=2
    ((1,), 6, 63, 0, 2),   # AC high band first, Al=2
    ((1,), 1, 63, 2, 1),   # AC refine 2 -> 1
    ((1,), 0, 0, 1, 0),    # DC refine
    ((1,), 1, 63, 1, 0),   # AC refine 1 -> 0
]

_COLOR_PROG_SCANS = [
    ((1, 2, 3), 0, 0, 0, 1),
    ((1,), 1, 63, 0, 2), ((2,), 1, 63, 0, 2), ((3,), 1, 63, 0, 2),
    ((1,), 1, 63, 2, 1), ((2,), 1, 63, 2, 1), ((3,), 1, 63, 2, 1),
    ((1, 2, 3), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0), ((3,), 1, 63, 1, 0),
]


def _encode_jpeg_multi(
    img: np.ndarray,
    quality: int,
    progressive: bool,
    scans=None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        planes = [img]
        samp = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsample:
            cb, cr = _downsample2(cb), _downsample2(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    else:
        raise ValueError("jpeg encode: expected (h,w) or (h,w,3) uint8")
    ncomp = len(planes)
    h, w = img.shape[:2]
    comps = [
        {"id": i + 1, "h": sh_, "v": sv_, "tq": 0 if i == 0 else 1}
        for i, (sh_, sv_) in enumerate(samp)
    ]
    frame = {"h": h, "w": w, "comps": comps, "progressive": progressive}
    _init_geometry(frame)
    q_luma = _scaled_q(_Q_LUMA, quality)
    q_chroma = _scaled_q(_Q_CHROMA, quality)
    store = {}
    for comp, plane in zip(comps, planes):
        q_nat = q_luma if comp["tq"] == 0 else q_chroma
        store[comp["id"]] = _component_coefs(plane, comp["bw"], comp["bh"], q_nat)
    if scans is None:
        if progressive:
            scans = _GRAY_PROG_SCANS if ncomp == 1 else _COLOR_PROG_SCANS
        else:
            # sequential non-interleaved: one full-band scan per comp
            scans = [((c["id"],), 0, 63, 0, 0) for c in comps]
    out = [b"\xff\xd8"]
    out.append(_seg(0xDB, b"\x00" + q_luma[_ZIGZAG].astype(np.uint8).tobytes()))
    if ncomp == 3:
        out.append(_seg(0xDB, b"\x01" + q_chroma[_ZIGZAG].astype(np.uint8).tobytes()))
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]]) for c in comps
    )
    out.append(_seg(0xC2 if progressive else 0xC0, sof))
    if restart_interval:
        out.append(_seg(0xDD, struct.pack(">H", restart_interval)))
    for comp_ids, ss, se, ah, al in scans:
        comps_in = [c for c in comps if c["id"] in comp_ids]
        sink = _TokenSink()
        _encode_scan_tokens(
            sink, frame, store, comps_in, ss, se, ah, al, progressive,
            restart_interval,
        )
        dc_codes: dict = {}
        ac_codes: dict = {}
        if sink.dc_syms:
            counts, values = _uniform_table(sink.dc_syms)
            out.append(_seg(0xC4, bytes([0x00] + counts) + values))
            dc_codes = _canonical_codes(counts, values)
        if sink.ac_syms:
            counts, values = _uniform_table(sink.ac_syms)
            out.append(_seg(0xC4, bytes([0x10] + counts) + values))
            ac_codes = _canonical_codes(counts, values)
        sos = bytes([len(comps_in)]) + b"".join(
            bytes([c["id"], 0x00]) for c in comps_in
        ) + bytes([ss, se, (ah << 4) | al])
        out.append(_seg(0xDA, sos))
        bw_ = _BitWriter()
        _write_tokens(bw_, sink.tokens, dc_codes, ac_codes)
        bw_.flush()
        out.append(bytes(bw_.out))
    out.append(b"\xff\xd9")
    return b"".join(out)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    scans=None,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> progressive (SOF2) JPEG
    with spectral selection + successive approximation (the libjpeg-ish
    default scan script).  The quantized coefficients are IDENTICAL to
    the sequential encoding at the same quality, so a progressive file
    and its baseline twin decode to the same pixels bit-for-bit."""
    return _encode_jpeg_multi(
        img, quality, progressive=True, scans=scans, subsample=subsample,
        restart_interval=restart_interval,
    )


def encode_jpeg_sequential_multiscan(img: np.ndarray, quality: int = 90) -> bytes:
    """Sequential (SOF0) JPEG coded as one NON-INTERLEAVED scan per
    component — the legal multi-scan baseline layout the round-3
    decoder silently mis-decoded (ADVICE r3); now a correctness fixture."""
    return _encode_jpeg_multi(img, quality, progressive=False)
