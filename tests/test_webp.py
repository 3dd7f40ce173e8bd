"""VP8L (WebP lossless) codec: encoder/decoder round trips, spec-path
coverage via hand-crafted bitstreams (LZ77 backward references with
the neighbor distance map, color cache, predictor / color transforms,
meta prefix codes), container sniffing (lossless decodes, lossy is the
named stub), and corrupt-stream typed errors."""

import struct

import numpy as np
import pytest

from rapidocr_ray.functions import webp as W
from rapidocr_ray.functions.codecs import decode_page_image, rgb_to_gray


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# encoder round trips (subtract-green + palette modes)
# ---------------------------------------------------------------------------


def test_gray_roundtrip():
    img = _rng(7).integers(0, 256, (37, 53), dtype=np.uint8)
    rgba = W.decode_webp(W.encode_webp(img))
    for c in range(3):
        assert np.array_equal(rgba[:, :, c], img)
    assert (rgba[:, :, 3] == 255).all()


def test_rgb_and_rgba_roundtrip():
    rgb = _rng(1).integers(0, 256, (11, 17, 3), dtype=np.uint8)
    out = W.decode_webp(W.encode_webp(rgb))
    assert np.array_equal(out[:, :, :3], rgb)
    rgba = _rng(2).integers(0, 256, (9, 5, 4), dtype=np.uint8)
    assert np.array_equal(W.decode_webp(W.encode_webp(rgba)), rgba)


@pytest.mark.parametrize("n_colors,shape", [(2, (20, 41)), (3, (9, 13)), (5, (8, 21)), (16, (6, 33))])
def test_palette_bundle_widths(n_colors, shape):
    """Color-indexing with all three bundling widths (8/4/2 px per
    packed byte) and widths not divisible by the bundle size."""
    rng = _rng(n_colors)
    base = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = base[rng.integers(0, n_colors, shape)]
    out = W.decode_webp(W.encode_webp(img))
    assert np.array_equal(out[:, :, :3], img)


def test_single_pixel_and_single_color():
    out = W.decode_webp(W.encode_webp(np.array([[200]], np.uint8)))
    assert out.shape == (1, 1, 4) and out[0, 0, 0] == 200
    flat = np.full((5, 9), 77, np.uint8)
    out = W.decode_webp(W.encode_webp(flat))
    assert (out[:, :, 1] == 77).all()


def test_decode_page_image_webp_gray():
    from rapidocr_ray.glyphs import render_page

    img = render_page(["webp lossless line"], margin=10)
    got = decode_page_image(W.encode_webp(img))
    assert np.array_equal(got, img)


def test_decode_page_image_webp_alpha_flattens():
    """Alpha flattening must match the reference's cvt_four_to_three
    (color kept where a != 0, white where a == 0)."""
    rgba = np.zeros((1, 2, 4), np.uint8)
    rgba[0, 0] = (200, 100, 50, 255)
    rgba[0, 1] = (200, 100, 50, 0)
    got = decode_page_image(W.encode_webp(rgba))
    assert got[0, 0] == rgb_to_gray(np.array([[[200, 100, 50]]], np.uint8))[0, 0]
    assert got[0, 1] == 255


# ---------------------------------------------------------------------------
# sniff / container behavior
# ---------------------------------------------------------------------------


def test_sniff_lossless_decodes_lossy_stubs():
    from rapidocr_ray.stages.multimodal import decode_image

    lossless = W.encode_webp(np.full((3, 3), 9, np.uint8))
    assert W.is_webp_lossless(lossless)
    assert decode_image(lossless).shape == (3, 3)

    lossy = b"RIFF\x10\x00\x00\x00WEBPVP8 " + b"\x00" * 24
    assert not W.is_webp_lossless(lossy)
    with pytest.raises(NotImplementedError, match="webp-lossy"):
        decode_image(lossy)
    with pytest.raises(NotImplementedError, match="webp-lossy"):
        decode_page_image(lossy)


def test_vp8x_container_walks_to_vp8l():
    """Extended (VP8X) containers carry the image in a later chunk."""
    inner = W.encode_webp(np.full((2, 2), 5, np.uint8))
    vp8l_chunk = inner[12:]  # strip RIFF....WEBP, keep VP8L chunk
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    body = b"WEBP" + vp8x + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert W.is_webp_lossless(data)
    assert W.decode_webp(data)[0, 0, 0] == 5


def test_corrupt_streams_raise_value_error():
    good = W.encode_webp(np.full((4, 4), 3, np.uint8))
    with pytest.raises(ValueError):
        W.decode_webp(good[:20])  # truncated mid-bitstream
    with pytest.raises(ValueError):
        W.decode_vp8l(b"\x00\x00\x00")  # bad signature
    bad_ver = bytearray(good)
    # flip the 3 version bits (byte after the 0x2f sig: bits 29..31
    # of the first dword hold them) — easier: corrupt via vp8l direct
    bw = W._LsbWriter()
    bw.write(0, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(5, 3)  # version != 0
    with pytest.raises(ValueError, match="version"):
        W.decode_vp8l(b"\x2f" + bw.getvalue())
    with pytest.raises((ValueError, NotImplementedError)):
        decode_page_image(b"RIFF\x04\x00\x00\x00WEBP")  # no image chunk


# ---------------------------------------------------------------------------
# hand-crafted bitstreams: paths the fixture encoder never emits
# ---------------------------------------------------------------------------


def _begin_stream(w, h):
    bw = W._LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    return bw


def _finish(bw):
    return b"\x2f" + bw.getvalue()


def test_lz77_backward_reference_and_color_cache():
    """w=4, h=2: two literals, an overlapping length-4 copy at
    distance 2 (emitted via the NEIGHBOR map: plane code (2,0)), then
    two color-cache hits.  Exercises: LZ77 length/distance prefix
    values + extra bits, the distance neighbor map, cache insertion
    on both literal and copied pixels, cache-hit symbols."""
    w, h = 4, 2
    cache_bits = 2
    A = (255 << 24) | (1 << 16) | (10 << 8) | 2   # argb
    B = (255 << 24) | (3 << 16) | (20 << 8) | 4
    idx = lambda px: ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    iA, iB = idx(A), idx(B)
    assert iA != iB  # fixture sanity: distinct cache slots

    bw = _begin_stream(w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix
    # green alphabet: literals 10, 20; length code 256+3 (length 4);
    # cache hits 280+iA, 280+iB
    green_freqs = {10: 1, 20: 1, 256 + 3: 1, 280 + iA: 1, 280 + iB: 1}
    green = W._write_prefix_code(bw, green_freqs, 280 + (1 << cache_bits))
    red = W._write_prefix_code(bw, {1: 1, 3: 1}, 256)
    blue = W._write_prefix_code(bw, {2: 1, 4: 1}, 256)
    alpha = W._write_prefix_code(bw, {255: 1}, 256)
    dist = W._write_prefix_code(bw, {4: 1}, 40)  # prefix code 4 (simple, 0 bits)

    def emit(codes, sym):
        c, n = codes[sym]
        bw.write_code(c, n)

    # P0 = literal A, P1 = literal B
    emit(green, 10); emit(red, 1); emit(blue, 2); emit(alpha, 255)
    emit(green, 20); emit(red, 3); emit(blue, 4); emit(alpha, 255)
    # P2..P5: copy len 4 dist 2 — length symbol 259 (code 3 -> 4, no
    # extra); distance prefix code 4 + 1 extra bit (1) -> value 6 ->
    # neighbor map entry 6 = 0x06 -> (dx=2, dy=0) -> distance 2
    emit(green, 256 + 3)
    emit(dist, 4)
    bw.write(1, 1)  # distance extra bit
    # P6 = cache hit B, P7 = cache hit A
    emit(green, 280 + iB)
    emit(green, 280 + iA)

    rgba = W.decode_vp8l(_finish(bw))
    argb = (
        (rgba[:, :, 3].astype(np.uint32) << 24)
        | (rgba[:, :, 0].astype(np.uint32) << 16)
        | (rgba[:, :, 1].astype(np.uint32) << 8)
        | rgba[:, :, 2].astype(np.uint32)
    ).ravel()
    assert argb.tolist() == [A, B, A, B, A, B, B, A]


def test_lz77_plain_distance():
    """Distances > the 120-entry neighbor window use plain
    dist_code - 120."""
    w, h = 16, 16  # distance 136 > any neighbor mapping at w=16
    lit = 7
    px = (255 << 24) | (lit << 8)
    bw = _begin_stream(w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # fill 136 literals, then copy 120 at distance 136 (code 136+120=256)
    # length 120: value 120 -> code c with offset ranges: c=12 covers
    # 65..96, c=13 covers 97..128: 120 = 96 + extra + 1 -> extra=23 (5 bits)
    green = W._write_prefix_code(bw, {lit: 200, 256 + 13: 1}, 280)
    red = W._write_prefix_code(bw, {0: 1}, 256)
    blue = W._write_prefix_code(bw, {0: 1}, 256)
    alpha = W._write_prefix_code(bw, {255: 1}, 256)
    # distance value 256: c=14 covers 129..192 (offset (2+0)<<6=128):
    # 256 > 192; c=15: offset 3<<6=192 -> 193..256 -> extra = 63 (6 bits)
    dist = W._write_prefix_code(bw, {15: 1}, 40)

    def emit(codes, sym):
        c, n = codes[sym]
        bw.write_code(c, n)

    for _ in range(136):
        emit(green, lit); emit(red, 0); emit(blue, 0); emit(alpha, 255)
    emit(green, 256 + 13)
    bw.write(23, 5)  # length extra -> 120
    emit(dist, 15)
    bw.write(63, 6)  # distance extra -> 256 -> plain distance 136
    rgba = W.decode_vp8l(_finish(bw))
    assert (rgba[:, :, 1] == lit).all() and rgba.shape == (16, 16, 4)


def _forward_predictor(img_argb, bits, modes):
    """Test-side forward predictor: residuals the decoder must invert."""
    h, w = img_argb.shape
    res = np.zeros_like(img_argb)
    sub = lambda a, b: tuple((( (a >> s) & 0xFF) - ((b >> s) & 0xFF)) & 0xFF for s in (24, 16, 8, 0))
    pack = lambda t: (t[0] << 24) | (t[1] << 16) | (t[2] << 8) | t[3]
    for y in range(h):
        for x in range(w):
            cur = int(img_argb[y, x])
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(img_argb[0, x - 1])
            elif x == 0:
                pred = int(img_argb[y - 1, 0])
            else:
                mode = int(modes[y >> bits, x >> bits])
                l = int(img_argb[y, x - 1])
                t = int(img_argb[y - 1, x])
                tl = int(img_argb[y - 1, x - 1])
                tr = int(img_argb[y - 1, x + 1]) if x + 1 < w else int(img_argb[y, 0])
                pred = {
                    0: 0xFF000000,
                    1: l,
                    2: t,
                    3: tr,
                    4: tl,
                    5: W._avg2(W._avg2(l, tr), t),
                    7: W._avg2(l, t),
                    11: W._select(l, t, tl),
                    12: W._clamp_add_subtract_full(l, t, tl),
                    13: W._clamp_add_subtract_half(W._avg2(l, t), tl),
                }[mode]
            res[y, x] = pack(sub(cur, pred))
    return res


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 7, 11, 12, 13])
def test_predictor_transform_modes(mode):
    """Full-bitstream predictor transform: one block covering the
    image, constant-mode sub-image (0-bit channel codes), residual
    literals; the decoder's inverse must reconstruct the original."""
    rng = _rng(mode + 40)
    h, w = 7, 9
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    argb = (
        np.uint32(255) << 24
        | img.astype(np.uint32) << 16
        | img.astype(np.uint32) << 8
        | img.astype(np.uint32)
    )
    bits = 4  # 16-px blocks: one mode cell covers the whole image
    modes = np.full((1, 1), mode, np.int64)
    res = _forward_predictor(argb, bits, modes)

    bw = _begin_stream(w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(bits - 2, 3)
    # sub-image stream (1x1): no cache, codes, single pixel w/ green=mode
    bw.write(0, 1)
    g = W._write_prefix_code(bw, {mode: 1}, 280)
    r = W._write_prefix_code(bw, {0: 1}, 256)
    b = W._write_prefix_code(bw, {0: 1}, 256)
    a = W._write_prefix_code(bw, {255: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 40)
    # all codes are single-symbol -> zero bits per pixel: nothing to emit
    assert g[mode] == (0, 0) and r[0] == (0, 0) and b[0] == (0, 0) and a[255] == (0, 0)
    bw.write(0, 1)  # no more transforms
    # main stream: residual literals
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    ra = (res >> 24).ravel().astype(np.int64)
    rr = ((res >> 16) & 0xFF).ravel().astype(np.int64)
    rg = ((res >> 8) & 0xFF).ravel().astype(np.int64)
    rb = (res & 0xFF).ravel().astype(np.int64)
    W._emit_channel_streams(bw, ra, rr, rg, rb)

    rgba = W.decode_vp8l(_finish(bw))
    assert np.array_equal(rgba[:, :, 1], img), mode


def test_predictor_multi_block_modes():
    """Two horizontal blocks with different modes (1=L, 2=T): the
    inverse must switch predictors at the block boundary."""
    rng = _rng(99)
    h, w = 6, 8
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    argb = np.uint32(255) << 24 | img.astype(np.uint32) << 8
    bits = 2  # 4-px blocks: mode image is 2 wide x 2 tall
    modes = np.array([[1, 2], [2, 1]], np.int64)
    res = _forward_predictor(argb, bits, modes)

    bw = _begin_stream(w, h)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(bits - 2, 3)
    # sub-image 2x2 with greens = modes
    bw.write(0, 1)
    g = W._write_prefix_code(bw, {1: 2, 2: 2}, 280)
    W._write_prefix_code(bw, {0: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 256)
    W._write_prefix_code(bw, {255: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 40)
    for m in modes.ravel():
        c, n = g[int(m)]
        bw.write_code(c, n)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    W._emit_channel_streams(
        bw,
        (res >> 24).ravel().astype(np.int64),
        ((res >> 16) & 0xFF).ravel().astype(np.int64),
        ((res >> 8) & 0xFF).ravel().astype(np.int64),
        (res & 0xFF).ravel().astype(np.int64),
    )
    rgba = W.decode_vp8l(_finish(bw))
    assert np.array_equal(rgba[:, :, 1], img)


def test_color_transform_inverse():
    """Full-bitstream color transform with a constant element: forward
    deltas computed in-test, decoder must invert them exactly."""
    rng = _rng(5)
    h, w = 5, 6
    r = rng.integers(0, 256, (h, w), dtype=np.uint8)
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    b = rng.integers(0, 256, (h, w), dtype=np.uint8)
    g2r, g2b, r2b = 17, -30 & 0xFF, 100  # int8 multipliers as bytes
    s8 = lambda v: v - 256 if v >= 128 else v
    delta = lambda t, c: (s8(t) * c.astype(np.uint8).astype(np.int8).astype(np.int32)) >> 5
    # forward: subtract the deltas; the blue delta uses the ORIGINAL
    # red (the inverse reconstructs red first, then feeds it to blue)
    fr = (r.astype(np.int32) - delta(g2r, g)) & 0xFF
    fb = (b.astype(np.int32) - delta(g2b, g) - delta(r2b, r)) & 0xFF

    bits = 3  # 8-px blocks: 1x1 element image
    bw = _begin_stream(w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(bits - 2, 3)
    # element sub-image: pixel with blue=g2r, green=g2b, red=r2b
    bw.write(0, 1)
    W._write_prefix_code(bw, {g2b: 1}, 280)
    W._write_prefix_code(bw, {r2b: 1}, 256)
    W._write_prefix_code(bw, {g2r: 1}, 256)
    W._write_prefix_code(bw, {255: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 40)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    W._emit_channel_streams(
        bw,
        np.full(h * w, 255, np.int64),
        fr.ravel().astype(np.int64),
        g.ravel().astype(np.int64),
        fb.ravel().astype(np.int64),
    )
    rgba = W.decode_vp8l(_finish(bw))
    assert np.array_equal(rgba[:, :, 0], r)
    assert np.array_equal(rgba[:, :, 1], g)
    assert np.array_equal(rgba[:, :, 2], b)


def test_meta_prefix_groups():
    """Meta prefix codes: two huffman groups selected by the entropy
    image (blocks of 4 px); each group fixes a different constant
    pixel, so the output shows which group decoded each block."""
    w, h = 8, 4
    meta_bits = 2
    bw = _begin_stream(w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix present
    bw.write(meta_bits - 2, 3)
    # entropy image 2x1: meta indices 0, 1 in (r<<8)|g -> g channel
    bw.write(0, 1)  # entropy stream: no cache
    mg = W._write_prefix_code(bw, {0: 1, 1: 1}, 280)
    W._write_prefix_code(bw, {0: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 256)
    W._write_prefix_code(bw, {255: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 40)
    for m in (0, 1):
        c, n = mg[m]
        bw.write_code(c, n)
    # group 0: constant green 50; group 1: constant green 200 (all
    # single-symbol codes: zero data bits)
    for green_val in (50, 200):
        W._write_prefix_code(bw, {green_val: 1}, 280)
        W._write_prefix_code(bw, {0: 1}, 256)
        W._write_prefix_code(bw, {0: 1}, 256)
        W._write_prefix_code(bw, {255: 1}, 256)
        W._write_prefix_code(bw, {0: 1}, 40)
    rgba = W.decode_vp8l(_finish(bw))
    assert (rgba[:, :4, 1] == 50).all()
    assert (rgba[:, 4:, 1] == 200).all()


def test_malformed_streams_typed_errors():
    # cache symbol without a color cache
    bw = _begin_stream(2, 1)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    g = W._write_prefix_code(bw, {281: 1, 5: 1}, 284)
    with pytest.raises(ValueError):
        W.decode_vp8l(_finish(bw))  # green alphabet larger than declared cache
    # backward reference before any pixel
    bw = _begin_stream(4, 1)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    g = W._write_prefix_code(bw, {256: 1, 1: 1}, 280)
    W._write_prefix_code(bw, {0: 1}, 256)
    W._write_prefix_code(bw, {0: 1}, 256)
    W._write_prefix_code(bw, {255: 1}, 256)
    W._write_prefix_code(bw, {4: 1}, 40)
    c, n = g[256]
    bw.write_code(c, n)  # copy as the FIRST symbol: distance > pos
    bw.write(1, 1)
    with pytest.raises(ValueError):
        W.decode_vp8l(_finish(bw))


def test_extraction_e2e_webp_byte_identical():
    """The flagship contract: a glyph page routed through the webp
    container extracts byte-identically to the RBMP original."""
    import pyarrow as pa

    from rapidocr_ray.glyphs import encode_rbmp, render_page
    from rapidocr_ray.pipelines.extract import extract_pages_table

    img = render_page(["webp lossless e2e"], margin=12)
    now = 1_700_000_000_000_000
    pages = pa.table(
        {
            "url": ["https://t/rbmp", "https://t/webpl"],
            "warc_ts": pa.array([now, now], type=pa.timestamp("us")),
            "html": [encode_rbmp(img), W.encode_webp(img)],
            "text": [None, None],
            "lang": ["en", "en"],
        }
    )
    out = extract_pages_table(pages, dedup=False).to_pandas().set_index("url")
    assert out.loc["https://t/webpl", "route"] == "bitmap"
    assert (
        out.loc["https://t/webpl", "extracted_text"]
        == out.loc["https://t/rbmp", "extracted_text"]
    )
    assert out.loc["https://t/rbmp", "extracted_text"] == "webp lossless e2e"


def test_animated_container_named_stub():
    """ANIM/ANMF-only containers (animated WebP) must raise the NAMED
    typed stub, not a 'corrupt' ValueError, through every entry point."""
    anim = b"ANIM" + struct.pack("<I", 6) + bytes(6)
    body = b"WEBP" + b"VP8X" + struct.pack("<I", 10) + bytes(10) + anim
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="animated|webp"):
        W.decode_webp(data)
    with pytest.raises(NotImplementedError, match="animated|webp"):
        decode_page_image(data)
    from rapidocr_ray.stages.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="animated|webp"):
        decode_image(data)


def test_oversized_dims_typed_error():
    """A ~30-byte payload declaring 16383x16383 must be rejected BEFORE
    gigabyte buffer allocation (typed ValueError, not MemoryError)."""
    bw = W._LsbWriter()
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    payload = b"\x2f" + bw.getvalue()
    with pytest.raises(ValueError, match="decode cap"):
        W.decode_vp8l(payload)
