"""Pure-numpy PNG/GIF/BMP codecs: round-trips, per-filter PNG decode,
alpha/palette semantics, and parity with the reference's gray/alpha
rules (utils.py:93-152)."""

import struct
import zlib

import numpy as np
import pytest

from rapidocr_ray.functions import codecs as C


def _rand_img(h=23, w=31, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_gray_roundtrip():
    img = _rand_img()
    assert np.array_equal(C.decode_png(C.encode_png(img)), img)


def test_png_rgb_roundtrip_gray_formula():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    out = C.decode_png(C.encode_png(rgb))
    assert np.array_equal(out, C.rgb_to_gray(rgb))


def test_png_rgba_flattens_like_reference():
    """cvt_four_to_three (utils.py:133-145): keep color where a != 0,
    zero elsewhere, saturated add of (255 - a)."""
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[0, 0] = (200, 100, 50, 255)   # opaque: color kept, +0
    rgba[0, 1] = (200, 100, 50, 0)     # transparent: white
    rgba[1, 0] = (200, 100, 50, 128)   # partial: color + 127, saturated
    rgba[1, 1] = (10, 20, 30, 1)       # a!=0: kept, +254 saturates
    out = C.decode_png(C.encode_png(rgba))
    expect_rgb = np.array(
        [
            [[200, 100, 50], [255, 255, 255]],
            [[255, 227, 177], [255, 255, 255]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(out, C.rgb_to_gray(expect_rgb))


def _encode_png_filtered(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-filterer: encode each row with the given filter type so the
    decoder's Sub/Up/Average/Paeth paths are all exercised."""
    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        row = img[y].astype(np.int32)
        raw.append(f)
        for x in range(w):
            left = int(row[x - 1]) if x >= 1 else 0
            up = int(prev[x])
            ul = int(prev[x - 1]) if x >= 1 else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - left
            elif f == 2:
                v = row[x] - up
            elif f == 3:
                v = row[x] - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                v = row[x] - pred
            raw.append(v & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types(filters):
    img = _rand_img(17, 13, seed=sum(filters) + 7)
    assert np.array_equal(C.decode_png(_encode_png_filtered(img, filters)), img)


def test_png_palette():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    data = (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"PLTE", pal.tobytes())
        + C._png_chunk(b"IDAT", zlib.compress(raw))
        + C._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(data), C.rgb_to_gray(pal[idx]))


def _encode_png_adam7_gray(img: np.ndarray) -> bytes:
    """Interlaced grayscale-8 writer (filter 0 rows per pass)."""
    h, w = img.shape
    raw = bytearray()
    for x0, y0, dx, dy in C._ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw.extend(row.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    return (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._png_chunk(b"IEND", b"")
    )


def test_png_adam7_interlaced():
    for shape in ((13, 11), (8, 8), (3, 17)):
        img = _rand_img(*shape, seed=shape[0] * 31 + shape[1])
        assert np.array_equal(C.decode_png(_encode_png_adam7_gray(img)), img)


def _encode_png_lowdepth_gray(vals: np.ndarray, depth: int) -> bytes:
    """Gray 1/2/4-bit writer (filter 0): vals holds RAW sample codes."""
    h, w = vals.shape
    raw = bytearray()
    for y in range(h):
        bits = np.zeros(w * depth, dtype=np.uint8)
        for i, v in enumerate(vals[y]):
            for b in range(depth):
                bits[i * depth + b] = (int(v) >> (depth - 1 - b)) & 1
        raw.append(0)
        raw.extend(np.packbits(bits).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    return (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_low_bit_depth_gray(depth):
    rng = np.random.default_rng(depth)
    vals = rng.integers(0, 1 << depth, (7, 11), dtype=np.uint8)
    out = C.decode_png(_encode_png_lowdepth_gray(vals, depth))
    scale = 255 // ((1 << depth) - 1)
    assert np.array_equal(out, (vals * scale).astype(np.uint8))


def test_png_16bit_gray_high_byte():
    rng = np.random.default_rng(16)
    img16 = rng.integers(0, 1 << 16, (5, 9), dtype=np.uint16)
    raw = bytearray()
    for y in range(5):
        raw.append(0)
        raw.extend(img16[y].astype(">u2").tobytes())
    ihdr = struct.pack(">IIBBBBB", 9, 5, 16, 0, 0, 0, 0)
    data = (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(data), (img16 >> 8).astype(np.uint8))


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_roundtrip():
    img = _rand_img(11, 19, seed=3)
    assert np.array_equal(C.decode_gif(C.encode_gif(img)), img)


def test_gif_lzw_width_growth_and_reset():
    """Round-trips that force the LZW code width through 9→10→11→12
    bits and a full-table clear/reset: random 8-bit pixels add ~one
    table entry per pixel, so 80x80 crosses every width boundary and
    the 4096-entry reset."""
    for shape, seed in (((30, 20), 11), ((80, 80), 12)):
        img = _rand_img(*shape, seed=seed)
        assert np.array_equal(C.decode_gif(C.encode_gif(img)), img)


def test_gif_repetitive_content_compresses():
    """Highly repetitive rows make long table entries (real LZW gain)
    and still round-trip."""
    img = np.tile(np.arange(16, dtype=np.uint8).repeat(4), (32, 2))
    data = C.encode_gif(img)
    assert len(data) < img.size  # actually compresses
    assert np.array_equal(C.decode_gif(data), img)


def test_gif_transparent_index_renders_white():
    img = np.array([[0, 7], [7, 0]], dtype=np.uint8)
    data = bytearray(C.encode_gif(img))
    # splice in a GCE marking index 7 transparent, before the image
    # descriptor (0x2C)
    i = data.index(0x2C, 13 + 768)
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x07, 0x00])
    data[i:i] = gce
    out = C.decode_gif(bytes(data))
    assert out[0, 0] == 0 and out[1, 1] == 0
    assert out[0, 1] == 255 and out[1, 0] == 255


def test_gif_interlaced():
    img = _rand_img(13, 5, seed=9)
    data = bytearray(C.encode_gif(img))
    i = data.index(0x2C, 13 + 768)
    # set the interlace flag and reorder rows into pass order
    data[i + 9] |= 0x40
    order = np.concatenate(
        [np.arange(0, 13, 8), np.arange(4, 13, 8), np.arange(2, 13, 4), np.arange(1, 13, 2)]
    )
    reordered = img[order]
    rebuilt = bytearray(C.encode_gif(reordered))
    j = rebuilt.index(0x2C, 13 + 768)
    rebuilt[j + 9] |= 0x40
    assert np.array_equal(C.decode_gif(bytes(rebuilt)), img)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_8bit():
    img = _rand_img(10, 6, seed=4)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)


def test_bmp_24bit_bottom_up_and_top_down():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    h, w = 4, 3
    stride = (w * 3 + 3) & ~3
    for top_down in (False, True):
        rows = np.zeros((h, stride), dtype=np.uint8)
        src = rgb if top_down else rgb[::-1]
        rows[:, : w * 3] = src[:, :, [2, 1, 0]].reshape(h, w * 3)  # BGR on disk
        data_off = 14 + 40
        head = b"BM" + struct.pack("<IHHI", data_off + rows.size, 0, 0, data_off)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, rows.size, 0, 0, 0, 0
        )
        out = C.decode_bmp(head + dib + rows.tobytes())
        assert np.array_equal(out, C.rgb_to_gray(rgb))


def test_bmp_compressed_raises_typed():
    # BI_JPEG (4) stays a named stub; RLE8 (1) and BITFIELDS (3)
    # decode since r5
    head = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 4, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="compression"):
        C.decode_bmp(head + dib)
    # BITFIELDS paired with 24-bit pixels is structurally invalid
    dib_bf24 = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 3, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="BI_BITFIELDS requires 16/32"):
        C.decode_bmp(head + dib_bf24 + b"\x00" * 24)
    # RLE8 paired with non-8-bit pixels is structurally invalid
    dib_rle24 = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 1, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="RLE8 requires 8-bit"):
        C.decode_bmp(head + dib_rle24)
    # RLE4 paired with non-4-bit pixels is structurally invalid
    dib_rle4_8 = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 2, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="RLE4 requires 4-bit"):
        C.decode_bmp(head + dib_rle4_8)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def test_decode_page_image_dispatch():
    from rapidocr_ray.glyphs import encode_rbmp

    img = _rand_img(8, 8, seed=6)
    for payload in (encode_rbmp(img), C.encode_png(img), C.encode_gif(img), C.encode_bmp(img)):
        assert np.array_equal(C.decode_page_image(payload), img)
    with pytest.raises(ValueError, match="jpeg"):
        C.decode_page_image(b"\xff\xd8\xff\xe0junk")  # truncated stream
    with pytest.raises(ValueError):
        C.decode_page_image(b"not an image")


# ---------------------------------------------------------------------------
# JPEG (functions/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_quality100_near_lossless():
    from rapidocr_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _rand_img(40, 56, seed=21)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_constant_block_exact():
    from rapidocr_ray.functions.jpeg import decode_jpeg, encode_jpeg

    for v in (0, 64, 130, 255):
        img = np.full((24, 17), v, dtype=np.uint8)  # non-multiple-of-8 dims
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=90)), img)


def test_jpeg_glyph_page_binarizes_identically():
    """Ink/background separation survives q95 quantization — the
    property the det/rec cascade depends on."""
    from rapidocr_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from rapidocr_ray.glyphs import render_page

    page = render_page(["the quick brown fox"], margin=12)
    out = decode_jpeg(encode_jpeg(page, quality=95))
    assert ((out > 127) == (page > 127)).all()


def test_jpeg_restart_intervals():
    """DRI/RSTn handling: splice a restart interval into the encoded
    stream by re-encoding with the encoder forced through the interval
    path is not available (encoder emits none), so instead decode must
    reject garbage after SOS cleanly."""
    from rapidocr_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _rand_img(16, 16, seed=3)
    data = bytearray(encode_jpeg(img, quality=80))
    data[-10] ^= 0xFF  # corrupt entropy data
    try:
        out = decode_jpeg(bytes(data))
        assert out.shape == img.shape  # decoded with visible corruption
    except ValueError:
        pass  # typed rejection is equally acceptable


def test_jpeg_arithmetic_rejected_typed():
    from rapidocr_ray.functions.jpeg import decode_jpeg

    # SOF9 (extended sequential, arithmetic coding) stays a typed error
    sof9 = b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11) + bytes(9) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="0xc9"):
        decode_jpeg(sof9)


def test_jpeg_progressive_bit_identical_to_baseline_twin():
    """A progressive (SOF2) encoding carries the SAME quantized
    coefficients as the sequential encoding at the same quality, so the
    two must decode to identical pixels — spectral selection,
    successive approximation, and refinement scans all exact."""
    from rapidocr_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(99)
    g = rng.integers(0, 256, (120, 97), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g, quality=90))
    assert np.array_equal(base, decode_jpeg(encode_jpeg_progressive(g, quality=90)))
    # restart markers inside progressive scans (DC + AC + refinement)
    assert np.array_equal(
        base, decode_jpeg(encode_jpeg_progressive(g, quality=90, restart_interval=3))
    )


def test_jpeg_progressive_color_and_subsampled():
    from rapidocr_ray.functions.jpeg import (
        _encode_jpeg_multi,
        decode_jpeg,
        encode_jpeg_progressive,
        encode_jpeg_sequential_multiscan,
    )

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    seq = decode_jpeg(encode_jpeg_sequential_multiscan(rgb, quality=85))
    assert np.array_equal(seq, decode_jpeg(encode_jpeg_progressive(rgb, quality=85)))
    # 4:2:0 subsampling: the non-interleaved scan grid (sw x sh) is
    # smaller than the MCU grid (bw x bh) for Y — the ns=1 geometry the
    # round-3 decoder got wrong (ADVICE r3)
    rgb2 = rng.integers(0, 256, (50, 100, 3), dtype=np.uint8)
    seq_sub = decode_jpeg(_encode_jpeg_multi(rgb2, 85, progressive=False, subsample=True))
    assert np.array_equal(
        seq_sub, decode_jpeg(encode_jpeg_progressive(rgb2, quality=85, subsample=True))
    )
    assert np.array_equal(
        seq_sub,
        decode_jpeg(
            encode_jpeg_progressive(rgb2, quality=85, subsample=True, restart_interval=2)
        ),
    )


def test_jpeg_sequential_multiscan_requires_all_components():
    """A sequential file whose scans do not cover every frame component
    is a typed ValueError, not a silent partial decode (ADVICE r3)."""
    from rapidocr_ray.functions.jpeg import decode_jpeg, encode_jpeg_sequential_multiscan

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = encode_jpeg_sequential_multiscan(rgb, quality=85)
    # truncate after the SECOND scan's entropy data: find the 3rd SOS
    sos_positions = []
    i = 2
    while i + 1 < len(data):
        if data[i] == 0xFF and data[i + 1] == 0xDA:
            sos_positions.append(i)
        i += 1
    assert len(sos_positions) == 3
    # cut at the 3rd scan's first DHT (entropy data byte-stuffs FF, so
    # a raw FF C4 after scan 2's SOS can only be scan 3's table marker)
    cut = data.index(b"\xff\xc4", sos_positions[1])
    truncated = data[:cut] + b"\xff\xd9"
    with pytest.raises(ValueError, match="never coded"):
        decode_jpeg(truncated)


def test_jpeg_progressive_q100_smooth_lossless():
    from rapidocr_ray.functions.jpeg import decode_jpeg, encode_jpeg_progressive

    smooth = np.tile(np.linspace(40, 200, 64).astype(np.uint8), (64, 1))
    out = decode_jpeg(encode_jpeg_progressive(smooth, quality=100))
    assert np.array_equal(out, smooth)


def _build_color_jpeg(v_y, v_cb, v_cr, w, h, subsample=False):
    """Hand-assemble a 3-component constant-color baseline JPEG with
    all-ones quant (DC-only blocks), optionally 4:2:0 subsampled."""
    from rapidocr_ray.functions import jpeg as J

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    q = bytes([1] * 64)
    dc_codes = J._canonical_codes(J._DC_COUNTS, J._DC_VALUES)
    ac_codes = J._canonical_codes(J._AC_COUNTS, J._AC_VALUES)
    bw = J._BitWriter()

    def write_block(dc_diff):
        size = J._category(dc_diff)
        length, code = dc_codes[size]
        bw.write(length, code)
        if size:
            bw.write(size, dc_diff if dc_diff >= 0 else dc_diff + (1 << size) - 1)
        length, code = ac_codes[0x00]  # EOB
        bw.write(length, code)

    hv_y = 0x22 if subsample else 0x11
    mcus_x = -(-w // (16 if subsample else 8))
    mcus_y = -(-h // (16 if subsample else 8))
    preds = {1: 0, 2: 0, 3: 0}
    vals = {1: v_y, 2: v_cb, 3: v_cr}
    for _ in range(mcus_x * mcus_y):
        for cid, nblocks in ((1, 4 if subsample else 1), (2, 1), (3, 1)):
            dc = int(round(8 * (vals[cid] - 128)))
            for _b in range(nblocks):
                write_block(dc - preds[cid])
                preds[cid] = dc
    bw.flush()
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, hv_y, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + q)
        + seg(0xC0, sof)
        + seg(0xC4, bytes([0x00] + J._DC_COUNTS) + J._DC_VALUES)
        + seg(0xC4, bytes([0x10] + J._AC_COUNTS) + J._AC_VALUES)
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def test_jpeg_ycbcr_color_decode():
    from rapidocr_ray.functions.jpeg import decode_jpeg

    out = decode_jpeg(_build_color_jpeg(90, 128, 128, w=8, h=8))
    assert out.shape == (8, 8)
    assert np.array_equal(out, np.full((8, 8), 90, dtype=np.uint8))
    # a chroma-shifted constant: YCbCr(128, 100, 160) -> some gray value
    out2 = decode_jpeg(_build_color_jpeg(128, 100, 160, w=8, h=8))
    assert (out2 == out2[0, 0]).all()


def test_jpeg_420_subsampling():
    from rapidocr_ray.functions.jpeg import decode_jpeg

    out = decode_jpeg(_build_color_jpeg(200, 128, 128, w=16, h=16, subsample=True))
    assert out.shape == (16, 16)
    assert np.array_equal(out, np.full((16, 16), 200, dtype=np.uint8))


def test_truncated_containers_raise_value_error():
    """Corrupt/truncated payloads that pass the magic sniff must raise
    ValueError (the typed-error-row contract), never raw
    struct.error/IndexError/zlib.error."""
    from rapidocr_ray.functions.codecs import decode_wav

    bad = (
        b"GIF89a\x01",                      # truncated GIF header
        b"BM",                              # 2-byte BMP
        b"BM" + bytes(52),                  # zeroed DIB
        C.PNG_MAGIC + b"\x00\x00\x00\x04IDATxxxx",  # PNG, garbage chunk
        b"\xff\xd8\xff\xe0bad",             # truncated JPEG
    )
    for payload in bad:
        with pytest.raises((ValueError, NotImplementedError)):
            C.decode_page_image(payload)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(
            b"RIFF\x10\x00\x00\x00WAVE" + b"fmt " + b"\x02\x00\x00\x00" + b"\x01\x00"
        )  # 2-byte fmt chunk


def test_tiff_lzw_stream_roundtrip_across_width_boundaries():
    """TIFF 6.0 LZW with EarlyChange: round-trips across every code
    width bump (511/1023/2047) and through table-full clears, on
    low-entropy, high-entropy, run and periodic inputs."""
    import numpy as np

    from rapidocr_ray.functions.codecs import _tiff_lzw_decode, _tiff_lzw_encode

    rng = np.random.RandomState(0)
    cases = [bytes(rng.randint(0, 8, n, dtype=np.uint8)) for n in (10, 700, 6000, 70000)]
    cases += [bytes(rng.randint(0, 256, n, dtype=np.uint8)) for n in (5000, 50000)]
    cases += [b"A" * 10000, bytes(range(256)) * 100, b"ab" * 5000, b""]
    for data in cases:
        got = bytes(_tiff_lzw_decode(_tiff_lzw_encode(data), len(data)))
        assert got == data


def test_tiff_lzw_deflate_predictor_decode_paths():
    """LZW (5) and Deflate (8) strips with and without the horizontal
    predictor decode to the same pixels as the uncompressed writer;
    the predictor genuinely shrinks smooth gradients; truncated and
    corrupt streams raise typed ValueError."""
    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(1)
    for shape in [(100, 77), (65, 130, 3)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        want = codecs.decode_tiff(codecs.encode_tiff(img, "none"))
        for comp in ("lzw", "deflate"):
            for pred in (1, 2):
                out = codecs.decode_tiff(codecs.encode_tiff(img, comp, predictor=pred))
                assert np.array_equal(out, want), (shape, comp, pred)
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 4))
    assert len(codecs.encode_tiff(grad, "lzw", predictor=2)) < len(
        codecs.encode_tiff(grad, "lzw", predictor=1)
    )
    good = codecs.encode_tiff(grad, "lzw")
    with pytest.raises(ValueError):  # truncated IFD stays typed
        codecs.decode_tiff(good[:-40])
    with pytest.raises(ValueError, match="LZW"):  # truncated LZW strip
        from rapidocr_ray.functions.codecs import _tiff_lzw_decode, _tiff_lzw_encode

        _tiff_lzw_decode(_tiff_lzw_encode(b"hello world" * 50)[:-20], 550)
    defl = bytearray(codecs.encode_tiff(grad, "deflate"))
    defl[20] ^= 0xFF  # corrupt a strip byte
    with pytest.raises(ValueError):
        codecs.decode_tiff(bytes(defl))


def test_bmp_rle8_roundtrip_and_errors():
    """BI_RLE8: encoded runs, absolute runs (word-aligned), EOL/EOB
    escapes round-trip exactly; glyph pages extract through the image
    path; overflowing runs and missing EOB are typed ValueErrors."""
    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs
    from rapidocr_ray.glyphs import render_page

    rng = np.random.RandomState(2)
    imgs = [
        rng.randint(0, 256, (40, 61), dtype=np.uint8),  # absolute-heavy
        np.repeat(rng.randint(0, 4, (30, 16), dtype=np.uint8), 4, axis=1),  # runs
        render_page(["rle bmp line"], margin=6),
    ]
    for img in imgs:
        out = codecs.decode_bmp(codecs.encode_bmp_rle8(img))
        assert np.array_equal(out, img)
    with pytest.raises(ValueError, match="overflows"):
        codecs._bmp_rle8_decode(b"\x05\x01", 3, 3)
    with pytest.raises(ValueError, match="end-of-bitmap"):
        codecs._bmp_rle8_decode(b"\x01\x01", 3, 3)
    with pytest.raises(ValueError, match="delta"):
        codecs._bmp_rle8_decode(b"\x00\x02", 3, 3)
    # BI_RLE4 (comp 2) on an 8-bit DIB is structurally invalid
    rle = bytearray(codecs.encode_bmp_rle8(imgs[0]))
    import struct as _s

    _s.pack_into("<I", rle, 30, 2)
    with pytest.raises(ValueError, match="RLE4 requires 4-bit"):
        codecs.decode_bmp(bytes(rle))


def test_tiff_tiled_roundtrip():
    """Tiled layout (tags 322-325, decodes since this round): every
    compression the strip path supports, gray + RGB, edge tiles padded
    and cropped, predictor-2 per tile row, non-multiple-of-tile sizes."""
    import numpy as np

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (37, 53), dtype=np.uint8)  # not tile-aligned
    rgb = rng.randint(0, 256, (20, 29, 3), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw", "deflate"):
        out = codecs.decode_tiff(codecs.encode_tiff_tiled(gray, (16, 16), comp))
        assert np.array_equal(out, gray), comp
    out = codecs.decode_tiff(codecs.encode_tiff_tiled(rgb, (16, 16), "lzw"))
    assert np.array_equal(out, codecs.rgb_to_gray(rgb))
    # predictor 2 applies within each tile independently
    out = codecs.decode_tiff(
        codecs.encode_tiff_tiled(gray, (16, 16), "deflate", predictor=2)
    )
    assert np.array_equal(out, gray)
    # exact-multiple grid and a single tile covering everything
    sq = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    assert np.array_equal(
        codecs.decode_tiff(codecs.encode_tiff_tiled(sq, (16, 16), "none")), sq
    )
    assert np.array_equal(
        codecs.decode_tiff(codecs.encode_tiff_tiled(sq, (64, 64), "none")), sq
    )


def test_tiff_tiled_typed_errors():
    import struct as _s

    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs

    img = np.zeros((20, 20), dtype=np.uint8)
    good = bytearray(codecs.encode_tiff_tiled(img, (16, 16), "none"))
    # truncating the file makes a tile extend past EOF
    with pytest.raises(ValueError):
        codecs.decode_tiff(bytes(good[:100]))
    # planar configuration 2 is the named stub
    blob = bytes(good)
    # append a PlanarConfiguration=2 tag by rewriting: easier to build
    # a fresh IFD is overkill — instead patch tag 277 (spp, short) to
    # tag 284 value 2 in a copy that has spp=1 anyway
    idx = blob.find(_s.pack("<HHI", 277, 3, 1))
    assert idx > 0
    patched = (
        blob[:idx] + _s.pack("<HHI", 284, 3, 1) + _s.pack("<I", 2)
        + blob[idx + 12:]
    )
    with pytest.raises(NotImplementedError, match="planar"):
        codecs.decode_tiff(patched)


def test_tiff_planar_configuration_2():
    """Planar-separate RGB strips (all R, then G, then B — tag 284=2)
    assemble correctly; before this round the chunky path would have
    silently mis-decoded them. Predictor-2 applies per plane."""
    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(6)
    rgb = rng.randint(0, 256, (70, 23, 3), dtype=np.uint8)  # 2 strips/plane
    for comp in ("none", "packbits", "deflate"):
        out = codecs.decode_tiff(codecs.encode_tiff(rgb, comp, planar=2))
        assert np.array_equal(out, codecs.rgb_to_gray(rgb)), comp
    out = codecs.decode_tiff(codecs.encode_tiff(rgb, "lzw", predictor=2, planar=2))
    assert np.array_equal(out, codecs.rgb_to_gray(rgb))
    # missing plane strips -> typed error
    import struct as _s

    blob = bytearray(codecs.encode_tiff(rgb, "none", planar=2))
    (ifd_off,) = _s.unpack_from("<I", blob, 4)
    (n,) = _s.unpack_from("<H", blob, ifd_off)
    for e in range(n):
        base = ifd_off + 2 + 12 * e
        (tag,) = _s.unpack_from("<H", blob, base)
        if tag in (273, 279):  # claim only 2 strips exist
            _s.pack_into("<I", blob, base + 4, 2)
    with pytest.raises(ValueError, match="planar strips"):
        codecs.decode_tiff(bytes(blob))


def test_tiff_16bit_samples():
    """16-bit gray and RGB strips (and tiles via direct helper) reduce
    to the high byte; big-endian rows honored by the helper; predictor-2
    on 16-bit and 16-bit palette stay named stubs."""
    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(4)
    g16 = rng.randint(0, 65536, (21, 33), dtype=np.uint16)
    for comp in ("none", "lzw", "deflate", "packbits"):
        out = codecs.decode_tiff(codecs.encode_tiff(g16, comp))
        assert np.array_equal(out, (g16 >> 8).astype(np.uint8)), comp
    rgb16 = rng.randint(0, 65536, (9, 14, 3), dtype=np.uint16)
    out = codecs.decode_tiff(codecs.encode_tiff(rgb16, "deflate"))
    assert np.array_equal(out, codecs.rgb_to_gray((rgb16 >> 8).astype(np.uint8)))
    # big-endian sample order via the helper directly
    rows = np.array([[0x12, 0x34, 0xAB, 0xCD]], dtype=np.uint8)
    be = codecs._tiff_u16_to_u8(rows, 2, 1, ">")
    assert be.ravel().tolist() == [0x12, 0xAB]
    le = codecs._tiff_u16_to_u8(rows, 2, 1, "<")
    assert le.ravel().tolist() == [0x34, 0xCD]
    # named stubs
    with pytest.raises(ValueError, match="predictor 2 needs 8-bit"):
        codecs.encode_tiff(g16, "lzw", predictor=2)
    blob = bytearray(codecs.encode_tiff(g16, "none"))
    import struct as _s

    idx = bytes(blob).find(_s.pack("<HHI", 262, 3, 1))  # photometric tag
    _s.pack_into("<H", blob, idx + 8, 3)  # palette
    with pytest.raises(NotImplementedError, match="16-bit palette"):
        codecs.decode_tiff(bytes(blob))


def test_tiff_jpeg_compression7():
    """JPEG-in-TIFF (compression 7, decodes since this round): strip
    and tile layouts, with and without a shared JPEGTables blob.
    8x8-block-constant images round-trip bit-exactly at q=100 (the
    same invariant the MJPG/AVI tests pin), so the expected output is
    the input itself — no circular decode."""
    import struct as _s

    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(8)
    img = np.repeat(np.repeat(rng.randint(0, 256, (5, 6), dtype=np.uint8), 8, 0), 8, 1)
    # 40x48, strip height 16 and tile 16x16 both 8-aligned
    for kw in (
        {"rows_per_strip": 16},
        {"rows_per_strip": 16, "shared_tables": True},
        {"tile": (16, 16)},
        {"tile": (16, 16), "shared_tables": True},
    ):
        blob = codecs.encode_tiff_jpeg(img, quality=100, **kw)
        assert np.array_equal(codecs.decode_tiff(blob), img), kw
    # non-aligned size: edge strips/tiles crop back
    odd = np.repeat(np.repeat(rng.randint(0, 256, (4, 5), dtype=np.uint8), 8, 0), 8, 1)[
        :29, :37
    ]
    blob = codecs.encode_tiff_jpeg(odd, rows_per_strip=16, shared_tables=True, quality=100)
    assert np.array_equal(codecs.decode_tiff(blob), odd)
    blob = codecs.encode_tiff_jpeg(odd, tile=(16, 16), quality=100)
    assert np.array_equal(codecs.decode_tiff(blob), odd)
    # typed errors: chunk without SOI; malformed JPEGTables
    broken = bytearray(codecs.encode_tiff_jpeg(img, rows_per_strip=16, quality=100))
    broken[8] = 0x00  # first chunk starts at offset 8; kill its SOI
    with pytest.raises(ValueError, match="without SOI"):
        codecs.decode_tiff(bytes(broken))
    shared = bytearray(codecs.encode_tiff_jpeg(img, rows_per_strip=16, shared_tables=True))
    # find the JPEGTables blob (starts with SOI right after chunk data)
    tb_idx = shared.rfind(b"\xff\xd8")
    assert tb_idx > 8
    shared[tb_idx] = 0x00
    with pytest.raises(ValueError, match="JPEGTables"):
        codecs.decode_tiff(bytes(shared))


def test_bmp_rle4_roundtrip_and_errors():
    """BI_RLE4 (decodes since this round): same-nibble encoded runs,
    pairwise literal runs, handcrafted absolute mode with word
    padding, delta skips; overflow/truncation are typed ValueErrors."""
    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(5)
    cases = [
        rng.randint(0, 16, (13, 21), dtype=np.uint8),  # literal-heavy, odd w
        np.repeat(rng.randint(0, 16, (9, 7), dtype=np.uint8), 5, axis=1),  # runs
        np.zeros((3, 1), dtype=np.uint8),
    ]
    for idx in cases:
        out = codecs.decode_bmp(codecs.encode_bmp_rle4(idx))
        assert np.array_equal(out, idx * 17)  # 16-step grayscale palette
    # handcrafted stream: alternating run, absolute mode (5 nibbles ->
    # 3 bytes + 1 pad), delta (skipped pixels stay index 0), EOL, EOB
    stream = bytes(
        [5, 0x12]          # 1,2,1,2,1
        + [0, 5, 0x34, 0x56, 0x70, 0x00]  # abs 3,4,5,6,7 + word pad
        + [0, 2, 2, 1]     # delta dx=2 dy=1 -> (x=12, y=1), row end
        + [0, 0]           # EOL -> row 2
        + [2, 0x99]        # 9,9 on row 2
        + [0, 1]           # EOB
    )
    rows = codecs._bmp_rle4_decode(stream, 12, 3)
    assert rows[0].tolist() == [1, 2, 1, 2, 1, 3, 4, 5, 6, 7, 0, 0]
    assert rows[1].tolist() == [0] * 12  # delta skipped this row entirely
    assert rows[2].tolist() == [9, 9] + [0] * 10
    with pytest.raises(ValueError, match="overflows"):
        codecs._bmp_rle4_decode(bytes([9, 0x11]), 4, 2)
    with pytest.raises(ValueError, match="end-of-bitmap"):
        codecs._bmp_rle4_decode(bytes([2, 0x11]), 4, 2)
    with pytest.raises(ValueError, match="truncated RLE4 absolute"):
        codecs._bmp_rle4_decode(bytes([0, 7, 0x12]), 8, 2)
    with pytest.raises(ValueError, match="indices must be 0..15"):
        codecs.encode_bmp_rle4(np.full((2, 2), 16, dtype=np.uint8))


def test_bmp_packed_subbyte_roundtrip():
    """Uncompressed 1- and 4-bit packed DIBs, odd widths crossing the
    old stride formula's truncation (33px 1-bit needs 5 bytes, the
    w*bpp//8 form allotted 4)."""
    import numpy as np

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(11)
    for w in (1, 7, 8, 9, 33, 64):
        bits = rng.randint(0, 2, (6, w), dtype=np.uint8)
        out = codecs.decode_bmp(codecs.encode_bmp_packed(bits, 1))
        assert np.array_equal(out, bits * 255), w
        nibs = rng.randint(0, 16, (5, w), dtype=np.uint8)
        out4 = codecs.decode_bmp(codecs.encode_bmp_packed(nibs, 4))
        assert np.array_equal(out4, nibs * 17), w


def test_r5_decoders_typed_error_fuzz():
    """Crawl-robustness contract for every round-5 decoder: random
    truncations and byte corruptions of valid files must either decode
    or raise ValueError/NotImplementedError — never struct.error,
    IndexError, KeyError, zlib.error or a crash."""
    import numpy as np

    from rapidocr_ray.functions import codecs
    from rapidocr_ray.functions.avi import avi_frame_scan_sample, encode_avi_mjpeg
    from rapidocr_ray.stages.multimodal import frame_scan_sample

    rng = np.random.RandomState(99)
    frames = [rng.randint(0, 256, (16, 16), dtype=np.uint8) for _ in range(3)]
    mono = (3000 * np.sin(np.arange(390) / 5)).astype(np.float32) / 32768.0

    def ima_wav():
        # reuse the public encoder via the PCM path, then a crafted
        # ADPCM container from raw nibbles (content validity unneeded
        # for the contract — only error TYPES matter)
        import struct as _s

        body = bytes(rng.randint(0, 256, 4 + 32, dtype=np.uint8))
        fmt = _s.pack("<HHIIHH", 0x11, 1, 8000, 8000, 36, 4)
        b = (b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
             + b"data" + _s.pack("<I", len(body)) + body)
        return b"RIFF" + _s.pack("<I", len(b)) + b

    samples = {
        "tiff-lzw": codecs.encode_tiff(frames[0], "lzw", predictor=2),
        "tiff-defl": codecs.encode_tiff(frames[0], "deflate"),
        "bmp-rle": codecs.encode_bmp_rle8(frames[0]),
        "bmp-bf16": codecs.encode_bmp_bitfields(frames[0], bpp=16),
        "bmp-bf32": codecs.encode_bmp_bitfields(
            frames[0], bpp=32, masks=(0xFF0000, 0xFF00, 0xFF)
        ),
        "gif-anim": codecs.encode_gif_animation(frames),
        "avi": encode_avi_mjpeg(frames, quality=90),
        "wav-ima": ima_wav(),
        "bmp-rle4": codecs.encode_bmp_rle4(frames[0] >> 4),
        "bmp-1bit": codecs.encode_bmp_packed((frames[0] > 127).astype(np.uint8), 1),
        "tiff-tiled": codecs.encode_tiff_tiled(frames[0], (8, 8), "lzw"),
        "tiff-jpeg": codecs.encode_tiff_jpeg(
            frames[0], rows_per_strip=8, shared_tables=True
        ),
        "tiff-16": codecs.encode_tiff(frames[0].astype(np.uint16) * 257, "deflate"),
    }

    def check(payload, kind):
        try:
            if kind == "avi":
                avi_frame_scan_sample(payload, every_k=1)
            elif kind == "gif-anim":
                frame_scan_sample(payload, every_k=1)
            elif kind == "wav-ima":
                codecs.decode_wav(payload)
            else:
                codecs.decode_page_image(payload)
        except (ValueError, NotImplementedError):
            pass  # the typed contract

    for kind, good in samples.items():
        check(good, kind)  # valid file must not raise at all... or typed
        for _ in range(60):
            cut = int(rng.randint(1, len(good)))
            check(good[:cut], kind)  # truncation
            b = bytearray(good)
            for _ in range(int(rng.randint(1, 4))):
                b[int(rng.randint(0, len(b)))] = int(rng.randint(0, 256))
            check(bytes(b), kind)  # corruption


def test_gif_truncated_extension_is_typed_valueerror():
    """Cut points inside a GCE extension block (the review repro) must
    raise ValueError, not IndexError — FrameSampleStage catches only
    the typed pair."""
    from rapidocr_ray.functions import codecs

    frames = [np.full((8, 8), 9, dtype=np.uint8) for _ in range(2)]
    anim = codecs.encode_gif_animation(frames)
    gce = anim.index(b"\x21\xf9\x04")
    for cut in (gce + 1, gce + 2, gce + 3, gce + 4, gce + 5, gce + 6):
        with pytest.raises(ValueError):
            codecs.gif_frame_scan_sample(anim[:cut], every_k=1)


def test_tiff_deflate_bomb_is_bounded():
    """A deflate strip that inflates far past the declared strip size
    must not allocate past rows*stride (the gzip-layer OOM class):
    decode stays bounded and returns the declared pixels."""
    import struct as _s

    from rapidocr_ray.functions import codecs

    img = np.full((64, 64), 7, dtype=np.uint8)
    good = bytearray(codecs.encode_tiff(img, "deflate"))
    # replace the strip with a bomb: 64 valid rows then 50 MB of junk,
    # all zlib-compressed (tiny on disk)
    bomb_plain = img.tobytes() + b"\x00" * (50 * 1024 * 1024)
    bomb = zlib.compress(bomb_plain, 9)
    # rebuild a one-strip TIFF around the bomb
    tif = codecs.encode_tiff(img[:64], "deflate")
    # locate strip offset/count via the decoder's own tag walk: easier
    # to just re-encode manually with the bomb as the strip
    import tracemalloc

    def build(strip: bytes) -> bytes:
        # minimal single-strip LE TIFF, 64x64 gray, deflate
        def entry(tag, typ, val):
            return _s.pack("<HHI", tag, typ, 1) + _s.pack("<I", val)

        data_off = 8
        ifd_off = data_off + len(strip)
        fields = [
            (256, 4, 64), (257, 4, 64), (258, 3, 8), (259, 3, 8),
            (262, 3, 1), (273, 4, data_off), (277, 3, 1),
            (278, 4, 64), (279, 4, len(strip)),
        ]
        ifd = _s.pack("<H", len(fields))
        for t, ty, v in fields:
            ifd += entry(t, ty, v)
        ifd += _s.pack("<I", 0)
        return b"II*\x00" + _s.pack("<I", ifd_off) + strip + ifd

    tracemalloc.start()
    out = codecs.decode_tiff(build(bomb))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert np.array_equal(out, img)
    assert peak < 8 * 1024 * 1024, f"bomb inflated {peak} bytes"


def test_bmp_bitfields_decode_and_errors():
    """BI_BITFIELDS: 565/555 16-bit and 8888 32-bit masks decode with
    rounded linear channel scaling; 0/255 images (glyph pages) survive
    any mask width exactly; malformed masks are typed ValueErrors."""
    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs
    from rapidocr_ray.glyphs import render_page

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (21, 13, 3), dtype=np.uint8)

    # independent scalar mirror of the decode convention
    def expect(rgb, masks):
        chans = []
        for ch, mask in enumerate(masks):
            shift = (mask & -mask).bit_length() - 1
            mx = mask >> shift
            down = (rgb[:, :, ch].astype(np.uint64) * mx + 127) // 255
            chans.append((down * 255 + mx // 2) // mx)
        return codecs.rgb_to_gray(np.stack(chans, -1).astype(np.uint8))

    for bpp, masks in (
        (16, (0xF800, 0x07E0, 0x001F)),  # 565
        (16, (0x7C00, 0x03E0, 0x001F)),  # 555
        (32, (0x00FF0000, 0x0000FF00, 0x000000FF)),  # 8888
    ):
        data = codecs.encode_bmp_bitfields(rgb, bpp=bpp, masks=masks)
        assert np.array_equal(codecs.decode_bmp(data), expect(rgb, masks))

    # binary glyph pages round-trip exactly even through 5-bit channels
    page = render_page(["bitfields bmp"], margin=6)
    for bpp, masks in ((16, (0xF800, 0x07E0, 0x001F)), (32, (0xFF0000, 0xFF00, 0xFF))):
        out = codecs.decode_bmp(codecs.encode_bmp_bitfields(page, bpp=bpp, masks=masks))
        assert np.array_equal(out, page)

    good = codecs.encode_bmp_bitfields(rgb)
    zero = bytearray(good)
    struct.pack_into("<III", zero, 54, 0xF800, 0, 0x001F)
    with pytest.raises(ValueError, match="zero channel mask"):
        codecs.decode_bmp(bytes(zero))
    overlap = bytearray(good)
    struct.pack_into("<III", overlap, 54, 0xF800, 0xFC00, 0x001F)
    with pytest.raises(ValueError, match="overlapping"):
        codecs.decode_bmp(bytes(overlap))
    with pytest.raises(ValueError, match="truncated BI_BITFIELDS pixel"):
        codecs.decode_bmp(bytes(good[: len(good) - 8]))


def test_bmp_bitfields_sparse_mask_and_wide_mask():
    """Review findings: a sparse (non-contiguous) mask must be a typed
    ValueError, never a silently wrong image (v*255 wrapped uint32);
    a wide contiguous mask (>24 bits) must decode exactly — the
    scaling now runs in uint64."""
    import numpy as np
    import pytest

    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    good = codecs.encode_bmp_bitfields(
        rgb, bpp=32, masks=(0xFF0000, 0xFF00, 0xFF)
    )
    sparse = bytearray(good)
    struct.pack_into("<III", sparse, 54, 0x80000004, 0xFF00, 0x1)
    with pytest.raises(ValueError, match="non-contiguous"):
        codecs.decode_bmp(bytes(sparse))

    # 30-bit red + 1-bit green/blue: extreme but contiguous and legal
    masks = (0x3FFFFFFF << 2, 0x2, 0x1)
    binary = (rgb > 127).astype(np.uint8) * 255  # survives 1-bit channels
    out = codecs.decode_bmp(codecs.encode_bmp_bitfields(binary, bpp=32, masks=masks))
    assert np.array_equal(out, codecs.rgb_to_gray(binary))
