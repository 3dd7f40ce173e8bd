"""PDF layer (functions/pdf.py): text-operator extraction, scanned
raster decode, typed error contract, routing integration, and Ray-vs-
oracle byte-identical e2e."""

import numpy as np
import pyarrow as pa
import pytest

from rapidocr_ray.functions import pdf as P


def test_pdf_text_roundtrip_multiline_and_escapes():
    lines = [
        "hello (nested (parens)) world",
        "back\\slash and tab\tchar",
        "octal \x07 bell and newline-in-line\ninside",
        "",
        "last",
    ]
    kind, text = P.parse_pdf(P.encode_pdf_text(lines))
    assert kind == "text"
    # exact round trip: empty lines emit an empty Tj, so they survive
    assert text == "\n".join(lines)


def test_pdf_literal_escape_forms():
    # hand-built content stream exercising octal, continuation, unknown
    content = rb"BT (a\101\12b) Tj (one\
two) Tj 0 -14 Td (\q) Tj ET"
    lines = P.extract_text_ops(content)
    assert lines == ["aA\nbonetwo", "q"]


def test_pdf_scanned_raster_exact():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (33, 57), dtype=np.uint8)
    kind, out = P.parse_pdf(P.encode_pdf_scanned(img))
    assert kind == "raster" and np.array_equal(out, img)


def test_pdf_scanned_dctdecode_via_jpeg_decoder():
    """A DCTDecode image XObject decodes through functions.jpeg: an
    8x8-block-constant image at q=100 round-trips bit-exactly."""
    from rapidocr_ray.functions.jpeg import encode_jpeg

    blocks = np.random.RandomState(5).randint(0, 256, (3, 4), dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    jpg = encode_jpeg(img, quality=100)
    h, w = img.shape
    pdf = P._assemble(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] " % (w, h)
            + b"/Resources << /XObject << /Im0 4 0 R >> >> >>",
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d " % (w, h)
            + b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode "
            b"/Length %d >>\nstream\n" % len(jpg) + jpg + b"\nendstream",
        ]
    )
    kind, out = P.parse_pdf(pdf)
    assert kind == "raster" and np.array_equal(out, img)


def test_pdf_filter_chains():
    """Transport/compression filter chains (decode since this round):
    ASCIIHex, ASCII85, RunLength, LZW, and multi-filter arrays over
    both the content-stream and image-XObject paths; unknown filters
    stay named stubs."""
    lines = ["filter chain line one", "and two"]
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    chains = [
        (),
        ("asciihex",),
        ("ascii85",),
        ("runlength",),
        ("lzw",),
        ("ascii85", "flate"),
        ("asciihex", "lzw"),
        ("ascii85", "runlength"),
    ]
    for ch in chains:
        kind, text = P.parse_pdf(P.encode_pdf_text(lines, filters=ch))
        assert (kind, text) == ("text", "\n".join(lines)), ch
        kind, out = P.parse_pdf(P.encode_pdf_scanned(img, filters=ch))
        assert kind == "raster" and np.array_equal(out, img), ch
    # typed stubs / errors
    good = P.encode_pdf_text(lines, filters=("runlength",))
    with pytest.raises(NotImplementedError, match="JBIG2"):
        P.parse_pdf(good.replace(b"/RunLengthDecode", b"/JBIG2Decode"))
    blob = P.encode_pdf_scanned(img, filters=("flate",))
    with pytest.raises(ValueError, match="whole row"):
        # dict declares Predictor 12 but the data was never
        # predictor-encoded (8x8 flate output: 64 bytes, PNG rows of 9)
        # -> typed corrupt-stream error, never a wrong raster
        P.parse_pdf(
            blob.replace(b"/BitsPerComponent 8", b"/BitsPerComponent 8 /Predictor 12")
        )
    # corrupt ascii85 body -> typed ValueError
    a85 = P.encode_pdf_text(lines, filters=("ascii85",))
    with pytest.raises(ValueError):
        P.parse_pdf(a85.replace(b"~>", b"\x01\x01"))


def test_pdf_large_ascii_stream_parses_linearly():
    """Regression: the object scanner used to finditer the `N M obj`
    regex across stream bodies, and ASCIIHex content is one long digit
    run wherever the raster is black (0x00 -> '00'), so `\\d+\\s+\\d+`
    backtracked quadratically — ~2 min for this payload before the
    re-anchored scan, milliseconds after.  Crawl PDFs are untrusted, so
    parse cost must stay linear in payload size."""
    import time

    img = np.zeros((40, 3500), dtype=np.uint8)  # ~140 KB raster, all-digit hex
    img[::7, ::11] = 255
    pdf = P.encode_pdf_scanned(img, filters=("asciihex",))
    assert len(pdf) > 250_000  # the hex blob dominates the file
    t0 = time.perf_counter()
    kind, out = P.parse_pdf(pdf)
    elapsed = time.perf_counter() - t0
    assert kind == "raster" and np.array_equal(out, img)
    # ~25 ms on a quiet box; 30 s is >100x headroom for host swings yet
    # two orders of magnitude under the quadratic behavior.
    assert elapsed < 30.0, f"ascii stream parse took {elapsed:.1f}s"


def test_pdf_typed_errors():
    with pytest.raises(ValueError, match="bad header"):
        P.parse_pdf(b"not a pdf")
    with pytest.raises(ValueError, match="no objects"):
        P.parse_pdf(b"%PDF-1.4\nnothing here")
    with pytest.raises(ValueError, match="no extractable content"):
        P.parse_pdf(b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n")
    with pytest.raises(NotImplementedError, match="encrypted"):
        P.parse_pdf(b"%PDF-1.4\n/Encrypt 1 0 obj\n<< >>\nendobj\n")
    good = P.encode_pdf_scanned(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(NotImplementedError, match="filter"):
        P.parse_pdf(good.replace(b"/FlateDecode", b"/CCITTFaxDecode"))
    with pytest.raises(ValueError, match="sanity bound"):
        P.parse_pdf(good.replace(b"/Width 8", b"/Width 99999999"))
    txt = P.encode_pdf_text(["abc"])
    with pytest.raises(ValueError):
        P.parse_pdf(txt[: len(txt) // 2])


def test_pdf_fuzz_typed_errors_only():
    rng = np.random.RandomState(17)
    fixtures = [
        P.encode_pdf_text(["fuzz line one", "two"]),
        P.encode_pdf_scanned(rng.randint(0, 256, (16, 16), dtype=np.uint8)),
    ]
    for good in fixtures:
        for _ in range(80):
            cut = int(rng.randint(6, len(good)))
            b = bytearray(good)
            for _ in range(int(rng.randint(1, 4))):
                b[int(rng.randint(0, len(b)))] = int(rng.randint(0, 256))
            for payload in (good[:cut], bytes(b)):
                try:
                    P.parse_pdf(payload)
                except (ValueError, NotImplementedError):
                    pass


def test_pdf_routing_sniff():
    from rapidocr_ray.stages.ray_stages import sniff_route, sniff_routes_batch

    pdfs = [P.encode_pdf_text(["x"]), P.encode_pdf_scanned(np.zeros((4, 4), np.uint8))]
    for p in pdfs:
        assert sniff_route(p) == ("pdf", None)
    routes, errs = sniff_routes_batch(pa.array(pdfs + [b"<html>"], type=pa.binary()))
    assert list(routes) == ["pdf", "pdf", "html"]
    assert errs[0] is None and errs[1] is None


def test_pdf_pages_ray_matches_oracle(ray_session):
    """Byte-identical per url: the Ray pipeline and the single-process
    oracle agree on all three PDF routes (text / raster / error)."""
    import pyarrow.parquet as pq

    from rapidocr_ray.pipelines.extract import extract_pages_table
    from rapidocr_ray.pipelines.oracle import OracleExtractor
    from rapidocr_ray.sources.pages import pdf_pages_from_documents

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 90)
    pages = pdf_pages_from_documents(docs)
    cols = ["url", "route", "err", "extracted_text", "n_spans", "spans"]
    got = (
        extract_pages_table(pages, dedup=False)
        .to_pandas()[cols]
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        OracleExtractor()
        .run(pages, dedup=False)
        .to_pandas()[cols]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert set(got.route) == {"pdf_text", "pdf_raster", "error"}
    # text/raster rows must reproduce documents.text byte-for-byte
    texts = {f"https://docs.example/{i}": t for i, t in
             zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())}
    ok = got[got.route.isin(["pdf_text", "pdf_raster"])]
    assert all(texts[u] == t for u, t in zip(ok.url, ok.extracted_text))


@pytest.mark.parametrize("pred", [1, 2, 10, 11, 12, 13, 14, 15])
def test_pdf_predictor_text_roundtrip(pred):
    lines = ["predictor line one", "two (with) escapes \\ ok", "", "tail"]
    for filters in (("flate",), ("lzw",)):
        kind, text = P.parse_pdf(
            P.encode_pdf_text(lines, filters=filters, predictor=pred)
        )
        assert kind == "text"
        assert text == "\n".join(lines)


@pytest.mark.parametrize("pred", [2, 12, 15])
def test_pdf_predictor_raster_exact(pred):
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (37, 29), dtype=np.uint8)  # odd dims
    kind, out = P.parse_pdf(P.encode_pdf_scanned(img, predictor=pred))
    assert kind == "raster"
    assert np.array_equal(out, img)


def test_pdf_predictor_typed_errors():
    with pytest.raises(ValueError, match="unknown /Predictor"):
        P._predictor_decode(b"abc", 3, 1, 8, 3)
    with pytest.raises(ValueError, match="unknown /Predictor"):
        P._predictor_decode(b"abc", 16, 1, 8, 3)
    with pytest.raises(NotImplementedError, match="BitsPerComponent"):
        P._predictor_decode(b"abc", 2, 1, 4, 3)
    with pytest.raises(ValueError, match="whole row"):
        P._predictor_decode(b"abcd", 2, 1, 8, 3)  # 4 bytes, rowbytes 3
    with pytest.raises(ValueError, match="whole row"):
        P._predictor_decode(b"abcde", 12, 1, 8, 3)  # 5 bytes, row+1 = 4
    with pytest.raises(ValueError, match="corrupt PNG-predictor"):
        P._predictor_decode(b"\x09abc", 12, 1, 8, 3)  # filter type 9
    with pytest.raises(ValueError, match="bad predictor DecodeParms"):
        P._predictor_decode(b"abc", 2, 0, 8, 3)
    # end-to-end: a corrupt Predictor value in an otherwise-valid PDF
    # stays inside the typed contract
    good = P.encode_pdf_text(["x"], predictor=12)
    with pytest.raises(ValueError, match="unknown /Predictor"):
        P.parse_pdf(good.replace(b"/Predictor 12", b"/Predictor 77"))


def test_pdf_predictor_2_multichannel():
    # colors=3: the per-channel prefix sum must not bleed across
    # channels (hand-built 2x2 RGB rows)
    raw = bytes([10, 20, 30, 5, 5, 5, 100, 0, 200, 1, 2, 3])
    enc = bytearray()
    for r in range(2):
        row = raw[r * 6 : (r + 1) * 6]
        enc += row[:3]
        enc += bytes((row[3 + c] - row[c]) % 256 for c in range(3))
    assert P._predictor_decode(bytes(enc), 2, 3, 8, 2) == raw


def test_pdf_xref_and_objstm_streams_skipped():
    """A modern-PDF /XRef stream (Flate + Predictor 12) or /ObjStm must
    not abort text extraction — they are skipped, not decoded as
    content.  This is the shape of virtually every crawl PDF >= 1.5."""
    import zlib as _z

    base = P.encode_pdf_text(["real content line"])
    # a plausible xref stream: 5-byte rows, PNG Up filter
    rows = b"".join(b"\x02" + bytes([i, 0, 0, 0, 0]) for i in range(4))
    xref_body = _z.compress(rows)
    xref_obj = (
        b"9 0 obj\n<< /Type /XRef /Filter /FlateDecode /Predictor 12 "
        b"/Columns 5 /W [1 2 2] /Size 10 /Length %d >>\nstream\n" % len(xref_body)
        + xref_body
        + b"\nendstream\nendobj\n"
    )
    objstm_body = _z.compress(b"11 0 12 8 << /A 1 >> << /B 2 >>")
    objstm_obj = (
        b"10 0 obj\n<< /Type /ObjStm /N 2 /First 10 /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % len(objstm_body)
        + objstm_body
        + b"\nendstream\nendobj\n"
    )
    doctored = base.replace(b"xref\n", xref_obj + objstm_obj + b"xref\n", 1)
    kind, text = P.parse_pdf(doctored)
    assert kind == "text"
    assert text == "real content line"
