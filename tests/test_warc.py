"""WARC (ISO 28500) source: record framing, HTTP block split,
per-record gzip members (the Common Crawl layout), typed error
contract, Dataset reader, and e2e parity with the direct pages path."""

import datetime as dt

import numpy as np
import pytest

from rapidocr_ray.sources import warc as W


def _rows(n=5):
    return [
        (
            f"https://example.test/{i}",
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i * 61),
            f"<html><body><p>doc {i} body</p></body></html>".encode(),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    rows = _rows()
    rows.append(("https://example.test/empty", dt.datetime(2026, 2, 2), b""))
    blob = W.encode_warc(rows, gzip_records=gz)
    got = W.parse_warc(blob)
    assert got == rows  # warcinfo skipped, order + bytes + ts exact


def test_warc_gzip_is_multi_member():
    """The CC layout is one gzip member per record: the blob must hold
    more than one member and still parse as a whole."""
    blob = W.encode_warc(_rows(3), gzip_records=True)
    # count member headers (deflate output never embeds 1f 8b 08 00 at
    # member boundaries by construction here: fixed flags byte)
    assert blob[:2] == b"\x1f\x8b"
    assert len(W.parse_warc(blob)) == 3


def test_warc_typed_errors():
    rows = _rows(2)
    good = W.encode_warc(rows, gzip_records=False)
    with pytest.raises(ValueError, match="version line"):
        W.parse_warc(b"NOPE/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="truncated record body"):
        W.parse_warc(good[: len(good) - 20])
    # strip Content-Length
    broken = good.replace(b"Content-Length: ", b"X-Length: ", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc(broken)
    # (first record is warcinfo; corrupt a response date instead)
    bad_date = good.replace(b"T00:01:01Z", b"Tbadbadbd", 1)
    with pytest.raises(ValueError, match="WARC-Date"):
        W.parse_warc(bad_date)
    gz = W.encode_warc(rows, gzip_records=True)
    with pytest.raises(ValueError, match="gzip"):
        W.parse_warc(gz[: len(gz) - 9])
    with pytest.raises(ValueError, match="exceeds"):
        W.parse_warc(gz, max_bytes=64)


def test_warc_fuzz_typed_errors_only():
    """Truncations/corruptions parse or raise ValueError — never
    struct.error/IndexError/KeyError/zlib.error/UnicodeDecodeError."""
    rng = np.random.RandomState(5)
    for gz in (False, True):
        good = W.encode_warc(_rows(3), gzip_records=gz)
        for _ in range(80):
            cut = int(rng.randint(1, len(good)))
            b = bytearray(good)
            for _ in range(int(rng.randint(1, 4))):
                b[int(rng.randint(0, len(b)))] = int(rng.randint(0, 256))
            for payload in (good[:cut], bytes(b)):
                try:
                    W.parse_warc(payload)
                except ValueError:
                    pass
                except UnicodeDecodeError:
                    pytest.fail("url decode must be wrapped")


def test_warc_non_response_records_skipped():
    rows = _rows(2)
    blob = W.encode_warc(rows, warcinfo=True)
    assert len(W.parse_warc(blob)) == 2
    assert len(W.parse_warc(W.encode_warc([], warcinfo=True))) == 0
    assert W.parse_warc(b"") == []


def test_read_warc_files_dataset(ray_session, tmp_path):
    rows_a, rows_b = _rows(4), _rows(3)
    (tmp_path / "a.warc").write_bytes(W.encode_warc(rows_a))
    (tmp_path / "b.warc.gz").write_bytes(W.encode_warc(rows_b, gzip_records=True))
    out = (
        W.read_warc_files([str(tmp_path / "a.warc"), str(tmp_path / "b.warc.gz")])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(out) == 7
    assert set(out.columns) == {"url", "warc_ts", "html", "lang"}
    assert (out.lang == "en").all()


def test_warc_extraction_parity_with_pages_path(ray_session):
    """The WARC container layer must be invisible to extraction: the
    WARC-wrapped flow and the direct pages flow produce byte-identical
    (url, route, extracted_text) at sf0.001."""
    from rapidocr_ray.pipelines.extract import build_extract_pipeline
    from rapidocr_ray.sources.pages import pages_ds_from_documents
    from rapidocr_ray.sources.warc import warc_pages_ds_from_documents

    sf = "/root/testdata/sf0.001"
    cols = ["url", "route", "extracted_text"]
    direct = (
        build_extract_pipeline(pages_ds_from_documents(sf), dedup=False)
        .select_columns(cols)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    via_warc = (
        build_extract_pipeline(warc_pages_ds_from_documents(sf), dedup=False)
        .select_columns(cols)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert direct.equals(via_warc)
