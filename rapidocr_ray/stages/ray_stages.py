"""Ray Data stages of the extraction pipeline.

The reference's single-process cascade (rapid_ocr_api.py:56-107) is cut
at its natural IR boundaries (SURVEY.md §3.1) into Dataset stages:

    decode/route/html (stateless MB)  ->  det (actor pool, fan-out to
    region rows)  ->  cls (actor pool)  ->  rec (actor pool)  ->
    assembly (groupby url)

All stages exchange one unified Arrow schema in which a row is either a
*document* row (``is_region == false``) or a *region* row produced by
the det stage's 1->N crop fan-out (M9; keyed ``(url, region_idx)`` so
assembly never depends on block arrival order — SURVEY.md §7.4).
Stateful stages are callable classes: model registry built once per
actor in ``__init__`` (T1/T3 analog), work in ``__call__`` per batch,
batched ACROSS documents and grouped by ``lang`` for model dispatch
(J3).  Batch composition cannot change results: pad width (A1) only
adds blank timesteps, which the CTC decode drops.
"""

from __future__ import annotations

import json
import struct
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rapidocr_ray.config import PipelineConfig
from rapidocr_ray.functions.html import extract_main_text
from rapidocr_ray.functions.imgproc import (
    crop_box,
    rotate180,
    sorted_boxes,
    use_det_bypass,
    whole_image_box,
)
from rapidocr_ray.functions.codecs import decode_page_image
from rapidocr_ray.functions.pdf import PDF_MAGIC, parse_pdf
from rapidocr_ray.glyphs import MAGIC, decode_rbmp, encode_rbmp, is_rbmp

# routes whose payload column carries a decodable page bitmap for the
# det->cls->rec cascade (pdf_raster = scanned-PDF raster re-wrapped as
# RBMP by DecodeRouteExtract)
CASCADE_ROUTES = ("bitmap", "pdf_raster")

# known BITMAPINFOHEADER-family sizes at offset 14 — the extra check
# that keeps the weak 2-byte "BM" magic from swallowing text payloads
_DIB_SIZES = tuple(
    struct.pack("<I", s) for s in (12, 40, 52, 56, 64, 108, 124)
)
from rapidocr_ray.stages.cascade import (
    TextClassifier,
    TextDetector,
    TextRecognizer,
    most_angle,
)
from rapidocr_ray.state.models import ModelRegistry

UNIFIED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("route", pa.string()),
        ("err", pa.string()),
        ("extracted_text", pa.string()),
        ("n_regions", pa.int32()),
        ("is_region", pa.bool_()),
        ("region_idx", pa.int32()),
        ("box", pa.list_(pa.int32())),
        ("payload", pa.binary()),
        ("cls_label", pa.string()),
        ("cls_score", pa.float64()),
        ("rec_text", pa.string()),
        ("rec_score", pa.float64()),
        ("det_elapse", pa.float64()),
        ("cls_elapse", pa.float64()),
        ("rec_elapse", pa.float64()),
    ]
)

FINAL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("route", pa.string()),
        ("err", pa.string()),
        ("extracted_text", pa.string()),
        ("n_spans", pa.int32()),
        ("spans", pa.string()),
        ("det_elapse", pa.float64()),
        ("cls_elapse", pa.float64()),
        ("rec_elapse", pa.float64()),
    ]
)

_UNIFIED_NAMES = [f.name for f in UNIFIED_SCHEMA]


def _blank_row() -> dict:
    return {name: None for name in _UNIFIED_NAMES}


def rows_to_table(rows: list[dict], schema: pa.Schema = UNIFIED_SCHEMA) -> pa.Table:
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    return pa.table(cols, schema=schema)


GZIP_MAGIC = b"\x1f\x8b"


def maybe_gunzip(
    payload: bytes | None, max_bytes: int
) -> tuple[bytes | None, str | None]:
    """Transparent content-encoding layer shared by the Ray stage and
    the oracle: gzip-wrapped crawl payloads (1f 8b — Common-Crawl
    bodies frequently arrive Content-Encoding: gzip) decompress BEFORE
    routing, bounded by max_payload_bytes so a decompression bomb
    becomes a typed error row, never a worker OOM.  Non-gzip payloads
    pass through untouched."""
    if payload is None or bytes(payload[:2]) != GZIP_MAGIC:
        return payload, None
    # RFC 1952: a gzip file is a CONCATENATION of members (gzip.decompress
    # semantics) — loop members so multi-member bodies don't silently
    # truncate to the first one
    remaining = bytes(payload)
    parts: list[bytes] = []
    total = 0
    while remaining[:2] == GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(remaining, max_bytes + 1 - total)
        except zlib.error as exc:
            return None, f"corrupt gzip payload ({exc})"
        total += len(out)
        if total > max_bytes:
            return None, f"decompressed payload exceeds max_payload_bytes ({max_bytes})"
        if not d.eof:
            return None, "corrupt gzip payload (truncated stream)"
        parts.append(out)
        remaining = d.unused_data
    if remaining:
        return None, "corrupt gzip payload (trailing garbage after member)"
    return b"".join(parts), None


def sniff_route(payload: bytes | None) -> tuple[str, str | None]:
    """S1 LoadImage container sniffing (utils.py:94-152) -> (route, err).

    Magic-byte routing: RBMP bitmaps take the cascade path, markup takes
    the HTML fast path, empty/undecodable payloads become typed error
    rows instead of raising (LoadImageError, utils.py:154)."""
    if payload is None or len(payload) == 0:
        return "empty", "empty payload"
    if is_rbmp(payload):
        return "bitmap", None
    # real image containers decode via the pure-numpy codecs
    # (functions/codecs.py + functions/jpeg.py — incl. the GIF
    # first-frame path the reference special-cases,
    # ocrweb_multi/rapidocr/main.py:29-40); unsupported container
    # features surface as typed error rows from the decode itself.
    # TIFF decodes for real (uncompressed/PackBits); WebP routes to the
    # codec so its NAMED NotImplementedError becomes the error column —
    # crawl triage can count tiff/webp instead of "unrecognized".
    if (
        payload[:4] in (b"\x89PNG", b"GIF8", b"II*\x00", b"MM\x00*")
        or payload[:3] == b"\xff\xd8\xff"
        or (payload[:4] == b"RIFF" and payload[8:12] == b"WEBP")
    ):
        return "bitmap", None
    if payload[:2] == b"BM" and len(payload) >= 54 and payload[14:18] in _DIB_SIZES:
        return "bitmap", None
    if payload[:5] == PDF_MAGIC:
        # PDF payloads split downstream: born-digital (text operators)
        # extract directly like html; scanned (image XObject) rasters
        # re-enter the cascade as bitmap payloads (north rule: "routes
        # PDF/binary payloads through rasterize -> det -> cls -> rec")
        return "pdf", None
    head = payload[:4096]
    try:
        snippet = head.decode("utf-8")
    except UnicodeDecodeError:
        return "error", "undecodable payload"
    if "<" in snippet:
        return "html", None
    return "error", "unrecognized payload format"


def sniff_routes_batch(payloads: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized S1 routing over a whole binary column: the columnar
    form of ``sniff_route`` (kept row-wise for the oracle).  Returns
    (route, err) object ndarrays.  Magic prefixes, emptiness and the
    utf-8 head check all run as Arrow kernels; only batches that
    actually contain invalid-utf-8 text heads fall back to the
    row-wise decode for those rows (semantics preserved exactly)."""
    n = len(payloads)
    routes = np.full(n, "error", dtype=object)
    errs = np.full(n, None, dtype=object)

    null_mask = pc.is_null(payloads).to_numpy(zero_copy_only=False)
    lengths = pc.fill_null(pc.binary_length(payloads), 0).to_numpy(zero_copy_only=False)
    empty = null_mask | (lengths == 0)
    routes[empty] = "empty"
    errs[empty] = "empty payload"

    def _magic(m: bytes) -> np.ndarray:
        eq = pc.equal(
            pc.binary_slice(payloads, 0, len(m)), pa.scalar(m, type=pa.binary())
        )
        return pc.fill_null(eq, False).to_numpy(zero_copy_only=False) & ~empty

    bitmap = (
        _magic(MAGIC)
        | _magic(b"\x89PNG")
        | _magic(b"GIF8")
        | _magic(b"\xff\xd8\xff")
        | _magic(b"II*\x00")
        | _magic(b"MM\x00*")
    )
    # WebP = RIFF container with WEBP fourcc at offset 8 (routes to the
    # codec's named NotImplementedError, same as the row-wise sniff)
    riff = _magic(b"RIFF") & (lengths >= 12)
    if riff.any():
        fourcc = pc.binary_slice(payloads, 8, 12)
        webp_eq = pc.fill_null(
            pc.equal(fourcc, pa.scalar(b"WEBP", type=pa.binary())), False
        ).to_numpy(zero_copy_only=False)
        bitmap |= riff & webp_eq
    # BMP: "BM" alone is too weak a magic (plain text can start with
    # it); require a known DIB header size at offset 14 like the
    # row-wise sniff does
    bm = _magic(b"BM") & (lengths >= 54)
    if bm.any():
        dib = pc.binary_slice(payloads, 14, 18)
        dib_ok = np.zeros(n, dtype=bool)
        for s in _DIB_SIZES:
            eq = pc.fill_null(pc.equal(dib, pa.scalar(s, type=pa.binary())), False)
            dib_ok |= eq.to_numpy(zero_copy_only=False)
        bitmap |= bm & dib_ok
    routes[bitmap] = "bitmap"
    errs[bitmap] = None
    pdf = _magic(PDF_MAGIC) & ~bitmap
    routes[pdf] = "pdf"
    errs[pdf] = None
    rest = ~(empty | bitmap | pdf)
    rest_idx = np.flatnonzero(rest)
    if len(rest_idx):
        heads = pc.binary_slice(payloads.take(pa.array(rest_idx)), 0, 4096)
        try:
            snippets = heads.cast(pa.string())  # validates utf-8 in C
            has_lt = pc.match_substring(snippets, "<").to_numpy(zero_copy_only=False)
            routes[rest_idx[has_lt]] = "html"
            errs[rest_idx[~has_lt]] = "unrecognized payload format"
        except pa.ArrowInvalid:
            # rare: some head is invalid utf-8 (binary junk or a split
            # multibyte char) — decide those rows exactly as the
            # row-wise sniff does
            head_bytes = heads.to_pylist()
            for j, i in enumerate(rest_idx):
                try:
                    snippet = head_bytes[j].decode("utf-8")
                except UnicodeDecodeError:
                    errs[i] = "undecodable payload"
                    continue
                if "<" in snippet:
                    routes[i] = "html"
                else:
                    errs[i] = "unrecognized payload format"
    return routes, errs


class DecodeRouteExtract:
    """Stage 1 (stateless task is fine, but a class lets the HtmlConfig
    live once per worker): sniff payload -> route; run the HTML fast
    path inline for html rows (it is orders of magnitude cheaper than
    the cascade — SURVEY.md §6); bitmap payloads ride along untouched.

    Routing is fully columnar (``sniff_routes_batch``); the only
    per-row Python left is the HTML parse itself, which is inherently
    row-wise."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column("html").combine_chunks()
        max_bytes = self.cfg.Global.max_payload_bytes

        # transparent gzip layer: only batches that actually contain
        # gzip rows pay the row materialization (the invalid-utf-8
        # fallback pattern); inner payloads then route normally
        gz_errs: dict[int, str] = {}
        gz_flag = pc.fill_null(
            pc.equal(
                pc.binary_slice(payloads, 0, 2),
                pa.scalar(GZIP_MAGIC, type=pa.binary()),
            ),
            False,
        ).to_numpy(zero_copy_only=False)
        if gz_flag.any():
            vals = payloads.to_pylist()
            for i in np.flatnonzero(gz_flag):
                vals[i], err = maybe_gunzip(vals[i], max_bytes)
                if err is not None:
                    gz_errs[int(i)] = err
            payloads = pa.array(vals, type=pa.binary())

        routes, errs = sniff_routes_batch(payloads)
        for i, err in gz_errs.items():
            routes[i] = "error"
            errs[i] = err
        # skew guard: an oversized blob would monopolize a cascade
        # actor; surface it as a typed error row (overrides the sniff)
        lengths = pc.fill_null(pc.binary_length(payloads), 0).to_numpy(
            zero_copy_only=False
        )
        over = lengths > max_bytes
        routes[over] = "error"
        errs[over] = f"payload exceeds max_payload_bytes ({max_bytes})"

        extracted = np.full(n, None, dtype=object)
        html_idx = np.flatnonzero(routes == "html")
        if len(html_idx):
            html_payloads = payloads.take(pa.array(html_idx)).to_pylist()
            for i, payload in zip(html_idx, html_payloads):
                extracted[i] = extract_main_text(
                    payload.decode("utf-8", errors="replace"), self.cfg.Html
                )

        # PDF fan-out: born-digital -> inline text extraction
        # (pdf_text, the html-fast-path analog); scanned -> the raster
        # re-wraps as an RBMP payload and rides the cascade route
        # (pdf_raster); malformed/unsupported -> typed error rows
        pdf_idx = np.flatnonzero(routes == "pdf")
        if len(pdf_idx):
            rewrapped: dict[int, bytes] = {}
            pdf_payloads = payloads.take(pa.array(pdf_idx)).to_pylist()
            for i, payload in zip(pdf_idx, pdf_payloads):
                try:
                    kind, content = parse_pdf(payload)
                except (ValueError, NotImplementedError) as exc:
                    routes[i] = "error"
                    errs[i] = str(exc)
                    continue
                if kind == "text":
                    routes[i] = "pdf_text"
                    extracted[i] = content
                else:
                    routes[i] = "pdf_raster"
                    rewrapped[int(i)] = encode_rbmp(content)
            if rewrapped:
                vals = payloads.to_pylist()
                for i, b in rewrapped.items():
                    vals[i] = b
                payloads = pa.array(vals, type=pa.binary())

        bitmap_mask = np.isin(routes, CASCADE_ROUTES)
        if bitmap_mask.all():
            payload_col = payloads  # zero-copy pass-through (det corpora)
        else:
            payload_col = pc.if_else(
                pa.array(bitmap_mask), payloads, pa.nulls(n, type=pa.binary())
            )
        cols: dict[str, pa.Array] = {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "route": pa.array(routes, type=pa.string()),
            "err": pa.array(errs, type=pa.string()),
            "extracted_text": pa.array(extracted, type=pa.string()),
            "n_regions": pa.array(np.zeros(n, dtype=np.int32)),
            "is_region": pa.array(np.zeros(n, dtype=bool)),
            "payload": payload_col,
        }
        arrays = [
            cols[f.name].cast(f.type) if f.name in cols else pa.nulls(n, type=f.type)
            for f in UNIFIED_SCHEMA
        ]
        return pa.Table.from_arrays(arrays, schema=UNIFIED_SCHEMA)


class DetStage:
    """Det actor pool (T1 analog): decode RBMP, M17 routing, M1-M7 det,
    M8 reading-order sort, M9 crop fan-out to region rows."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.registry = ModelRegistry(self.cfg.Global.backend)
        self.detector = TextDetector(self.cfg.Det, self.registry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.cfg.Global
        # payload bytes are read zero-copy from the arrow buffer; every
        # other column is small, so to_pylist on the remainder is cheap.
        # Upstream guarantees non-bitmap rows carry a null payload, so
        # dropping the column loses nothing for the passthrough rows.
        payload_col = batch.column("payload").combine_chunks()
        rows = batch.drop_columns(["payload"]).to_pylist()
        out: list[dict] = []
        for i, row in enumerate(rows):
            row["payload"] = None
            if row["route"] not in CASCADE_ROUTES or row["err"] is not None:
                out.append(row)
                continue
            t0 = time.perf_counter()
            try:
                pay = payload_col[i]
                img = decode_page_image(pay.as_buffer() if pay.is_valid else b"")
            except (ValueError, NotImplementedError) as exc:
                row.update(route="error", err=str(exc))
                out.append(row)
                continue
            h, w = img.shape
            if not g.use_det or use_det_bypass(h, w, g.min_height, g.width_height_ratio):
                boxes = [whole_image_box(h, w)]  # M17 (rapid_ocr_api.py:114-119)
            else:
                det_boxes = self.detector(img, row["lang"])
                boxes = sorted_boxes(det_boxes) if len(det_boxes) else []
            det_elapse = time.perf_counter() - t0
            row.update(payload=None, n_regions=len(boxes), det_elapse=det_elapse)
            out.append(row)  # doc row survives even when empty (M18)
            for ridx, box in enumerate(boxes):
                crop = crop_box(img, np.asarray(box))
                region = _blank_row()
                region.update(
                    url=row["url"],
                    lang=row["lang"],
                    route="bitmap",
                    is_region=True,
                    region_idx=ridx,
                    box=[int(v) for v in np.asarray(box).reshape(-1)],
                    payload=encode_rbmp(crop),
                )
                out.append(region)
        return rows_to_table(out)


def _region_indices_by_lang(batch: pa.Table) -> dict[str, list[int]]:
    is_region = batch.column("is_region").to_pylist()
    langs = batch.column("lang").to_pylist()
    groups: dict[str, list[int]] = {}
    for i, (reg, lang) in enumerate(zip(is_region, langs)):
        if reg:
            groups.setdefault(lang or "en", []).append(i)
    return groups


class ClsStage:
    """Cls actor pool: M10-M12 + M16 over region rows, batched across
    documents, dispatched per lang (T3 grouped dispatch)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.registry = ModelRegistry(self.cfg.Global.backend)
        self.classifier = TextClassifier(self.cfg.Cls, self.registry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.cfg.Global.use_cls:
            return batch
        payload_col = batch.column("payload").combine_chunks()
        rows = batch.drop_columns(["payload"]).to_pylist()
        for row in rows:  # region rows get re-encoded crops below
            row["payload"] = None
        for lang, idxs in _region_indices_by_lang(batch).items():
            t0 = time.perf_counter()
            crops = [decode_rbmp(payload_col[i].as_buffer()) for i in idxs]
            crops, cls_res = self.classifier(crops, lang)
            share = (time.perf_counter() - t0) / max(1, len(idxs))
            for i, crop, (label, score) in zip(idxs, crops, cls_res):
                rows[i].update(
                    payload=encode_rbmp(crop),
                    cls_label=label,
                    cls_score=score,
                    cls_elapse=share,
                )
        return rows_to_table(rows)


class RecStage:
    """Rec actor pool: M13-M14 + M16/A1 over region rows; drops the crop
    payload afterwards so the assembly shuffle moves only text."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.registry = ModelRegistry(self.cfg.Global.backend)
        self.recognizer = TextRecognizer(self.cfg.Rec, self.registry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload_col = batch.column("payload").combine_chunks()
        rows = batch.drop_columns(["payload"]).to_pylist()
        for row in rows:  # rec drops crops; doc rows are already null
            row["payload"] = None
        for lang, idxs in _region_indices_by_lang(batch).items():
            t0 = time.perf_counter()
            crops = [decode_rbmp(payload_col[i].as_buffer()) for i in idxs]
            rec_res = self.recognizer(crops, lang)
            share = (time.perf_counter() - t0) / max(1, len(idxs))
            for i, (text, score) in zip(idxs, rec_res):
                rows[i].update(
                    payload=None, rec_text=text, rec_score=score, rec_elapse=share
                )
        return rows_to_table(rows)


class CascadeStage:
    """Fused det -> cls -> rec actor-pool stage (the default physical
    plan).  The reference's stage boundaries are per-doc function calls
    inside one process (SURVEY.md §3.1 'all the boundaries are ours to
    draw'); fusing them into one Ray stage means crop payloads NEVER
    enter the object store — only text/span rows leave the actor — while
    cls/rec still batch ACROSS the documents of the batch (M16/A1
    micro-batching is batch-composition-invariant, tested in
    tests/test_cascade.py::test_batch_composition_invariant).

    The split stages (DetStage/ClsStage/RecStage) remain available for
    pipelines that need independent per-stage scaling (e.g. a GPU rec
    pool); `PipelineConfig.Ray.fuse_cascade` picks the plan.

    Because every region of a document is produced and consumed inside
    ONE actor call, the fused stage also performs the per-document
    assembly (J1/M15/A5/A6) and emits FINAL_SCHEMA rows directly — the
    fused pipeline therefore has NO all-to-all operation after dedup
    (the unfused plan still needs the groupby-url assembly, since its
    region rows cross stage boundaries)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.registry = ModelRegistry(self.cfg.Global.backend)
        self.detector = TextDetector(self.cfg.Det, self.registry)
        self.classifier = TextClassifier(self.cfg.Cls, self.registry)
        self.recognizer = TextRecognizer(self.cfg.Rec, self.registry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.cfg.Global
        docs: list[dict] = []
        # per-doc det + crop fan-out, crops held in actor memory
        pending: list[tuple[int, int, "np.ndarray", list[int], str]] = []
        # (doc_idx, region_idx, crop, box, lang)
        # columnar row access: the payload column is read as zero-copy
        # arrow buffers (a to_pylist would memcpy every page into python
        # bytes — measured hundreds of MB/s of pure copy at 30 actors)
        meta = batch.drop_columns(["payload"]).to_pylist()
        payload_col = batch.column("payload").combine_chunks()
        for i, row in enumerate(meta):
            final = {
                "url": row["url"],
                "warc_ts": row["warc_ts"],
                "lang": row["lang"],
                "route": row["route"],
                "err": row["err"],
                "extracted_text": row["extracted_text"],
                "n_spans": 0,
                "spans": "[]",
                "det_elapse": None,
                "cls_elapse": None,
                "rec_elapse": None,
            }
            if row["route"] not in CASCADE_ROUTES or row["err"] is not None:
                docs.append(final)
                continue
            t0 = time.perf_counter()
            try:
                pay = payload_col[i]
                buf = pay.as_buffer() if pay.is_valid else b""
                img = decode_page_image(buf)
            except (ValueError, NotImplementedError) as exc:
                final.update(route="error", err=str(exc))
                docs.append(final)
                continue
            h, w = img.shape
            if not g.use_det or use_det_bypass(h, w, g.min_height, g.width_height_ratio):
                boxes = [whole_image_box(h, w)]
            else:
                det_boxes = self.detector(img, row["lang"])
                boxes = sorted_boxes(det_boxes) if len(det_boxes) else []
            final["det_elapse"] = time.perf_counter() - t0
            doc_idx = len(docs)
            docs.append(final)
            for ridx, box in enumerate(boxes):
                crop = crop_box(img, np.asarray(box))
                pending.append(
                    (doc_idx, ridx, crop,
                     [int(v) for v in np.asarray(box).reshape(-1)],
                     row["lang"] or "en")
                )
        # cls + rec across all docs in the batch, grouped by lang (J3)
        by_lang: dict[str, list[int]] = {}
        for i, item in enumerate(pending):
            by_lang.setdefault(item[4], []).append(i)
        rec_results: dict[int, tuple[str, float, float, float]] = {}
        for lang, idxs in by_lang.items():
            crops = [pending[i][2] for i in idxs]
            cls_elapse = 0.0
            if g.use_cls:
                t1 = time.perf_counter()
                if g.use_most_angle:
                    # A4 mostAngle (OcrLite.cpp:150-160): classify the
                    # UNROTATED crops, vote once per DOCUMENT, rotate a
                    # doc's crops all-or-none
                    cls_res = self.classifier.classify_only(crops, lang)
                    doc_positions: dict[int, list[int]] = {}
                    for pos, i in enumerate(idxs):
                        doc_positions.setdefault(pending[i][0], []).append(pos)
                    for dpos in doc_positions.values():
                        if most_angle([cls_res[p] for p in dpos]) == "180":
                            for p in dpos:
                                crops[p] = rotate180(crops[p])
                else:
                    crops, _cls_res = self.classifier(crops, lang)
                cls_elapse = (time.perf_counter() - t1) / max(1, len(idxs))
            t2 = time.perf_counter()
            decoded = self.recognizer(crops, lang)
            rec_elapse = (time.perf_counter() - t2) / max(1, len(idxs))
            for i, (text, score) in zip(idxs, decoded):
                rec_results[i] = (text, score, cls_elapse, rec_elapse)
        # in-actor assembly (J1/M15/A5/A6): regions are already ordered
        # per doc by region_idx (construction order)
        spans_by_doc: dict[int, list] = {}
        for i, (doc_idx, ridx, _crop, box, _lang) in enumerate(pending):
            text, score, cls_el, rec_el = rec_results[i]
            spans_by_doc.setdefault(doc_idx, []).append(
                (ridx, box, text, score, cls_el, rec_el)
            )
        for doc_idx, regions in spans_by_doc.items():
            final = docs[doc_idx]
            regions.sort(key=lambda r: r[0])
            kept = [r for r in regions if r[3] >= g.text_score]  # M15
            if kept:
                final["extracted_text"] = "\n".join(r[2] for r in kept)  # A5
                final["n_spans"] = len(kept)
                final["spans"] = json.dumps(
                    [{"box": r[1], "text": r[2], "score": r[3]} for r in kept]
                )
            else:
                final["extracted_text"] = None  # M18
            if g.use_cls:
                final["cls_elapse"] = float(sum(r[4] for r in regions))
            final["rec_elapse"] = float(sum(r[5] for r in regions))
        return rows_to_table(docs, schema=FINAL_SCHEMA)


def assemble_group(group: pa.Table, text_score: float = 0.5) -> pa.Table:
    """J1/M15/A5/A6 per url: positional join of boxes with rec results
    (already keyed by region_idx), score filter, ordered '\\n' concat."""
    rows = group.to_pylist()
    docs = [r for r in rows if not r["is_region"]]
    regions = sorted(
        (r for r in rows if r["is_region"]), key=lambda r: r["region_idx"]
    )
    if not docs:  # defensive: regions without a doc row should not happen
        docs = [dict(rows[0], is_region=False, n_regions=len(regions))]
    doc = docs[0]
    out = {
        "url": doc["url"],
        "warc_ts": doc["warc_ts"],
        "lang": doc["lang"],
        "route": doc["route"],
        "err": doc["err"],
        "extracted_text": doc["extracted_text"],
        "n_spans": 0,
        "spans": "[]",
        "det_elapse": doc["det_elapse"],
        "cls_elapse": None,
        "rec_elapse": None,
    }
    if regions:
        # M15 filter_boxes_rec_by_score (rapid_ocr_api.py:176-183)
        kept = [r for r in regions if (r["rec_score"] or 0.0) >= text_score]
        if kept:
            out["extracted_text"] = "\n".join(r["rec_text"] for r in kept)  # A5
            out["n_spans"] = len(kept)
            out["spans"] = json.dumps(
                [
                    {"box": r["box"], "text": r["rec_text"], "score": r["rec_score"]}
                    for r in kept
                ]
            )
        else:
            out["extracted_text"] = None  # M18: empty result -> null, row kept
        cls_vals = [r["cls_elapse"] for r in regions if r["cls_elapse"] is not None]
        rec_vals = [r["rec_elapse"] for r in regions if r["rec_elapse"] is not None]
        out["cls_elapse"] = float(sum(cls_vals)) if cls_vals else None
        out["rec_elapse"] = float(sum(rec_vals)) if rec_vals else None
    return rows_to_table([out], schema=FINAL_SCHEMA)


def dedup_latest_group(group: pa.Table) -> pa.Table:
    """Exact dedup by url, latest capture wins (north rule; tie-break by
    warc_ts max — SURVEY.md §2.6).  Per-url variant (one group per url)."""
    idx = pc.sort_indices(
        group, sort_keys=[("warc_ts", "descending"), ("url", "ascending")]
    )
    return group.take(idx[:1])


N_URL_BUCKETS = 256  # bounded shuffle fan-in for url-keyed groupbys


def add_url_bucket(batch: pa.Table) -> pa.Table:
    """Stable url hash bucket — the explicit partition key for the
    dedup and assembly shuffles (ONE key reused across both,
    SURVEY.md §7.3).  pandas hash_array is a C-level siphash with a
    fixed key: deterministic across processes/runs (unlike builtin
    hash) and vectorized (the round-2 per-row blake2b loop is gone)."""
    import pandas as pd

    h = pd.util.hash_array(
        batch.column("url").to_pandas().to_numpy(dtype=object)
    )
    buckets = (h % np.uint64(N_URL_BUCKETS)).astype(np.int32)
    return batch.append_column("url_bucket", pa.array(buckets, type=pa.int32()))


def dedup_bucket(group: pa.Table) -> pa.Table:
    """Vectorized latest-capture-wins over ONE url bucket: arrow-native
    sort (url asc, warc_ts desc) + keep-first-per-url via a boundary
    mask — no per-url python calls (a per-url map_groups pays ~1 ms of
    framework overhead per url) and no pandas copy of the multi-KB/MB
    payload bytes."""
    idx = pc.sort_indices(
        group, sort_keys=[("url", "ascending"), ("warc_ts", "descending")]
    )
    s = group.take(idx)
    urls = s.column("url").combine_chunks()
    n = len(urls)
    if n == 0:
        return s
    first = pa.concat_arrays(
        [
            pa.array([True]),
            pc.not_equal(urls.slice(1, n - 1), urls.slice(0, n - 1)),
        ]
    )
    return s.filter(first)


def assemble_bucket(group: pa.Table, text_score: float = 0.5) -> pa.Table:
    """Assembly over ONE url bucket: J1/M15/A5/A6 for every url in the
    bucket.  Sorting and splitting are vectorized; the per-url join is
    a tight loop over numpy slices."""
    import numpy as np

    df = group.to_pandas()
    df = df.sort_values(
        ["url", "is_region", "region_idx"], kind="mergesort"
    ).reset_index(drop=True)
    urls = df["url"].to_numpy()
    bounds = np.flatnonzero(np.concatenate([[True], urls[1:] != urls[:-1]]))
    bounds = np.append(bounds, len(urls))
    out_rows = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        sub = df.iloc[s:e]
        doc = sub[~sub.is_region.fillna(False)]
        regions = sub[sub.is_region.fillna(False)]
        base = doc.iloc[0] if len(doc) else regions.iloc[0]
        out = {
            "url": base["url"],
            "warc_ts": None if len(doc) == 0 else doc.iloc[0]["warc_ts"],
            "lang": base["lang"],
            "route": base["route"],
            "err": base["err"],
            "extracted_text": None if len(doc) == 0 else doc.iloc[0]["extracted_text"],
            "n_spans": 0,
            "spans": "[]",
            "det_elapse": None if len(doc) == 0 else doc.iloc[0]["det_elapse"],
            "cls_elapse": None,
            "rec_elapse": None,
        }
        if len(regions):
            scores = regions["rec_score"].fillna(0.0)
            kept = regions[scores >= text_score]
            if len(kept):
                out["extracted_text"] = "\n".join(kept["rec_text"])  # A5
                out["n_spans"] = int(len(kept))
                out["spans"] = json.dumps(
                    [
                        {"box": [int(v) for v in b], "text": t, "score": float(sc)}
                        for b, t, sc in zip(
                            kept["box"], kept["rec_text"], kept["rec_score"]
                        )
                    ]
                )
            else:
                out["extracted_text"] = None  # M18
            cls_vals = regions["cls_elapse"].dropna()
            rec_vals = regions["rec_elapse"].dropna()
            out["cls_elapse"] = float(cls_vals.sum()) if len(cls_vals) else None
            out["rec_elapse"] = float(rec_vals.sum()) if len(rec_vals) else None
        out_rows.append(out)
    return rows_to_table(out_rows, schema=FINAL_SCHEMA)
