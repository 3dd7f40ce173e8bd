"""Rotated-text geometry: pure-numpy minAreaRect / fillPoly / unclip /
perspective warp (ch_ppocr_v3_det/utils.py:280-345, rapid_ocr_api.py:
121-150 analogs), the bilinear resize kernels, and the rotated-page
golden — det quad vs hand-computed rotated rect, full-cascade text
recovery, and Ray-vs-oracle byte identity on a rotated payload."""

import datetime

import numpy as np
import pyarrow as pa

from rapidocr_ray.config import PipelineConfig
from rapidocr_ray.functions.imgproc import (
    crop_box,
    fill_poly_mask,
    min_area_rect,
    perspective_matrix,
    resize_bilinear,
    unclip_rect,
    warp_perspective,
)
from rapidocr_ray.glyphs import encode_rbmp, render_page


def test_resize_bilinear_hand_computed():
    img = np.array([[0, 100], [200, 60]], dtype=np.uint8)
    out = resize_bilinear(img, 4, 4)
    # dst (0,0): src = (0.5*0.5-0.5, ...) = (-0.25,-0.25) -> clamp -> corner
    assert out[0, 0] == 0 and out[0, 3] == 100
    assert out[3, 0] == 200 and out[3, 3] == 60
    # dst (1,1): src (0.25, 0.25) -> .75*.75*0 + .75*.25*100 + .25*.75*200 + .25*.25*60
    expect = 0.5625 * 0 + 0.1875 * 100 + 0.1875 * 200 + 0.0625 * 60
    assert out[1, 1] == int(np.floor(expect + 0.5))


def test_resize_bilinear_4x_inversion():
    """The M13 contract: 4x bilinear upscale of a binary band is exactly
    inverted by thresholded sampling at [1::4, 1::4] (RecModel.infer)."""
    rng = np.random.default_rng(3)
    band = (rng.random((12, 40)) < 0.4).astype(np.uint8) * 255
    up = resize_bilinear(band, 48, 160)
    rec = up[1::4, 1::4] > 127
    assert np.array_equal(rec, band > 127)


def test_min_area_rect_axis_aligned():
    pts = np.array([[2, 3], [10, 3], [10, 7], [2, 7], [5, 5]], dtype=np.float64)
    box, sside = min_area_rect(pts)
    assert sside == 4.0
    assert sorted(map(tuple, box.tolist())) == [
        (2.0, 3.0), (2.0, 7.0), (10.0, 3.0), (10.0, 7.0)
    ]
    # get_mini_boxes order: tl, tr, br, bl
    assert box.tolist() == [[2, 3], [10, 3], [10, 7], [2, 7]]


def test_min_area_rect_rotated_hand_computed():
    """A 3-4-5 oriented rectangle: corners of a w=10, h=5 rect rotated
    by atan2(3,4).  The calipers must recover it exactly."""
    u = np.array([0.8, 0.6])
    v = np.array([-0.6, 0.8])
    origin = np.array([20.0, 10.0])
    corners = np.array([origin, origin + 10 * u, origin + 10 * u + 5 * v, origin + 5 * v])
    # feed interior + corner points
    pts = np.vstack([corners, origin + 5 * u + 2 * v])
    box, sside = min_area_rect(pts)
    assert abs(sside - 5.0) < 1e-9
    got = sorted(map(tuple, np.round(box, 6).tolist()))
    want = sorted(map(tuple, np.round(corners, 6).tolist()))
    assert got == want


def test_fill_poly_mask_axis_aligned_exact():
    mask = fill_poly_mask((8, 10), np.array([[2, 1], [6, 1], [6, 4], [2, 4]]))
    want = np.zeros((8, 10), dtype=bool)
    want[1:5, 2:7] = True
    assert np.array_equal(mask, want)


def test_fill_poly_mask_rotated_area():
    # diamond with vertices on axes: area 2*r^2 = 50 for r=5
    quad = np.array([[10, 5], [15, 10], [10, 15], [5, 10]])
    mask = fill_poly_mask((20, 20), quad)
    assert abs(int(mask.sum()) - 50) <= 11  # rasterized diamond ~ area


def test_unclip_rect_expands_by_d():
    box = np.array([[0, 0], [10, 0], [10, 4], [0, 4]], dtype=np.float64)
    out, sside = unclip_rect(box, unclip_ratio=1.6)
    d = (10 * 4) * 1.6 / (2 * (10 + 4))
    assert abs(sside - (4 + 2 * d)) < 1e-9
    assert np.allclose(out, [[-d, -d], [10 + d, -d], [10 + d, 4 + d], [-d, 4 + d]])


def test_warp_identity_equals_slice():
    rng = np.random.default_rng(0)
    img = (rng.random((30, 40)) * 255).astype(np.uint8)
    quad = np.array([[5, 3], [25, 3], [25, 13], [5, 13]])
    m = perspective_matrix(
        quad.astype(np.float64),
        np.array([[0, 0], [20, 0], [20, 10], [0, 10]], dtype=np.float64),
    )
    warped = warp_perspective(img, m, 20, 10)
    assert np.array_equal(warped, img[3:13, 5:25])
    # crop_box's axis-aligned fast path agrees
    assert np.array_equal(crop_box(img, quad), img[3:13, 5:25])


def _rotated_canvas(lines, deg):
    """Render a page, rotate by deg into a larger canvas (pure-numpy
    ground truth), returning (canvas, rotated page corners)."""
    page = render_page(lines)
    h, w = page.shape
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    big_h, big_w = int(h * c + w * s) + 40, int(w * c + h * s) + 40
    corners = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float64)
    rot = (corners - [w / 2, h / 2]) @ np.array([[c, s], [-s, c]]) + [big_w / 2, big_h / 2]
    canvas = warp_perspective(page, perspective_matrix(corners, rot), big_w, big_h)
    return canvas, rot


def test_rotated_page_det_quad_matches_hand_computed():
    """7-degree rotated single-line page: the det quad's long edge must
    carry the rotation angle and its corners must sit within the
    det-smear + unclip margin of the hand-rotated ink rectangle."""
    from rapidocr_ray.stages.cascade import TextDetector

    deg = 7.0
    canvas, rot_corners = _rotated_canvas(["hello world test line"], deg)
    det = TextDetector(PipelineConfig().Det)
    boxes = det(canvas)
    assert boxes.shape == (1, 4, 2)
    box = boxes[0].astype(np.float64)
    # edge angle of the detected quad == rotation angle (deg, tolerance
    # from int corner rounding on a ~200 px edge)
    e = box[1] - box[0]
    angle = np.rad2deg(np.arctan2(e[1], e[0]))
    assert abs(angle - deg) < 1.5
    # every detected corner lies within smear+unclip margin (~22 px)
    # of the rotated PAGE rectangle's corner zone
    for corner in box:
        dist = np.min(np.linalg.norm(rot_corners - corner, axis=1))
        assert dist < 30, (corner, rot_corners)


def test_rotated_page_text_recovery():
    """Full det -> warp -> deskew -> rec on rotated pages recovers the
    text exactly at angles where glyph-level distortion stays sub-pixel."""
    from rapidocr_ray.stages.cascade import TextDetector, TextRecognizer

    cfg = PipelineConfig()
    det, rec = TextDetector(cfg.Det), TextRecognizer(cfg.Rec)
    for deg in (2.0, 7.0, 15.0):
        canvas, _ = _rotated_canvas(["hello world test line"], deg)
        boxes = det(canvas)
        res = rec([crop_box(canvas, b) for b in boxes])
        assert [r[0] for r in res] == ["hello world test line"], deg


def test_multiline_rotated_page_lines_stay_separate():
    """Direction-aware det smear (round-2 known limitation): on a sloped
    page the axis-aligned H-smear turned horizontal reach into vertical
    proximity and merged neighbouring lines.  The shear-aware smear must
    keep a 2-line page as 2 boxes across angles and recover both lines'
    text exactly at 7 degrees (corpus-contract line_gap=32)."""
    from rapidocr_ray.functions.imgproc import sorted_boxes
    from rapidocr_ray.stages.cascade import TextDetector, TextRecognizer

    cfg = PipelineConfig()
    det, rec = TextDetector(cfg.Det), TextRecognizer(cfg.Rec)
    lines = ["hello world test line", "second line of text"]
    page = render_page(lines, line_gap=32)
    h, w = page.shape
    for deg in (0.0, 2.0, 7.0, 15.0):
        th = np.deg2rad(deg)
        c, s = np.cos(th), np.sin(th)
        big_h, big_w = int(h * c + w * s) + 40, int(w * c + h * s) + 40
        corners = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float64)
        rot = (corners - [w / 2, h / 2]) @ np.array([[c, s], [-s, c]]) + [big_w / 2, big_h / 2]
        canvas = warp_perspective(page, perspective_matrix(corners, rot), big_w, big_h)
        boxes = sorted_boxes(det(canvas))
        assert len(boxes) == 2, deg
        if deg <= 7.0:  # glyph warp distortion stays sub-threshold
            res = rec([crop_box(canvas, b) for b in boxes])
            assert [r[0] for r in res] == lines, deg


def test_multiline_rotated_ray_matches_oracle(ray_session):
    """Byte-identical Ray-vs-oracle on a MULTI-LINE 7-degree rotated
    page (round-2 verdict worklist #8): both engines run the same
    direction-aware smear, and the extracted text must carry both
    lines in reading order."""
    from rapidocr_ray.pipelines.extract import extract_pages_table
    from rapidocr_ray.pipelines.oracle import OracleExtractor

    page = render_page(["hello world test line", "second line of text"], line_gap=32)
    h, w = page.shape
    th = np.deg2rad(7.0)
    c, s = np.cos(th), np.sin(th)
    big_h, big_w = int(h * c + w * s) + 40, int(w * c + h * s) + 40
    corners = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float64)
    rot = (corners - [w / 2, h / 2]) @ np.array([[c, s], [-s, c]]) + [big_w / 2, big_h / 2]
    canvas = warp_perspective(page, perspective_matrix(corners, rot), big_w, big_h)
    ts = datetime.datetime(2024, 1, 1)
    pages = pa.table(
        {
            "url": ["https://r.example/rot2"],
            "warc_ts": pa.array([ts], type=pa.timestamp("us")),
            "html": [encode_rbmp(canvas)],
            "lang": ["en"],
        }
    )
    got = extract_pages_table(pages).to_pandas()
    want_tbl = OracleExtractor().run(pages)
    want = want_tbl.to_pandas() if isinstance(want_tbl, pa.Table) else want_tbl
    for col in ["url", "route", "err", "extracted_text", "n_spans", "spans"]:
        assert got[col].fillna("<N>").tolist() == want[col].fillna("<N>").tolist(), col
    assert got.extracted_text[0] == "hello world test line\nsecond line of text"


def test_rotated_page_ray_matches_oracle(ray_session):
    """Byte-identical Ray-vs-oracle on a corpus containing a rotated
    RBMP payload (the north rule's per-url invariant, rotated case)."""
    from rapidocr_ray.pipelines.extract import extract_pages_table
    from rapidocr_ray.pipelines.oracle import OracleExtractor

    canvas, _ = _rotated_canvas(["hello world test line"], 7.0)
    plain = render_page(["plain upright page"])
    ts = datetime.datetime(2024, 1, 1)
    pages = pa.table(
        {
            "url": ["https://r.example/rot", "https://r.example/plain"],
            "warc_ts": pa.array([ts, ts], type=pa.timestamp("us")),
            "html": [encode_rbmp(canvas), encode_rbmp(plain)],
            "lang": ["en", "en"],
        }
    )
    got = extract_pages_table(pages).to_pandas().sort_values("url").reset_index(drop=True)
    want_tbl = OracleExtractor().run(pages)
    want_tbl = want_tbl.to_pandas() if isinstance(want_tbl, pa.Table) else want_tbl
    want = want_tbl.sort_values("url").reset_index(drop=True)
    for col in ["url", "route", "err", "extracted_text", "n_spans", "spans"]:
        assert got[col].fillna("<N>").tolist() == want[col].fillna("<N>").tolist(), col
    assert "hello world test line" in got.extracted_text.tolist()[1 if got.url[1].endswith("rot") else 0]
