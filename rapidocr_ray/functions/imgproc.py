"""Image-processing kernels for the cascade path — faithful, from-scratch
implementations of the reference's pre/post-processing rules (SURVEY.md
§2.2).  Pure numpy; no cv2/pyclipper in this environment, so contour
machinery is an exact-semantics replacement (connected components +
axis-aligned min boxes) with the same thresholds, filters, rounding and
ordering rules.  All functions are deterministic and shared verbatim by
the Ray stages and the single-process oracle.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# M1 — DetResizeForTest (ch_ppocr_v3_det/utils.py:101-211), mode 0:
# scale so the min/max side meets limit_side_len, then round H and W to
# multiples of 32.  The x32 rounding is bit-exact per the reference
# (int(round(h*ratio/32)*32)); resize is bilinear with cv2 INTER_LINEAR
# geometry (utils.py:184), implemented in resize_bilinear below.
# ---------------------------------------------------------------------------


def det_resize(img: np.ndarray, limit_side_len: int = 960, limit_type: str = "max"):
    """Returns (resized_img, (src_h, src_w, ratio_h, ratio_w)).

    Mirrors DetResizeForTest.resize_image_type0: ratio chosen from the
    limit rule, target dims rounded to x32, early-return None analog for
    degenerate sizes (utils.py:178-180) mapped to raising ValueError.
    """
    src_h, src_w = img.shape[:2]
    h, w = float(src_h), float(src_w)
    if limit_type == "max":
        ratio = float(limit_side_len) / max(h, w) if max(h, w) > limit_side_len else 1.0
    elif limit_type == "min":
        ratio = float(limit_side_len) / min(h, w) if min(h, w) < limit_side_len else 1.0
    else:
        raise ValueError(f"unknown limit_type {limit_type!r}")
    resize_h = int(round(h * ratio / 32.0) * 32)
    resize_w = int(round(w * ratio / 32.0) * 32)
    if resize_h <= 0 or resize_w <= 0:
        raise ValueError("image too small to resize")  # utils.py:178-180 analog
    resized = resize_bilinear(img, resize_h, resize_w)
    ratio_h = resize_h / float(src_h)
    ratio_w = resize_w / float(src_w)
    return resized, (src_h, src_w, ratio_h, ratio_w)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (index mapping floor((i+0.5)/scale))."""
    src_h, src_w = img.shape[:2]
    if (out_h, out_w) == (src_h, src_w):
        return img
    rows = np.minimum((np.arange(out_h) + 0.5) * (src_h / out_h), src_h - 1).astype(np.int64)
    cols = np.minimum((np.arange(out_w) + 0.5) * (src_w / out_w), src_w - 1).astype(np.int64)
    return img[rows][:, cols]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with cv2.INTER_LINEAR geometry: half-pixel
    centers (src = (dst+0.5)*scale - 0.5), edge clamp.  Separable —
    interpolate rows then columns.  uint8 in -> uint8 out (round-half-up
    like cv2's fixed-point path); float in -> float out.

    The reference resizes with cv2 INTER_LINEAR at M1/M10/M13
    (ch_ppocr_v3_det/utils.py:184, ch_ppocr_v2_cls/text_cls.py:85,
    ch_ppocr_v3_rec/text_recognize.py:87).

    Grayscale-only contract: 2-D (H, W) input (the engine's bitmaps are
    single-channel end-to-end); the separable weight arrays broadcast
    against 2-D only."""
    assert img.ndim == 2, "resize_bilinear expects a 2-D grayscale image"
    src_h, src_w = img.shape[:2]
    if (out_h, out_w) == (src_h, src_w):
        return img
    y = (np.arange(out_h) + 0.5) * (src_h / out_h) - 0.5
    x = (np.arange(out_w) + 0.5) * (src_w / out_w) - 0.5
    y0 = np.clip(np.floor(y), 0, src_h - 1).astype(np.int64)
    x0 = np.clip(np.floor(x), 0, src_w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, src_h - 1)
    x1 = np.minimum(x0 + 1, src_w - 1)
    # float32 accumulation for uint8 inputs: exact for 0..255 pixel
    # values times dyadic-rational weights well inside float32's 24-bit
    # mantissa (cv2's fixed-point path is coarser still); half the
    # memory traffic of float64 on the hot det-resize pass
    dt = np.float32 if img.dtype == np.uint8 else np.float64
    wy = np.clip(y - y0, 0.0, 1.0)[:, None].astype(dt)
    wx = np.clip(x - x0, 0.0, 1.0)[None, :].astype(dt)
    f = img.astype(dt)
    # separable: interpolate rows first (2 row gathers), then columns
    # (2 column gathers) — half the gather traffic of the 4-corner form
    rows_i = f[y0] * (1 - wy) + f[y1] * wy           # [out_h, src_w]
    out = rows_i[:, x0] * (1 - wx) + rows_i[:, x1] * wx
    if img.dtype == np.uint8:
        return np.floor(out + np.float32(0.5)).astype(np.uint8)
    return out.astype(img.dtype)


# ---------------------------------------------------------------------------
# M2/M3 — NormalizeImage + ToCHWImage (ch_ppocr_v3_det/utils.py:59-87):
# (img*scale - mean)/std with ImageNet stats, then HWC->CHW.  Our pages
# are single-channel; broadcast to 3 channels first so the tensor shape
# contract (NCHW float32) matches the reference exactly.
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_chw(img: np.ndarray) -> np.ndarray:
    """gray uint8 HW -> float32 CHW normalized, C=3.  Written directly
    in CHW (no HWC intermediate / transpose copy); per-channel values
    identical to the reference formula (img*scale - mean)/std."""
    f = img.astype(np.float32) * (1.0 / 255.0)
    out = np.empty((3, img.shape[0], img.shape[1]), dtype=np.float32)
    for c in range(3):
        np.subtract(f, IMAGENET_MEAN[c], out=out[c])
        np.divide(out[c], IMAGENET_STD[c], out=out[c])
    return out


def normalize_ch0(img: np.ndarray) -> np.ndarray:
    """Channel 0 of normalize_chw as a single (H, W) float32 plane —
    bit-identical to normalize_chw(img)[0].  The det kernel reads only
    channel 0 (state/models.py::_ink_from_normalized), so the hot path
    materializes one plane and broadcasts the channel dim (1/3 the
    memory traffic); normalize_chw remains the full-tensor contract."""
    f = img.astype(np.float32) * (1.0 / 255.0)
    np.subtract(f, IMAGENET_MEAN[0], out=f)
    np.divide(f, IMAGENET_STD[0], out=f)
    return f


# ---------------------------------------------------------------------------
# Connected components — replaces cv2.findContours in the DBPostProcess
# chain (M6, ch_ppocr_v3_det/utils.py:280-307).  Two-pass row-run
# union-find; deterministic label order = discovery order top-to-bottom,
# left-to-right, matching findContours' RETR_LIST discovery enumeration
# closely enough that the max_candidates cap (O3, utils.py:286) has the
# same "first 1000 discovered" meaning.
# ---------------------------------------------------------------------------


def connected_components(bitmap: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected components of a boolean map -> list of bounding boxes
    (xmin, ymin, xmax, ymax) inclusive, in discovery order."""
    h, w = bitmap.shape
    parent: list[int] = []

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    # vectorized run extraction: all (row, x0, x1) runs in one pass —
    # the python work below is proportional to the RUN count (text
    # regions), not the pixel count
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = bitmap
    d = np.diff(padded, axis=1)
    sy, sx = np.nonzero(d == 1)    # run starts, row-major order
    ey, ex = np.nonzero(d == -1)   # run ends (exclusive), same order
    all_runs = list(zip(sy.tolist(), sx.tolist(), (ex - 1).tolist()))

    runs_with_labels: list[tuple[int, int, int, int]] = []  # (y, x0, x1, label)
    prev_runs: list[tuple[int, int, int]] = []  # (x0, x1, label) of prev row
    prev_y = -2
    i = 0
    n_runs = len(all_runs)
    while i < n_runs:
        y = all_runs[i][0]
        row_runs: list[tuple[int, int, int]] = []
        if y != prev_y + 1:
            prev_runs = []
        while i < n_runs and all_runs[i][0] == y:
            _, x0, x1 = all_runs[i]
            label = len(parent)
            parent.append(label)
            # 8-connectivity: overlap with [x0-1, x1+1] of previous row
            for px0, px1, plab in prev_runs:
                if px0 <= x1 + 1 and px1 >= x0 - 1:
                    union(label, plab)
            row_runs.append((x0, x1, label))
            runs_with_labels.append((y, x0, x1, label))
            i += 1
        prev_runs = row_runs
        prev_y = y

    boxes: dict[int, list[int]] = {}
    order: list[int] = []
    for y, x0, x1, label in runs_with_labels:
        root = find(label)
        if root not in boxes:
            boxes[root] = [x0, y, x1, y]
            order.append(root)
        else:
            b = boxes[root]
            b[0] = min(b[0], x0)
            b[2] = max(b[2], x1)
            b[3] = y  # rows are scanned top-down
    return [tuple(boxes[r]) for r in order]


def connected_component_points(bitmap: np.ndarray) -> list[np.ndarray]:
    """8-connected components -> list of per-component point arrays
    [(x, y), ...] (the run ENDPOINTS of every row-run — sufficient for
    the convex hull, hence for minAreaRect), in discovery order
    (top-to-bottom, left-to-right — the same 'first max_candidates
    discovered' meaning cv2.findContours RETR_LIST gives the O3 cap).

    Same two-pass row-run union-find as ``connected_components``; kept
    separate because the bbox-only variant is cheaper and still serves
    callers that need no rotated geometry."""
    h, w = bitmap.shape
    parent: list[int] = []

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = bitmap
    d = np.diff(padded, axis=1)
    sy, sx = np.nonzero(d == 1)
    ey, ex = np.nonzero(d == -1)
    all_runs = list(zip(sy.tolist(), sx.tolist(), (ex - 1).tolist()))

    runs_with_labels: list[tuple[int, int, int, int]] = []
    prev_runs: list[tuple[int, int, int]] = []
    prev_y = -2
    i = 0
    n_runs = len(all_runs)
    while i < n_runs:
        y = all_runs[i][0]
        row_runs: list[tuple[int, int, int]] = []
        if y != prev_y + 1:
            prev_runs = []
        while i < n_runs and all_runs[i][0] == y:
            _, x0, x1 = all_runs[i]
            label = len(parent)
            parent.append(label)
            for px0, px1, plab in prev_runs:
                if px0 <= x1 + 1 and px1 >= x0 - 1:
                    union(label, plab)
            row_runs.append((x0, x1, label))
            runs_with_labels.append((y, x0, x1, label))
            i += 1
        prev_runs = row_runs
        prev_y = y

    # the hull only needs each row's horizontal extremes per component:
    # collapse multiple runs per (component, row) to (min x0, max x1)
    rows: dict[int, dict[int, list[int]]] = {}
    order: list[int] = []
    for y, x0, x1, label in runs_with_labels:
        root = find(label)
        comp = rows.get(root)
        if comp is None:
            rows[root] = comp = {}
            order.append(root)
        ext = comp.get(y)
        if ext is None:
            comp[y] = [x0, x1]
        else:
            if x0 < ext[0]:
                ext[0] = x0
            if x1 > ext[1]:
                ext[1] = x1
    out: list[np.ndarray] = []
    for r in order:
        comp = rows[r]
        pts = []
        for y, (lo, hi) in comp.items():
            pts.append((lo, y))
            if hi != lo:
                pts.append((hi, y))
        out.append(np.array(pts, dtype=np.float64))
    return out


# ---------------------------------------------------------------------------
# Rotated-rectangle geometry — pure-numpy replacements for
# cv2.minAreaRect/boxPoints (get_mini_boxes, utils.py:326-345) and
# cv2.fillPoly (box_score_fast, utils.py:347-361).
# ---------------------------------------------------------------------------


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain -> CCW hull vertices (y axis pointing
    down makes it visually clockwise; orientation is consistent, which
    is all the calipers need).  Scalar cross products — np.cross on
    2-vectors costs ~30x in Python dispatch (profiled at 85% of det
    wall before this)."""
    pts = np.unique(points, axis=0)  # sorts lexicographically (x, then y)
    if len(pts) <= 2:
        return pts
    seq = [(float(x), float(y)) for x, y in pts]

    def half(s):
        out: list[tuple[float, float]] = []
        for px, py in s:
            while len(out) >= 2:
                ox, oy = out[-1]
                qx, qy = out[-2]
                if (ox - qx) * (py - qy) - (oy - qy) * (px - qx) <= 0:
                    out.pop()
                else:
                    break
            out.append((px, py))
        return out

    lower = half(seq)
    upper = half(seq[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Minimum-area enclosing rectangle (rotating calipers over the
    convex hull) -> (4 corner points ordered by the reference's
    get_mini_boxes rule [tl, tr, br, bl], sside = min(w, h)).

    Functional replacement for cv2.minAreaRect + cv2.boxPoints +
    get_mini_boxes (utils.py:326-345); deterministic ties (first
    minimal hull edge wins)."""
    hull = convex_hull(np.asarray(points, dtype=np.float64))
    if len(hull) == 1:
        p = hull[0]
        box = np.array([p, p, p, p])
        return _order_mini_box(box), 0.0
    if len(hull) == 2:
        p, q = hull
        box = np.array([p, q, q, p])
        return _order_mini_box(box), 0.0
    best = None
    n = len(hull)
    for i in range(n):
        e = hull[(i + 1) % n] - hull[i]
        norm = np.hypot(e[0], e[1])
        if norm == 0:
            continue
        u = e / norm
        v = np.array([-u[1], u[0]])
        pu = hull @ u
        pv = hull @ v
        w = pu.max() - pu.min()
        h = pv.max() - pv.min()
        area = w * h
        if best is None or area < best[0] - 1e-12:
            best = (area, u, v, pu.min(), pv.min(), w, h)
    _, u, v, u0, v0, w, h = best
    c00 = u * u0 + v * v0
    box = np.array([c00, c00 + u * w, c00 + u * w + v * h, c00 + v * h])
    return _order_mini_box(box), float(min(w, h))


def _order_mini_box(box: np.ndarray) -> np.ndarray:
    """get_mini_boxes point ordering (utils.py:329-344): sort the 4
    corners by x, then resolve each x-pair by y -> [tl, tr, br, bl]."""
    pts = sorted(box.tolist(), key=lambda p: p[0])
    if pts[1][1] > pts[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if pts[3][1] > pts[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    return np.array([pts[i1], pts[i2], pts[i3], pts[i4]], dtype=np.float64)


def fill_poly_mask(shape: tuple[int, int], quad: np.ndarray) -> np.ndarray:
    """Boolean mask of pixels inside or on the polygon — the
    cv2.fillPoly analog used by box_score_fast (utils.py:354-360).
    Vectorized even-odd ray cast over the window (4 edge passes) plus
    explicit boundary inclusion, so an axis-aligned int rect fills
    exactly [x0..x1] x [y0..y1] as cv2 does."""
    h, w = shape
    q = np.asarray(quad, dtype=np.float64)
    n = len(q)
    ys, xs = np.mgrid[0:h, 0:w]
    inside = np.zeros((h, w), dtype=bool)
    on_edge = np.zeros((h, w), dtype=bool)
    for i in range(n):
        x1, y1 = q[i]
        x2, y2 = q[(i + 1) % n]
        if y1 != y2:
            crosses = ((y1 <= ys) & (ys < y2)) | ((y2 <= ys) & (ys < y1))
            xi = x1 + (ys - y1) * (x2 - x1) / (y2 - y1)
            inside ^= crosses & (xs < xi)
        cross = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
        on_edge |= (
            (cross == 0)
            & (xs >= min(x1, x2)) & (xs <= max(x1, x2))
            & (ys >= min(y1, y2)) & (ys <= max(y1, y2))
        )
    return inside | on_edge


def box_score_fast(pred: np.ndarray, box: np.ndarray) -> float:
    """A3 'fast' score (utils.py:347-361): mean prob inside the filled
    quad, evaluated on the quad's clipped AABB window."""
    h, w = pred.shape[:2]
    b = np.asarray(box, dtype=np.float64).copy()
    xmin = int(np.clip(np.floor(b[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(b[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(b[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(b[:, 1].max()), 0, h - 1))
    b[:, 0] -= xmin
    b[:, 1] -= ymin
    bi = np.floor(b).astype(np.int64)
    window = pred[ymin:ymax + 1, xmin:xmax + 1]
    if _axis_aligned(bi) and np.all(b == bi):
        # the filled INTEGRAL quad covers its own AABB window exactly —
        # the common case (axis-aligned text): score = plain window
        # mean.  Fractional corners that merely FLOOR to axis-aligned
        # must take the mask path: the ceil-extended window includes an
        # uncovered fractional margin the mask correctly excludes
        return float(window.mean())
    mask = fill_poly_mask(window.shape, bi)
    if not mask.any():
        return 0.0
    return float(window[mask].mean())


def box_score_slow(pred: np.ndarray, contour: np.ndarray) -> float:
    """A3 'slow' score (box_score_slow, utils.py:363-380): mean prob
    inside the CONTOUR polygon rather than the minAreaRect quad.  Our
    contour analog is the component's convex hull (the union-find run
    extremes play the role of CHAIN_APPROX_SIMPLE's corner chain)."""
    poly = convex_hull(np.asarray(contour, dtype=np.float64))
    if len(poly) < 3:
        poly = np.asarray(contour, dtype=np.float64).reshape(-1, 2)
    h, w = pred.shape[:2]
    b = poly.copy()
    xmin = int(np.clip(np.floor(b[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(b[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(b[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(b[:, 1].max()), 0, h - 1))
    b[:, 0] -= xmin
    b[:, 1] -= ymin
    mask = fill_poly_mask((ymax - ymin + 1, xmax - xmin + 1), np.floor(b).astype(np.int64))
    if not mask.any():
        return 0.0
    window = pred[ymin:ymax + 1, xmin:xmax + 1]
    return float(window[mask].mean())


def unclip_rect(box: np.ndarray, unclip_ratio: float) -> tuple[np.ndarray, float]:
    """The reference unclips the minAreaRect quad with a pyclipper
    JT_ROUND offset by d = area*ratio/perimeter, then takes
    minAreaRect again (utils.py:317-324, 305-306).  For a rectangle the
    round offset is the Minkowski sum with a d-disk, whose minimum-area
    rectangle is the SAME rectangle grown by d on every side — so the
    analytic expansion below is exactly the composition the reference
    computes, without pyclipper."""
    b = np.asarray(box, dtype=np.float64)
    w = float(np.hypot(*(b[1] - b[0])))
    h = float(np.hypot(*(b[3] - b[0])))
    if w == 0 or h == 0:
        return b.copy(), 0.0
    area = w * h
    perimeter = 2.0 * (w + h)
    d = area * unclip_ratio / perimeter
    u = (b[1] - b[0]) / w
    v = (b[3] - b[0]) / h
    out = np.array(
        [
            b[0] - u * d - v * d,
            b[1] + u * d - v * d,
            b[2] + u * d + v * d,
            b[3] - u * d + v * d,
        ]
    )
    return _order_mini_box(out), float(min(w, h) + 2 * d)


def dilate2x2(bitmap: np.ndarray) -> np.ndarray:
    """cv2.dilate with a 2x2 ones kernel (anchor top-left), as in
    DBPostProcess when use_dilation is set (utils.py:264-270)."""
    out = bitmap.copy()
    out[1:, :] |= bitmap[:-1, :]
    out[:, 1:] |= bitmap[:, :-1]
    out[1:, 1:] |= bitmap[:-1, :-1]
    return out


# ---------------------------------------------------------------------------
# M6 — DBPostProcess (ch_ppocr_v3_det/utils.py:248-401), numpy edition.
# prob map -> bitmap -> components -> minAreaRect (rotated quads) ->
# fast polygon score -> analytic JT_ROUND unclip -> minAreaRect ->
# rescale.  Faithful flow of boxes_from_bitmap (utils.py:269-316) with
# the cv2/pyclipper calls replaced by the pure-numpy geometry above.
# ---------------------------------------------------------------------------


def db_postprocess(
    pred: np.ndarray,
    shape_info: tuple[int, int, float, float],
    thresh: float = 0.3,
    box_thresh: float = 0.5,
    max_candidates: int = 1000,
    unclip_ratio: float = 1.6,
    use_dilation: bool = True,
    min_box_side: int = 3,
    score_mode: str = "fast",
) -> tuple[np.ndarray, list[float]]:
    """pred: float32 [H, W] probability map in resized frame.
    Returns (boxes int32 [N,4,2] rotated quads in SOURCE frame, scores).

    ``score_mode``: 'fast' scores the minAreaRect quad (box_score_fast,
    utils.py:296-299), 'slow' scores the contour polygon itself
    (box_score_slow, utils.py:300) — tighter on L-shaped components."""
    src_h, src_w, ratio_h, ratio_w = shape_info
    bitmap = pred > thresh
    if use_dilation:
        bitmap = dilate2x2(bitmap)
    comps = connected_component_points(bitmap)[:max_candidates]  # O3 cap
    out_boxes: list[np.ndarray] = []
    out_scores: list[float] = []
    for pts in comps:
        points, sside = min_area_rect(pts)
        if sside < min_box_side:  # mini-box drop (utils.py:292-294)
            continue
        if score_mode == "slow":
            score = box_score_slow(pred, pts)  # A3 slow (utils.py:300)
        else:
            score = box_score_fast(pred, points)  # A3 (utils.py:296-299)
        if score < box_thresh:
            continue
        box, esside = unclip_rect(points, unclip_ratio)  # utils.py:302-306
        if esside < min_box_side + 2:
            continue
        # rescale to source frame + clip (utils.py:308-313)
        box = box.copy()
        box[:, 0] = np.clip(np.round(box[:, 0] / ratio_w), 0, src_w)
        box[:, 1] = np.clip(np.round(box[:, 1] / ratio_h), 0, src_h)
        out_boxes.append(box.astype(np.int32))
        out_scores.append(score)
    if not out_boxes:
        return np.zeros((0, 4, 2), dtype=np.int32), []
    return np.stack(out_boxes), out_scores


# ---------------------------------------------------------------------------
# M19 — order_points_clockwise (ch_ppocr_v3_det/text_detect.py:84-107):
# canonical tl,tr,br,bl by x-sort then y-sort of the two halves.
# ---------------------------------------------------------------------------


def order_points_clockwise(pts: np.ndarray) -> np.ndarray:
    xs = pts[np.argsort(pts[:, 0])]
    left, right = xs[:2], xs[2:]
    left = left[np.argsort(left[:, 1])]      # tl, bl
    right = right[np.argsort(right[:, 1])]   # tr, br
    return np.array([left[0], right[0], right[1], left[1]], dtype=pts.dtype)


# ---------------------------------------------------------------------------
# M7 — filter_tag_det_res (ch_ppocr_v3_det/text_detect.py:109-127):
# canonicalize, clip to bounds, drop boxes with a side <= 3 px.
# ---------------------------------------------------------------------------


def filter_det_boxes(boxes: np.ndarray, src_h: int, src_w: int) -> np.ndarray:
    kept = []
    for box in boxes:
        b = order_points_clockwise(box.astype(np.float64))
        b[:, 0] = np.clip(b[:, 0], 0, src_w - 1)
        b[:, 1] = np.clip(b[:, 1], 0, src_h - 1)
        rect_w = int(np.linalg.norm(b[0] - b[1]))
        rect_h = int(np.linalg.norm(b[0] - b[3]))
        if rect_w <= 3 or rect_h <= 3:
            continue
        kept.append(b.astype(np.int32))
    if not kept:
        return np.zeros((0, 4, 2), dtype=np.int32)
    return np.stack(kept)


# ---------------------------------------------------------------------------
# M8 — sorted_boxes (rapid_ocr_api.py:152-174): sort by (y, x), then one
# adjacent-swap pass where boxes whose top-y differs by < 10 px are
# re-ordered by x.  This ordering defines output text concatenation and
# must be exact.
# ---------------------------------------------------------------------------


def sorted_boxes(boxes: np.ndarray) -> list[np.ndarray]:
    n = boxes.shape[0]
    sb = sorted(boxes, key=lambda b: (b[0][1], b[0][0]))
    out = list(sb)
    for i in range(n - 1):
        for j in range(i, -1, -1):
            if (
                abs(out[j + 1][0][1] - out[j][0][1]) < 10
                and out[j + 1][0][0] < out[j][0][0]
            ):
                out[j], out[j + 1] = out[j + 1], out[j]
            else:
                break
    return out


# ---------------------------------------------------------------------------
# M9 — get_rotate_crop_image (rapid_ocr_api.py:121-150): perspective-warp
# the quad upright (bilinear inverse map with BORDER_REPLICATE — the
# reference uses INTER_CUBIC, a documented interpolation divergence);
# rotate 90 deg CCW if h/w >= 1.5.  Axis-aligned integer quads take an
# exact array-slice fast path (bit-identical to the identity warp).
# ---------------------------------------------------------------------------


def perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping src quad -> dst quad
    (cv2.getPerspectiveTransform analog: 8-unknown linear solve)."""
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        sx, sy = src[i]
        dx, dy = dst[i]
        a[2 * i] = [sx, sy, 1, 0, 0, 0, -sx * dx, -sy * dx]
        a[2 * i + 1] = [0, 0, 0, sx, sy, 1, -sx * dy, -sy * dy]
        b[2 * i] = dx
        b[2 * i + 1] = dy
    coeff = np.linalg.solve(a, b)
    return np.append(coeff, 1.0).reshape(3, 3)


def warp_perspective(
    img: np.ndarray, m: np.ndarray, out_w: int, out_h: int
) -> np.ndarray:
    """Inverse-map bilinear warp with border replicate
    (cv2.warpPerspective analog; rapid_ocr_api.py:134-139)."""
    minv = np.linalg.inv(m)
    xs, ys = np.meshgrid(np.arange(out_w, dtype=np.float64),
                         np.arange(out_h, dtype=np.float64))
    denom = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / denom
    sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / denom
    h, w = img.shape[:2]
    sx = np.clip(sx, 0, w - 1)
    sy = np.clip(sy, 0, h - 1)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = sx - x0
    fy = sy - y0
    f = img.astype(np.float64)
    out = (
        f[y0, x0] * (1 - fx) * (1 - fy)
        + f[y0, x1] * fx * (1 - fy)
        + f[y1, x0] * (1 - fx) * fy
        + f[y1, x1] * fx * fy
    )
    if img.dtype == np.uint8:
        return np.floor(out + 0.5).astype(np.uint8)
    return out.astype(img.dtype)


def _axis_aligned(b: np.ndarray) -> bool:
    return (
        b[0][1] == b[1][1]
        and b[2][1] == b[3][1]
        and b[0][0] == b[3][0]
        and b[1][0] == b[2][0]
    )


def crop_box(img: np.ndarray, box: np.ndarray) -> np.ndarray:
    b = box.astype(np.float64)
    img_crop_width = int(max(np.linalg.norm(b[0] - b[1]), np.linalg.norm(b[2] - b[3])))
    img_crop_height = int(max(np.linalg.norm(b[0] - b[3]), np.linalg.norm(b[1] - b[2])))
    if img_crop_width <= 0 or img_crop_height <= 0:
        return np.zeros((1, 1), dtype=img.dtype)
    if _axis_aligned(box):
        # exact fast path: identity warp == slice (+replicate padding
        # never needed because det boxes are clipped to the image)
        x0 = max(0, int(b[:, 0].min()))
        y0 = max(0, int(b[:, 1].min()))
        crop = img[y0:min(y0 + img_crop_height, img.shape[0]),
                   x0:min(x0 + img_crop_width, img.shape[1])]
        if crop.size == 0:
            return np.zeros((1, 1), dtype=img.dtype)
    else:
        pts_std = np.array(
            [[0, 0], [img_crop_width, 0], [img_crop_width, img_crop_height],
             [0, img_crop_height]], dtype=np.float64
        )
        m = perspective_matrix(b, pts_std)
        crop = warp_perspective(img, m, img_crop_width, img_crop_height)
    # rotate 90 deg CCW when tall (rapid_ocr_api.py:144-148, np.rot90 k=1)
    if crop.shape[0] * 1.0 / crop.shape[1] >= 1.5:
        crop = np.rot90(crop).copy()
    return crop


def rotate180(img: np.ndarray) -> np.ndarray:
    """cv2.rotate(img, ROTATE_180) analog (ch_ppocr_v2_cls/text_cls.py:71)."""
    return img[::-1, ::-1].copy()


# ---------------------------------------------------------------------------
# M17 — det-bypass routing predicate + whole-image box
# (rapid_ocr_api.py:69-77,114-119 get_boxes_img_without_det).
# ---------------------------------------------------------------------------


def use_det_bypass(h: int, w: int, min_height: int = 30, width_height_ratio: float = 8.0) -> bool:
    if width_height_ratio < 0:  # -1 disables the ratio rule (utils.py arg semantics)
        return h <= min_height
    return h <= min_height or w / max(h, 1) > width_height_ratio


def whole_image_box(h: int, w: int) -> np.ndarray:
    return np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.int32)
