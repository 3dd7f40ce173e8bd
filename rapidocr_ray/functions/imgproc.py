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
# (int(round(h*ratio/32)*32)); resize itself is nearest-neighbor (the
# reference uses cv2 bilinear — a documented divergence that cannot
# change box *semantics* here because the det kernel is threshold-based).
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
    resized = resize_nearest(img, resize_h, resize_w)
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
# prob map -> bitmap -> components -> scored boxes -> unclip -> rescale.
# Boxes here are axis-aligned quads [[x0,y0],[x1,y0],[x1,y1],[x0,y1]]
# (tl,tr,br,bl) — the minAreaRect of axis-aligned synthetic text is the
# axis-aligned box, so semantics are preserved; documented divergence:
# no rotated rectangles without cv2.
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
) -> tuple[np.ndarray, list[float]]:
    """pred: float32 [H, W] probability map in resized frame.
    Returns (boxes int32 [N,4,2] in SOURCE frame, scores)."""
    src_h, src_w, ratio_h, ratio_w = shape_info
    bitmap = pred > thresh
    if use_dilation:
        bitmap = dilate2x2(bitmap)
    comps = connected_components(bitmap)[:max_candidates]  # O3 cap
    out_boxes: list[np.ndarray] = []
    out_scores: list[float] = []
    for (xmin, ymin, xmax, ymax) in comps:
        bw = xmax - xmin + 1
        bh = ymax - ymin + 1
        if min(bw, bh) < min_box_side:  # mini-box drop (utils.py:330-333 sside<3)
            continue
        # A3 'fast' score: mean prob over the bbox mask
        score = float(pred[ymin:ymax + 1, xmin:xmax + 1].mean())
        if score < box_thresh:
            continue
        # unclip: offset distance d = area * unclip_ratio / perimeter
        # (utils.py:317-324), applied as an axis-aligned margin.
        area = float(bw * bh)
        perimeter = 2.0 * (bw + bh)
        d = area * unclip_ratio / perimeter
        ex0 = xmin - d
        ey0 = ymin - d
        ex1 = xmax + 1 + d
        ey1 = ymax + 1 + d
        if min(ex1 - ex0, ey1 - ey0) < min_box_side + 2:  # re-minbox drop (sside<5)
            continue
        # rescale to source frame + clip (utils.py:354-360)
        box = np.array(
            [[ex0, ey0], [ex1, ey0], [ex1, ey1], [ex0, ey1]], dtype=np.float64
        )
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
# the quad upright; rotate 90 deg if h/w >= 1.5.  Axis-aligned quads make
# the warp an exact array slice (same output the reference's
# warpPerspective yields for an axis-aligned box).
# ---------------------------------------------------------------------------


def crop_box(img: np.ndarray, box: np.ndarray) -> np.ndarray:
    b = box.astype(np.int64)
    img_crop_width = int(max(np.linalg.norm(b[0] - b[1]), np.linalg.norm(b[2] - b[3])))
    img_crop_height = int(max(np.linalg.norm(b[0] - b[3]), np.linalg.norm(b[1] - b[2])))
    x0 = int(min(b[:, 0])); x1 = x0 + img_crop_width
    y0 = int(min(b[:, 1])); y1 = y0 + img_crop_height
    x0 = max(0, x0); y0 = max(0, y0)
    crop = img[y0:min(y1, img.shape[0]), x0:min(x1, img.shape[1])]
    if crop.size == 0:
        return np.zeros((1, 1), dtype=img.dtype)
    # rotate 90 deg when tall (rapid_ocr_api.py:144-148)
    if crop.shape[0] * 1.0 / crop.shape[1] >= 1.5:
        crop = np.rot90(crop, k=3).copy()
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
