"""Seeded deterministic "model" kernels + the per-worker model registry.

The reference holds an ONNXRuntime ``InferenceSession`` per stage,
built once per process (T1, python/rapidocr_onnxruntime/utils.py:21-87)
and cached across languages through two ``lru_cache`` levels (T3,
ocrweb_multi/rapidocr/rapid_ocr_api.py:53-61, main.py:15-19).  No model
files ship in the reference and this sandbox has no network, so — per
SURVEY.md §7.0 — each session is a deterministic numpy kernel behind
the same ``infer(tensor) -> ndarray`` interface.  Everything
*observable* (tensor contracts NCHW float32, prob-map post-processing,
argmax semantics, CTC logit layout) matches the reference's shapes.

``ModelRegistry`` is the T3 analog: a per-actor dict cache keyed by
``(stage, model_name)`` plus a language -> (det, cls, rec) routing
table (J3, ocrweb_multi/config.yaml:72-104), so one actor serves many
languages with shared sub-models.
"""

from __future__ import annotations

import math

import numpy as np

from rapidocr_ray.glyphs import (
    CHARSET,
    GLYPH_ADVANCE,
    GLYPH_GAP,
    GLYPH_H,
    GLYPH_W,
    TEMPLATES,
)
from rapidocr_ray.functions.imgproc import IMAGENET_MEAN, IMAGENET_STD

N_CLASSES = 1 + len(CHARSET)  # blank + keys + space, CTC layout (M14)

# det kernel receptive field: text pixels are smeared horizontally so
# word gaps fuse into line-level regions — the behavior DBNet learns;
# here it is an explicit max-filter (SURVEY.md §7.0 stand-in).
DET_H_REACH = 5   # +/- columns: bridges inter-word gaps -> line-level regions
DET_V_REACH = 3   # +/- rows: bridges the glyph's blank rows 6..10 so the
                  # row-11 anchors fuse with the dense top band; line gaps
                  # (>= 32 px in the synthetic corpus) stay separate
DET_PEAK = 0.9    # prob value inside text regions


def _max_filter_1d(x: np.ndarray, reach: int, axis: int) -> np.ndarray:
    """Centered 1-D max filter (window 2*reach+1), zero-padded edges.
    Successive-doubling dilation: a dilation by s applied to a map
    already dilated by c yields dilation by c+s, so reach r needs
    O(log r) full-array max passes instead of 2r shifted copies."""
    out = x.copy()
    covered = 0
    step = 1
    while covered < reach:
        s = min(step, reach - covered)
        prev = out.copy()
        if axis == 1:
            np.maximum(out[:, :-s], prev[:, s:], out=out[:, :-s])
            np.maximum(out[:, s:], prev[:, :-s], out=out[:, s:])
        else:
            np.maximum(out[:-s, :], prev[s:, :], out=out[:-s, :])
            np.maximum(out[s:, :], prev[:-s, :], out=out[s:, :])
        covered += s
        step = covered  # doubling: next dilation can be as large as covered
    return out


def _ink_from_normalized(chan0: np.ndarray) -> np.ndarray:
    """Invert M2 normalization on channel 0 -> boolean ink map."""
    return (chan0 * IMAGENET_STD[0] + IMAGENET_MEAN[0]) > 0.5


DET_SKEW_MAX_DEG = 20       # shear-estimate search range (+/- degrees)
DET_SKEW_MARGIN = 1.15      # profile-sharpness hysteresis: a non-zero
                            # shear must beat the 0-degree profile by
                            # 15% or the bit-identical axis-aligned
                            # path is kept (stability on clean pages)
DET_SKEW_SAMPLE = 20_000    # deterministic ink-pixel stride cap for
                            # the estimate (big pages stay O(sample))


def _estimate_shear(ink: np.ndarray) -> float:
    """Dominant text-line shear (tan theta) by projection-profile
    maximization: for each candidate angle, flatten lines with a
    per-column integer y-shift and score the row-profile sharpness
    (sum of squared bin counts — maximal when ink concentrates into
    few rows, i.e. when lines are horizontal after the shear).
    Deterministic; returns 0.0 unless a non-zero angle clearly wins."""
    ys, xs = np.nonzero(ink)
    if ys.size < 2:
        return 0.0
    if ys.size > DET_SKEW_SAMPLE:
        step = ys.size // DET_SKEW_SAMPLE + 1
        ys, xs = ys[::step], xs[::step]
    ys = ys.astype(np.int64)
    xs = xs.astype(np.int64)
    best_t, best_v, v0 = 0.0, -1.0, 0.0
    for deg in range(-DET_SKEW_MAX_DEG, DET_SKEW_MAX_DEG + 1):
        t = math.tan(math.radians(deg))
        yp = ys - np.round(xs * t).astype(np.int64)
        yp -= yp.min()
        prof = np.bincount(yp).astype(np.float64)
        v = float((prof * prof).sum())
        if deg == 0:
            v0 = v
        # strict > plus |deg| asc iteration order => smallest winning
        # |angle| is kept on exact ties
        if v > best_v:
            best_v, best_t = v, t
    if best_t != 0.0 and best_v < v0 * DET_SKEW_MARGIN:
        return 0.0
    return best_t


def _deskewed_line_bands(ink_u8: np.ndarray, t: float) -> int:
    """Number of distinct text bands in deskewed space: runs of inky
    rows (after the per-column y-shift that _ink_to_pred would apply)
    separated by more than the V-smear reach.  One band means the
    shear-space smear cannot improve line separation."""
    ys, xs = np.nonzero(ink_u8)
    if ys.size == 0:
        return 0
    yp = ys - np.round(xs * t).astype(np.int64)
    yp -= yp.min()
    has_ink = np.bincount(yp) > 0
    rows = np.flatnonzero(has_ink)
    # count gaps the V-smear would NOT bridge (> 2 * reach)
    return 1 + int((np.diff(rows) > 2 * DET_V_REACH).sum())


def _axis_smear(
    ink_u8: np.ndarray,
    h_reach: int = DET_H_REACH,
    v_reach: int = DET_V_REACH,
) -> np.ndarray:
    smear = _max_filter_1d(ink_u8, h_reach, axis=1)
    return _max_filter_1d(smear, v_reach, axis=0)


def _ink_to_pred(ink: np.ndarray) -> np.ndarray:
    """Shared det smear: boolean ink map -> prob map (uint8 passes, one
    float32 write).

    Direction-aware: the axis-aligned H-smear on a sloped page turns
    horizontal reach into vertical proximity (+/-reach * tan theta from
    each side), merging neighbouring rotated lines.  When the shear
    estimate finds a dominant non-zero angle, the smear runs in
    deskewed space — per-column integer y-shift, axis-aligned smear,
    inverse shift — so line separation is judged perpendicular to the
    text direction.  Axis-aligned pages (estimate 0 under the
    hysteresis margin) take the identical legacy path bit-for-bit."""
    ink_u8 = ink.astype(np.uint8)
    t = _estimate_shear(ink)
    if t != 0.0 and _deskewed_line_bands(ink_u8, t) <= 1:
        # single text band: the axis smear cannot merge anything, and
        # its (proven) geometry feeds the rec warp unchanged — the
        # shear path's integer-shift staircase would only perturb the
        # box by a pixel or two for no separation benefit
        t = 0.0
    if t == 0.0:
        smear = _axis_smear(ink_u8)
        return smear.astype(np.float32) * np.float32(DET_PEAK)
    h, w = ink_u8.shape
    shifts = np.round(np.arange(w, dtype=np.float64) * t).astype(np.int64)
    pad_top = int(max(0, shifts.max()))
    pad_bot = int(max(0, -shifts.min()))
    tall = np.zeros((h + pad_top + pad_bot, w), dtype=np.uint8)
    for s in np.unique(shifts):
        cols = shifts == s
        tall[pad_top - s:pad_top - s + h, cols] = ink_u8[:, cols]
    # +1 horizontal reach: the integer shift staircase costs up to one
    # column of effective H continuity at each step boundary
    tall = _axis_smear(tall, h_reach=DET_H_REACH + 1)
    out = np.empty((h, w), dtype=np.uint8)
    for s in np.unique(shifts):
        cols = shifts == s
        out[:, cols] = tall[pad_top - s:pad_top - s + h, cols]
    return out.astype(np.float32) * np.float32(DET_PEAK)


class DetModel:
    """DBNet stand-in: NCHW float32 -> prob maps [N, 1, H, W]."""

    def infer(self, x: np.ndarray) -> np.ndarray:
        n, _, h, w = x.shape
        out = np.zeros((n, 1, h, w), dtype=np.float32)
        for i in range(n):
            out[i, 0] = _ink_to_pred(_ink_from_normalized(x[i, 0]))
        return out

    def infer_ink(self, ink: np.ndarray) -> np.ndarray:
        """Fast entry: boolean ink map -> prob map [H, W].

        ``infer(normalize(img))`` and ``infer_ink(img >= 128)`` are
        bit-identical by construction: M2 normalization is affine, so
        inverting it (``_ink_from_normalized``) recovers exactly the
        128-gray threshold — the hot path skips the two full-page
        float32 normalize/invert passes, and the smear runs on uint8
        (1/4 the memory traffic of float32)."""
        return _ink_to_pred(ink)


class ClsModel:
    """AngleNet stand-in: NCHW float32 (M10-normalized, +/-0.5) ->
    softmax probs [N, 2] over ('0', '180').

    The learned 0/180 feature is replaced by the glyph alphabet's
    enforced top-heaviness (glyphs.py): upright text has more ink in
    the top half of its tight row band.  k is sized so the enforced
    margin clears the reference's 0.9 rotate threshold (M12)."""

    K = 20.0

    def infer(self, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        out = np.zeros((n, 2), dtype=np.float32)
        for i in range(n):
            ink = x[i, 0] > 0.0  # M10 normalization maps ink->+1, bg->-1
            rows = np.flatnonzero(ink.any(axis=1))
            if rows.size == 0:
                out[i] = [0.5, 0.5]
                continue
            band = ink[rows[0]:rows[-1] + 1]
            hh = band.shape[0] // 2
            top = int(band[:hh].sum())
            bot = int(band[band.shape[0] - hh:].sum())
            total = max(1, int(band.sum()))
            ratio = (top - bot) / total
            p0 = 1.0 / (1.0 + np.exp(-self.K * ratio))
            out[i] = [p0, 1.0 - p0]
        return out


class RecModel:
    """CRNN-CTC stand-in: NCHW float32 (M13-normalized, h=48=4x glyph
    height) -> CTC logits [N, T, C].

    Matched filter over the shared glyph templates at the glyph stride,
    emitting interleaved blank timesteps (T = 2*nmax+1) so the faithful
    CTC greedy decode (M14) — blank drop + repeat collapse — recovers
    doubled letters exactly as a real CRNN's blank-separated emissions
    would."""

    def infer(self, x: np.ndarray) -> np.ndarray:
        inks = []
        for i in range(x.shape[0]):
            ink4 = x[i, 0] > 0.0          # M13 maps ink->+1, bg/pad->-1
            # exact inverse of the 4x BILINEAR upscale: at offsets
            # (1+4k), the target pixel's weight is 0.875^2 = 0.77 > 0.5,
            # so thresholding at gray 127.5 recovers the source bit
            inks.append(ink4[1::4, 1::4])
        return RecModel._bands_to_logits(self, inks)

    def infer_bands(self, inks: list[np.ndarray]) -> np.ndarray:
        return RecModel._bands_to_logits(self, inks)

    def _bands_to_logits(self, inks: list[np.ndarray]) -> np.ndarray:
        """Shared impl of the band path: boolean glyph-resolution ink
        maps -> CTC logits.

        ``infer(rec_resize_norm(crop))`` and ``infer_bands([band])``
        are bit-identical by construction: the M13 4x bilinear upscale
        of a binary band is exactly inverted by thresholded sampling at
        [1::4, 1::4] (the target pixel's bilinear weight there is
        0.875^2, which dominates the 127.5 gray threshold —
        tests/test_imgproc.py::test_resize_bilinear_4x_inversion and
        tests/test_cascade.py fast-vs-contract equality), so the hot
        path skips the float32 48-high tensor round trip entirely."""
        per_item: list[np.ndarray] = []
        max_chars = 0
        for ink in inks:
            logits = self._line_logits(ink)
            max_chars = max(max_chars, logits.shape[0])
            per_item.append(logits)
        t_total = 2 * max_chars + 1
        out = np.zeros((len(inks), t_total, N_CLASSES), dtype=np.float32)
        out[:, :, 0] = 1.0                 # blank-certain everywhere by default
        for i, logits in enumerate(per_item):
            for k in range(logits.shape[0]):
                out[i, 2 * k + 1, :] = logits[k]
        return out

    # windows whose best direct match falls below this retry at +/-1 px
    # offsets — clean (unwarped) glyphs match exactly at 1.0, so the
    # fallback never fires on the axis-aligned path and its output is
    # bit-identical to the direct strided match
    OFFSET_SEARCH_THRESH = 0.9

    @staticmethod
    def _line_logits(ink: np.ndarray) -> np.ndarray:
        """boolean [H, W] -> per-char class scores [n_chars, C].

        Direct strided matched filter at the glyph advance; windows
        that score poorly (rotated/warped crops re-rasterized by the M9
        perspective rectification introduce +/-1 px jitter) are re-tried
        at the 8 neighbouring 1-px offsets and keep their best score —
        the stand-in for a real CRNN's translation tolerance."""
        rows = np.flatnonzero(ink.any(axis=1))
        cols = np.flatnonzero(ink.any(axis=0))
        if rows.size == 0 or cols.size == 0:
            return np.zeros((0, N_CLASSES), dtype=np.float32)
        band = ink[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]
        bh, bw = band.shape
        # glyph alphabet guarantees ink in first/last row+col of every
        # non-space glyph, so the tight band is exactly GLYPH_H tall and
        # starts/ends on glyph boundaries; degenerate crops fall back to
        # a padded/cropped canvas (deterministic either way).
        n_chars = (bw - 1) // GLYPH_ADVANCE + 1
        # 1-px halo so the offset fallback can sample neighbours
        canvas = np.zeros((GLYPH_H + 2, n_chars * GLYPH_ADVANCE + 2), dtype=np.float32)
        canvas[1:1 + min(GLYPH_H + 1, bh), 1:1 + bw] = band[:GLYPH_H + 1, :]
        core = canvas[1:1 + GLYPH_H, 1:]
        isz = canvas.itemsize
        windows = np.lib.stride_tricks.as_strided(
            core,
            shape=(n_chars, GLYPH_H, GLYPH_W),
            strides=(GLYPH_ADVANCE * isz, canvas.shape[1] * isz, isz),
        )
        diff = np.abs(windows[:, None, :, :] - TEMPLATES[None, :, :, :])
        match = 1.0 - diff.sum(axis=(2, 3)) / float(GLYPH_H * GLYPH_W)  # [n, C-1]
        weak = np.flatnonzero(match.max(axis=1) < RecModel.OFFSET_SEARCH_THRESH)
        for k in weak:
            best = match[k]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    y0 = 1 + dy
                    x0 = 1 + k * GLYPH_ADVANCE + dx
                    win = canvas[y0:y0 + GLYPH_H, x0:x0 + GLYPH_W]
                    if win.shape != (GLYPH_H, GLYPH_W):
                        continue
                    m = 1.0 - np.abs(win[None] - TEMPLATES).sum(axis=(1, 2)) / float(
                        GLYPH_H * GLYPH_W
                    )
                    if m.max() > best.max():
                        best = m
            match[k] = best
        logits = np.zeros((n_chars, N_CLASSES), dtype=np.float32)
        logits[:, 0] = 0.3                 # blank baseline at char timesteps
        logits[:, 1:] = match              # template j -> dict index j+1
        return logits


class DetModelContract(DetModel):
    """'contract' backend det session: exposes ONLY the NCHW float32
    tensor interface — no ``infer_ink`` fast entry.  The T2 backend
    swap analog of the reference's API-duplicate runtime tree
    (python/rapidocr_openvino/* re-implements the onnxruntime surface
    over a second runtime): same math, different session API shape.
    Outputs are bit-identical to the kernel backend by construction."""

    infer_ink = None


class RecModelContract(RecModel):
    """'contract' backend rec session: full M13 tensor path only (no
    ``infer_bands`` fast entry)."""

    infer_bands = None


# ---------------------------------------------------------------------------
# Registry (T3/J3 analog) + backend strategy (T2)
# ---------------------------------------------------------------------------

BACKENDS: dict[str, dict[tuple[str, str], type]] = {
    # numpy kernels with fast entries (the default 'runtime')
    "kernel": {
        ("det", "det_ch"): DetModel,
        ("cls", "cls_ch"): ClsModel,
        ("rec", "rec_ch"): RecModel,
    },
    # tensor-contract-only sessions (the second 'runtime'): identical
    # outputs through the full NCHW/M13 path — tests/test_cascade.py
    # asserts cross-backend equality
    "contract": {
        ("det", "det_ch"): DetModelContract,
        ("cls", "cls_ch"): ClsModel,
        ("rec", "rec_ch"): RecModelContract,
    },
}

_FACTORIES = BACKENDS["kernel"]

# language -> model-name triple; distinct languages share sub-models,
# exactly the sharing ocrweb_multi/config.yaml:43-47,72-104 exercises.
LANG_ROUTES: dict[str, dict[str, str]] = {
    lang: {"det": "det_ch", "cls": "cls_ch", "rec": "rec_ch"}
    for lang in ("ch", "en", "cht", "ja", "zh", "es", "de", "fr")
}
DEFAULT_LANG = "en"


class ModelRegistry:
    """Per-actor model cache keyed (stage, name) — the lru_cache analog.

    Built once in each Ray actor's ``__init__``; ``for_lang`` resolves
    the routing table and returns shared session objects.  ``backend``
    picks the session implementation family (T2 strategy; the config
    surface is ``Global.backend``)."""

    def __init__(self, backend: str = "kernel"):
        if backend not in BACKENDS:
            raise ValueError(f"unknown backend {backend!r}; have {sorted(BACKENDS)}")
        self.backend = backend
        self._cache: dict[tuple[str, str], object] = {}

    def get(self, stage: str, name: str):
        key = (stage, name)
        if key not in self._cache:
            self._cache[key] = BACKENDS[self.backend][key]()
        return self._cache[key]

    def for_lang(self, stage: str, lang: str):
        route = LANG_ROUTES.get(lang, LANG_ROUTES[DEFAULT_LANG])
        return self.get(stage, route[stage])
