"""Reference-compatible convenience API.

The reference's primary entry is ``RapidOCR()(img) -> (result, elapses)``
with ``result = [[box, text, score], ...]`` or ``(None, None)`` when
nothing survives (rapid_ocr_api.py:56-107).  ``RapidOCR`` here wraps the
single-process oracle loop behind that exact call shape so a user of
the reference can port call sites mechanically; kwargs are the same
prefix-routed overrides (det_*/cls_*/rec_*, utils.py:218-287).

This is the LIBRARY surface; the batch engine surface is
pipelines.extract.build_extract_pipeline (Dataset-in, Dataset-out).
"""

from __future__ import annotations

import numpy as np

from rapidocr_ray.config import PipelineConfig
from rapidocr_ray.glyphs import encode_rbmp
from rapidocr_ray.pipelines.oracle import OracleExtractor


class RapidOCR:
    def __init__(self, config: PipelineConfig | None = None, **kwargs):
        cfg = (config or PipelineConfig()).with_overrides(**kwargs)
        self._oracle = OracleExtractor(cfg)

    def __call__(self, payload, lang: str = "en", **kwargs):
        """payload: RBMP/HTML bytes, str (HTML), or a uint8 ndarray
        (encoded to RBMP — the LoadImage ndarray entry analog).

        Returns ``(result, elapses)`` where result is
        ``[[box(4x2 list), text, str(score)], ...]`` (score stringified
        exactly like rapid_ocr_api.py:105) or ``(None, None)``."""
        if kwargs:
            cfg = self._oracle.cfg.with_overrides(**kwargs)
            oracle = OracleExtractor(cfg)
        else:
            oracle = self._oracle
        if isinstance(payload, np.ndarray):
            payload = encode_rbmp(payload.astype(np.uint8))
        elif isinstance(payload, str):
            payload = payload.encode("utf-8")
        row = oracle.extract_one("<adhoc>", None, payload, lang)
        elapses = [row["det_elapse"], row["cls_elapse"], row["rec_elapse"]]
        if row["route"] == "html":
            if row["extracted_text"] is None:
                return None, None
            lines = row["extracted_text"].split("\n")
            return [[None, line, "1.0"] for line in lines], elapses
        import json

        spans = json.loads(row["spans"] or "[]")
        if not spans:
            return None, None
        result = [
            [
                np.asarray(s["box"], dtype=np.int64).reshape(4, 2).tolist(),
                s["text"],
                str(s["score"]),
            ]
            for s in spans
        ]
        return result, elapses
