"""Result writers/sinks (S6/S7 analogs).

- ``render_boxes``: draw det boxes onto the page bitmap (the
  draw_text_det_res debug sink, ch_ppocr_v3_det/utils.py:239-245) —
  box outlines burned in at a mid-gray level.
- ``render_stage``: optional map_batches debug stage producing an
  RBMP-encoded ``rendered`` column from final spans.
- ``result_to_json`` / ``decode_data_url``: the JSON encoder
  (ocrweb/rapidocr_web/api.py:26-32, numpy-aware) and the base64
  data-URL ingest adapter (ocrweb/rapidocr_web/task.py:30-37).
- ``write_results``: partitioned parquet sink (primary sink; one
  directory per run with shard files, resumable layout in
  state/manifest.py).
"""

from __future__ import annotations

import base64
import json

import numpy as np
import pyarrow as pa

BOX_GRAY = 128


def render_boxes(img: np.ndarray, boxes: list) -> np.ndarray:
    """Burn box outlines (1-px, gray) into a copy of the page."""
    out = img.copy()
    h, w = out.shape
    for box in boxes:
        b = np.asarray(box).reshape(4, 2).astype(np.int64)
        x0 = int(np.clip(b[:, 0].min(), 0, w - 1))
        x1 = int(np.clip(b[:, 0].max(), 0, w - 1))
        y0 = int(np.clip(b[:, 1].min(), 0, h - 1))
        y1 = int(np.clip(b[:, 1].max(), 0, h - 1))
        out[y0, x0:x1 + 1] = BOX_GRAY
        out[y1, x0:x1 + 1] = BOX_GRAY
        out[y0:y1 + 1, x0] = BOX_GRAY
        out[y0:y1 + 1, x1] = BOX_GRAY
    return out


def result_to_json(obj) -> str:
    """Numpy-aware JSON encoder (S7: default=tolist,
    ocrweb_multi/utils/utils.py:20-27)."""

    def default(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, bytes):
            return base64.b64encode(o).decode()
        return str(o)

    return json.dumps(obj, default=default)


def decode_data_url(data_url: str) -> bytes:
    """S4 ingest adapter: 'data:*;base64,<payload>' -> bytes
    (task.py:30-37 split-on-comma semantics)."""
    if "," in data_url:
        data_url = data_url.split(",", 1)[1]
    return base64.b64decode(data_url)


def write_results(ds, out_dir: str, min_rows_per_file: int = 100_000):
    """Primary sink: directory of parquet shards (never one giant
    file).  For resumable multi-shard runs use
    state.manifest.run_resumable instead."""
    try:
        ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray releases
        ds.write_parquet(out_dir)
    return out_dir
