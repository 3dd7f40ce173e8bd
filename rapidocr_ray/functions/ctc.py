"""M14 — CTC greedy decode (ch_ppocr_v3_rec/utils.py:33-75), faithful.

The char dictionary is built exactly like the reference
(ch_ppocr_v3_rec/utils.py:24,43-45): ``['blank'] + keys + [' ']`` with
blank at index 0.  Decode: per-timestep argmax + max prob; drop
positions equal to the previous timestep's index (repeat collapse),
then drop blanks; score is ``np.mean(conf_list + [1e-50])`` — the
reference's exact quirk, which makes an empty decode score 1e-50 and
biases every score slightly low.  This function produces the bytes the
per-url invariant checks; it must not change.
"""

from __future__ import annotations

import numpy as np

from rapidocr_ray.glyphs import KEYS


def build_char_dict() -> list[str]:
    """['blank'] + keys + [' '] (ch_ppocr_v3_rec/utils.py:24,43-45)."""
    return ["blank"] + list(KEYS) + [" "]


CHAR_DICT = build_char_dict()


def ctc_greedy_decode(preds: np.ndarray) -> list[tuple[str, float]]:
    """preds: float32 [N, T, C] -> [(text, score)] per item."""
    preds_idx = preds.argmax(axis=2)
    preds_prob = preds.max(axis=2)
    out: list[tuple[str, float]] = []
    for idx_seq, prob_seq in zip(preds_idx, preds_prob):
        # repeat collapse: keep t where idx[t] != idx[t-1] (t=0 always kept)
        selection = np.ones(len(idx_seq), dtype=bool)
        selection[1:] = idx_seq[1:] != idx_seq[:-1]
        # drop blanks (index 0)
        selection &= idx_seq != 0
        chars = [CHAR_DICT[i] for i in idx_seq[selection]]
        conf_list = list(prob_seq[selection])
        text = "".join(chars)
        score = float(np.mean(conf_list + [1e-50]))  # utils.py:74 quirk, exact
        out.append((text, score))
    return out
