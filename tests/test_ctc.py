"""M14 CTC decode goldens (ch_ppocr_v3_rec/utils.py:33-75 semantics)."""

import numpy as np
import pytest

from rapidocr_ray.functions.ctc import CHAR_DICT, ctc_greedy_decode


def logits_for(seq, n_classes=None):
    n_classes = n_classes or len(CHAR_DICT)
    out = np.zeros((1, len(seq), n_classes), dtype=np.float32)
    for t, (idx, p) in enumerate(seq):
        out[0, t, idx] = p
        if idx != 0:
            out[0, t, 0] = min(0.3, p / 2)
    return out


def idx_of(ch):
    return CHAR_DICT.index(ch)


def test_blank_drop_and_repeat_collapse():
    a = idx_of("a")
    seq = [(0, 1.0), (a, 0.9), (a, 0.8), (0, 1.0), (a, 0.7)]
    [(text, score)] = ctc_greedy_decode(logits_for(seq))
    assert text == "aa"  # repeat collapsed, blank separates the second 'a'
    assert score == pytest.approx(np.mean([0.9, 0.7, 1e-50]))


def test_empty_decode_scores_1e50():
    seq = [(0, 1.0), (0, 1.0)]
    [(text, score)] = ctc_greedy_decode(logits_for(seq))
    assert text == ""
    assert score == pytest.approx(1e-50)


def test_mean_quirk_single_char():
    """score = np.mean(conf + [1e-50]): one char at p=1.0 -> exactly 0.5."""
    a = idx_of("a")
    [(text, score)] = ctc_greedy_decode(logits_for([(0, 1.0), (a, 1.0), (0, 1.0)]))
    assert text == "a"
    assert score == 0.5


def test_space_is_last_class():
    assert CHAR_DICT[0] == "blank"
    assert CHAR_DICT[-1] == " "
    sp = len(CHAR_DICT) - 1
    a = idx_of("a")
    seq = [(a, 1.0), (0, 1.0), (sp, 1.0), (0, 1.0), (a, 1.0)]
    [(text, _)] = ctc_greedy_decode(logits_for(seq))
    assert text == "a a"
