"""Text-recognition metrics: word accuracy variants, char P/R, 1-NED.

Byte-for-byte the same protocol as the reference
``mmocr/core/evaluation/ocr_metric.py:84-134``: the headline metric is
``word_acc_ignore_case_symbol`` where "symbol" stripping keeps only
``[A-Za-z0-9一-龥]`` (ocr_metric.py:49). Pure host-side Python.
Levenshtein uses rapidfuzz when available (same C++ backend as the
reference), with a pure-Python DP fallback; an optional first-party C
extension (tps_pp_tpu.native) overrides both when built.
"""
from __future__ import annotations

import re
from difflib import SequenceMatcher
from typing import Dict, List


def _levenshtein_py(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _resolve_levenshtein():
    try:  # first-party C extension (fastest, no deps)
        from ..native import get_lib, levenshtein as _lev  # type: ignore
        # the import itself never fails (the module carries Python
        # fallbacks); only prefer it when the compiled library actually
        # loaded — otherwise rapidfuzz beats the O(len^2) pure-Python path
        if get_lib() is not None:
            return _lev
    except Exception:
        pass
    try:
        from rapidfuzz.distance import Levenshtein
        return Levenshtein.distance
    except Exception:
        pass
    try:
        from rapidfuzz import string_metric  # older rapidfuzz API
        return string_metric.levenshtein
    except Exception:
        return _levenshtein_py


levenshtein = _resolve_levenshtein()

_IGNORE_SYMBOL_RE = re.compile('[^A-Z^a-z^0-9^一-龥]')


def cal_true_positive_char(pred: str, gt: str) -> int:
    tp = 0
    for opt, _, _, s2, e2 in SequenceMatcher(None, pred, gt).get_opcodes():
        if opt == 'equal':
            tp += e2 - s2
    return tp


def count_matches(pred_texts: List[str], gt_texts: List[str]) -> Dict:
    match_res = {
        'gt_char_num': 0,
        'pred_char_num': 0,
        'true_positive_char_num': 0,
        'gt_word_num': 0,
        'match_word_num': 0,
        'match_word_ignore_case': 0,
        'match_word_ignore_case_symbol': 0,
    }
    norm_ed_sum = 0.0
    for pred_text, gt_text in zip(pred_texts, gt_texts):
        if gt_text == pred_text:
            match_res['match_word_num'] += 1
        gt_lower = gt_text.lower()
        pred_lower = pred_text.lower()
        if gt_lower == pred_lower:
            match_res['match_word_ignore_case'] += 1
        gt_ignore = _IGNORE_SYMBOL_RE.sub('', gt_lower)
        pred_ignore = _IGNORE_SYMBOL_RE.sub('', pred_lower)
        if gt_ignore == pred_ignore:
            match_res['match_word_ignore_case_symbol'] += 1
        match_res['gt_word_num'] += 1

        edit_dist = levenshtein(pred_ignore, gt_ignore)
        norm_ed_sum += float(edit_dist) / max(1, len(gt_ignore),
                                              len(pred_ignore))

        match_res['gt_char_num'] += len(gt_ignore)
        match_res['pred_char_num'] += len(pred_ignore)
        match_res['true_positive_char_num'] += cal_true_positive_char(
            pred_ignore, gt_ignore)

    match_res['ned'] = norm_ed_sum / max(1, len(gt_texts))
    return match_res


def eval_ocr_metric(pred_texts: List[str], gt_texts: List[str],
                    full: bool = False) -> Dict[str, float]:
    """Headline metric dict. ``full=True`` additionally returns the metrics
    the reference computes but leaves commented out (ocr_metric.py:124-129)."""
    assert len(pred_texts) == len(gt_texts)
    m = count_matches(pred_texts, gt_texts)
    eps = 1e-8
    res = {
        'word_acc_ignore_case_symbol':
            1.0 * m['match_word_ignore_case_symbol'] / (eps + m['gt_word_num'])
    }
    if full:
        res.update({
            'word_acc': 1.0 * m['match_word_num'] / (eps + m['gt_word_num']),
            'word_acc_ignore_case':
                1.0 * m['match_word_ignore_case'] / (eps + m['gt_word_num']),
            'char_recall':
                1.0 * m['true_positive_char_num'] / (eps + m['gt_char_num']),
            'char_precision':
                1.0 * m['true_positive_char_num'] / (eps + m['pred_char_num']),
            '1-N.E.D': 1.0 - m['ned'],
        })
    return {k: float(f'{v:.4f}') for k, v in res.items()}
