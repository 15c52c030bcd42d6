"""Metric parity tests (reference analog: tests/test_metrics)."""
from tps_pp_tpu.evaluation import eval_ocr_metric


def test_word_acc_ignore_case_symbol():
    preds = ['hello', 'World', 'he-llo', 'nope']
    gts = ['hello', 'world', 'hello', 'yes!']
    res = eval_ocr_metric(preds, gts)
    # 3/4 match once case+symbols ignored
    assert abs(res['word_acc_ignore_case_symbol'] - 0.75) < 1e-3


def test_full_metrics():
    res = eval_ocr_metric(['abc'], ['abc'], full=True)
    assert res['word_acc'] == 1.0
    assert res['char_recall'] == 1.0
    assert res['1-N.E.D'] == 1.0
    res = eval_ocr_metric(['axc'], ['abc'], full=True)
    assert abs(res['1-N.E.D'] - (1 - 1 / 3)) < 1e-3


def test_symbol_stripping_keeps_cjk():
    res = eval_ocr_metric(['中文!'], ['中文?'])
    assert res['word_acc_ignore_case_symbol'] == 1.0


def test_hmean_ic13():
    """IC13 protocol: one-to-one match on area recall/precision thresholds
    (reference core/evaluation/hmean_ic13.py)."""
    import numpy as np
    from tps_pp_tpu.evaluation.hmean_ic13 import eval_hmean_ic13
    gt = [np.array([10, 10, 50, 10, 50, 30, 10, 30], np.float32)]
    good = [np.array([11, 11, 49, 11, 49, 29, 11, 29, 0.9], np.float32)]
    bad = [np.array([100, 100, 120, 100, 120, 120, 100, 120, 0.9],
                    np.float32)]
    res = eval_hmean_ic13([good], [gt])
    assert res['hmean'] > 0.9
    res = eval_hmean_ic13([bad], [gt])
    assert res['hmean'] == 0.0
    # one-to-many: two half-boxes together cover the gt
    halves = [np.array([10, 10, 30, 10, 30, 30, 10, 30, 0.9], np.float32),
              np.array([30, 10, 50, 10, 50, 30, 30, 30, 0.9], np.float32)]
    res = eval_hmean_ic13([halves], [gt])
    assert res['recall'] > 0.5
