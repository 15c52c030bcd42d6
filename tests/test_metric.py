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
