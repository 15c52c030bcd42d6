"""Metric parity tests (reference analog: tests/test_metrics)."""
import numpy as np

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


def _random_ic13_scenario(rng):
    """One image's (dets, gts, ignored) with rotated-rect boxes at ~100s-px
    scale, mixing one2one / one2many / many2one / spurious / ignored cases."""
    def rect(cx, cy, w, h, ang):
        c, s = np.cos(ang), np.sin(ang)
        pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                        [w / 2, h / 2], [-w / 2, h / 2]])
        pts = pts @ np.array([[c, -s], [s, c]]).T + [cx, cy]
        return np.clip(pts, 1, None).reshape(-1).tolist()

    gts, dets, ignored = [], [], []
    for k in range(rng.integers(1, 5)):
        cx, cy = rng.uniform(300, 1700), rng.uniform(250, 750)
        w, h = rng.uniform(150, 400), rng.uniform(80, 200)
        ang = rng.uniform(-0.3, 0.3)
        gt = rect(cx, cy, w, h, ang)
        gts.append(gt)
        mode = rng.integers(0, 4)
        if mode == 0:      # near-exact det -> one2one
            dets.append(rect(cx + rng.uniform(-3, 3), cy + rng.uniform(-3, 3),
                             w * rng.uniform(0.97, 1.03),
                             h * rng.uniform(0.97, 1.03), ang))
        elif mode == 1:    # two half dets -> one2many
            c, s = np.cos(ang), np.sin(ang)
            for side in (-1, 1):
                dets.append(rect(cx + side * c * w / 4, cy + side * s * w / 4,
                                 w / 2 * 1.04, h * 1.04, ang))
        elif mode == 2:    # det far off -> miss
            dets.append(rect(cx + w, cy + h, w / 2, h / 2, ang))
        # mode 3: undetected gt
    if rng.random() < 0.5 and len(gts) >= 2:  # merged det -> many2one
        a = np.asarray(gts[0]).reshape(-1, 2)
        b = np.asarray(gts[1]).reshape(-1, 2)
        lo = np.minimum(a.min(0), b.min(0)) - 2
        hi = np.maximum(a.max(0), b.max(0)) + 2
        dets.append([lo[0], lo[1], hi[0], lo[1], hi[0], hi[1], lo[0], hi[1]])
    if rng.random() < 0.4:  # ignored gt + det hitting it
        cx, cy = rng.uniform(300, 1700), rng.uniform(250, 750)
        ig = rect(cx, cy, 200, 100, 0.0)
        ignored.append(ig)
        if rng.random() < 0.7:
            dets.append(rect(cx, cy, 198, 98, 0.0))
    if rng.random() < 0.5:  # spurious det
        dets.append(rect(rng.uniform(200, 1800), rng.uniform(200, 800),
                         100, 60, rng.uniform(-0.3, 0.3)))
    return dets, gts, ignored


def _near_threshold(ns, dets, gts, ignored, margin=0.05):
    """Skip-filter: drop scenarios where any matcher-relevant quantity sits
    within `margin` of a protocol threshold — there rasterized (ours) and
    exact (reference) areas may legitimately decide differently."""
    eu = ns.eval_utils
    gt_polys = [eu.points2polygon(np.asarray(p)) for p in gts + ignored]
    det_polys = [eu.points2polygon(np.asarray(p)) for p in dets]
    if not det_polys or not gt_polys:
        return False
    rec, prec = ns.compute_recall_precision(gt_polys, det_polys)
    if (np.abs(rec - 0.8) < margin).any() or (np.abs(prec - 0.4) < margin).any():
        return True
    for i in range(rec.shape[0]):  # one2many sums
        s = rec[i, prec[i] >= 0.4].sum()
        if abs(s - 0.8) < margin:
            return True
    for j in range(rec.shape[1]):  # many2one sums
        s = prec[rec[:, j] >= 0.8, j].sum()
        if abs(s - 0.4) < margin:
            return True
    return False


def test_hmean_ic13_reference_parity():
    """Executable parity with the reference eval (loaded via ref_shim with
    a convex-polygon shapely shim): randomized rotated-rect scenarios,
    near-threshold cases filtered (rasterized vs exact areas)."""
    import numpy as np
    from tps_pp_tpu.evaluation.hmean_ic13 import eval_hmean_ic13
    from tps_pp_tpu.utils.ref_shim import load_reference_eval
    ns = load_reference_eval()

    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(120):
        dets, gts, ignored = _random_ic13_scenario(rng)
        if _near_threshold(ns, dets, gts, ignored):
            continue
        ref, _ = ns.eval_hmean_ic13([dets], [gts], [ignored])
        ours = eval_hmean_ic13([dets], [gts], gt_ignore=[ignored])
        for key in ('recall', 'precision', 'hmean'):
            assert abs(ours[key] - ref[key]) < 1e-3, (
                key, ours, ref, dets, gts, ignored)
        checked += 1
    assert checked >= 60, f'only {checked} scenarios survived the filter'
