"""DBNet detection subsystem: shapes, loss, targets, postprocess, hmean."""
import jax
import jax.numpy as jnp
import numpy as np

from tps_pp_tpu.models.textdet import (DBHead, DBLoss, DBNetModule,
                                       DBNetTargets, DBPostprocessor, FPNC,
                                       ResNetDet, eval_hmean_iou)


def test_dbnet_forward_and_loss():
    model = DBNetModule(
        backbone=ResNetDet(stage_blocks=(1, 1, 1, 1), base_channels=8),
        neck=FPNC(in_channels=(8, 16, 32, 64), lateral_channels=16,
                  out_channels=4),
        head=DBHead(in_channels=16))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(v, img)
    assert out.shape == (1, 64, 64, 3)  # prob/thr/binary at full res
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()

    # loss on synthetic targets
    tg = DBNetTargets()
    poly = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], np.float32)
    targets = tg.generate([poly], 64, 64)
    targets = {k: jnp.asarray(v_)[None] for k, v_ in targets.items()}
    losses = DBLoss()(out, targets)
    assert set(losses) == {'loss_prob', 'loss_thr', 'loss_db'}
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_targets_geometry():
    tg = DBNetTargets(shrink_ratio=0.4)
    poly = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], np.float32)
    t = tg.generate([poly], 64, 64)
    # shrink region inside the polygon, smaller than it
    assert t['gt_shrink'].sum() > 0
    full = np.zeros((64, 64), np.uint8)
    import cv2
    cv2.fillPoly(full, [poly.astype(np.int32)], 1)
    assert t['gt_shrink'].sum() < full.sum()
    assert (t['gt_shrink'] * (1 - full)).sum() == 0
    # threshold band straddles the boundary
    assert t['gt_thr_mask'].sum() > 0
    assert t['gt_thr'].max() <= 0.7 + 1e-6


def test_postprocess_recovers_box():
    prob = np.zeros((64, 64), np.float32)
    prob[20:40, 10:50] = 0.9
    post = DBPostprocessor(unclip_ratio=0.0)
    boundaries = post(prob)
    assert len(boundaries) == 1
    pts = boundaries[0][:-1].reshape(-1, 2)
    score = boundaries[0][-1]
    assert score > 0.8
    assert abs(pts[:, 0].min() - 10) <= 2 and abs(pts[:, 0].max() - 49) <= 2


def test_hmean_iou():
    gt = [np.array([10, 10, 50, 10, 50, 30, 10, 30], np.float32)]
    pred_good = [np.array([11, 11, 49, 11, 49, 29, 11, 29, 0.9], np.float32)]
    pred_bad = [np.array([0, 0, 5, 0, 5, 5, 0, 5, 0.9], np.float32)]
    res = eval_hmean_iou([pred_good], [gt])
    assert res['hmean'] == 1.0
    res = eval_hmean_iou([pred_bad], [gt])
    assert res['hmean'] == 0.0


def test_textdet_dataset(tmp_path):
    import cv2
    import json
    img = np.zeros((100, 200, 3), np.uint8)
    cv2.rectangle(img, (20, 30), (120, 60), (255, 255, 255), -1)
    cv2.imwrite(str(tmp_path / 'a.jpg'), img)
    ann = {'file_name': 'a.jpg', 'annotations': [
        {'polygon': [20, 30, 120, 30, 120, 60, 20, 60]},
        {'polygon': [0, 0, 5, 0, 5, 5, 0, 5], 'ignore': True},
    ]}
    f = tmp_path / 'det.jsonl'
    f.write_text(json.dumps(ann))
    from tps_pp_tpu.datasets import TextDetDataset
    ds = TextDetDataset(str(f), img_prefix=str(tmp_path),
                        img_size=(64, 128))
    item = ds[0]
    assert item['img'].shape == (64, 128, 3)
    assert len(item['gt_polygons']) == 1  # ignored one dropped
    assert item['gt_shrink'].shape == (64, 128)
    assert item['gt_shrink'].sum() > 0
    # perfect predictions -> hmean 1
    pred = [np.concatenate([item['gt_polygons'][0].reshape(-1), [0.9]])]
    res = ds.evaluate([pred])
    assert res['hmean'] == 1.0
