"""TTA wired into evaluation: MultiRotateAugOCR variants run through the
recognizer at batch_size=1 and merge_aug_results picks the winner
(reference test pipelines apply MultiRotateAugOCR with samples_per_gpu=1
and strip it when batch > 1, apis/utils.py:61-98).
"""
import os

import cv2
import numpy as np

from tps_pp_tpu.apis.test import eval_recognizer
from tps_pp_tpu.datasets import build_dataset


class _StubConvertor:
    """argmax decode over a 3-char vocab [blank, 'a', 'b']."""

    def tensor2idx(self, out, img_metas=None):
        idxs = out.argmax(-1)
        scores = [[float(out[i, t, idxs[i, t]]) for t in range(out.shape[1])]
                  for i in range(out.shape[0])]
        return idxs.tolist(), scores

    def idx2str(self, indexes):
        return [''.join('_ab'[i] for i in idx).strip('_')
                for idx in indexes]


class _OrientationRec:
    """Scores 'b' by the left-half brightness of the (resized) variant: the
    90-degree rotation of the toy image is bright on the left, the upright
    one is not — so only the rotated hypothesis reads 'b' confidently."""

    label_convertor = _StubConvertor()

    def predict(self, variables, imgs, valid_ratio=None,
                bucket_batch: bool = True, mesh=None):
        imgs = np.asarray(imgs, np.float32)
        n = imgs.shape[0]
        left = imgs[:, :, :imgs.shape[2] // 2].mean(axis=(1, 2, 3)) / 255.0
        out = np.zeros((n, 1, 3), np.float32)
        # upright: left half ~50% bright (0.5) -> 'a' wins; 90°-rotated:
        # left half fully bright (~1.0) -> 'b' wins
        out[:, :, 1] = 0.65                    # 'a': constant mid confidence
        out[:, :, 2] = left[:, None]           # 'b': left-half brightness
        return out


def _tta_dataset(tmp_path, with_tta: bool, write_img: bool = True):
    if write_img:
        img = np.zeros((64, 16, 3), np.uint8)
        img[32:] = 255                  # bottom half white -> left after 90°
        cv2.imwrite(str(tmp_path / 'tall.jpg'), img)
        (tmp_path / 'label.txt').write_text('tall.jpg b\n')
    inner = [
        dict(type='ResizeOCR', height=32, min_width=64, max_width=64,
             keep_aspect_ratio=False),
        dict(type='Collect', keys=['img']),
    ]
    pipeline = [dict(type='LoadImageFromFile')]
    if with_tta:
        pipeline.append(dict(type='MultiRotateAugOCR',
                             rotate_degrees=(0, 90, 270),
                             transforms=inner))
    else:
        pipeline.extend(inner)
    return build_dataset(dict(
        type='OCRDataset', img_prefix=str(tmp_path),
        ann_file=os.path.join(str(tmp_path), 'label.txt'),
        loader=dict(type='HardDiskLoader',
                    parser=dict(type='LineStrParser',
                                keys=['filename', 'text'],
                                keys_idx=[0, 1], separator=' ')),
        pipeline=pipeline, test_mode=True))


def test_tta_changes_winning_hypothesis(tmp_path):
    rec = _OrientationRec()
    ds = _tta_dataset(tmp_path, with_tta=True)
    item = ds[0]
    assert item['aug_n'] == 3 and len(item['aug_imgs']) == 3
    assert all(v.shape == item['aug_imgs'][0].shape
               for v in item['aug_imgs'])  # sub-pipeline ran per variant

    # TTA at batch 1: the 90-degree hypothesis ('b') wins the merge
    metrics, results = eval_recognizer(rec, None, ds, batch_size=1,
                                       return_results=True)
    assert results[0]['text'] == 'b'
    assert metrics['word_acc_ignore_case_symbol'] == 1.0

    # batch > 1 strips TTA (reference rule): upright image alone reads 'a'
    ds2 = _tta_dataset(tmp_path, with_tta=True)
    metrics2, results2 = eval_recognizer(rec, None, ds2, batch_size=2,
                                         return_results=True)
    assert results2[0]['text'] == 'a'
    assert metrics2['word_acc_ignore_case_symbol'] == 0.0


def test_short_crop_skips_rotation(tmp_path):
    """Wide crops produce a single variant; the TTA loop pads but decodes
    only the real one."""
    img = np.zeros((16, 64, 3), np.uint8)
    cv2.imwrite(str(tmp_path / 'tall.jpg'), img)   # overwrite: wide now
    (tmp_path / 'label.txt').write_text('tall.jpg a\n')
    ds = _tta_dataset(tmp_path, with_tta=True, write_img=False)
    item = ds[0]
    assert item['aug_n'] == 1
    rec = _OrientationRec()
    metrics, results = eval_recognizer(rec, None, ds, batch_size=1,
                                       return_results=True)
    assert results[0]['text'] == 'a'


def test_rotation_mapping_matches_reference():
    """Reference maps degree 90 -> np.rot90(img, 1) (one CCW turn),
    180 -> 2, 270 -> 3 (test_time_aug.py:66-71)."""
    from tps_pp_tpu.datasets.pipelines.test_time_aug import MultiRotateAugOCR

    aug = MultiRotateAugOCR(rotate_degrees=(0, 90, 180, 270),
                            force_rotate=True)
    img = np.arange(2 * 3 * 1).reshape(2, 3, 1).astype(np.uint8)
    v0, v90, v180, v270 = aug.expand(img)
    np.testing.assert_array_equal(v0, img)
    np.testing.assert_array_equal(v90, np.rot90(img, 1))
    np.testing.assert_array_equal(v180, np.rot90(img, 2))
    np.testing.assert_array_equal(v270, np.rot90(img, 3))
    # rotate only taller-than-wide crops (reference height<=width -> [0])
    aug2 = MultiRotateAugOCR(rotate_degrees=(0, 90, 270))
    assert not aug2.should_rotate(np.zeros((32, 32, 1)))
    assert aug2.should_rotate(np.zeros((33, 32, 1)))
