"""Data-layer tests (reference analog: tests/test_dataset/*): loaders,
parsers, transforms, datasets, dataloader batching, config loading."""
import os

import numpy as np
import pytest

from tps_pp_tpu.config import load_config
from tps_pp_tpu.datasets import (Compose, DataLoader, HardDiskLoader,
                                 LineJsonParser, LineStrParser, OCRDataset,
                                 UniformConcatDataset, build_dataset)

TOY = os.path.join(os.path.dirname(__file__), 'data/ocr_toy_dataset')


def toy_cfg(test_mode=True):
    return dict(
        type='OCRDataset', img_prefix=TOY,
        ann_file=os.path.join(TOY, 'label.txt'),
        loader=dict(type='HardDiskLoader',
                    parser=dict(type='LineStrParser',
                                keys=['filename', 'text'],
                                keys_idx=[0, 1], separator=' ')),
        pipeline=[
            dict(type='LoadImageFromFile', color_type='grayscale'),
            dict(type='ResizeOCR', height=32, min_width=100, max_width=100,
                 keep_aspect_ratio=False),
            dict(type='ToTensorOCR'),
            dict(type='NormalizeOCR', mean=[0.5], std=[0.5]),
            dict(type='Collect', keys=['img']),
        ],
        test_mode=test_mode)


def test_parsers(tmp_path):
    p = LineStrParser(keys=['filename', 'text'], keys_idx=[0, 1])
    item = p.get_item(['a.jpg hello'], 0)
    assert item == {'filename': 'a.jpg', 'text': 'hello'}
    jp = LineJsonParser(keys=['filename', 'text'])
    item = jp.get_item(['{"filename": "b.jpg", "text": "w"}'], 0)
    assert item['text'] == 'w'
    with pytest.raises(ValueError):
        jp.get_item(['{"filename": "b.jpg"}'], 0)


def test_string_strip_in_parser():
    """StringStrip kwargs flow through LineStrParser (reference
    parser.py:32 + string_util.py)."""
    from tps_pp_tpu.utils import StringStrip
    assert StringStrip()('  x  ') == 'x'
    assert StringStrip(strip_pos='left')(' x ') == 'x '
    assert StringStrip(strip_pos='right', strip_str='#')('x##') == 'x'
    assert StringStrip(strip=False)(' x ') == ' x '
    p = LineStrParser(keys=['filename', 'text'], keys_idx=[0, 1],
                      strip_pos='right', strip_str='#')
    assert p.get_item(['a.jpg hello##'], 0)['text'] == 'hello'


def test_imshow_edge():
    """KIE node/edge visualization (reference core/visualize.py:822)."""
    import numpy as np
    from tps_pp_tpu.utils.visualize import imshow_edge
    img = np.full((80, 120, 3), 200, np.uint8)
    boxes = np.array([[5, 5, 50, 20], [5, 30, 60, 45]], np.float32)
    nodes = np.array([[0.1, 0.8, 0.1], [0.1, 0.1, 0.8]], np.float32)
    edges = np.array([[0, 0.9], [0.9, 0]], np.float32)
    out = imshow_edge(img, boxes, ['Name:', 'Alice'], nodes, edges)
    assert out.shape[0] == 80 and out.shape[1] > 120
    # the panel carries drawn text (non-white pixels)
    assert (out[:, 120:] < 250).any()
    # below-threshold edges draw no pairs
    out2 = imshow_edge(img, boxes, ['a', 'b'], nodes,
                       np.zeros((2, 2), np.float32))
    assert not (out2[:, 120:] < 250).any()


def test_hard_disk_loader(tmp_path):
    f = tmp_path / 'ann.txt'
    f.write_text('a.jpg x\nb.jpg y\n')
    loader = HardDiskLoader(str(f), dict(type='LineStrParser',
                                         keys=['filename', 'text'],
                                         keys_idx=[0, 1]), repeat=2)
    assert len(loader) == 4
    assert loader[3]['text'] == 'y'  # wraps around


def test_ocr_dataset_and_loader():
    ds = build_dataset(toy_cfg())
    assert len(ds) == 10
    item = ds[0]
    assert item['img'].shape == (32, 100, 1)
    assert item['text'] == 'hello'
    dl = DataLoader(ds, batch_size=4, pad_to_batch=True)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[-1]['img'].shape == (4, 32, 100, 1)  # padded
    assert batches[-1]['n_real'] == 2


def test_uniform_concat_evaluate():
    ds = UniformConcatDataset([toy_cfg(), toy_cfg()], test_mode=True)
    assert len(ds) == 20
    results = [dict(text=ds.datasets[0].data_infos[i % 10]['text'], score=[])
               for i in range(20)]
    metrics = ds.evaluate(results)
    assert metrics['mean_word_acc_ignore_case_symbol'] == 1.0
    # break half of the second dataset
    for i in range(10, 15):
        results[i] = dict(text='zzz', score=[])
    metrics = ds.evaluate(results)
    assert abs(metrics['mean_word_acc_ignore_case_symbol'] - 0.75) < 1e-3


def test_resize_ocr_valid_ratio():
    from tps_pp_tpu.datasets.pipelines.transforms import ResizeOCR
    img = np.zeros((64, 64, 3), np.uint8)
    r = ResizeOCR(height=32, min_width=32, max_width=160,
                  keep_aspect_ratio=True, width_downsample_ratio=0.25)
    out = r({'img': img, 'img_shape': img.shape})
    assert out['img'].shape == (32, 160, 3)
    assert abs(out['valid_ratio'] - 32 / 160) < 1e-6
    assert out['resize_shape'][1] == 32


def test_augmentations_preserve_shape():
    from tps_pp_tpu.registry import PIPELINES
    img = np.random.default_rng(0).integers(
        0, 255, (32, 100, 3)).astype(np.uint8)
    for cfg in [
        dict(type='RandomRotateTextDet', max_angle=15),
        dict(type='RandomAffine'),
        dict(type='RandomPerspective'),
        dict(type='ColorJitter'),
        dict(type='GaussNoise'),
        dict(type='MotionBlur'),
        dict(type='PyramidRescale'),
        dict(type='RandomWrapper', p=1.0,
             transforms=[dict(type='MotionBlur')]),
        dict(type='OneOfWrapper', transforms=[dict(type='GaussNoise')]),
    ]:
        t = PIPELINES.build(cfg)
        out = t({'img': img.copy()})
        assert out['img'].shape == img.shape, cfg


def test_config_system():
    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs/textrecog/nrtr/nrtr_tps++.py'))
    assert cfg.model.type == 'NRTR'
    assert cfg.model.tpsnet.point_size == (2, 16)
    assert cfg.optimizer.lr == 1e-4
    assert cfg.lr_config.step == [8, 10]
    # {{_base_.var}} interpolation resolved the pipelines
    assert isinstance(cfg.data.train.pipeline, list)
    assert cfg.data.train.pipeline[0]['type'] == 'LoadImageFromFile'
    # dataset entries resolved from the base file
    assert cfg.data.train.datasets[0]['type'] == 'OCRDataset'


def test_all_model_configs_load():
    import glob
    base = os.path.join(os.path.dirname(__file__), '..', 'configs')
    files = []
    for task in ('textrecog', 'textdet', 'kie', 'ner'):
        files += glob.glob(os.path.join(base, task, '*', '*.py'))
    assert len(files) >= 20
    for f in files:
        cfg = load_config(f)
        assert 'model' in cfg and 'type' in cfg.model, f
