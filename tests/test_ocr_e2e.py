"""End-to-end det+recog MMOCR readtext (reference utils/ocr.py:164-717;
VERDICT r1 missing #5) + box-stitching/crop units."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy


def test_stitch_boxes_into_lines():
    from tps_pp_tpu.utils.box_util import stitch_boxes_into_lines
    boxes = [
        {'box': [0, 0, 10, 0, 10, 10, 0, 10], 'text': 'hello'},
        {'box': [12, 0, 22, 0, 22, 10, 12, 10], 'text': 'world'},
        # far to the right on the same line: split by max_x_dist
        {'box': [100, 0, 110, 0, 110, 10, 100, 10], 'text': 'far'},
        # different line
        {'box': [0, 30, 10, 30, 10, 40, 0, 40], 'text': 'below'},
    ]
    merged = stitch_boxes_into_lines(boxes, max_x_dist=10,
                                     min_y_overlap_ratio=0.8)
    texts = sorted(m['text'] for m in merged)
    assert texts == ['below', 'far', 'hello world']
    hw = next(m for m in merged if m['text'] == 'hello world')
    assert hw['box'][0] == 0 and hw['box'][2] == 22


def test_crop_img_padding():
    from tps_pp_tpu.utils.box_util import crop_img
    img = np.arange(100 * 200 * 3, dtype=np.uint8).reshape(100, 200, 3)
    box = [50, 20, 150, 20, 150, 40, 50, 40]  # w=100, h=20 -> font 20
    crop = crop_img(img, box, long_edge_pad_ratio=0.4,
                    short_edge_pad_ratio=0.2)
    # horizontal pad 8 (long edge), vertical pad 4
    assert crop.shape[1] == (150 + 8) - (50 - 8)
    assert crop.shape[0] == (40 + 4) - (20 - 4)
    # clipped at image edges
    crop2 = crop_img(img, [0, 0, 30, 0, 30, 10, 0, 10])
    assert crop2.shape[0] > 0 and crop2.shape[1] > 0


def test_mmocr_det_recog_readtext(tmp_path):
    """Full pipeline on a synthetic image with random-init weights:
    det -> crop -> batched recog -> merge. Structure (not accuracy) is
    asserted — no trained checkpoints exist in this environment."""
    import cv2
    import json
    from tps_pp_tpu.apis.ocr import MMOCR

    img = np.full((160, 320, 3), 255, np.uint8)
    cv2.rectangle(img, (40, 60), (160, 100), (0, 0, 0), -1)
    path = str(tmp_path / 'demo.jpg')
    cv2.imwrite(path, img)

    ocr = MMOCR(det='DBNet', recog='CRNN', det_img_size=(160, 160))
    out = ocr.readtext(path, merge=True, details=True,
                       output=str(tmp_path / 'out.json'))
    assert len(out) == 1
    res = out[0]
    assert res['filename'] == path
    assert 'result' in res and 'merged' in res
    for r in res['result']:
        assert len(r['box']) == 8
        assert set(r) >= {'box', 'box_score', 'text', 'text_score'}
    # exported JSON parses back
    loaded = json.load(open(tmp_path / 'out.json'))
    assert loaded[0]['filename'] == path

    # det-only and recog-only paths
    boundaries = ocr.detect(path)
    assert isinstance(boundaries, list)
    rec = MMOCR(det=None, recog='CRNN')
    crop = img[60:100, 40:160]
    single = rec.readtext(crop)
    assert isinstance(single[0]['text'], str)


def test_mmocr_det_recog_kie_readtext():
    """Three-stage pipeline (reference MMOCR(det, recog, kie='SDMGR'),
    ocr.py:349-352): every detected box gets a KIE node label."""
    import cv2
    from tps_pp_tpu.apis.ocr import MMOCR
    img = np.full((160, 320, 3), 255, np.uint8)
    cv2.rectangle(img, (40, 60), (160, 100), (0, 0, 0), -1)
    ocr = MMOCR(det='DBNet', recog='CRNN', kie='SDMGR',
                det_img_size=(160, 160))
    out = ocr.readtext(img, details=True)
    for r in out[0]['result']:
        assert 'label' in r and 0 <= r['label'] < 26
        assert 0.0 <= r['label_score'] <= 1.0
