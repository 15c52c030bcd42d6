"""Data converter units on synthetic inputs (reference tools/data/*;
VERDICT r1 missing #4)."""
import importlib.util
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(rel, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_icdar_det_converter(tmp_path):
    det = _load('tools/data/textdet_converter.py', 'tdc')
    import cv2
    gt = tmp_path / 'gt'
    imgs = tmp_path / 'imgs'
    gt.mkdir()
    imgs.mkdir()
    cv2.imwrite(str(imgs / 'img_1.jpg'), np.zeros((64, 64, 3), np.uint8))
    (gt / 'gt_img_1.txt').write_text(
        '10,10,50,10,50,30,10,30,hello\n5,5,9,5,9,9,5,9,###\n')
    recs = det.convert_icdar(str(gt), str(imgs))
    assert len(recs) == 1
    anns = recs[0]['annotations']
    assert len(anns) == 2
    assert anns[0]['text'] == 'hello' and 'ignore' not in anns[0]
    assert anns[1].get('ignore') is True


def test_totaltext_det_converter(tmp_path):
    det = _load('tools/data/textdet_converter.py', 'tdc2')
    gt = tmp_path
    (gt / 'poly_gt_img1.txt').write_text(
        "x: [[10 50 50 10]], y: [[10 10 30 30]], ornt: [u'h'], "
        "transcriptions: [u'word']\n")
    recs = det.convert_totaltext(str(gt), str(gt))
    assert recs[0]['file_name'] == 'img1.jpg'
    assert recs[0]['annotations'][0]['polygon'] == [10.0, 10.0, 50.0, 10.0,
                                                    50.0, 30.0, 10.0, 30.0]
    assert recs[0]['annotations'][0]['text'] == 'word'


def test_coco_det_converter(tmp_path):
    det = _load('tools/data/textdet_converter.py', 'tdc3')
    coco = {'images': [{'id': 1, 'file_name': 'a.jpg'}],
            'annotations': [
                {'image_id': 1, 'segmentation': [[0, 0, 10, 0, 10, 10,
                                                  0, 10]], 'iscrowd': 0},
                {'image_id': 1, 'segmentation': [[1, 1, 2, 1, 2, 2, 1, 2]],
                 'iscrowd': 1}]}
    f = tmp_path / 'coco.json'
    f.write_text(json.dumps(coco))
    recs = det.convert_coco(str(f), str(tmp_path))
    assert len(recs[0]['annotations']) == 2
    assert recs[0]['annotations'][1].get('ignore') is True


def test_textocr_recog_converter(tmp_path):
    rec = _load('tools/data/textrecog_converter.py', 'trc')
    import cv2
    cv2.imwrite(str(tmp_path / 'x.jpg'),
                np.full((64, 64, 3), 128, np.uint8))
    data = {'imgs': {'1': {'file_name': 'x.jpg'}},
            'imgToAnns': {'1': [0, 1]},
            'anns': [
                {'bbox': [4, 4, 20, 12], 'utf8_string': 'abc'},
                {'bbox': [30, 30, 10, 10], 'utf8_string': '.'}]}
    f = tmp_path / 'TextOCR.json'
    f.write_text(json.dumps(data))
    out = tmp_path / 'out'
    lines = rec.convert_textocr(str(f), str(tmp_path), str(out))
    assert len(lines) == 1 and lines[0].endswith(' abc')
    assert os.path.exists(out / lines[0].split()[0])


def test_openvino_recog_converter(tmp_path):
    rec = _load('tools/data/textrecog_converter.py', 'trc2')
    import cv2
    cv2.imwrite(str(tmp_path / 'y.jpg'), np.full((64, 64, 3), 99, np.uint8))
    data = {'images': [{'id': 7, 'file_name': 'y.jpg'}],
            'annotations': [
                {'image_id': 7, 'bbox': [2, 2, 16, 10],
                 'attributes': {'transcription': 'ok', 'legible': True,
                                'language': 'english'}},
                {'image_id': 7, 'bbox': [2, 20, 16, 10],
                 'attributes': {'transcription': 'non', 'legible': True,
                                'language': 'french'}}]}
    f = tmp_path / 'ov.json'
    f.write_text(json.dumps(data))
    lines = rec.convert_openvino(str(f), str(tmp_path), str(tmp_path / 'o'))
    assert len(lines) == 1 and lines[0].endswith(' ok')


def test_synthtext_recog_and_seg_converters(tmp_path):
    rec = _load('tools/data/textrecog_converter.py', 'trc3')
    import cv2
    from scipy.io import savemat
    os.makedirs(tmp_path / 'im')
    cv2.imwrite(str(tmp_path / 'im' / 'a.jpg'),
                np.full((64, 96, 3), 30, np.uint8))
    # one image, two words 'ab' 'c' -> 3 char boxes
    word_bb = np.zeros((2, 4, 2), np.float64)   # (2=xy, 4 corners, n)
    word_bb[:, :, 0] = np.array([[4, 40, 40, 4], [4, 4, 20, 20]])
    word_bb[:, :, 1] = np.array([[50, 80, 80, 50], [4, 4, 20, 20]])
    char_bb = np.zeros((2, 4, 3), np.float64)
    for i, x0 in enumerate((4, 22, 50)):
        char_bb[:, :, i] = np.array([[x0, x0 + 14, x0 + 14, x0],
                                     [4, 4, 20, 20]])
    gt = {'imnames': np.array([[np.array(['a.jpg'])]], dtype=object),
          'txt': np.array([[np.array(['ab c'])]], dtype=object),
          'wordBB': np.empty((1, 1), object),
          'charBB': np.empty((1, 1), object)}
    gt['wordBB'][0, 0] = word_bb
    gt['charBB'][0, 0] = char_bb
    savemat(tmp_path / 'gt.mat', gt)
    out = tmp_path / 'crops'
    lines = rec.convert_synthtext(str(tmp_path / 'gt.mat'),
                                  str(tmp_path / 'im'), str(out))
    assert sorted(ln.split()[1] for ln in lines) == ['ab', 'c']

    rec.convert_seg_synthtext(str(tmp_path / 'gt.mat'),
                              str(tmp_path / 'im'), str(tmp_path / 'seg'))
    seg_lines = [json.loads(ln) for ln in open(
        tmp_path / 'seg' / 'seg_label.jsonl')]
    assert seg_lines[0]['text'] == 'abc'
    assert len(seg_lines[0]['annotations']) == 3


def test_lmdb_pack_roundtrip(tmp_path):
    conv = _load('tools/data/lmdb_converter.py', 'lmc')
    txt = tmp_path / 'label.txt'
    txt.write_text('a.jpg hello\nb.jpg world\n')
    n = conv.txt2pack(str(txt), str(tmp_path / 'label.pack'))
    assert n == 2
    m = conv.pack2txt(str(tmp_path / 'label.pack'), str(tmp_path / 'out.txt'))
    assert m == 2
    assert (tmp_path / 'out.txt').read_text() == txt.read_text()
    try:
        import lmdb  # noqa: F401
    except ImportError:
        return
    conv.txt2lmdb(str(txt), str(tmp_path / 'label.lmdb'))
    conv.lmdb2txt(str(tmp_path / 'label.lmdb'), str(tmp_path / 'out2.txt'))
    assert (tmp_path / 'out2.txt').read_text() == txt.read_text()
