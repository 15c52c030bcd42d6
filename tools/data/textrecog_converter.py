#!/usr/bin/env python
"""Recognition dataset converters (reference tools/data/textrecog/
{svt,totaltext,textocr,openvino,synthtext}_converter.py).

Produces the framework's standard ``label.txt`` (``<relpath> <text>`` lines,
consumable by HardDiskLoader) and optionally a TPSPACK1 pack, from:

  * ``svt``       — SVT's test.xml (image-level rectangles + tags): crops
    each word box into an output dir.
  * ``totaltext`` — Total-Text's txt polygon annotations per image.
  * ``jsonl``     — generic {'filename': ..., 'text': ...} JSON lines.
  * ``synthtext`` — SynthText's gt.mat (scipy loadmat; word boxes cropped;
    reference tools/data/textrecog/synthtext_converter.py).
  * ``textocr``   — TextOCR's TextOCR_*.json (utf8_string boxes cropped;
    reference textocr_converter.py; '.'-labelled illegible boxes skipped).
  * ``openvino``  — Open Images v5 annotation json (attributes.transcription
    boxes, legible english only; reference openvino_converter.py).
  * ``seg_synthtext`` — SynthText char boxes -> the OCRSegDataset JSON-lines
    char-annotation format (reference seg_synthtext_converter.py).

    python tools/data/textrecog_converter.py svt PATH/test.xml IMG_ROOT OUT/
"""
import argparse

import numpy as np
import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def convert_svt(xml_path, img_root, out_dir):
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    tree = ET.parse(xml_path)
    lines = []
    idx = 0
    for image in tree.getroot().iter('image'):
        name = image.find('imageName').text
        img = cv2.imread(os.path.join(img_root, name))
        if img is None:
            continue
        for rect in image.iter('taggedRectangle'):
            tag = rect.find('tag').text
            x, y = int(rect.get('x')), int(rect.get('y'))
            w, h = int(rect.get('width')), int(rect.get('height'))
            x0, y0 = max(x, 0), max(y, 0)
            crop = img[y0:y + h, x0:x + w]
            if crop.size == 0:
                continue
            fn = f'img_{idx}.jpg'
            cv2.imwrite(os.path.join(out_dir, fn), crop)
            lines.append(f'{fn} {tag}')
            idx += 1
    return lines


def convert_totaltext(ann_dir, img_root, out_dir):
    import re

    import cv2
    os.makedirs(out_dir, exist_ok=True)
    lines = []
    idx = 0
    for ann in sorted(os.listdir(ann_dir)):
        if not ann.endswith('.txt'):
            continue
        img_name = ann.replace('poly_gt_', '').replace('.txt', '.jpg')
        img = cv2.imread(os.path.join(img_root, img_name))
        if img is None:
            continue
        for line in open(os.path.join(ann_dir, ann), encoding='utf-8'):
            xs = re.findall(r"x: \[\[([\d\s]+)\]\]", line)
            ys = re.findall(r"y: \[\[([\d\s]+)\]\]", line)
            ts = re.findall(r"transcriptions: \[u?'(.+?)'\]", line)
            if not xs or not ys or not ts or ts[0] == '#':
                continue
            x = [int(v) for v in xs[0].split()]
            y = [int(v) for v in ys[0].split()]
            crop = img[max(min(y), 0):max(y), max(min(x), 0):max(x)]
            if crop.size == 0:
                continue
            fn = f'img_{idx}.jpg'
            cv2.imwrite(os.path.join(out_dir, fn), crop)
            lines.append(f'{fn} {ts[0]}')
            idx += 1
    return lines


def _crop_box_lines(entries, img_root, out_dir):
    """entries: iterable of (img_relpath, [(x0, y0, x1, y1, text), ...])."""
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    lines = []
    idx = 0
    for rel, boxes in entries:
        img = cv2.imread(os.path.join(img_root, rel))
        if img is None:
            continue
        H, W = img.shape[:2]
        for x0, y0, x1, y1, text in boxes:
            x0, y0 = max(int(x0), 0), max(int(y0), 0)
            x1, y1 = min(int(x1), W), min(int(y1), H)
            crop = img[y0:y1, x0:x1]
            if crop.size == 0 or not text:
                continue
            fn = f'img_{idx}.jpg'
            cv2.imwrite(os.path.join(out_dir, fn), crop)
            lines.append(f'{fn} {text}')
            idx += 1
    return lines


def _load_synthtext_gt(mat_path):
    """gt.mat -> (img_path, words, word quads) tuples (reference
    synthtext_converter.py:28-76)."""
    from scipy.io import loadmat
    gt = loadmat(mat_path, simplify_cells=False)
    def _unwrap(v):
        import numpy as _np
        while isinstance(v, _np.ndarray):
            v = v.reshape(-1)[0]
        return str(v)

    for i in range(gt['imnames'].shape[1]):
        img_path = _unwrap(gt['imnames'][0, i])
        txt = gt['txt'][0, i]
        word_bb = gt['wordBB'][0, i]
        char_bb = gt['charBB'][0, i]
        words = []
        if isinstance(txt, str):
            words = txt.split()
        else:
            for line in np.asarray(txt, dtype=object).reshape(-1):
                words += _unwrap(line).split()
        if word_bb.ndim == 2:
            word_bb = word_bb[:, :, None]
        quads = word_bb.transpose(2, 1, 0)  # (n, 4, 2)
        if len(words) != len(quads):
            continue
        yield img_path, words, quads, char_bb


def convert_synthtext(mat_path, img_root, out_dir):
    entries = []
    for img_path, words, quads, _ in _load_synthtext_gt(mat_path):
        boxes = []
        for word, quad in zip(words, quads):
            xs, ys = quad[:, 0], quad[:, 1]
            boxes.append((xs.min(), ys.min(), xs.max(), ys.max(), word))
        entries.append((img_path, boxes))
    return _crop_box_lines(entries, img_root, out_dir)


def convert_seg_synthtext(mat_path, img_root, out_dir):
    """SynthText char boxes -> OCRSegDataset JSON lines (written alongside
    label.txt as seg_label.jsonl)."""
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, 'seg_label.jsonl')
    n = 0
    with open(out_path, 'w', encoding='utf-8') as f:
        for img_path, words, quads, char_bb in _load_synthtext_gt(mat_path):
            if char_bb.ndim == 2:
                char_bb = char_bb[:, :, None]
            chars = ''.join(words)
            cquads = char_bb.transpose(2, 1, 0)
            if len(chars) != len(cquads):
                continue
            anns = [{'char_box': q.reshape(-1).tolist(), 'char_text': c}
                    for c, q in zip(chars, cquads)]
            f.write(json.dumps({'file_name': img_path, 'text': chars,
                                'annotations': anns}) + '\n')
            n += 1
    return [f'# wrote {n} records to seg_label.jsonl (use OCRSegDataset)']


def convert_textocr(json_path, img_root, out_dir):
    """reference textocr_converter.py:25-47."""
    with open(json_path, encoding='utf-8') as f:
        data = json.load(f)
    entries = []
    for img_id, info in data['imgs'].items():
        boxes = []
        for ann_id in data['imgToAnns'].get(img_id, []):
            ann = data['anns'][str(ann_id)] if isinstance(
                data['anns'], dict) else data['anns'][ann_id]
            text = ann.get('utf8_string', '')
            if text == '.':
                continue
            x, y, w, h = ann['bbox']
            boxes.append((x, y, x + w, y + h, text))
        entries.append((info['file_name'], boxes))
    return _crop_box_lines(entries, img_root, out_dir)


def convert_openvino(json_path, img_root, out_dir):
    """Open Images v5 (reference openvino_converter.py:36-60): keep legible
    english transcriptions only."""
    with open(json_path, encoding='utf-8') as f:
        data = json.load(f)
    imgs = {i['id']: i for i in data['images']}
    per_img = {}
    for ann in data['annotations']:
        attrs = ann.get('attributes', {})
        if not attrs.get('legible', True):
            continue
        if attrs.get('language', 'english') != 'english':
            continue
        x, y, w, h = ann['bbox']
        per_img.setdefault(ann['image_id'], []).append(
            (x, y, x + w, y + h, attrs.get('transcription', '')))
    entries = [(imgs[i]['file_name'], boxes)
               for i, boxes in per_img.items() if i in imgs]
    return _crop_box_lines(entries, img_root, out_dir)


def convert_jsonl(jsonl_path, img_root, out_dir):
    lines = []
    for line in open(jsonl_path, encoding='utf-8'):
        if not line.strip():
            continue
        obj = json.loads(line)
        lines.append(f"{obj['filename']} {obj['text']}")
    return lines


def main():
    p = argparse.ArgumentParser()
    p.add_argument('kind', choices=['svt', 'totaltext', 'jsonl',
                                    'synthtext', 'textocr', 'openvino',
                                    'seg_synthtext'])
    p.add_argument('annotation')
    p.add_argument('img_root')
    p.add_argument('out_dir')
    p.add_argument('--pack', action='store_true',
                   help='also write label.pack (TPSPACK1)')
    args = p.parse_args()

    fn = {'svt': convert_svt, 'totaltext': convert_totaltext,
          'jsonl': convert_jsonl, 'synthtext': convert_synthtext,
          'textocr': convert_textocr, 'openvino': convert_openvino,
          'seg_synthtext': convert_seg_synthtext}[args.kind]
    lines = fn(args.annotation, args.img_root, args.out_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    label = os.path.join(args.out_dir, 'label.txt')
    with open(label, 'w', encoding='utf-8') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'wrote {len(lines)} samples -> {label}')
    if args.pack:
        from tps_pp_tpu.native import write_packed
        write_packed(os.path.join(args.out_dir, 'label.pack'),
                     [ln.encode('utf-8') for ln in lines])
        print('wrote label.pack')


if __name__ == '__main__':
    main()
