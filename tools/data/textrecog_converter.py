#!/usr/bin/env python
"""Recognition dataset converters (reference tools/data/textrecog/
{svt,totaltext,textocr,openvino,synthtext}_converter.py).

Produces the framework's standard ``label.txt`` (``<relpath> <text>`` lines,
consumable by HardDiskLoader) and optionally a TPSPACK1 pack, from:

  * ``svt``       — SVT's test.xml (image-level rectangles + tags): crops
    each word box into an output dir.
  * ``totaltext`` — Total-Text's txt polygon annotations per image.
  * ``jsonl``     — generic {'filename': ..., 'text': ...} JSON lines.

    python tools/data/textrecog_converter.py svt PATH/test.xml IMG_ROOT OUT/
"""
import argparse
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
    p.add_argument('kind', choices=['svt', 'totaltext', 'jsonl'])
    p.add_argument('annotation')
    p.add_argument('img_root')
    p.add_argument('out_dir')
    p.add_argument('--pack', action='store_true',
                   help='also write label.pack (TPSPACK1)')
    args = p.parse_args()

    fn = {'svt': convert_svt, 'totaltext': convert_totaltext,
          'jsonl': convert_jsonl}[args.kind]
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
