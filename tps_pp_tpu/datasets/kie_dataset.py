"""KIE / NER datasets (§2.6: reference KIEDataset / NerDataset).

* KIEDataset — wildreceipt-style JSON-line annotations (one image per line:
  {'file_name', 'height', 'width', 'annotations': [{'box': 8 floats,
  'text', 'label'}]}). Produces the SDMGR inputs: padded (max_nodes,
  max_chars) char-index texts, (max_nodes, max_nodes, 5) box-relation
  features (the reference's dx/dy/w-ratio/h-ratio/aspect features,
  kie_dataset.py compute_relation) and node labels.
* NerDataset — cluener-style JSON lines ({'text', 'label': {type: {entity:
  [[s, e], ...]}}}) -> per-char BIO tag ids.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..registry import DATASETS


@DATASETS.register_module()
class KIEDataset:
    def __init__(self, ann_file: str, dict_file: Optional[str] = None,
                 dict_list: Optional[Sequence[str]] = None,
                 max_nodes: int = 64, max_chars: int = 32,
                 norm: float = 10.0, test_mode: bool = False, **kwargs):
        with open(ann_file, encoding='utf-8') as f:
            self.lines = [json.loads(line) for line in f if line.strip()]
        if dict_file:
            with open(dict_file, encoding='utf-8') as f:
                chars = [line.rstrip('\n') for line in f if line.strip()]
        else:
            chars = list(dict_list or
                         '0123456789abcdefghijklmnopqrstuvwxyz'
                         'ABCDEFGHIJKLMNOPQRSTUVWXYZ')
        # index 0 is reserved for padding (reference embeds with padding_idx=0)
        self.char2idx = {c: i + 1 for i, c in enumerate(chars)}
        self.max_nodes = max_nodes
        self.max_chars = max_chars
        self.norm = norm
        self.test_mode = test_mode

    def __len__(self):
        return len(self.lines)

    def compute_relations(self, boxes: np.ndarray) -> np.ndarray:
        """(N, 4) xyxy -> (N, N, 5) [dx/norm_h, dy/norm_h, w_i/h_i,
        h_j/h_i, w_j/h_i] (reference KIEDataset.compute_relation)."""
        x1, y1 = boxes[:, 0], boxes[:, 1]
        w = np.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
        h = np.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
        dx = (x1[None, :] - x1[:, None]) / (h[:, None] * self.norm / 10.0)
        dy = (y1[None, :] - y1[:, None]) / (h[:, None] * self.norm / 10.0)
        N = len(boxes)
        rel = np.stack([
            dx, dy,
            np.broadcast_to((w / h)[:, None], (N, N)),
            h[None, :] / h[:, None],
            w[None, :] / h[:, None],
        ], axis=-1)
        return rel.astype(np.float32)

    def __getitem__(self, index: int) -> Dict:
        line = self.lines[index]
        anns = line['annotations'][:self.max_nodes]
        N = self.max_nodes
        texts = np.zeros((N, self.max_chars), np.int32)
        labels = np.full((N,), -100, np.int32)
        boxes = np.zeros((max(len(anns), 1), 4), np.float32)
        for i, ann in enumerate(anns):
            for j, ch in enumerate(str(ann.get('text', ''))[:self.max_chars]):
                texts[i, j] = self.char2idx.get(ch, len(self.char2idx) + 1)
            labels[i] = int(ann.get('label', 0))
            box = np.asarray(ann['box'], np.float32).reshape(-1, 2)
            boxes[i] = [box[:, 0].min(), box[:, 1].min(),
                        box[:, 0].max(), box[:, 1].max()]
        rel = np.zeros((N, N, 5), np.float32)
        n = len(anns)
        if n:
            rel[:n, :n] = self.compute_relations(boxes[:n])
        # edge labels: same-key linking = same label pairs (wildreceipt's
        # edge supervision; -1 = ignore for padded rows)
        edges = np.full((N, N), -1, np.int32)
        if n:
            lab = labels[:n]
            edges[:n, :n] = (lab[:, None] == lab[None, :]).astype(np.int32)
        return {
            'texts': texts,
            'relations': rel,
            'labels': labels,
            'edge_labels': edges,
            'filename': line.get('file_name'),
        }

    def evaluate(self, results: List[np.ndarray], metric='macro_f1',
                 ignores=(0, 2, 4, 6, 8, 10, 12, 25), **kwargs) -> Dict:
        """results: per-sample predicted node classes."""
        from ..evaluation import compute_f1_score
        preds, gts = [], []
        for i, pred in enumerate(results):
            gt = self[i]['labels']
            valid = gt != -100
            preds.append(np.asarray(pred)[valid])
            gts.append(gt[valid])
        f1 = compute_f1_score(np.concatenate(preds), np.concatenate(gts),
                              ignores=ignores)
        return {'macro_f1': round(float(f1.mean()), 4)}


@DATASETS.register_module()
class NerDataset:
    """cluener-style NER dataset -> (input_ids via a char vocab, BIO tag
    ids, attention mask). The reference tokenizes with its in-tree BERT
    vocab (ner/utils/*); supply ``vocab_file`` for real runs."""

    def __init__(self, ann_file: str, categories: Sequence[str],
                 vocab_file: Optional[str] = None, max_len: int = 128,
                 test_mode: bool = False, **kwargs):
        with open(ann_file, encoding='utf-8') as f:
            self.lines = [json.loads(line) for line in f if line.strip()]
        self.categories = list(categories)
        self.tag2id = {'O': 0}
        for c in self.categories:
            self.tag2id[f'B-{c}'] = len(self.tag2id)
            self.tag2id[f'I-{c}'] = len(self.tag2id)
        self.id2tag = {v: k for k, v in self.tag2id.items()}
        self.max_len = max_len
        self.vocab = {}
        if vocab_file:
            with open(vocab_file, encoding='utf-8') as f:
                for i, tok in enumerate(f):
                    self.vocab[tok.rstrip('\n')] = i

    def __len__(self):
        return len(self.lines)

    def _char_id(self, ch: str) -> int:
        if self.vocab:
            return self.vocab.get(ch, self.vocab.get('[UNK]', 1))
        return (ord(ch) % 20000) + 100  # hash fallback without a vocab

    def __getitem__(self, index: int) -> Dict:
        line = self.lines[index]
        text = line['text'][:self.max_len]
        ids = np.zeros((self.max_len,), np.int32)
        mask = np.zeros((self.max_len,), np.int32)
        tags = np.zeros((self.max_len,), np.int32)
        for i, ch in enumerate(text):
            ids[i] = self._char_id(ch)
            mask[i] = 1
        for cat, entities in line.get('label', {}).items():
            for _, spans in entities.items():
                for s, e in spans:
                    if s >= self.max_len:
                        continue
                    tags[s] = self.tag2id[f'B-{cat}']
                    for k in range(s + 1, min(e + 1, self.max_len)):
                        tags[k] = self.tag2id[f'I-{cat}']
        return {'input_ids': ids, 'attention_mask': mask, 'labels': tags,
                'text': text}

    def evaluate(self, results: List[np.ndarray], **kwargs) -> Dict:
        """results: per-sample predicted tag-id arrays."""
        from ..evaluation import eval_ner_f1
        pred_tags, gt_tags = [], []
        for i, pred in enumerate(results):
            item = self[i]
            n = int(item['attention_mask'].sum())
            pred_tags.append([self.id2tag[int(t)] for t in
                              np.asarray(pred)[:n]])
            gt_tags.append([self.id2tag[int(t)] for t in
                            item['labels'][:n]])
        return eval_ner_f1(pred_tags, gt_tags)
