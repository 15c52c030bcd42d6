from .ocr_metric import eval_ocr_metric, count_matches, levenshtein
from .f1 import compute_f1_score, eval_ner_f1
from ..models.textdet.postprocess import eval_hmean_iou

__all__ = ['eval_ocr_metric', 'count_matches', 'levenshtein',
           'compute_f1_score', 'eval_ner_f1', 'eval_hmean_iou']
