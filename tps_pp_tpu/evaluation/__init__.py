from .ocr_metric import eval_ocr_metric, count_matches, levenshtein

__all__ = ['eval_ocr_metric', 'count_matches', 'levenshtein']
