from .loader import HardDiskLoader, LmdbLoader, LineStrParser, LineJsonParser
from .ocr_dataset import OCRDataset, UniformConcatDataset, DataLoader, build_dataset
from .pipelines.transforms import Compose

__all__ = ['HardDiskLoader', 'LmdbLoader', 'LineStrParser', 'LineJsonParser',
           'OCRDataset', 'UniformConcatDataset', 'DataLoader', 'build_dataset',
           'Compose']
from .kie_dataset import KIEDataset, NerDataset, OpensetKIEDataset
from .textdet_dataset import TextDetDataset
from .ocr_seg_dataset import OCRSegDataset
from .pipelines.ocr_seg_targets import OCRSegTargets
