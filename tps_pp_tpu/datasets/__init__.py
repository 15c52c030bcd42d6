from .loader import HardDiskLoader, LmdbLoader, LineStrParser, LineJsonParser
from .ocr_dataset import OCRDataset, UniformConcatDataset, DataLoader, build_dataset
from .pipelines.transforms import Compose

__all__ = ['HardDiskLoader', 'LmdbLoader', 'LineStrParser', 'LineJsonParser',
           'OCRDataset', 'UniformConcatDataset', 'DataLoader', 'build_dataset',
           'Compose']
from .kie_dataset import KIEDataset, NerDataset
from .textdet_dataset import TextDetDataset
