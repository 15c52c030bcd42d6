from .base import greedy_decode
from .nrtr import NRTRDecoder
from .crnn import CRNNDecoder
from .sar import ParallelSARDecoder
from .robust_scanner import (SequenceAttentionDecoder,
                             PositionAttentionDecoder, RobustScannerDecoder)
from .abi import ABIVisionDecoder, ABILanguageDecoder

__all__ = ['NRTRDecoder', 'CRNNDecoder', 'ParallelSARDecoder',
           'SequenceAttentionDecoder', 'PositionAttentionDecoder',
           'RobustScannerDecoder', 'ABIVisionDecoder', 'ABILanguageDecoder',
           'greedy_decode']
from .tf_common import TFCommonDecoder, TFCommonDecoderLayer  # noqa: F401,E501
