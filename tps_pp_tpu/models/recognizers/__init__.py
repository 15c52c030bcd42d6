from .encode_decode import EncodeDecodeRecognizerModule
from .abinet import ABINetRecognizerModule
from .seg import SegRecognizerModule, FPNOCR, SegHead, SegLoss

__all__ = ['EncodeDecodeRecognizerModule', 'ABINetRecognizerModule',
           'SegRecognizerModule', 'FPNOCR', 'SegHead', 'SegLoss']
