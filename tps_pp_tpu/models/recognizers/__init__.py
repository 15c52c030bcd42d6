from .encode_decode import EncodeDecodeRecognizerModule
from .abinet import ABINetRecognizerModule

__all__ = ['EncodeDecodeRecognizerModule', 'ABINetRecognizerModule']
