from .encode_decode import EncodeDecodeRecognizerModule

__all__ = ['EncodeDecodeRecognizerModule']
