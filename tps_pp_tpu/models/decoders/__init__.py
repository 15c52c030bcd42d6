from .nrtr import NRTRDecoder, greedy_decode
from .crnn import CRNNDecoder

__all__ = ['NRTRDecoder', 'CRNNDecoder', 'greedy_decode']
