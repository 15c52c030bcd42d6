from .dbnet import ResNetDet, FPNC, DBHead, DBLoss, DBNetModule
from .targets import DBNetTargets
from .postprocess import DBPostprocessor, eval_hmean_iou

__all__ = ['ResNetDet', 'FPNC', 'DBHead', 'DBLoss', 'DBNetModule',
           'DBNetTargets', 'DBPostprocessor', 'eval_hmean_iou']
