from .dbnet import ResNetDet, FPNC, DBHead, DBLoss, DBNetModule
from .pan import (Bottleneck, FPEM_FFM, FPNF, PANHead, PANLoss, PANetModule,
                  PSELoss, ResNetDet50)
from .targets import DBNetTargets, PANetTargets, PSENetTargets
from .postprocess import (DBPostprocessor, PANPostprocessor,
                          PSEPostprocessor, eval_hmean_iou, points2boundary)

__all__ = [
    'ResNetDet', 'FPNC', 'DBHead', 'DBLoss', 'DBNetModule',
    'Bottleneck', 'FPEM_FFM', 'FPNF', 'PANHead', 'PANLoss', 'PANetModule',
    'PSELoss', 'ResNetDet50',
    'DBNetTargets', 'PANetTargets', 'PSENetTargets',
    'DBPostprocessor', 'PANPostprocessor', 'PSEPostprocessor',
    'eval_hmean_iou', 'points2boundary',
]
