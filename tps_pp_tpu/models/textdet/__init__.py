from .dbnet import ResNetDet, FPNC, DBHead, DBLoss, DBNetModule
from .pan import (Bottleneck, FPEM_FFM, FPNF, PANHead, PANLoss, PANetModule,
                  PSELoss, ResNetDet50)
from .fce_textsnake import (FCEHead, FCELoss, FCENetModule, FPNDet, FPN_UNet,
                            TextSnakeHead, TextSnakeLoss, TextSnakeModule)
from .drrg import (DRRGDetector, DRRGHead, DRRGLoss, DRRGPostprocessor,
                   GCN, LocalGraphs, ProposalLocalGraphs,
                   roi_align_rotated_np)
from .maskrcnn import (BoxHead, MaskHead, MaskRCNNDetector, MaskRCNNModule,
                       RPNHead, generate_anchors, nms_xyxy, roi_align_jax)
from .targets import (DBNetTargets, DRRGTargets, FCENetTargets, PANetTargets,
                      PSENetTargets, TextSnakeTargets)
from .postprocess import (DBPostprocessor, FCEPostprocessor,
                          PANPostprocessor, PSEPostprocessor,
                          TextSnakePostprocessor, eval_hmean_iou,
                          points2boundary, poly_nms)

__all__ = [
    'ResNetDet', 'FPNC', 'DBHead', 'DBLoss', 'DBNetModule',
    'Bottleneck', 'FPEM_FFM', 'FPNF', 'PANHead', 'PANLoss', 'PANetModule',
    'PSELoss', 'ResNetDet50',
    'FCEHead', 'FCELoss', 'FCENetModule', 'FPNDet', 'FPN_UNet',
    'TextSnakeHead', 'TextSnakeLoss', 'TextSnakeModule',
    'DRRGDetector', 'DRRGHead', 'DRRGLoss', 'DRRGPostprocessor', 'GCN',
    'LocalGraphs', 'ProposalLocalGraphs', 'roi_align_rotated_np',
    'BoxHead', 'MaskHead', 'MaskRCNNDetector', 'MaskRCNNModule', 'RPNHead',
    'generate_anchors', 'nms_xyxy', 'roi_align_jax',
    'DBNetTargets', 'DRRGTargets', 'FCENetTargets', 'PANetTargets',
    'PSENetTargets', 'TextSnakeTargets',
    'DBPostprocessor', 'FCEPostprocessor', 'PANPostprocessor',
    'PSEPostprocessor', 'TextSnakePostprocessor', 'eval_hmean_iou',
    'points2boundary', 'poly_nms',
]
