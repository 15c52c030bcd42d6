from .sdmgr import SDMGRHead, SDMGRLoss, GNNLayer, BlockFusion
