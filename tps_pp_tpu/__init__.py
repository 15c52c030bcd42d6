"""tps_pp_tpu: TPU-native scene-text-recognition framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
simplify23/TPS_PP (TPS++, IJCAI 2023 — reference mounted at
/root/reference): text recognizers (CRNN, NRTR, ABINet, SAR, SATRN,
RobustScanner) with the TPS++ feature-space rectifier, classic TPS-STN /
MORAN / SPIN preprocessors, LMDB/txt data pipelines, the 6-benchmark academic
evaluation protocol, and SPMD training/eval over jax.sharding meshes.
"""
__version__ = '0.4.0'

from . import registry
from .config import ConfigDict, load_config
