"""ABINetRecognizer: host-side wrapper for the ABINet family.

Counterpart of the generic TextRecognizer for the iterative-LM recognizer
(reference ``recognizer/abinet.py``): builds vision model / language decoder
/ fuser / ABILoss from the reference config shape
(configs/_base_/recog_models/abinet.py) and exposes the same
compute_loss/predict/simple_test surface.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigDict
from ..registry import CONVERTORS, MODELS
from ..models.recognizers.abinet import ABINetRecognizerModule
from .recognizer import TextRecognizer, _DTYPES, _build_module


class ABINetRecognizer(TextRecognizer):

    def __init__(self, cfg: Dict[str, Any]):
        cfg = ConfigDict._wrap(dict(cfg))
        self.cfg = cfg
        self.max_seq_len = int(cfg.get('max_seq_len', 40))
        dtype = _DTYPES[cfg.get('dtype', 'float32')]
        self.dtype = dtype

        lc_cfg = dict(cfg['label_convertor'])
        lc_cfg['max_seq_len'] = self.max_seq_len
        self.label_convertor = CONVERTORS.build(lc_cfg)
        num_chars = self.label_convertor.num_classes()

        enc_cfg = dict(cfg.get('encoder') or {})
        # plumb num_chars/max_seq_len into the nested ABIVisionDecoder the
        # way the reference injects num_classes into its decoders
        if 'decoder' in enc_cfg:
            enc_cfg['decoder'] = dict(enc_cfg['decoder'])
            enc_cfg['decoder'].setdefault('num_chars', num_chars)
            enc_cfg['decoder'].setdefault('max_seq_len', self.max_seq_len)

        self.module = ABINetRecognizerModule(
            backbone=_build_module(cfg['backbone'], dtype),
            encoder=_build_module(enc_cfg, dtype,
                                  num_chars=num_chars,
                                  max_seq_len=self.max_seq_len),
            decoder=_build_module(cfg.get('decoder'), dtype,
                                  num_chars=num_chars,
                                  max_seq_len=self.max_seq_len,
                                  pad_idx=self.label_convertor.end_idx),
            fuser=_build_module(cfg.get('fuser'), dtype,
                                num_chars=num_chars,
                                max_seq_len=self.max_seq_len),
            preprocessor=_build_module(cfg.get('preprocessor'), dtype),
            tpsnet=_build_module(cfg.get('tpsnet'), dtype),
            iter_size=int(cfg.get('iter_size', 1)),
        )
        loss_cfg = dict(cfg['loss'])
        loss_cfg.setdefault('num_classes', num_chars)
        self.loss_obj = MODELS.build(loss_cfg)
        self.autoregressive = False
        self._predict_jit = None

    # compute_loss: inherited from TextRecognizer (identical semantics —
    # the module.apply output shape differs but the loss obj handles it)
