"""ABINet recognizer module: vision model + iterative BCN LM + fuser.

Re-implements reference ``recognizer/abinet.py:18-206``: the encoder is an
ABIVisionModel producing text logits; ``iter_size`` rounds of
language-decoder refinement feed fuser logits back as the next iteration's
tokens (abinet.py:127-140 train, :175-184 test). The iteration count is
static, so the loop unrolls under jit. Accepts a ``tpsnet`` rectifier like
the generic recognizer (abinet.py:41-44).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class ABINetRecognizerModule(nn.Module):
    backbone: nn.Module
    encoder: nn.Module            # ABIVisionModel
    decoder: Optional[nn.Module]  # ABILanguageDecoder
    fuser: Optional[nn.Module]
    preprocessor: Optional[nn.Module] = None
    tpsnet: Optional[nn.Module] = None
    iter_size: int = 1

    # the preprocessor + mid-backbone TPS++ protocol is shared with
    # EncodeDecodeRecognizerModule — one implementation, no drift
    from .encode_decode import EncodeDecodeRecognizerModule as _EDR
    extract_feat = _EDR.extract_feat
    del _EDR

    def __call__(self, img, targets=None, valid_ratio=None,
                 train: bool = False):
        """Returns dict(out_enc, out_decs, out_fusers) for ABILoss
        (reference abinet.py:127-145)."""
        feat = self.extract_feat(img, train=train)
        out_enc = self.encoder(feat, valid_ratio=valid_ratio, train=train)
        text_logits = out_enc['logits']
        out_decs, out_fusers = [], []
        for _ in range(self.iter_size):
            out_dec = None
            if self.decoder is not None:
                out_dec = self.decoder(feat, text_logits, targets=targets,
                                       valid_ratio=valid_ratio, train=train)
                out_decs.append(out_dec)
            if self.fuser is not None and out_dec is not None:
                # argument order matches the reference call
                # fuser(out_enc['feature'], out_dec['feature'])
                # (abinet.py:138) — the vision feature lands in the
                # l_feature slot, faithfully preserved
                out_fuser = self.fuser(out_enc['feature'],
                                       out_dec['feature'])
                text_logits = out_fuser['logits']
                out_fusers.append(out_fuser)
        return {'out_enc': out_enc, 'out_decs': out_decs,
                'out_fusers': out_fusers}

    def forward_test_nar(self, img, valid_ratio=None, stem=None):
        # `stem` (a precomputed stem for the v2_large geometry) never
        # applies to ABINet's ResNetABI backbone — accepted for the
        # shared TextRecognizer predict signature, always None here
        del stem
        outputs = self(img, valid_ratio=valid_ratio, train=False)
        if outputs['out_fusers']:
            return outputs['out_fusers'][-1]['logits']
        if outputs['out_decs']:
            return outputs['out_decs'][-1]['logits']
        return outputs['out_enc']['logits']
