"""Encode-decode recognizer: the generic STR model assembly.

TPU-native counterpart of reference
``recognizer/encode_decode_recognizer.py:15-251`` and ``recognizer/base.py``:
label_convertor + optional preprocessor + backbone + optional tpsnet +
optional encoder + decoder + loss. Instead of threading a tpsnet Module
through ``backbone(img, tpsnet, test)`` (reference resnet_v2_large.py:163-196)
the rectifier is an explicit mid-backbone stage:
``x, skips = backbone.stem_and_head(img); x = tpsnet(x, skips)['output'];
x = backbone.tail(x)`` — a functional split that jits cleanly.

The linen module carries only device math. Host-side glue (str<->idx, metric,
result dicts) lives in :class:`TextRecognizer` (apis/recognizer.py).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...registry import RECOGNIZERS


class EncodeDecodeRecognizerModule(nn.Module):
    backbone: nn.Module
    decoder: nn.Module
    encoder: Optional[nn.Module] = None
    preprocessor: Optional[nn.Module] = None
    tpsnet: Optional[nn.Module] = None

    def extract_feat(self, img, train: bool = False, stem=None):
        """Backbone features with optional image-space preprocessor and
        feature-space TPS++ (reference extract_feat,
        encode_decode_recognizer.py:107-122). ``stem``: precomputed
        (x, skips) replacing backbone.stem_and_head — the serving path
        passes the fused (C, P)-layout stem from ops/pallas_stem.py."""
        if self.preprocessor is not None:
            img = self.preprocessor(img, train=train)
        if self.tpsnet is not None:
            x, skips = (stem if stem is not None else
                        self.backbone.stem_and_head(img, train=train))
            outs = self.tpsnet(x, skips, train=train)
            x = self.backbone.tail(outs['output'], train=train)
            return x
        return self.backbone(img, train=train)

    def encode_full(self, img, valid_ratio=None, train: bool = False,
                    stem=None):
        """(feat, out_enc) — both are needed by decoders like SAR whose 2D
        attention reads the raw feature map alongside the holistic encoding
        (reference sar_decoder.py:164-200)."""
        feat = self.extract_feat(img, train=train, stem=stem)
        out_enc = None
        if self.encoder is not None:
            out_enc = self.encoder(feat, valid_ratio=valid_ratio, train=train)
        return feat, out_enc

    def encode(self, img, valid_ratio=None, train: bool = False):
        feat, out_enc = self.encode_full(img, valid_ratio, train)
        return out_enc if out_enc is not None else feat

    def __call__(self, img, targets=None, valid_ratio=None,
                 train: bool = False):
        """Teacher-forced train-mode logits (reference forward_train,
        encode_decode_recognizer.py:131-182, minus host-side label prep)."""
        feat, out_enc = self.encode_full(img, valid_ratio, train)
        return self.decoder(feat, out_enc, targets=targets,
                            valid_ratio=valid_ratio, train=train)

    def forward_test_nar(self, img, valid_ratio=None, stem=None):
        """Single-pass test path for non-autoregressive decoders (CRNN)."""
        feat, out_enc = self.encode_full(img, valid_ratio, train=False,
                                         stem=stem)
        return self.decoder(feat, out_enc, valid_ratio=valid_ratio,
                            train=False)

    # --- proxies so greedy_decode can drive the decoder through one apply ---
    def decode_init(self, feat, out_enc, valid_ratio=None):
        return self.decoder.decode_init(feat, out_enc, valid_ratio)

    def decode_step(self, token, t, carry, static, *args):
        return self.decoder.decode_step(token, t, carry, static, *args)

    def decode_full_fused(self, img, valid_ratio=None,
                          enc_dtype: str = 'int8',
                          fused_encoder: bool = False,
                          end_idx: int = None, stem=None):
        """encode + whole-decode-in-one-pallas-kernel serving path
        (NRTRDecoder.fused_full_decode). ``fused_encoder`` additionally
        routes the encoder through its whole-encoder pallas kernel;
        ``end_idx`` enables the kernel's all-rows-EOS early exit."""
        feat = self.extract_feat(img, train=False, stem=stem)
        if fused_encoder:
            out_enc = self.encoder(feat, valid_ratio=valid_ratio,
                                   train=False, fused=True)
        else:
            out_enc = (self.encoder(feat, valid_ratio=valid_ratio,
                                    train=False)
                       if self.encoder is not None else None)
        return self.decoder.fused_full_decode(feat, out_enc, valid_ratio,
                                              enc_dtype=enc_dtype,
                                              end_idx=end_idx)


# Recognizer ``type=`` names are resolved by apis.recognizer.build_recognizer
# (the reference's recognizer classes NRTR/CRNNNet/SARNet/SATRN/RobustScanner
# are trivial tags over EncodeDecodeRecognizer — see reference
# recognizer/{nrtr,crnn,sar,satrn,robust_scanner}.py).
ENCODE_DECODE_TYPE_NAMES = ('EncodeDecodeRecognizer', 'NRTR', 'CRNNNet',
                            'SARNet', 'SATRN', 'RobustScanner')
