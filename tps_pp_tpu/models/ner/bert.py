"""NER: BERT-softmax token classifier (§2.8).

TPU-native counterpart of reference ``ner/encoders/bert_encoder.py`` (backed
by the 485-LoC in-tree BERT at ``ner/utils/bert.py``), ``ner/decoders/
fc_decoder.py`` and ``ner/classifiers/ner_classifier.py``. Standard
post-norm BERT: token+position+type embeddings -> LN/dropout -> n layers of
(MHA + residual + LN, GELU FFN + residual + LN) -> per-token softmax head.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import ENCODERS, HEADS, LOSSES
from ..transformer import MultiHeadAttention


@ENCODERS.register_module()
class BertEncoder(nn.Module):
    vocab_size: int = 21128
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 train: bool = False):
        N, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = (nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                      name='word_embeddings')(input_ids) +
             nn.Embed(self.max_position_embeddings, self.hidden_size,
                      dtype=self.dtype, name='position_embeddings')(
                 jnp.broadcast_to(jnp.arange(T)[None], (N, T))) +
             nn.Embed(self.type_vocab_size, self.hidden_size,
                      dtype=self.dtype, name='token_type_embeddings')(
                 token_type_ids))
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         name='embeddings_ln')(x)
        x = nn.Dropout(self.hidden_dropout_prob)(x, deterministic=not train)

        d_k = self.hidden_size // self.num_attention_heads
        mask = attention_mask.astype(jnp.float32)
        for i in range(self.num_hidden_layers):
            attn = MultiHeadAttention(
                self.num_attention_heads, self.hidden_size, d_k, d_k,
                self.attention_probs_dropout_prob,
                # BERT: hidden_dropout on the projected output (the
                # reference applies attn-prob dropout ONLY to the probs)
                proj_dropout=self.hidden_dropout_prob, qkv_bias=True,
                dtype=self.dtype, name=f'layer{i}_attn')
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                             name=f'layer{i}_ln1')(
                x + attn(x, x, x, mask=mask, deterministic=not train))
            h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                         name=f'layer{i}_ffn1')(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name=f'layer{i}_ffn2')(h)
            h = nn.Dropout(self.hidden_dropout_prob)(h,
                                                     deterministic=not train)
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                             name=f'layer{i}_ln2')(x + h)
        return x


@HEADS.register_module()
class FCDecoder(nn.Module):
    """Per-token classifier (reference ner/decoders/fc_decoder.py)."""
    num_labels: int = 26
    hidden_dropout_prob: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, train: bool = False):
        h = nn.Dropout(self.hidden_dropout_prob)(hidden,
                                                 deterministic=not train)
        return nn.Dense(self.num_labels, dtype=self.dtype, name='cls')(h)


class NerClassifierModule(nn.Module):
    """encoder + decoder (reference ner/classifiers/ner_classifier.py)."""
    encoder: nn.Module
    decoder: nn.Module

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 train: bool = False):
        hidden = self.encoder(input_ids, attention_mask, token_type_ids,
                              train=train)
        return self.decoder(hidden, train=train)


@LOSSES.register_module()
class MaskedCrossEntropyLoss:
    """Token-level CE over attention-masked positions
    (reference ner/losses/masked_cross_entropy_loss.py)."""

    def __init__(self, num_labels=None, **kwargs):
        self.num_labels = num_labels

    def __call__(self, logits, labels, attention_mask):
        C = logits.shape[-1]
        if self.num_labels is not None and C != self.num_labels:
            raise ValueError(
                f'loss num_labels={self.num_labels} != decoder logits '
                f'width {C} (check model.decoder.num_labels)')
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = jnp.clip(labels, 0, C - 1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = attention_mask.astype(jnp.float32)
        return {'loss_cls': jnp.sum(nll * mask) /
                jnp.maximum(mask.sum(), 1.0)}
