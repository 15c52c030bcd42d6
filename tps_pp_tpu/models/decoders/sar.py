"""SAR parallel decoder with 2D attention
(reference ``decoders/sar_decoder.py:14-255``).

Training: decoder LSTM consumes [holistic, emb(targets)] and the per-step
hidden state queries a tanh 2D attention over the raw feature map
(sar_decoder.py:107-162); output positions 1..T are the logits.

Inference: the reference re-runs the whole LSTM over the growing prefix each
step (sar_decoder.py:241-253). Since an LSTM is causal, that equals carrying
the LSTM state — decode_init feeds the holistic feature once, decode_step
feeds one embedding and carries (h1,c1,h2,c2). Same per-step math, O(T) not
O(T^2).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import DECODERS
from ..layers import TorchGRUCellScan, TorchLSTMCellScan


@DECODERS.register_module()
class ParallelSARDecoder(nn.Module):
    IS_AUTOREGRESSIVE = True

    num_classes: int = 37
    enc_bi_rnn: bool = False
    dec_bi_rnn: bool = False
    dec_do_rnn: float = 0.0
    dec_gru: bool = False
    d_model: int = 512
    d_enc: int = 512
    d_k: int = 64
    pred_dropout: float = 0.0
    max_seq_len: int = 40
    mask: bool = True
    start_idx: int = 0
    padding_idx: int = 92
    pred_concat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # the decoder LSTM here is the carried-state scan form; the
        # reference's bidirectional/inter-layer-dropout options are not
        # implemented — fail loudly instead of silently building a
        # different architecture than the config asked for
        assert not self.dec_bi_rnn, 'dec_bi_rnn is not implemented'
        assert not self.dec_do_rnn, 'dec_do_rnn is not implemented'
        enc_size = self.d_enc * (int(self.enc_bi_rnn) + 1)
        self.conv1x1_1 = nn.Dense(self.d_k, dtype=self.dtype)
        self.conv3x3_1 = nn.Conv(self.d_k, (3, 3), padding=((1, 1), (1, 1)),
                                 dtype=self.dtype)
        self.conv1x1_2 = nn.Dense(1, dtype=self.dtype)
        # dec_gru swaps both decoder layers for torch-gate GRUs
        # (reference sar_decoder.py:88-96 nn.GRU / :319-323 GRUCell pair)
        cell = TorchGRUCellScan if self.dec_gru else TorchLSTMCellScan
        self.rnn0 = cell(enc_size, dtype=self.dtype)
        self.rnn1 = cell(enc_size, dtype=self.dtype)
        self.embedding = nn.Embed(self.num_classes, enc_size,
                                  dtype=self.dtype)
        self.pred_drop = nn.Dropout(self.pred_dropout)
        # flax infers the input width, so pred_concat just changes the
        # concatenated input (reference fc_in_channel, sar_decoder.py:100-105)
        self.prediction = nn.Dense(self.num_classes - 1, dtype=self.dtype)
        self._enc_size = enc_size

    # --- shared attention ------------------------------------------------
    def _attend(self, y, feat, valid_ratio, key=None):
        """y: (N, T, H) decoder hiddens; feat: (N, h, w, C).
        Returns glimpse (N, T, C). ``key`` lets decode steps reuse the
        step-invariant conv3x3_1(feat) computed once in decode_init
        (hoisting out of the scan is otherwise up to XLA's LICM)."""
        query = self.conv1x1_1(y)                       # (N, T, d_k)
        if key is None:
            key = self.conv3x3_1(feat)                  # (N, h, w, d_k)
        attn = jnp.tanh(key[:, None] + query[:, :, None, None, :])
        attn = self.conv1x1_2(attn)[..., 0]             # (N, T, h, w)
        if self.mask and valid_ratio is not None:
            w = feat.shape[2]
            valid_width = jnp.minimum(
                w, jnp.ceil(w * valid_ratio)).astype(jnp.int32)
            col = jnp.arange(w)[None, :]
            mask = (col < valid_width[:, None])[:, None, None, :]
            attn = jnp.where(mask, attn, -1e9)
        N, T = attn.shape[:2]
        weights = jax.nn.softmax(attn.reshape(N, T, -1), axis=-1)
        weights = weights.reshape(attn.shape)
        return jnp.einsum('nthw,nhwc->ntc', weights, feat,
                          preferred_element_type=jnp.float32
                          ).astype(self.dtype)

    def _predict(self, y, glimpse, holistic, train):
        if self.pred_concat:
            T = y.shape[1]
            hf = jnp.broadcast_to(holistic[:, None, :],
                                  (y.shape[0], T, holistic.shape[-1]))
            out = self.prediction(jnp.concatenate([y, glimpse, hf], axis=2))
        else:
            out = self.prediction(glimpse)
        return self.pred_drop(out, deterministic=not train)

    def __call__(self, feat, out_enc, targets=None, valid_ratio=None,
                 train: bool = False):
        """out_enc: (N, C) holistic. Returns (N, T, C-1)."""
        emb = self.embedding(targets)                     # (N, T, E)
        in_dec = jnp.concatenate([out_enc[:, None, :], emb], axis=1)
        y = self.rnn1(self.rnn0(in_dec))                  # (N, T+1, H)
        glimpse = self._attend(y, feat, valid_ratio)
        out = self._predict(y, glimpse, out_enc, train)
        return out[:, 1:, :]

    # --- generic AR protocol ---------------------------------------------
    def _lstm_cell(self, rnn, x, h, c):
        """One step of a Torch{LSTM,GRU}CellScan using its own params. The
        GRU form returns (h, h) — the reference's ``hx = cx = GRUCell(...)``
        (sar_decoder.py:353-358) — so the carried c slot stays inert."""
        from .robust_scanner import _gru_cell_step, _lstm_cell_step
        step = _gru_cell_step if self.dec_gru else _lstm_cell_step
        return step(rnn, x, h, c)

    def decode_init(self, feat, out_enc, valid_ratio=None):
        N = out_enc.shape[0]
        H = self._enc_size
        z = jnp.zeros((N, H), self.dtype)
        # feed the holistic feature first (sar_decoder.py:236-239)
        h0, c0 = self._lstm_cell(self.rnn0, out_enc, z, z)
        h1, c1 = self._lstm_cell(self.rnn1, h0, z, z)
        carry = (h0, c0, h1, c1)
        static = (feat, out_enc, valid_ratio, self.conv3x3_1(feat))
        return carry, static

    def decode_step(self, token, t, carry, static):
        h0, c0, h1, c1 = carry
        feat, out_enc, valid_ratio, key = static
        x = self.embedding(token)
        h0, c0 = self._lstm_cell(self.rnn0, x, h0, c0)
        h1, c1 = self._lstm_cell(self.rnn1, h0, h1, c1)
        y = h1[:, None, :]
        glimpse = self._attend(y, feat, valid_ratio, key=key)
        out = self._predict(y, glimpse, out_enc, train=False)[:, 0]
        probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        return probs, (h0, c0, h1, c1)


@DECODERS.register_module()
class SequentialSARDecoder(ParallelSARDecoder):
    """Reference ``SequentialSARDecoder`` (sar_decoder.py:269-478): the same
    2D-attention decode with per-step LSTMCells — plus the reference's
    cell-state quirk, which parameter-name mapping alone cannot reproduce:
    ``_2d_attention`` returns ``(y, hx1, hx1, hx2, hx2)`` (sar_decoder.py:
    391), so the LSTM CELL state is overwritten with the HIDDEN state after
    every step (only the holistic init step at :432-435 keeps a true cell
    state). Checkpoints of this class were trained under that recurrence,
    so we replicate it exactly in both the teacher-forced and AR paths;
    greedy parity vs the executed reference is tested in
    tests/test_convert_cli.py. Parameter containers map losslessly
    (utils/torch_convert.sequential_sar_rules): LSTMCell pairs <-> one
    layer of nn.LSTM share weight names/shapes, and the reference's 1x1
    Conv2d attention projections are Denses over channels."""

    def __call__(self, feat, out_enc, targets=None, valid_ratio=None,
                 train: bool = False):
        if self.is_initializing():
            # create the rnn0/rnn1 scan params (same shapes the parallel
            # LSTM uses); _lstm_cell reads them directly afterwards
            self.rnn0(out_enc[:, None, :])
            self.rnn1(out_enc[:, None, :])
        emb = self.embedding(targets)                     # (N, T, E)
        key = self.conv3x3_1(feat)
        N = out_enc.shape[0]
        z = jnp.zeros((N, self._enc_size), self.dtype)
        # holistic init step (i == -1): true cell states kept
        h0, c0 = self._lstm_cell(self.rnn0, out_enc, z, z)
        h1, c1 = self._lstm_cell(self.rnn1, h0, z, z)
        outs = []
        for t in range(targets.shape[1]):
            h0, c0 = self._lstm_cell(self.rnn0, emb[:, t], h0, c0)
            h1, c1 = self._lstm_cell(self.rnn1, h0, h1, c1)
            y = h1[:, None, :]
            glimpse = self._attend(y, feat, valid_ratio, key=key)
            outs.append(self._predict(y, glimpse, out_enc, train)[:, 0])
            # the c := h quirk — applied to the carried state, as in the
            # reference's `return y, hx1, hx1, hx2, hx2`
            c0, c1 = h0, h1
        return jnp.stack(outs, axis=1)

    def decode_step(self, token, t, carry, static):
        probs, (h0, _, h1, _) = ParallelSARDecoder.decode_step(
            self, token, t, carry, static)
        return probs, (h0, h0, h1, h1)   # c := h quirk


@DECODERS.register_module()
class ParallelSARDecoderWithBS(ParallelSARDecoder):
    """SAR beam-search decoder (reference ``sar_decoder_with_bs.py``).
    Decoding runs through decoders.base.beam_decode — a vectorized jitted
    beam search with the reference's additive-softmax-score ranking,
    without its batch-size-1 restriction."""
    beam_width: int = 5
