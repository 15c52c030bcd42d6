"""SDMGR — Spatial Dual-Modality Graph Reasoning for KIE (§2.8).

TPU-native re-implementation of reference ``kie/heads/sdmgr_head.py`` (head
:11-88, GNNLayer :88-130, Block fusion) and ``kie/losses/sdmgr_loss.py``.

Design differences for static shapes: one padded graph per sample —
(max_nodes, max_chars) text indices with 0-padding, (max_nodes, max_nodes,
edge_input) relation features, and a node mask; the reference's
variable-size torch.cat-over-samples becomes masked dense ops (the GNN's
all-pairs attention is an (N, N) softmax with self/pad positions masked).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import HEADS, LOSSES
from ..layers import TorchLSTMCellScan


class BlockFusion(nn.Module):
    """Bilinear block fusion of visual+text node features (the reference
    uses the MUTAN-style 'Block' from block.bootstrap; this is the standard
    chunked low-rank bilinear variant with the same interface)."""
    out_dim: int = 256
    mm_dim: int = 1024
    chunks: int = 8
    rank: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1):
        h0 = nn.Dense(self.mm_dim, dtype=self.dtype, name='linear0')(x0)
        h1 = nn.Dense(self.mm_dim, dtype=self.dtype, name='linear1')(x1)
        chunk = self.mm_dim // self.chunks
        zs = []
        for c in range(self.chunks):
            a = h0[..., c * chunk:(c + 1) * chunk]
            b = h1[..., c * chunk:(c + 1) * chunk]
            za = nn.Dense(chunk * self.rank, dtype=self.dtype,
                          name=f'm0_{c}')(a)
            zb = nn.Dense(chunk * self.rank, dtype=self.dtype,
                          name=f'm1_{c}')(b)
            z = (za * zb).reshape(*za.shape[:-1], self.rank, chunk).sum(-2)
            zs.append(z)
        z = jnp.concatenate(zs, axis=-1)
        # signed sqrt + guarded L2 norm: the plain sqrt(relu(z)) form has an
        # unbounded/NaN gradient at z == 0 (exact zeros occur on padded rows)
        z = jnp.sign(z) * jnp.sqrt(jnp.abs(z) + 1e-12)
        sq = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
        z = z * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
        return nn.Dense(self.out_dim, dtype=self.dtype, name='linear_out')(z)


class GNNLayer(nn.Module):
    node_dim: int = 256
    edge_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, nodes, edges, node_mask):
        """nodes (N, D); edges (N, N, E); node_mask (N,)."""
        N = nodes.shape[0]
        pair = jnp.concatenate([
            jnp.broadcast_to(nodes[:, None, :], (N, N, nodes.shape[-1])),
            jnp.broadcast_to(nodes[None, :, :], (N, N, nodes.shape[-1])),
            edges,
        ], axis=-1)
        cat = nn.relu(nn.Dense(self.node_dim, dtype=self.dtype,
                               name='in_fc')(pair))          # (N, N, D)
        coefs = nn.Dense(1, dtype=self.dtype, name='coef_fc')(cat)
        # softmax over the neighbor axis, masking self + padded nodes
        # (reference gnn: -eye*1e9 + coefs, softmax dim=1). For a
        # single-valid-node graph every neighbor is masked and the softmax
        # would flatten to uniform weights over PADDING pairs — keep the
        # self pair alive in that case (the reference's finite -1e9 bias
        # leaves weight on self when nothing else qualifies).
        valid_neighbors = ((1 - jnp.eye(N)) *
                           node_mask[None, :]).sum(1, keepdims=True)  # (N,1)
        self_ok = (valid_neighbors < 0.5) * jnp.eye(N)
        mask = ((1 - jnp.eye(N)) * node_mask[None, :] +
                self_ok)[:, :, None]
        coefs = jnp.where(mask > 0, coefs, -1e9)
        attn = jax.nn.softmax(coefs, axis=1)
        residual = (attn * cat).sum(axis=1)                  # (N, D)
        nodes = nodes + nn.relu(
            nn.Dense(self.node_dim, dtype=self.dtype, name='out_fc')(
                residual))
        return nodes, cat


@HEADS.register_module()
class SDMGRHead(nn.Module):
    num_chars: int = 92
    visual_dim: int = 64
    fusion_dim: int = 1024
    node_input: int = 32
    node_embed: int = 256
    edge_input: int = 5
    edge_embed: int = 256
    num_gnn: int = 2
    num_classes: int = 26
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, relations, texts, visual=None):
        """relations: (N, N, edge_input); texts: (N, L) char indices,
        0-padded; visual: optional (N, visual_dim). Returns
        (node_cls (N, num_classes), edge_cls (N*N, 2))."""
        N, L = texts.shape
        char_mask = (texts > 0)
        node_mask = char_mask.any(-1).astype(jnp.float32)
        emb = nn.Embed(self.num_chars, self.node_input, dtype=self.dtype,
                       name='node_embed')(jnp.clip(texts, 0, None))
        rnn_out = TorchLSTMCellScan(self.node_embed, dtype=self.dtype,
                                    name='rnn')(emb)          # (N, L, D)
        # hidden state at the last valid char (sdmgr_head.py:66-72)
        lengths = jnp.maximum(char_mask.sum(-1), 1)
        nodes = jnp.take_along_axis(
            rnn_out, (lengths - 1)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        if visual is not None:
            nodes = BlockFusion(self.node_embed, self.fusion_dim,
                                dtype=self.dtype, name='fusion')(visual,
                                                                 nodes)
        edges = nn.Dense(self.edge_embed, dtype=self.dtype,
                         name='edge_embed')(relations.astype(self.dtype))
        # guarded L2 normalize (reference F.normalize): padded relation rows
        # embed to exactly 0 at init, and d(x/||x||)/dx is NaN at 0
        sq = jnp.sum(jnp.square(edges), axis=-1, keepdims=True)
        edges = edges * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
        cat = None
        for i in range(self.num_gnn):
            nodes, cat = GNNLayer(self.node_embed, self.edge_embed,
                                  dtype=self.dtype, name=f'gnn{i}')(
                nodes, edges, node_mask)
        node_cls = nn.Dense(self.num_classes, dtype=self.dtype,
                            name='node_cls')(nodes)
        edge_cls = nn.Dense(2, dtype=self.dtype, name='edge_cls')(
            cat.reshape(N * N, -1))
        return node_cls, edge_cls


@LOSSES.register_module()
class SDMGRLoss:
    """Masked node/edge CE (reference kie/losses/sdmgr_loss.py:10-60)."""

    def __init__(self, node_weight=1.0, edge_weight=1.0, ignore=-100,
                 **kwargs):
        self.node_weight = node_weight
        self.edge_weight = edge_weight
        self.ignore = ignore

    @staticmethod
    def _masked_ce(logits, targets, ignore):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        mask = (targets != ignore).astype(jnp.float32)
        return jnp.sum(nll * mask) / jnp.maximum(mask.sum(), 1.0)

    def __call__(self, node_preds, edge_preds, node_gts, edge_gts):
        return {
            'loss_node': self.node_weight * self._masked_ce(
                node_preds, node_gts, self.ignore),
            'loss_edge': self.edge_weight * self._masked_ce(
                edge_preds, edge_gts.reshape(-1), -1),
        }
