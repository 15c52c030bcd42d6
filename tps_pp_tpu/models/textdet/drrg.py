"""DRRG — Deep Relational Reasoning Graph text detector
(SURVEY §2.8; VERDICT r1 missing #2, the last of the hard detectors).

Split TPU-natively:
  * device (flax): the 6-map ``DRRGHead`` conv and the ``GCN`` relational
    classifier (reference ``modules/gcn.py:7-76``) applied to padded
    (graphs, nodes, feat) batches — static shapes, MXU matmuls.
  * host (numpy): everything inherently dynamic — text-component proposal,
    k-NN local-graph construction (reference ``modules/local_graph.py:10-297``
    and ``proposal_local_graph.py``), rotated-RoI feature pooling (a numpy
    re-implementation of mmcv's RoIAlignRotated via inverse affine bilinear
    sampling), and the boundary construction from clustered components
    (reference ``postprocess/drrg_postprocessor.py`` + postprocess/utils.py
    graph_propagation/connected_components/comps2boundaries).

The reference runs this graph machinery on numpy too (local_graph.py mixes
numpy + torch); only RoIAlignRotated was CUDA there.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import HEADS, LOSSES
from .fce_textsnake import _masked_mean, _smooth_l1


# ------------------------------------------------------------- host utils --

def euclidean_distance_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(reference modules/utils.py:28-52)"""
    d2 = ((a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] -
          2 * a @ b.T)
    return np.sqrt(np.maximum(d2, 0.0))


def normalize_adjacent_matrix(mat: np.ndarray) -> np.ndarray:
    """D^-1/2 (A+I) D^-1/2 (reference modules/utils.py:5-25)."""
    mat = mat + np.eye(mat.shape[0])
    d = np.clip(np.sum(mat, axis=0), 0, None)
    d_inv = np.power(d, -0.5).flatten()
    d_inv[np.isinf(d_inv)] = 0.0
    d_inv = np.diag(d_inv)
    return mat.dot(d_inv).transpose().dot(d_inv)


def feature_embedding(input_feats: np.ndarray, out_feat_len: int):
    """Sinusoidal geometric-feature embedding
    (reference modules/utils.py:55-107)."""
    num_nodes, feat_dim = input_feats.shape
    repeat = out_feat_len // feat_dim
    residue = out_feat_len % feat_dim
    if residue > 0:
        wave = np.array([np.power(1000, 2.0 * (j // 2) / repeat + 1)
                         for j in range(repeat + 1)]).reshape(-1, 1, 1)
        feats = np.repeat(input_feats[None], repeat, axis=0)
        residue_feats = np.hstack([
            input_feats[:, :residue],
            np.zeros((num_nodes, feat_dim - residue))])
        feats = np.concatenate([feats, residue_feats[None]], axis=0)
    else:
        wave = np.array([np.power(1000, 2.0 * (j // 2) / repeat)
                         for j in range(repeat)]).reshape(-1, 1, 1)
        feats = np.repeat(input_feats[None], repeat, axis=0)
    emb = feats / wave
    emb[:, 0::2] = np.sin(emb[:, 0::2])
    emb[:, 1::2] = np.cos(emb[:, 1::2])
    return np.transpose(emb, (1, 0, 2)).reshape(
        num_nodes, -1)[:, :out_feat_len].astype(np.float32)


def roi_align_rotated_np(feat: np.ndarray, rois: np.ndarray,
                         out_size: Tuple[int, int],
                         spatial_scale: float = 1.0) -> np.ndarray:
    """Numpy rotated-RoI pooling (first-party equivalent of
    mmcv.ops.RoIAlignRotated, reference modules/local_graph.py:4,44).

    feat: (H, W, C); rois: (N, 5) [cx, cy, w, h, angle(rad)];
    returns (N, out_h, out_w, C) bilinear samples on each rotated grid.
    """
    H, W, C = feat.shape
    out_w, out_h = out_size
    n = len(rois)
    if n == 0:
        return np.zeros((0, out_h, out_w, C), np.float32)
    ys = (np.arange(out_h) + 0.5) / out_h - 0.5   # [-0.5, 0.5)
    xs = (np.arange(out_w) + 0.5) / out_w - 0.5
    gy, gx = np.meshgrid(ys, xs, indexing='ij')   # (oh, ow)
    # vectorized over all RoIs: one (N, oh, ow) rotated sampling grid and
    # one fancy-indexed bilinear gather (the per-RoI python loop was the
    # input-bound stage at real DRRG scale — hundreds of components/batch)
    cx, cy, w, h = (rois[:, i, None, None] * spatial_scale
                    for i in range(4))
    ang = rois[:, 4, None, None]
    cosa, sina = np.cos(ang), np.sin(ang)
    px = cx + gx[None] * w * cosa - gy[None] * h * sina   # (N, oh, ow)
    py = cy + gx[None] * w * sina + gy[None] * h * cosa
    x0 = np.clip(np.floor(px), 0, W - 1).astype(np.int32)
    y0 = np.clip(np.floor(py), 0, H - 1).astype(np.int32)
    x1 = np.clip(x0 + 1, 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    wx = np.clip(px - x0, 0, 1)[..., None]
    wy = np.clip(py - y0, 0, 1)[..., None]
    out = ((feat[y0, x0] * (1 - wx) + feat[y0, x1] * wx) * (1 - wy) +
           (feat[y1, x0] * (1 - wx) + feat[y1, x1] * wx) * wy)
    return out.astype(np.float32)


# ----------------------------------------------------------- device: GCN --

class GraphConv(nn.Module):
    """cat(x, A@x) @ W + b -> relu (reference gcn.py:15-34)."""
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, adj):
        agg = jnp.einsum('bnm,bmd->bnd', adj, x)
        cat = jnp.concatenate([x, agg], axis=-1)
        w = self.param('weight', nn.initializers.xavier_uniform(),
                       (cat.shape[-1], self.out_dim), self.dtype)
        b = self.param('bias', nn.initializers.zeros, (self.out_dim,),
                       self.dtype)
        return nn.relu(jnp.einsum('bnd,df->bnf', cat, w) + b)


class GCN(nn.Module):
    """4 graph convs + edge classifier (reference gcn.py:37-76). The input
    batch-norm is the reference's affine-free BatchNorm1d — computed over
    the flattened node axis of the batch."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, adj, knn_inds):
        # x: (G, N, D); adj: (G, N, N); knn_inds: (G, K) indices into N
        G, N, D = x.shape
        flat = x.reshape(-1, D).astype(jnp.float32)
        mu = flat.mean(axis=0, keepdims=True)
        var = flat.var(axis=0, keepdims=True)
        x = ((flat - mu) / jnp.sqrt(var + 1e-5)).reshape(G, N, D).astype(
            self.dtype)
        x = GraphConv(512, self.dtype, name='conv1')(x, adj)
        x = GraphConv(256, self.dtype, name='conv2')(x, adj)
        x = GraphConv(128, self.dtype, name='conv3')(x, adj)
        x = GraphConv(64, self.dtype, name='conv4')(x, adj)
        edge_feat = jnp.take_along_axis(x, knn_inds[..., None], axis=1)
        edge_feat = edge_feat.reshape(-1, x.shape[-1])
        h = nn.Dense(32, dtype=self.dtype, name='cls_fc1')(edge_feat)
        alpha = self.param('prelu_alpha',
                           nn.initializers.constant(0.25), (32,), self.dtype)
        h = jnp.where(h > 0, h, alpha * h)
        return nn.Dense(2, dtype=self.dtype, name='cls_fc2')(h)


@HEADS.register_module()
class DRRGHead(nn.Module):
    """1x1 conv -> 6 maps [text(1), center(1), sin, cos, top_h, bot_h]
    (reference drrg_head.py:124-130; text/center are single-logit here,
    matching the loss's sigmoid use)."""
    in_channels: int = 32
    out_channels: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name='out_conv')(x)


# ------------------------------------------------------ host: local graphs --

class LocalGraphs:
    """k-hop local-graph construction (reference local_graph.py:10-297),
    with numpy RoI pooling for content features."""

    def __init__(self, k_at_hops=(8, 4), num_adjacent_linkages=3,
                 node_geo_feat_len=120, pooling_scale=1.0,
                 pooling_output_size=(4, 3), local_graph_thr=0.7):
        self.k_at_hops = k_at_hops
        self.num_adjacent_linkages = num_adjacent_linkages
        self.node_geo_feat_dim = node_geo_feat_len
        self.pooling_scale = pooling_scale
        self.pooling_output_size = pooling_output_size
        self.local_graph_thr = local_graph_thr

    def generate_local_graphs(self, sorted_dist_inds, labels):
        """(reference local_graph.py:47-114)"""
        knn_graph = sorted_dist_inds[:, 1:self.k_at_hops[0] + 1]
        pivot_local_graphs, pivot_knns = [], []
        for pivot_ind, knn in enumerate(knn_graph):
            neighbors = set(knn)
            for n_ind in knn:
                neighbors.update(
                    set(sorted_dist_inds[n_ind, 1:self.k_at_hops[1] + 1]))
            neighbors.discard(pivot_ind)
            local_graph = [pivot_ind] + list(neighbors)
            pivot_knn = [pivot_ind] + list(knn)
            add_flag = True
            if pivot_ind >= 1 and labels is not None:
                for g_ind, added_knn in enumerate(pivot_knns):
                    added_pivot = added_knn[0]
                    added_graph = pivot_local_graphs[g_ind]
                    union = len(set(local_graph[1:]) | set(added_graph[1:]))
                    inter = len(set(local_graph[1:]) & set(added_graph[1:]))
                    iou = inter / (union + 1e-8)
                    if (iou > self.local_graph_thr and pivot_ind in added_knn
                            and labels[added_pivot] == labels[pivot_ind]
                            and labels[pivot_ind] != 0):
                        add_flag = False
                        break
            if add_flag:
                pivot_local_graphs.append(local_graph)
                pivot_knns.append(pivot_knn)
        return pivot_local_graphs, pivot_knns

    def node_features(self, feat_map: np.ndarray, geo_attribs: np.ndarray):
        """content (rotated RoI) + embedded geometric features.
        geo_attribs: (n, 6) [x, y, h, w, cos, sin]."""
        cosv = np.clip(geo_attribs[:, 4], -1, 1)
        angle = np.arccos(cosv) * np.sign(geo_attribs[:, 5])
        rois = np.hstack([geo_attribs[:, 0:4], angle.reshape(-1, 1)])
        content = roi_align_rotated_np(feat_map, rois,
                                       self.pooling_output_size,
                                       self.pooling_scale)
        content = content.reshape(len(rois), -1)
        geo = feature_embedding(geo_attribs, self.node_geo_feat_dim)
        return np.hstack([content, geo]).astype(np.float32)

    def build(self, feat_map: np.ndarray, comp_attribs: np.ndarray,
              pad_nodes: int = None, pad_graphs: int = None):
        """comp_attribs: (n, 8) [x, y, h, w, cos, sin, label, _] or the
        reference layout (n, 1+6+1). Returns padded numpy GCN inputs +
        gt link labels. ``pad_nodes``/``pad_graphs`` pad to bucket sizes so
        the downstream GCN step compiles once per bucket (padded graphs get
        link label -1, ignored by DRRGLoss.gcn_loss)."""
        geo = comp_attribs[:, 0:6].astype(np.float32)
        labels = comp_attribs[:, 6].astype(np.int32)
        centers = geo[:, 0:2]
        dist = euclidean_distance_matrix(centers, centers)
        sorted_dist_inds = np.argsort(dist, axis=1)
        graphs, knns = self.generate_local_graphs(sorted_dist_inds, labels)
        node_feats = self.node_features(feat_map, geo)
        return self.pack(node_feats, sorted_dist_inds, graphs, knns, labels,
                         pad_nodes=pad_nodes, pad_graphs=pad_graphs)

    def pack(self, node_feats, sorted_dist_inds, graphs, knns, labels=None,
             pad_nodes: int = None, pad_graphs: int = None):
        """Pad graphs to a common node count; returns (feats (G,N,D),
        adj (G,N,N), knn_inds (G,K), link_labels (G*K,) or None)
        (reference local_graph.py:116-222)."""
        num_max = max(len(g) for g in graphs)
        if pad_nodes is not None:
            assert pad_nodes >= num_max, (pad_nodes, num_max)
            num_max = pad_nodes
        feats, adjs, knn_out, links = [], [], [], []
        for graph, knn in zip(graphs, knns):
            n = len(graph)
            node2ind = {j: i for i, j in enumerate(graph)}
            knn_inds = np.array([node2ind[i] for i in knn[1:]], np.int32)
            pivot_feat = node_feats[graph[0]]
            normalized = node_feats[graph] - pivot_feat
            adj = np.zeros((n, n), np.float32)
            for node in graph:
                for neighbor in sorted_dist_inds[
                        node, 1:self.num_adjacent_linkages + 1]:
                    if neighbor in node2ind:
                        adj[node2ind[node], node2ind[neighbor]] = 1
                        adj[node2ind[neighbor], node2ind[node]] = 1
            adj = normalize_adjacent_matrix(adj)
            pad_adj = np.zeros((num_max, num_max), np.float32)
            pad_adj[:n, :n] = adj
            pad_feat = np.zeros((num_max, node_feats.shape[1]), np.float32)
            pad_feat[:n] = normalized
            feats.append(pad_feat)
            adjs.append(pad_adj)
            knn_out.append(knn_inds)
            if labels is not None:
                graph_labels = labels[graph]
                knn_labels = graph_labels[knn_inds]
                links.append(((labels[graph[0]] == knn_labels) &
                              (labels[graph[0]] > 0)).astype(np.int32))
        K = len(knns[0]) - 1
        if pad_graphs is not None and pad_graphs > len(graphs):
            n_pad = pad_graphs - len(graphs)
            D = node_feats.shape[1]
            for _ in range(n_pad):
                feats.append(np.zeros((num_max, D), np.float32))
                adjs.append(np.zeros((num_max, num_max), np.float32))
                knn_out.append(np.zeros((K,), np.int32))
                if labels is not None:
                    links.append(np.full((K,), -1, np.int32))  # ignored
        out_links = np.concatenate(links) if labels is not None else None
        return (np.stack(feats), np.stack(adjs),
                np.stack(knn_out).astype(np.int32), out_links, graphs, knns)


class ProposalLocalGraphs(LocalGraphs):
    """Test-time component proposal from predicted maps + local graphs
    (reference proposal_local_graph.py)."""

    def __init__(self, k_at_hops=(8, 4), num_adjacent_linkages=3,
                 node_geo_feat_len=120, pooling_scale=1.0,
                 pooling_output_size=(4, 3), nms_thr=0.3, min_width=8.0,
                 max_width=24.0, comp_shrink_ratio=1.03, comp_w_h_ratio=0.4,
                 comp_score_thr=0.3, text_region_thr=0.2,
                 center_region_thr=0.2, center_region_area_thr=50):
        super().__init__(k_at_hops, num_adjacent_linkages, node_geo_feat_len,
                         pooling_scale, pooling_output_size, 1.0)
        self.nms_thr = nms_thr
        self.min_width = min_width
        self.max_width = max_width
        self.comp_shrink_ratio = comp_shrink_ratio
        self.comp_w_h_ratio = comp_w_h_ratio
        self.comp_score_thr = comp_score_thr
        self.text_region_thr = text_region_thr
        self.center_region_thr = center_region_thr
        self.center_region_area_thr = center_region_area_thr

    def propose_comps(self, pred_maps: np.ndarray):
        """pred_maps (H, W, 6) raw -> text components (n, 9)
        [8 corners, score] + geo attribs (n, 6)."""
        from .postprocess import poly_nms
        from .sidelines import skeletonize

        text_score = 1 / (1 + np.exp(-pred_maps[..., 0]))
        center_score = 1 / (1 + np.exp(-pred_maps[..., 1])) * text_score
        sin_p, cos_p = pred_maps[..., 2], pred_maps[..., 3]
        scale = np.sqrt(1.0 / (sin_p ** 2 + cos_p ** 2 + 1e-8))
        sin_p, cos_p = sin_p * scale, cos_p * scale
        top_h, bot_h = pred_maps[..., 4], pred_maps[..., 5]

        center_mask = ((center_score > self.center_region_thr) &
                       (text_score > self.text_region_thr)).astype(np.uint8)
        n_comp, labels_cc = cv2.connectedComponents(center_mask,
                                                    connectivity=8)
        comps = []
        for lab in range(1, n_comp):
            region = labels_cc == lab
            if region.sum() < self.center_region_area_thr:
                continue
            skel = skeletonize(region)
            ys, xs = np.nonzero(skel if skel.any() else region)
            for y, x in zip(ys, xs):
                th = max(float(top_h[y, x]), 1.0) * self.comp_shrink_ratio
                bh = max(float(bot_h[y, x]), 1.0) * self.comp_shrink_ratio
                s, c = float(sin_p[y, x]), float(cos_p[y, x])
                # same geometry as the gt sampler (targets.py
                # _sample_comp_attribs): sin/cos are the center-line
                # TANGENT; top at +th*(s, -c), bot at -bh*(s, -c),
                # corners offset along the tangent by +-r*(c, s)
                top_mid = np.array([x + th * s, y - th * c])
                bot_mid = np.array([x - bh * s, y + bh * c])
                width = np.clip((th + bh) * self.comp_w_h_ratio,
                                self.min_width, self.max_width)
                r = width / 2
                dx, dy = c * r, s * r
                tl = top_mid + [-dx, -dy]
                tr = top_mid + [dx, dy]
                br = bot_mid + [dx, dy]
                bl = bot_mid + [-dx, -dy]
                score = float(center_score[y, x])
                if score < self.comp_score_thr:
                    continue
                comps.append(np.hstack([tl, tr, br, bl, [score]]))
        if not comps:
            return None, None
        comps = poly_nms([c.tolist() for c in comps], self.nms_thr)
        comps = np.asarray(comps, np.float32)
        centers = comps[:, 0:8].reshape(-1, 4, 2).mean(axis=1)
        cx = np.clip(centers[:, 0].astype(np.int32), 0,
                     pred_maps.shape[1] - 1)
        cy = np.clip(centers[:, 1].astype(np.int32), 0,
                     pred_maps.shape[0] - 1)
        h = (top_h[cy, cx] + bot_h[cy, cx]) * self.comp_shrink_ratio
        w = np.clip(h * self.comp_w_h_ratio, self.min_width, self.max_width)
        geo = np.stack([centers[:, 0], centers[:, 1], np.maximum(h, 1.0), w,
                        cos_p[cy, cx], sin_p[cy, cx]], axis=1)
        return comps, geo.astype(np.float32)

    def build_test(self, pred_maps: np.ndarray, feat_map: np.ndarray):
        comps, geo = self.propose_comps(pred_maps)
        if comps is None or len(comps) < 2:
            return None
        dist = euclidean_distance_matrix(geo[:, 0:2], geo[:, 0:2])
        sorted_dist_inds = np.argsort(dist, axis=1)
        k = min(self.k_at_hops[0], len(comps) - 1)
        knn_graph = sorted_dist_inds[:, 1:k + 1]
        graphs, knns = [], []
        for pivot_ind, knn in enumerate(knn_graph):
            neighbors = set(knn)
            for n_ind in knn:
                neighbors.update(set(
                    sorted_dist_inds[n_ind,
                                     1:min(self.k_at_hops[1],
                                           len(comps) - 1) + 1]))
            neighbors.discard(pivot_ind)
            graphs.append([pivot_ind] + list(neighbors))
            knns.append([pivot_ind] + list(knn))
        node_feats = self.node_features(feat_map, geo)
        feats, adjs, knn_inds, _, graphs, knns = self.pack(
            node_feats, sorted_dist_inds, graphs, knns, None)
        return feats, adjs, knn_inds, graphs, knns, comps


# -------------------------------------------------------------------- loss --

@LOSSES.register_module()
class DRRGLoss:
    """Reference losses/drrg_loss.py:12-253: balanced-BCE text, pos/neg
    center BCE, log-height-weighted smooth-L1 heights, sin/cos, GCN CE."""

    def __init__(self, ohem_ratio=3.0, **kwargs):
        self.ohem_ratio = ohem_ratio

    def _balanced_bce(self, prob, gt, mask):
        gt = gt.astype(jnp.float32).reshape(-1)
        mask = mask.astype(jnp.float32).reshape(-1)
        prob = prob.astype(jnp.float32).reshape(-1)
        eps = 1e-6
        loss = -(gt * jnp.log(prob + eps) + (1 - gt) *
                 jnp.log(1 - prob + eps))
        pos = gt * mask
        neg = (1 - gt) * mask
        n_pos = jnp.sum(pos)
        n_neg = jnp.minimum(jnp.sum(neg),
                            jnp.maximum(n_pos * self.ohem_ratio,
                                        100.0)).astype(jnp.int32)
        neg_sorted = jnp.sort(jnp.where(neg > 0, loss, -jnp.inf))[::-1]
        keep = jnp.arange(neg_sorted.shape[0]) < n_neg
        neg_sum = jnp.sum(jnp.where(keep & jnp.isfinite(neg_sorted),
                                    neg_sorted, 0.0))
        return (jnp.sum(loss * pos) + neg_sum) / (
            n_pos + n_neg.astype(jnp.float32) + 1e-5)

    def gcn_loss(self, gcn_pred, gt_labels):
        """CE over link predictions; labels < 0 mark padded graphs (the
        bucketed jitted train step pads G to a bucket size) and are
        ignored — with no padding this is the reference's plain mean CE."""
        logp = jax.nn.log_softmax(gcn_pred.astype(jnp.float32), axis=-1)
        labels = gt_labels.reshape(-1).astype(jnp.int32)
        mask = (labels >= 0).astype(jnp.float32)
        nll = -jnp.take_along_axis(logp, jnp.clip(labels, 0)[:, None],
                                   axis=-1)[:, 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def __call__(self, preds, targets, gcn_pred=None, gt_links=None):
        """preds: (N, H, W, 6); targets: gt_text_mask,
        gt_center_region_mask, gt_mask, gt_top_height_map,
        gt_bot_height_map, gt_sin_map, gt_cos_map."""
        p = preds.astype(jnp.float32)
        pred_text = jax.nn.sigmoid(p[..., 0])
        pred_center = jax.nn.sigmoid(p[..., 1])
        pred_sin, pred_cos = p[..., 2], p[..., 3]
        pred_top, pred_bot = p[..., 4], p[..., 5]
        scale = jnp.sqrt(1.0 / (pred_sin ** 2 + pred_cos ** 2 + 1e-8))
        pred_sin, pred_cos = pred_sin * scale, pred_cos * scale

        gt_text = targets['gt_text_mask'].astype(jnp.float32)
        gt_center = targets['gt_center_region_mask'].astype(jnp.float32)
        gt_mask = targets['gt_mask'].astype(jnp.float32)
        gt_top = targets['gt_top_height_map'].astype(jnp.float32)
        gt_bot = targets['gt_bot_height_map'].astype(jnp.float32)
        gt_sin = targets['gt_sin_map'].astype(jnp.float32)
        gt_cos = targets['gt_cos_map'].astype(jnp.float32)

        loss_text = self._balanced_bce(pred_text, gt_text, gt_mask)
        text_mask = gt_text * gt_mask
        neg_text_mask = (1 - gt_text) * gt_mask
        eps = 1e-6
        bce_center = -(gt_center * jnp.log(pred_center + eps) +
                       (1 - gt_center) * jnp.log(1 - pred_center + eps))
        loss_center = (_masked_mean(bce_center, text_mask) +
                       0.5 * _masked_mean(bce_center, neg_text_mask))
        center_mask = gt_center * gt_mask
        ones = jnp.ones_like(pred_top)
        loss_top = _smooth_l1(pred_top / (gt_top + 1e-2), ones)
        loss_bot = _smooth_l1(pred_bot / (gt_bot + 1e-2), ones)
        gt_height = gt_top + gt_bot
        loss_height = _masked_mean(
            jnp.log(gt_height + 1) * (loss_top + loss_bot), center_mask)
        loss_sin = _masked_mean(_smooth_l1(pred_sin, gt_sin), center_mask)
        loss_cos = _masked_mean(_smooth_l1(pred_cos, gt_cos), center_mask)
        out = {'loss_text': loss_text, 'loss_center': loss_center,
               'loss_height': loss_height, 'loss_sin': loss_sin,
               'loss_cos': loss_cos}
        if gcn_pred is not None and gt_links is not None:
            out['loss_gcn'] = self.gcn_loss(gcn_pred, gt_links)
        return out


# ------------------------------------------------------------ postprocess --

class DRRGPostprocessor:
    """Cluster text components along high-score edges and build boundaries
    (reference drrg_postprocessor.py + postprocess/utils.py:184-268,433+;
    boundaries come from the rasterized union of each cluster's quads)."""

    def __init__(self, link_thr=0.8, edge_len_thr=50.0, **kwargs):
        self.link_thr = link_thr
        self.edge_len_thr = edge_len_thr

    def __call__(self, edges, scores, text_comps) -> List[np.ndarray]:
        if edges is None or len(edges) == 0:
            return []
        edges = np.sort(np.asarray(edges), axis=1)
        scores = np.asarray(scores, np.float32).copy()
        n = text_comps.shape[0]
        # kill over-long edges (graph_propagation, utils.py:206-216)
        score_map: Dict[Tuple[int, int], float] = {}
        for i, (a, b) in enumerate(edges):
            c1 = text_comps[a, :8].reshape(4, 2).mean(0)
            c2 = text_comps[b, :8].reshape(4, 2).mean(0)
            if np.linalg.norm(c1 - c2) > self.edge_len_thr:
                scores[i] = 0
            key = (int(a), int(b))
            score_map[key] = (0.5 * (score_map[key] + scores[i])
                              if key in score_map else float(scores[i]))
        # union-find over edges above threshold
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for (a, b), s in score_map.items():
            if s >= self.link_thr:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        clusters: Dict[int, List[int]] = {}
        for i in range(n):
            clusters.setdefault(find(i), []).append(i)
        boundaries = []
        for members in clusters.values():
            if len(members) < 2:  # remove_single (utils.py:296-323)
                continue
            quads = text_comps[members, :8].reshape(-1, 4, 2)
            score = float(text_comps[members, 8].mean())
            x_max = int(quads[..., 0].max()) + 3
            y_max = int(quads[..., 1].max()) + 3
            mask = np.zeros((y_max, x_max), np.uint8)
            for q in quads:
                cv2.fillPoly(mask, [np.clip(q, 0, None).astype(np.int32)], 1)
            cs, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                     cv2.CHAIN_APPROX_SIMPLE)
            if not cs:
                continue
            cont = max(cs, key=cv2.contourArea)
            if cont.size <= 8:
                continue
            boundaries.append(np.asarray(
                cont.flatten().tolist() + [score], np.float32))
        return boundaries


class DRRGDetector:
    """Orchestrates the device head/GCN with the host graph machinery.

    Train: ``forward_train(variables, feats, comp_attribs)`` -> (pred_maps,
    gcn_pred, gt_links). Test: ``detect(variables, feats)`` -> boundaries.
    ``feats`` is the neck output (N, H, W, C) as a numpy/jax array.
    """

    def __init__(self, head: DRRGHead, gcn: GCN = None,
                 graph_train: LocalGraphs = None,
                 graph_test: ProposalLocalGraphs = None,
                 postprocessor: DRRGPostprocessor = None):
        self.head = head
        self.gcn = gcn or GCN()
        self.graph_train = graph_train or LocalGraphs()
        self.graph_test = graph_test or ProposalLocalGraphs()
        self.postprocessor = postprocessor or DRRGPostprocessor()

    def init_variables(self, rng, feat_shape, node_feat_len):
        import jax.numpy as jnp
        feats = jnp.zeros(feat_shape, jnp.float32)
        head_vars = self.head.init(rng, feats)
        gcn_vars = self.gcn.init(
            rng, jnp.zeros((1, 4, node_feat_len), jnp.float32),
            jnp.zeros((1, 4, 4), jnp.float32),
            jnp.zeros((1, 2), jnp.int32))
        return {'head': head_vars, 'gcn': gcn_vars}

    def node_feat_len(self, in_channels):
        pw, ph = self.graph_train.pooling_output_size
        return pw * ph * (in_channels + self.head.out_channels) + \
            self.graph_train.node_geo_feat_dim

    def forward_train(self, variables, feats, comp_attribs):
        pred_maps = self.head.apply(variables['head'], feats)
        feat_cat = np.concatenate([np.asarray(feats),
                                   np.asarray(pred_maps)], axis=-1)
        all_feats, all_adjs, all_knn, all_links = [], [], [], []
        for b in range(feat_cat.shape[0]):
            f, a, k, links, _, _ = self.graph_train.build(
                feat_cat[b], np.asarray(comp_attribs[b]))
            all_feats.append(f)
            all_adjs.append(a)
            all_knn.append(k)
            all_links.append(links)
        num_max = max(f.shape[1] for f in all_feats)

        def pad(f, a):
            g, n, d = f.shape
            pf = np.zeros((g, num_max, d), np.float32)
            pf[:, :n] = f
            pa = np.zeros((g, num_max, num_max), np.float32)
            pa[:, :n, :n] = a
            return pf, pa

        padded = [pad(f, a) for f, a in zip(all_feats, all_adjs)]
        feats_b = np.concatenate([p[0] for p in padded])
        adjs_b = np.concatenate([p[1] for p in padded])
        knn_b = np.concatenate(all_knn)
        links_b = np.concatenate(all_links)
        gcn_pred = self.gcn.apply(variables['gcn'], jnp.asarray(feats_b),
                                  jnp.asarray(adjs_b), jnp.asarray(knn_b))
        return pred_maps, gcn_pred, jnp.asarray(links_b)

    def detect(self, variables, feats, pred_maps=None) -> List[np.ndarray]:
        if pred_maps is None:
            pred_maps = np.asarray(self.head.apply(variables['head'], feats))
        else:
            # precomputed by the caller's jitted batched forward — avoid
            # re-running the head eagerly per image
            pred_maps = np.asarray(pred_maps)
        boundaries = []
        for b in range(pred_maps.shape[0]):
            feat_cat = np.concatenate([np.asarray(feats)[b], pred_maps[b]],
                                      axis=-1)
            data = self.graph_test.build_test(pred_maps[b], feat_cat)
            if data is None:
                continue
            node_feats, adjs, knn_inds, graphs, knns, comps = data
            gcn_pred = np.asarray(self.gcn.apply(
                variables['gcn'], jnp.asarray(node_feats),
                jnp.asarray(adjs), jnp.asarray(knn_inds)))
            probs = np.exp(gcn_pred[:, 1]) / np.exp(gcn_pred).sum(-1)
            edges, scores = [], []
            k = knn_inds.shape[1]
            for g_ind, (graph, knn) in enumerate(zip(graphs, knns)):
                pivot = graph[0]
                for k_ind in range(k):
                    neighbor = graph[int(knn_inds[g_ind, k_ind])]
                    edges.append([pivot, neighbor])
                    scores.append(probs[g_ind * k + k_ind])
            boundaries.extend(self.postprocessor(
                np.asarray(edges), np.asarray(scores), comps))
        return boundaries
