"""EXECUTED gradient-level parity against the reference torch modules.

Forward parity (test_reference_parity.py) defends inference; these defend
the TRAINING numerics: loss gradients w.r.t. logits for every loss family
(reference losses/ce_loss.py, ctc_loss.py, mix_loss.py) and full
train-step parameter gradients through NRTR decoder / encoder+decoder and
the flagship backbone+TPS_PP composition (reference recognizer/base.py:
131-164 train_step = forward_train -> loss -> backward), fp32.

Gradients are compared by converting torch ``param.grad`` tensors through
the SAME layout rules used for weights (utils/torch_convert.py) — every
rule is a pure layout permutation (transpose/reshape/gate reorder), which
commutes with differentiation.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tps_pp_tpu.utils.ref_shim import load_reference
from tps_pp_tpu.utils.torch_convert import (convert_state_dict,
                                            filter_rules_to_state,
                                            merge_flat)

pytestmark = pytest.mark.heavy

REF = load_reference()


def _seed_all(s=0):
    torch.manual_seed(s)
    return np.random.default_rng(s)


def _grad_state_dict(module: torch.nn.Module):
    """state_dict-shaped dict of parameter gradients (buffers copied
    verbatim so 'bn'-kind rules still resolve; they land in batch_stats,
    which the comparison skips)."""
    out = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    for name, p in module.named_parameters():
        out[name] = (p.grad.detach().numpy() if p.grad is not None
                     else np.zeros_like(p.detach().numpy()))
    return out


def _compare_flat(flat_ref, our_params, atol=2e-6, rtol=5e-4):
    """Compare converted torch grads (flat paths) against our grad tree."""
    n = 0
    for path, ref_g in flat_ref['params'].items():
        node = our_params
        for part in path.strip('/').split('/'):
            node = node[part]
        got = np.asarray(node)
        scale = max(np.abs(ref_g).max(), 1e-8)
        np.testing.assert_allclose(
            got, ref_g, atol=atol + 1e-4 * scale, rtol=rtol,
            err_msg=f'grad mismatch at {path}')
        n += 1
    assert n > 0


# ------------------------------------------------------------ loss grads --

def test_tf_loss_grad_parity():
    """TFLoss: reduction='none' vector mean()-ed by _parse_losses
    (reference recognizer/base.py:107-110) — grads w.r.t. logits."""
    from tps_pp_tpu.losses.ce import TFLoss

    rng = _seed_all(0)
    logits = rng.standard_normal((3, 8, 37)).astype(np.float32)
    tgt = np.array([[1, 5, 9, 2, 36, 36, 36, 36],
                    [1, 7, 3, 3, 4, 6, 2, 36],
                    [1, 2, 36, 36, 36, 36, 36, 36]], np.int64)

    lt = torch.tensor(logits, requires_grad=True)
    ref = REF.TFLoss(ignore_index=36)
    ref_loss = ref(lt, {'padded_targets': torch.tensor(tgt)})['loss_ce']
    ref_scalar = ref_loss.mean()
    ref_scalar.backward()

    ours = TFLoss(ignore_index=36)

    def f(lg):
        return ours(lg, {'padded_targets': jnp.asarray(tgt)})['loss_ce']

    val, grad = jax.value_and_grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(float(val), float(ref_scalar), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), lt.grad.numpy(),
                               atol=1e-7, rtol=1e-5)


def test_sar_loss_grad_parity():
    """SARLoss: shift + reduction='mean' over non-ignored positions."""
    from tps_pp_tpu.losses.ce import SARLoss

    rng = _seed_all(1)
    logits = rng.standard_normal((2, 8, 40)).astype(np.float32)
    tgt = np.array([[38, 1, 5, 9, 39, 0, 0, 0],
                    [38, 7, 3, 3, 4, 39, 0, 0]], np.int64)

    lt = torch.tensor(logits, requires_grad=True)
    ref = REF.SARLoss(ignore_index=0)
    ref_scalar = ref(lt, {'padded_targets': torch.tensor(tgt)})['loss_ce']
    ref_scalar.backward()

    ours = SARLoss(ignore_index=0)

    def f(lg):
        return ours(lg, {'padded_targets': jnp.asarray(tgt)})['loss_ce']

    val, grad = jax.value_and_grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(float(val), float(ref_scalar), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), lt.grad.numpy(),
                               atol=1e-7, rtol=1e-5)


def test_ctc_loss_grad_parity():
    """CTCLoss (optax forward-backward vs torch native), incl. the
    per-sequence /length 'mean' reduction."""
    from tps_pp_tpu.losses.ctc import CTCLoss

    rng = _seed_all(2)
    logits = rng.standard_normal((2, 12, 11)).astype(np.float32)
    labels = np.zeros((2, 6), np.int64)
    labels[0, :4] = [3, 1, 4, 1]
    labels[1, :2] = [5, 9]
    lengths = np.array([4, 2], np.int64)

    lt = torch.tensor(logits, requires_grad=True)
    ref = REF.CTCLoss(flatten=False)
    ref_scalar = ref(lt, {'targets': torch.tensor(labels),
                          'target_lengths':
                          torch.tensor(lengths)})['loss_ctc']
    ref_scalar.backward()

    ours = CTCLoss(flatten=False)

    def f(lg):
        return ours(lg, {'padded_targets': jnp.asarray(labels),
                         'target_lengths':
                         jnp.asarray(lengths)})['loss_ctc']

    val, grad = jax.value_and_grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(float(val), float(ref_scalar), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), lt.grad.numpy(),
                               atol=2e-6, rtol=1e-4)


def test_abi_loss_grad_parity():
    """ABILoss over enc/dec/fuser logits (reference mix_loss.py)."""
    from tps_pp_tpu.losses.abi import ABILoss

    rng = _seed_all(3)
    C, T, N = 37, 6, 2
    enc = rng.standard_normal((N, T, C)).astype(np.float32)
    dec = rng.standard_normal((N, T, C)).astype(np.float32)
    fus = rng.standard_normal((N, T, C)).astype(np.float32)
    tgt = np.array([[4, 7, 2, 0, 0, 0],
                    [9, 1, 3, 5, 0, 0]], np.int64)
    lengths = np.array([3, 4], np.int64)

    te, td, tf = (torch.tensor(x, requires_grad=True)
                  for x in (enc, dec, fus))
    ref = REF.ABILoss(num_classes=C)
    ref_losses = ref(
        {'out_enc': {'logits': te},
         'out_decs': [{'logits': td}],
         'out_fusers': [{'logits': tf}]},
        {'padded_targets': torch.tensor(tgt),
         'targets': [torch.tensor(t[:n]) for t, n in
                     zip(torch.tensor(tgt), lengths)]})
    ref_total = sum(v for v in ref_losses.values())
    ref_total.backward()

    ours = ABILoss(num_classes=C)

    def f(args):
        e, d, fz = args
        losses = ours({'out_enc': {'logits': e},
                       'out_decs': [{'logits': d}],
                       'out_fusers': [{'logits': fz}]},
                      {'padded_targets': jnp.asarray(tgt),
                       'target_lengths': jnp.asarray(lengths)})
        return sum(jax.tree.leaves(losses))

    val, grads = jax.value_and_grad(f)((jnp.asarray(enc), jnp.asarray(dec),
                                        jnp.asarray(fus)))
    np.testing.assert_allclose(float(val), float(ref_total), rtol=1e-5)
    for got, want in zip(grads, (te.grad, td.grad, tf.grad)):
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=1e-7, rtol=1e-5)


# ------------------------------------------------- module train-step grads --

def test_nrtr_decoder_train_step_grad_parity():
    """One teacher-forced train step through the NRTR decoder + TFLoss:
    every decoder parameter gradient and the encoder-feature gradient match
    torch autograd (reference nrtr_decoder.py forward_train + TFLoss)."""
    from tps_pp_tpu.losses.ce import TFLoss
    from tps_pp_tpu.models.decoders.nrtr import NRTRDecoder
    from tps_pp_tpu.utils.torch_convert import _tf_decoder_layer_rules

    _seed_all(4)
    n_layers, num_classes, max_seq_len = 2, 39, 12
    ref = REF.NRTRDecoder(n_layers=n_layers, d_embedding=512, n_head=8,
                          d_k=64, d_v=64, d_model=512, d_inner=256,
                          n_position=200, dropout=0.0,
                          num_classes=num_classes, max_seq_len=max_seq_len,
                          start_idx=1, padding_idx=num_classes - 1)
    ref.train()
    out_enc = torch.randn(2, 16, 512, requires_grad=True)
    tgt = torch.tensor([[1, 5, 9, 2, 0, 38, 38, 38, 38, 38, 38, 38],
                        [1, 7, 3, 3, 4, 6, 2, 0, 38, 38, 38, 38]],
                       dtype=torch.long)
    metas = [{'valid_ratio': 0.7}, {'valid_ratio': 1.0}]
    ref_logits = ref.forward_train(None, out_enc, {'padded_targets': tgt},
                                   metas)
    ref_loss = REF.TFLoss(ignore_index=38)(
        ref_logits, {'padded_targets': tgt})['loss_ce'].mean()
    ref_loss.backward()

    mod = NRTRDecoder(n_layers=n_layers, num_classes=num_classes,
                      max_seq_len=max_seq_len, start_idx=1,
                      padding_idx=num_classes - 1, dropout=0.0,
                      dtype=jnp.float32)
    rules = []
    for i in range(n_layers):
        rules += _tf_decoder_layer_rules(f'decoder.layer_stack.{i}',
                                         f'layer_stack_{i}')
    rules += [
        ('decoder.trg_word_emb', 'trg_word_emb', 'embed'),
        ('decoder.layer_norm', 'layer_norm', 'ln'),
        ('decoder.classifier', 'classifier', 'linear'),
    ]
    sd = {f'decoder.{k}': v.detach().numpy()
          for k, v in ref.state_dict().items()}
    oj = jnp.asarray(out_enc.detach().numpy())
    vr = jnp.asarray([0.7, 1.0], jnp.float32)
    tj = jnp.asarray(tgt.numpy())
    variables = mod.init(jax.random.PRNGKey(0), None, oj, targets=tj,
                         valid_ratio=vr)
    rules = filter_rules_to_state(rules, sd)
    variables = merge_flat(variables, convert_state_dict(sd, rules))
    loss_obj = TFLoss(ignore_index=38)

    def f(params, o):
        logits = mod.apply({'params': params}, None, o, targets=tj,
                           valid_ratio=vr, train=True)
        return loss_obj(logits, {'padded_targets': tj})['loss_ce']

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(
        variables['params'], oj)
    np.testing.assert_allclose(float(val), float(ref_loss), rtol=1e-5)

    sd_grads = {f'decoder.{k}': v
                for k, v in _grad_state_dict(ref).items()}
    flat_ref = convert_state_dict(sd_grads, rules)
    _compare_flat(flat_ref, grads[0])
    np.testing.assert_allclose(np.asarray(grads[1]),
                               out_enc.grad.numpy(), atol=1e-5, rtol=5e-4)


def test_flagship_composition_grad_parity():
    """Flagship feature extractor one-step gradients: input image ->
    backbone stem -> TPS_PP -> backbone tail, mean-square feature loss;
    every backbone + TPS_PP parameter gradient matches torch autograd
    (reference resnet_v2_large.py:163-196 with tpsnet, train mode).

    Runs in float64 on both sides so the comparison isolates SEMANTIC
    differences from fp32 noise amplified by 26 train-mode BN layers.
    Criteria: per-leaf cosine >= 0.999 and relative L2 error bounded —
    the warp makes bit-exactness unattainable (the grid gradient is the
    feature map's spatial derivative, discontinuous at bilinear cell
    edges), but a wrong formula anywhere (e.g. the round-3 DGAB
    LayerNorm-eps bug this test caught) collapses the cosine."""
    from tps_pp_tpu.models.backbones.resnet_abi import ResNetABI_v2_large
    from tps_pp_tpu.models.rectifiers.tps_pp import TPS_PP
    from tps_pp_tpu.utils.torch_convert import (resnet_abi_rules,
                                                tps_pp_rules)

    _seed_all(5)
    ref_bb = REF.ResNetABI_v2_large(strides=[1, 2, 2, 1, 2]).double()
    ref_tps = REF.TPS_PP().double()
    ref_bb.train()
    ref_tps.train()
    x = torch.randn(2, 3, 32, 128, dtype=torch.float64)
    ref_out = ref_bb(x, tpsnet=ref_tps)['output']
    ref_loss = (ref_out ** 2).mean()
    ref_loss.backward()

    jax.config.update('jax_enable_x64', True)
    try:
        _composition_grad_check_x64(ref_bb, ref_tps, x, ref_loss)
    finally:
        jax.config.update('jax_enable_x64', False)


def _composition_grad_check_x64(ref_bb, ref_tps, x, ref_loss):
    from tps_pp_tpu.models.backbones.resnet_abi import ResNetABI_v2_large
    from tps_pp_tpu.models.rectifiers.tps_pp import TPS_PP
    from tps_pp_tpu.utils.torch_convert import (resnet_abi_rules,
                                                tps_pp_rules)

    def to64(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, tree)

    bb = ResNetABI_v2_large(dtype=jnp.float64)
    tps = TPS_PP(dtype=jnp.float64, sample_mode='gather')
    xj = jnp.asarray(np.ascontiguousarray(
        x.detach().numpy().transpose(0, 2, 3, 1)))
    bb_vars = to64(bb.init(jax.random.PRNGKey(0), xj))
    sd = {}
    for k, v in ref_bb.state_dict().items():
        sd[f'backbone.{k}'] = v.detach().numpy()
    for k, v in ref_tps.state_dict().items():
        sd[f'tpsnet.{k}'] = v.detach().numpy()
    bb_rules = filter_rules_to_state(resnet_abi_rules('backbone', ''), sd)
    flat = convert_state_dict(sd, bb_rules)
    flat = {tree: {p.lstrip('/'): a for p, a in entries.items()}
            for tree, entries in flat.items()}
    bb_vars = merge_flat(bb_vars, flat)

    head0, skips0 = bb.apply(bb_vars, xj, method='stem_and_head')
    tps_vars = to64(tps.init(jax.random.PRNGKey(1), head0, skips0))
    tps_rules = filter_rules_to_state(tps_pp_rules(), sd)
    tps_flat = convert_state_dict(sd, tps_rules)
    wrapped = {'params': {'tpsnet': tps_vars['params']}}
    if 'batch_stats' in tps_vars:
        wrapped['batch_stats'] = {'tpsnet': tps_vars['batch_stats']}
    merged = merge_flat(wrapped, tps_flat)
    tps_vars = {'params': merged['params']['tpsnet']}
    if 'batch_stats' in merged.get('batch_stats', {}):
        tps_vars['batch_stats'] = merged['batch_stats']['tpsnet']

    bb_state = {k: v for k, v in bb_vars.items() if k != 'params'}
    tps_state = {k: v for k, v in tps_vars.items() if k != 'params'}

    def f(bb_p, tps_p):
        (head, skips), _ = bb.apply(
            {'params': bb_p, **bb_state}, xj, train=True,
            method='stem_and_head', mutable=['batch_stats'])
        rect, _ = tps.apply({'params': tps_p, **tps_state}, head, skips,
                            train=True, mutable=['batch_stats'])
        out, _ = bb.apply({'params': bb_p, **bb_state}, rect['output'],
                          train=True, method='tail',
                          mutable=['batch_stats'])
        return jnp.mean(jnp.square(out))

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(
        bb_vars['params'], tps_vars['params'])
    np.testing.assert_allclose(float(val), float(ref_loss), rtol=1e-5)

    sd_grads = {}
    for k, v in _grad_state_dict(ref_bb).items():
        sd_grads[f'backbone.{k}'] = v
    for k, v in _grad_state_dict(ref_tps).items():
        sd_grads[f'tpsnet.{k}'] = v

    def leaf_stats(tree, path, ref_g):
        node = tree
        for part in path.strip('/').split('/'):
            node = node[part]
        g = np.asarray(node).ravel()
        r = np.asarray(ref_g).ravel()
        nr = np.linalg.norm(r)
        if nr < 1e-12:   # degenerate directions (e.g. pre-BN conv bias)
            return None
        l2 = np.linalg.norm(g - r) / nr
        cos = float(g @ r) / (np.linalg.norm(g) * nr + 1e-30)
        return l2, cos

    l2s = []
    flat_bb = convert_state_dict(sd_grads, bb_rules)
    flat_bb = {tree: {p.lstrip('/'): a for p, a in entries.items()}
               for tree, entries in flat_bb.items()}
    flat_tps = convert_state_dict(sd_grads, tps_rules)
    flat_tps['params'] = {
        p.split('/', 1)[1] if p.startswith('tpsnet/') else p: a
        for p, a in flat_tps['params'].items()}
    for tree, flat in ((grads[0], flat_bb), (grads[1], flat_tps)):
        for path, ref_g in flat['params'].items():
            st = leaf_stats(tree, path, ref_g)
            if st is None:
                continue
            l2, cos = st
            # a wrong formula anywhere collapses the cosine; the warp
            # derivative's cell-edge discontinuities bound the L2
            assert cos >= 0.999, (path, cos, l2)
            assert l2 <= 0.25, (path, l2)
            l2s.append(l2)
    l2s.sort()
    assert l2s and l2s[len(l2s) // 2] <= 0.02, l2s[len(l2s) // 2]
