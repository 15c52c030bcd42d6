"""Checkpoint-conversion layout transforms vs live torch layers — the
mitigation for SURVEY §7.3 hard-part #1 (conv OIHW->HWIO, linear transpose,
BN stats, torch LSTM gate order)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tps_pp_tpu.models.layers import BidirectionalLSTM, ConvModule
from tps_pp_tpu.utils.torch_convert import (convert_state_dict, merge_flat,
                                            t_conv, t_linear)


def test_conv_layout():
    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = np.random.default_rng(0).standard_normal((2, 5, 7, 3)).astype(
        np.float32)
    ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).detach().numpy()

    import flax.linen as fnn
    conv = fnn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {'params': {
        'kernel': jnp.asarray(t_conv(tconv.weight.detach().numpy())),
        'bias': jnp.asarray(tconv.bias.detach().numpy())}}
    out = np.asarray(conv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_linear_layout():
    tl = torch.nn.Linear(6, 4)
    x = np.random.default_rng(1).standard_normal((3, 6)).astype(np.float32)
    ref = tl(torch.from_numpy(x)).detach().numpy()
    import flax.linen as fnn
    dense = fnn.Dense(4)
    variables = {'params': {
        'kernel': jnp.asarray(t_linear(tl.weight.detach().numpy())),
        'bias': jnp.asarray(tl.bias.detach().numpy())}}
    out = np.asarray(dense.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_bilstm_matches_torch():
    """BidirectionalLSTM (CRNN layer, reference lstm_layer.py:5-21) with
    converted torch weights reproduces torch outputs."""
    torch.manual_seed(0)
    rnn = torch.nn.LSTM(6, 5, bidirectional=True)
    emb = torch.nn.Linear(10, 4)
    x = np.random.default_rng(2).standard_normal((7, 2, 6)).astype(
        np.float32)  # (T, N, C) torch convention
    rec, _ = rnn(torch.from_numpy(x))
    ref = emb(rec).detach().numpy()          # (T, N, 4)

    m = BidirectionalLSTM(hidden_size=5, out_size=4)
    xb = jnp.asarray(np.transpose(x, (1, 0, 2)))  # (N, T, C)
    variables = m.init(jax.random.PRNGKey(0), xb)
    sd = {f'm.rnn.{k}': v.detach().numpy()
          for k, v in rnn.state_dict().items()}
    sd.update({f'm.embedding.{k}': v.detach().numpy()
               for k, v in emb.state_dict().items()})
    flat = convert_state_dict(sd, [
        ('m.rnn', 'fwd', 'lstm'),
        ('m.rnn', 'bwd', 'lstm_reverse'),
        ('m.embedding', 'embedding', 'linear'),
    ])
    variables = merge_flat(variables, flat)
    out = np.asarray(m.apply(variables, xb))   # (N, T, 4)
    np.testing.assert_allclose(out, np.transpose(ref, (1, 0, 2)),
                               rtol=2e-4, atol=2e-5)


def test_bn_stats_convert():
    bn = torch.nn.BatchNorm2d(4)
    bn.weight.data.normal_(); bn.bias.data.normal_()
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    x = np.random.default_rng(3).standard_normal((2, 3, 5, 4)).astype(
        np.float32)
    ref = bn(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).detach().numpy()

    import flax.linen as fnn
    fbn = fnn.BatchNorm(use_running_average=True, epsilon=1e-5)
    variables = {
        'params': {'scale': jnp.asarray(bn.weight.detach().numpy()),
                   'bias': jnp.asarray(bn.bias.detach().numpy())},
        'batch_stats': {'mean': jnp.asarray(bn.running_mean.numpy()),
                        'var': jnp.asarray(bn.running_var.numpy())},
    }
    out = np.asarray(fbn.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.heavy
def test_flagship_rule_table_structurally_complete():
    """Every rule in the NRTR+TPS++ name map must land on an existing flax
    param with the right shape (mitigation for SURVEY §7.3 hard-part #1;
    validated structurally since the released .pth cannot be fetched here)."""
    import tps_pp_tpu.models  # noqa: F401
    import tps_pp_tpu.losses  # noqa: F401
    from tps_pp_tpu.apis.flagship import nrtr_tps_pp_cfg
    from tps_pp_tpu.apis.recognizer import build_recognizer
    from tps_pp_tpu.utils.torch_convert import (convert_state_dict,
                                                merge_flat,
                                                nrtr_tps_pp_rules)

    cfg = nrtr_tps_pp_cfg(tiny=True)
    rec = build_recognizer(cfg)
    variables = rec.init_variables(jax.random.PRNGKey(0), (1, 32, 64, 3))

    def flat_paths(tree, prefix=''):
        out = {}
        for k, v in tree.items():
            p = f'{prefix}/{k}' if prefix else k
            if isinstance(v, dict):
                out.update(flat_paths(v, p))
            else:
                out[p] = np.asarray(v)
        return out

    params = flat_paths(variables['params'])
    stats = flat_paths(variables.get('batch_stats', {}))
    rules = nrtr_tps_pp_rules(
        n_enc=cfg['encoder']['n_layers'], n_dec=cfg['decoder']['n_layers'],
        arch=tuple(cfg['backbone']['arch_settings']))

    # fabricate a torch-layout state dict from the flax shapes
    sd = {}
    covered = set()
    for tp, fp, kind in rules:
        def p(name):
            assert name in params, f'rule targets missing param {name}'
            covered.add(name)
            return params[name]

        def s(name):
            assert name in stats, f'rule targets missing stat {name}'
            covered.add('BS:' + name)
            return stats[name]

        if kind in ('conv', 'conv_nobias'):
            if f'{fp}/kernel' not in params:
                continue  # optional (e.g. downsample-less blocks)
            sd[f'{tp}.weight'] = np.transpose(p(f'{fp}/kernel'),
                                              (3, 2, 0, 1))
            if kind == 'conv':
                sd[f'{tp}.bias'] = p(f'{fp}/bias')
        elif kind.startswith('conv1x1_as_dense'):
            sd[f'{tp}.weight'] = np.transpose(
                p(f'{fp}/kernel'), (1, 0))[:, :, None, None]
            if kind == 'conv1x1_as_dense':
                sd[f'{tp}.bias'] = p(f'{fp}/bias')
        elif kind in ('linear', 'linear_nobias'):
            sd[f'{tp}.weight'] = np.transpose(p(f'{fp}/kernel'), (1, 0))
            if kind == 'linear':
                sd[f'{tp}.bias'] = p(f'{fp}/bias')
        elif kind in ('ln', 'bn'):
            if f'{fp}/scale' not in params:
                continue  # optional (downsample-less blocks)
            sd[f'{tp}.weight'] = p(f'{fp}/scale')
            sd[f'{tp}.bias'] = p(f'{fp}/bias')
            if kind == 'bn':
                sd[f'{tp}.running_mean'] = s(f'{fp}/mean')
                sd[f'{tp}.running_var'] = s(f'{fp}/var')
        elif kind == 'embed':
            sd[f'{tp}.weight'] = p(f'{fp}/embedding')
        else:
            raise AssertionError(f'unhandled kind {kind}')

    from tps_pp_tpu.utils.torch_convert import filter_rules_to_state
    kept = filter_rules_to_state(rules, sd)
    flat = convert_state_dict(sd, kept)
    merged = merge_flat(variables, flat)  # raises on any shape mismatch

    # round-trip: merged values equal the originals
    merged_params = flat_paths(merged['params'])
    for name in covered:
        if name.startswith('BS:'):
            continue
        np.testing.assert_allclose(merged_params[name], params[name],
                                   rtol=1e-6)

    # coverage: at least the transformer + tps heads are all mapped
    uncovered = [n for n in params if n not in covered]
    for must in ('encoder/', 'decoder/', 'tpsnet/'):
        missing = [n for n in uncovered if n.startswith(must)]
        assert not missing, f'unmapped params under {must}: {missing[:5]}'
