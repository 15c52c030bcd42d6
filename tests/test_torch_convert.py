"""Checkpoint-conversion layout transforms vs live torch layers — the
mitigation for SURVEY §7.3 hard-part #1 (conv OIHW->HWIO, linear transpose,
BN stats, torch LSTM gate order)."""
import jax
import jax.numpy as jnp
import numpy as np
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
