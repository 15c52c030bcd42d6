"""Config-style smoke tests on tiny models (reference analog:
tests/test_models/test_recog_config.py) + the KV-cache equivalence proof."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tps_pp_tpu.models  # noqa: F401  (registers modules)
import tps_pp_tpu.losses  # noqa: F401
from tps_pp_tpu.apis.recognizer import build_recognizer

pytestmark = pytest.mark.heavy


def tiny_nrtr_cfg(with_tps=False):
    cfg = dict(
        type='NRTR',
        label_convertor=dict(type='AttnConvertor', dict_type='DICT36',
                             with_unknown=True),
        backbone=dict(type='ResNetABI_v2_large', in_channels=3,
                      stem_channels=4, base_channels=4,
                      arch_settings=[1, 1, 1, 1, 1], strides=[1, 2, 2, 1, 2]),
        encoder=dict(type='NRTREncoder', n_layers=2, n_head=2, d_k=8, d_v=8,
                     d_model=64, d_inner=64, dropout=0.1),
        decoder=dict(type='NRTRDecoder', n_layers=2, d_embedding=64, n_head=2,
                     d_model=64, d_inner=64, d_k=8, d_v=8),
        loss=dict(type='TFLoss'),
        max_seq_len=8,
    )
    if with_tps:
        # MSFA bottleneck is (H/8, W/4): feature (16,32) -> fiducials (2,8)
        # (a single fiducial row makes the TPS system singular, like the
        # reference's delta_C would be)
        cfg['tpsnet'] = dict(type='TPS_PP', num_img_channel=16,
                             img_size=(16, 32), rectified_img_size=(16, 32),
                             point_size=(2, 8))
    return cfg


def _make_batch(rec, n=2, h=16, w=64):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((n, h, w, 3)), jnp.float32)
    td = rec.label_convertor.str2tensor(['ab', '7'])
    batch = {
        'img': img,
        'valid_ratio': jnp.asarray([1.0, 0.5], jnp.float32),
        'padded_targets': jnp.asarray(td['padded_targets']),
    }
    if 'target_lengths' in td:
        batch['target_lengths'] = jnp.asarray(td['target_lengths'])
    return batch


_CACHE = {}


def _tiny_nrtr():
    if 'nrtr' not in _CACHE:
        rec = build_recognizer(tiny_nrtr_cfg())
        variables = rec.init_variables(jax.random.PRNGKey(0), (2, 16, 64, 3))
        _CACHE['nrtr'] = (rec, variables)
    return _CACHE['nrtr']


def test_nrtr_train_and_test():
    rec, variables = _tiny_nrtr()
    batch = _make_batch(rec)
    loss, (ld, _) = rec.compute_loss(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = rec.predict(variables, batch['img'], batch['valid_ratio'])
    # decoder never predicts <PAD>: C-1 outputs (reference
    # nrtr_decoder.py:78-79)
    assert out.shape == (2, 8, rec.label_convertor.num_classes() - 1)
    res = rec.simple_test(variables, batch['img'], batch['valid_ratio'])
    assert len(res) == 2 and all('text' in r for r in res)


def test_nrtr_tps_pp_geometry():
    """The consistent-stride TPS++ geometry (SURVEY §2.3) runs end to end."""
    cfg = tiny_nrtr_cfg(with_tps=True)
    # stage-2 feature at (16, 32) for a (32, 64) input:
    # stem 4ch @32x64, layer1 s1 @32x64, layer2 s2 8ch @16x32
    rec = build_recognizer(cfg)
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, 32, 64, 3))
    batch = _make_batch(rec, h=32, w=64)
    loss, _ = rec.compute_loss(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    res = rec.simple_test(variables, batch['img'], batch['valid_ratio'])
    assert len(res) == 2


def test_kv_cache_decode_matches_full_recompute():
    """The KV-cached scan must compute the same per-step distributions as
    the reference's full-prefix recompute (nrtr_decoder.py:153-177).

    Decoder-only and compared under the greedy token prefix the cached path
    produced, so near-uniform random-weight ties can't flip the comparison.
    """
    from tps_pp_tpu.models.decoders.nrtr import NRTRDecoder, greedy_decode
    num_classes, pad, start, T = 12, 11, 10, 6
    dec = NRTRDecoder(n_layers=2, d_embedding=32, n_head=2, d_k=8, d_v=8,
                      d_model=32, d_inner=32, num_classes=num_classes,
                      max_seq_len=T, start_idx=start, padding_idx=pad)
    rng = np.random.default_rng(0)
    out_enc = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
    tgt = jnp.full((2, T), pad, jnp.int32)
    variables = dec.init(jax.random.PRNGKey(0), None, out_enc, tgt)
    vr = jnp.asarray([1.0, 0.6], jnp.float32)

    fast = np.asarray(greedy_decode(
        lambda m, *a: dec.apply(variables, *a, method=m), None, out_enc, vr,
        max_seq_len=T, start_idx=start))

    # full-prefix recompute with the SAME tokens as the cached run
    seq = np.full((2, T + 1), pad, np.int32)
    seq[:, 0] = start
    seq[:, 1:] = fast.argmax(-1)
    logits = dec.apply(variables, None, out_enc, jnp.asarray(seq),
                       valid_ratio=vr, train=False)
    slow = np.asarray(jax.nn.softmax(
        jnp.asarray(logits).astype(jnp.float32), axis=-1))[:, :T]
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(fast.argmax(-1), slow.argmax(-1))


def test_early_exit_decode_matches_full():
    """while_loop early-exit greedy must reproduce the scan decode on every
    step up to (and including) each row's first EOS."""
    rec, variables = _tiny_nrtr()
    batch = _make_batch(rec)
    img, vr = batch['img'], batch['valid_ratio']
    lc = rec.label_convertor

    from tps_pp_tpu.models.decoders.base import greedy_decode
    feat, out_enc = rec.module.apply(variables, img, vr,
                                     method='encode_full')

    def apply(m, *a):
        return rec.module.apply(variables, *a, method=m)

    full = np.asarray(greedy_decode(apply, feat, out_enc, vr,
                                    max_seq_len=rec.max_seq_len,
                                    start_idx=lc.start_idx))
    fast = np.asarray(greedy_decode(apply, feat, out_enc, vr,
                                    max_seq_len=rec.max_seq_len,
                                    start_idx=lc.start_idx,
                                    end_idx=lc.end_idx))
    # decoded strings identical
    fi, _ = lc.tensor2idx(full)
    gi, _ = lc.tensor2idx(fast)
    assert lc.idx2str(fi) == lc.idx2str(gi)
    # executed steps agree exactly wherever the fast buffer is non-zero
    executed = np.abs(fast).sum(-1) > 0
    np.testing.assert_allclose(fast[executed], full[executed], rtol=1e-5,
                               atol=1e-6)


def test_crnn_shapes():
    cfg = dict(
        type='CRNNNet',
        label_convertor=dict(type='CTCConvertor', dict_type='DICT36',
                             with_unknown=False, lower=True),
        backbone=dict(type='VeryDeepVgg', leaky_relu=False, input_channels=1),
        decoder=dict(type='CRNNDecoder', in_channels=512, rnn_flag=True),
        loss=dict(type='CTCLoss'),
    )
    rec = build_recognizer(cfg)
    variables = rec.init_variables(jax.random.PRNGKey(0), (1, 32, 100, 1))
    img = jnp.zeros((1, 32, 100, 1), jnp.float32)
    out = rec.predict(variables, img)
    assert out.shape == (1, 26, 37)  # W/4+1 columns, 36 chars + blank


def test_backbone_output_shapes():
    from tps_pp_tpu.registry import MODELS
    bb = MODELS.build(dict(type='ResNet31OCR'))
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)))
    out = bb.apply(v, jnp.zeros((1, 32, 128, 3)))
    assert out.shape == (1, 4, 32, 512)  # H/8, W/4 via (2,1) stage-4 pool

    bb = MODELS.build(dict(type='ResNetABI'))
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)))
    out = bb.apply(v, jnp.zeros((1, 32, 128, 3)))
    assert out.shape == (1, 8, 32, 512)  # H/4 (strides 2,1,2,1,1)

    bb = MODELS.build(dict(type='ResNetABI_v2_large'))
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128, 3)))
    out = bb.apply(v, jnp.zeros((1, 32, 128, 3)))
    assert out.shape == (1, 4, 16, 512)  # strides 1,2,2,1,2
