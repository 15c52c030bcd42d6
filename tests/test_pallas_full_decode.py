"""Whole-decode pallas kernel vs the XLA KV-cached greedy path."""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from tps_pp_tpu.models.decoders.nrtr import NRTRDecoder


def test_full_decode_kernel_matches_xla_greedy(monkeypatch):
    import tps_pp_tpu.ops.pallas_full_decode as pfd
    orig = pfd.full_greedy_decode

    def interp(*args, **kwargs):
        kwargs['interpret'] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pfd, 'full_greedy_decode', interp)

    rng = np.random.default_rng(0)
    mod = NRTRDecoder(n_layers=2, num_classes=39, max_seq_len=10,
                      start_idx=1, padding_idx=38, dtype=jnp.float32)
    out_enc = jnp.asarray(rng.standard_normal((4, 16, 512)), jnp.float32)
    vr = jnp.asarray([0.6, 1.0, 0.8, 1.0], jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), None, out_enc,
                 targets=jnp.full((4, 10), 38, jnp.int32), valid_ratio=vr)

    # reference: XLA decode_init/decode_step greedy loop
    carry, static = mod.apply(v, None, out_enc, vr, method='decode_init')
    tok = jnp.full((4,), 1, jnp.int32)
    ref_probs = []
    for t in range(10):
        p, carry = mod.apply(v, tok, t, carry, static, method='decode_step')
        ref_probs.append(np.asarray(p))
        tok = jnp.argmax(p, -1).astype(jnp.int32)
    ref_probs = np.stack(ref_probs, axis=1)

    got = np.asarray(mod.apply(v, None, out_enc, vr,
                               method='fused_full_decode'))
    assert got.shape == ref_probs.shape
    np.testing.assert_array_equal(got.argmax(-1), ref_probs.argmax(-1))
    np.testing.assert_allclose(got, ref_probs, atol=2e-2, rtol=5e-2)
    # tight agreement on the argmax probabilities themselves
    idx = ref_probs.argmax(-1)
    gp = np.take_along_axis(got, idx[..., None], -1)
    rp = np.take_along_axis(ref_probs, idx[..., None], -1)
    np.testing.assert_allclose(gp, rp, atol=5e-3)

    # odd and singleton batches route through the 8-sublane batch padding
    # (a prime batch would otherwise drive the batch block to bt=1)
    for n in (3, 1):
        gotn = np.asarray(mod.apply(v, None, out_enc[:n], vr[:n],
                                    method='fused_full_decode'))
        assert gotn.shape == (n,) + ref_probs.shape[1:]
        np.testing.assert_array_equal(gotn.argmax(-1),
                                      ref_probs[:n].argmax(-1))
        np.testing.assert_allclose(gotn, ref_probs[:n], atol=2e-2,
                                   rtol=5e-2)

    # ---- bf16 enc-KV (the DEFAULT fused40_bf16 serving path): exercises
    # the manual-DMA branch (memory_space=ANY + make_async_copy), which is
    # argmax-identical to the XLA loop by construction
    got_bf16 = np.asarray(mod.apply(v, None, out_enc, vr,
                                    method='fused_full_decode',
                                    enc_dtype='bfloat16'))
    np.testing.assert_array_equal(got_bf16.argmax(-1), ref_probs.argmax(-1))
    np.testing.assert_allclose(got_bf16, ref_probs, atol=2e-2, rtol=5e-2)

    # ---- in-kernel early exit (while_loop path) ----
    end_idx = 37
    # random weights rarely emit class 37: the exit never triggers and the
    # while_loop run must reproduce the fori_loop run exactly
    got_ee = np.asarray(mod.apply(v, None, out_enc, vr,
                                  method='fused_full_decode',
                                  end_idx=end_idx))
    if not (got_ee.argmax(-1) == end_idx).any(axis=1).all():
        np.testing.assert_array_equal(got_ee, got)
    # force EOS everywhere at step 0 via classifier-bias surgery: the loop
    # must stop after one step, later steps reading back as zeros
    import flax
    v_eos = flax.core.unfreeze(jax.tree.map(lambda x: x, v))
    b = np.asarray(v_eos['params']['classifier']['bias']).copy()
    b[end_idx] += 100.0
    v_eos['params']['classifier']['bias'] = jnp.asarray(b)
    got_eos = np.asarray(mod.apply(v_eos, None, out_enc, vr,
                                   method='fused_full_decode',
                                   end_idx=end_idx))
    full_eos = np.asarray(mod.apply(v_eos, None, out_enc, vr,
                                    method='fused_full_decode'))
    assert (got_eos.argmax(-1)[:, 0] == end_idx).all()
    np.testing.assert_allclose(got_eos[:, 0], full_eos[:, 0],
                               atol=1e-6, rtol=1e-6)
    assert np.all(got_eos[:, 1:] == 0.0)
    # early exit combined with the bf16 manual-DMA branch
    got_eos16 = np.asarray(mod.apply(v_eos, None, out_enc, vr,
                                     method='fused_full_decode',
                                     enc_dtype='bfloat16',
                                     end_idx=end_idx))
    assert (got_eos16.argmax(-1)[:, 0] == end_idx).all()
    assert np.all(got_eos16[:, 1:] == 0.0)
