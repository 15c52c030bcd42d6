"""Mesh/sharding tests on the 8-virtual-CPU-device harness
(what the reference never had: SURVEY §4 'no distributed test')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tps_pp_tpu.models  # noqa: F401
import tps_pp_tpu.losses  # noqa: F401
from tps_pp_tpu.apis.recognizer import build_recognizer
from tps_pp_tpu.parallel import (TrainState, build_optimizer, create_mesh,
                                 make_lr_schedule, make_train_step,
                                 param_sharding, shard_state)

pytestmark = pytest.mark.heavy


def _tiny_cfg():
    return dict(
        type='NRTR',
        label_convertor=dict(type='AttnConvertor', dict_type='DICT36',
                             with_unknown=True),
        backbone=dict(type='ResNetABI_v2_large', in_channels=3,
                      stem_channels=4, base_channels=4,
                      arch_settings=[1, 1, 1, 1, 1], strides=[1, 2, 2, 1, 2]),
        encoder=dict(type='NRTREncoder', n_layers=1, n_head=2, d_k=8, d_v=8,
                     d_model=64, d_inner=64, dropout=0.0),
        decoder=dict(type='NRTRDecoder', n_layers=1, d_embedding=64, n_head=2,
                     d_model=64, d_inner=64, d_k=8, d_v=8),
        loss=dict(type='TFLoss'),
        max_seq_len=6,
    )


def test_mesh_shapes():
    assert len(jax.devices()) == 8, 'conftest must force 8 CPU devices'
    mesh = create_mesh(data=4, model=2)
    assert dict(mesh.shape) == {'data': 4, 'model': 2}
    mesh = create_mesh()
    assert dict(mesh.shape) == {'data': 8, 'model': 1}


def test_tp_param_rules():
    rec = build_recognizer(_tiny_cfg())
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, 16, 64, 3))
    mesh = create_mesh(data=4, model=2)
    shardings = param_sharding(variables['params'], mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {'/'.join(getattr(p, 'key', str(p)) for p in path): s.spec
             for path, s in flat}
    qkv = [s for name, s in specs.items()
           if 'linear_q/kernel' in name or 'w_1/kernel' in name]
    assert qkv, 'no attention kernels found'
    assert all(tuple(s) == (None, 'model') for s in qkv), qkv
    fc = [s for name, s in specs.items()
          if name.endswith('fc/kernel') or name.endswith('w_2/kernel')]
    assert all(tuple(s) == ('model', None) for s in fc), fc
    # residual-block convs get the Megatron conv pairing; stem conv
    # (backbone-root 'conv1') stays replicated
    c1 = [s for name, s in specs.items()
          if 'block' in name and name.endswith('conv1/kernel')]
    assert c1 and all(tuple(s) == (None, None, None, 'model') for s in c1)
    c2 = [s for name, s in specs.items()
          if 'block' in name and name.endswith('conv2/kernel')]
    assert c2 and all(tuple(s) == (None, None, 'model', None) for s in c2)
    stem = [s for name, s in specs.items()
            if name == 'backbone/conv1/kernel']
    assert all(tuple(s) == () for s in stem)
    # embedding feature axis + classifier contraction axis
    emb = [s for name, s in specs.items()
           if name.endswith('trg_word_emb/embedding')]
    assert emb and all(tuple(s) == (None, 'model') for s in emb)
    cls = [s for name, s in specs.items()
           if name.endswith('classifier/kernel')]
    assert cls and all(tuple(s) == ('model', None) for s in cls)


def test_tp_conv_parity_vs_replicated():
    """Channel-sharding a det conv trunk over the 'model' axis must not
    change the numbers: forward ResNetDet replicated vs TP-sharded on a
    2x2 mesh and compare every pyramid level."""
    from tps_pp_tpu.models.textdet.dbnet import ResNetDet
    model = ResNetDet(stage_blocks=(1, 1, 1, 1), base_channels=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)

    mesh = create_mesh(data=2, model=2, devices=jax.devices()[:4])
    p_sh = param_sharding(variables['params'], mesh)
    flat = jax.tree_util.tree_flatten_with_path(p_sh)[0]
    assert any(tuple(s.spec) == (None, None, None, 'model')
               for _, s in flat), 'no conv got the model axis'
    params = jax.device_put(variables['params'], p_sh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    bs = jax.device_put(variables['batch_stats'],
                        NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P('data')))
    with mesh:
        out = jax.jit(lambda p, b, xi: model.apply(
            {'params': p, 'batch_stats': b}, xi))(params, bs, xs)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_sharded_train_step_runs():
    rec = build_recognizer(_tiny_cfg())
    variables = rec.init_variables(jax.random.PRNGKey(0), (8, 16, 64, 3))
    tx, _ = build_optimizer(dict(type='Adam', lr=1e-3))
    state = TrainState.create(variables, tx)
    mesh = create_mesh(data=4, model=2)
    with mesh:
        state = shard_state(state, mesh)
        step = make_train_step(rec, mesh=mesh)
        td = rec.label_convertor.str2tensor(['ab'] * 8)
        batch = {
            'img': np.random.default_rng(0).standard_normal(
                (8, 16, 64, 3)).astype(np.float32),
            'valid_ratio': np.ones((8,), np.float32),
            'padded_targets': np.asarray(td['padded_targets']),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        l1 = float(metrics['loss'])
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        l2 = float(metrics['loss'])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert int(state.step) == 2
    # param sharding survived the update
    qkv_leaf = None
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, leaf in flat:
        name = '/'.join(getattr(p, 'key', str(p)) for p in path)
        if 'linear_q/kernel' in name:
            qkv_leaf = leaf
            break
    assert qkv_leaf is not None
    assert tuple(qkv_leaf.sharding.spec) == (None, 'model')


def test_lr_schedule():
    sched = make_lr_schedule(1e-4, warmup_steps=10, warmup_ratio=1e-3,
                             step_epochs=[8, 10], steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-7, rel=1e-2)
    assert float(sched(10)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(850)) == pytest.approx(1e-5, rel=1e-3)
    assert float(sched(1050)) == pytest.approx(1e-6, rel=1e-3)


def test_lr_schedule_poly():
    # mmcv PolyLrUpdaterHook (reference schedule_sgd_1200e.py): lr =
    # (base - min) * (1 - t/T)^power + min
    sched = make_lr_schedule(0.007, policy='poly', power=0.9, min_lr=1e-7,
                             total_steps=1000)
    assert float(sched(0)) == pytest.approx(0.007, rel=1e-5)
    expect = (0.007 - 1e-7) * (1 - 0.5) ** 0.9 + 1e-7
    assert float(sched(500)) == pytest.approx(expect, rel=1e-5)
    assert float(sched(1000)) == pytest.approx(1e-7, abs=1e-10)


def test_optimizer_mmcv_warmup_and_paramwise():
    import numpy as np

    # mmcv warmup keys (schedule_sgd_160e.py)
    tx, sched = build_optimizer(dict(
        type='SGD', lr=0.08, momentum=0.9,
        lr_config=dict(policy='step', warmup='linear', warmup_iters=500,
                       warmup_ratio=0.001, step=[80, 128])),
        steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.08 * 0.001, rel=1e-3)
    assert float(sched(500)) == pytest.approx(0.08, rel=1e-3)

    # paramwise custom_keys lr_mult (schedule_adam_custom_key_step_10e.py:
    # freeze backbone/encoder with lr_mult=0.0)
    tx, _ = build_optimizer(dict(
        type='Adam', lr=1e-3,
        paramwise_cfg=dict(custom_keys={'backbone': dict(lr_mult=0.0)})))
    params = {'backbone': {'conv': {'kernel': jnp.ones((3, 3))}},
              'decoder': {'fc': {'kernel': jnp.ones((3, 3))}}}
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates['backbone']['conv']['kernel']) == 0.0)
    assert np.any(np.asarray(updates['decoder']['fc']['kernel']) != 0.0)


def test_det_trainer_optimizer_honors_lr_config_and_clip():
    """ADVICE r4: the det/KIE loops built flat-lr sgd/adam and ignored
    lr_config poly/warmup + optimizer_config.grad_clip. They now route
    through build_optimizer_from_run_cfg — the schedule_sgd_1200e recipe
    (poly power 0.9 + 1000-iter linear warmup + grad_clip) must decay."""
    from tps_pp_tpu.parallel import build_optimizer_from_run_cfg
    from tps_pp_tpu.apis.train_det import _make_optimizer

    run_cfg = dict(
        optimizer=dict(type='SGD', lr=0.007, momentum=0.9,
                       weight_decay=0.0001),
        optimizer_config=dict(grad_clip=dict(max_norm=0.5)),
        lr_config=dict(policy='poly', power=0.9, min_lr=1e-7,
                       warmup='linear', warmup_iters=200,
                       warmup_ratio=0.001))
    _, sched = build_optimizer_from_run_cfg(run_cfg, steps_per_epoch=10,
                                            total_epochs=100)
    assert float(sched(0)) == pytest.approx(0.007 * 0.001, rel=1e-3)
    # mmcv warmup multiplies the regular (already poly-decayed) lr
    assert float(sched(200)) == pytest.approx(
        0.007 * (1 - 200 / 1000) ** 0.9, rel=1e-2)
    mid, late = float(sched(500)), float(sched(900))
    assert 1e-7 < late < mid < 0.007          # poly decay after warmup

    # the det trainers' _make_optimizer wraps the same builder: huge
    # gradients must come out clipped to max_norm before the lr scaling
    tx = _make_optimizer(run_cfg, steps_per_epoch=10, total_epochs=100)
    params = {'w': jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {'w': jnp.full((4, 4), 1e6)}
    updates, _ = tx.update(grads, state, params)
    # after clip to 0.5 and warmup lr 7e-6, the update norm is tiny
    norm = float(jnp.linalg.norm(updates['w']))
    assert norm < 0.5 * 0.007


def test_predict_under_mesh_shard_map():
    """Data-parallel serving: predict(mesh=...) shard_maps the forward over
    the 'data' axis (the fused Pallas paths cannot be auto-partitioned) and
    matches the single-device result; non-divisible batches pad per shard."""
    from tps_pp_tpu.parallel import shard_batch

    rec = build_recognizer(_tiny_cfg())
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, 16, 64, 3))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((8, 16, 64, 3)), jnp.float32)
    vr = jnp.ones((8,), jnp.float32)
    ref = np.asarray(rec.predict(variables, img, vr, bucket_batch=False))

    mesh = create_mesh(data=8, model=1)
    placed = shard_batch({'img': img, 'valid_ratio': vr}, mesh)
    out = np.asarray(rec.predict(variables, placed['img'],
                                 placed['valid_ratio'], bucket_batch=False,
                                 mesh=mesh))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    # 6 images over 8 data shards: padded to 8, sliced back
    out6 = np.asarray(rec.predict(variables, img[:6], vr[:6],
                                  bucket_batch=False, mesh=mesh))
    assert out6.shape[0] == 6
    np.testing.assert_allclose(out6, ref[:6], atol=2e-5, rtol=1e-4)


def test_remat_policies_give_identical_steps():
    """jax.checkpoint trades FLOPs for memory; the raw GRADIENTS must agree
    across remat policies (up to recompute-order rounding). Post-optimizer
    params are deliberately not compared: Adam's g/(sqrt(g^2)+eps) amplifies
    reassociation noise in near-zero gradients to O(lr)."""
    rec = build_recognizer(_tiny_cfg())
    variables = rec.init_variables(jax.random.PRNGKey(0), (2, 32, 64, 3))
    rng_img = np.random.default_rng(0)
    td = rec.label_convertor.str2tensor(['ab', '7x'])
    batch = {
        'img': jnp.asarray(rng_img.standard_normal((2, 32, 64, 3)),
                           jnp.float32),
        'valid_ratio': jnp.ones((2,), jnp.float32),
        'padded_targets': jnp.asarray(td['padded_targets']),
    }

    def grads_for(remat):
        def loss_fn(params):
            v = {'params': params, 'batch_stats': variables['batch_stats']}
            total, _ = rec.compute_loss(v, batch, jax.random.PRNGKey(1),
                                        train=True)
            return total
        if remat == 'full':
            loss_fn = jax.checkpoint(loss_fn)
        elif remat == 'dots':
            loss_fn = jax.checkpoint(
                loss_fn, policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            variables['params'])
        return float(loss), jax.tree.leaves(grads)

    base_loss, base_grads = grads_for('none')
    scale = max(float(np.abs(np.asarray(g)).max()) for g in base_grads)
    for remat in ('dots', 'full'):
        loss, grads = grads_for(remat)
        assert abs(loss - base_loss) < 1e-5 * max(1.0, abs(base_loss))
        for a, b in zip(base_grads, grads):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6 * scale)
