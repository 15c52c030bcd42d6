"""Rectifier smoke tests: MORAN / SPIN / TPS aug transforms
(reference analog: tests/test_models/test_ocr_preprocessor.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from tps_pp_tpu.registry import MODELS
import tps_pp_tpu.models  # noqa: F401


def test_moran_shapes():
    m = MODELS.build(dict(type='MORAN', num_img_channel=3,
                          img_size=(16, 64)))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_spin_shapes_and_identity_init():
    m = MODELS.build(dict(type='SPIN', input_channel=3, offsets=True,
                          default_type=6))
    rng = np.random.default_rng(1)
    # normalized ImageNet-style input
    raw = rng.uniform(0.05, 0.95, (2, 32, 64, 3)).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = jnp.asarray((raw - mean) / std)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_tps_aug_transforms():
    from tps_pp_tpu.registry import PIPELINES
    import tps_pp_tpu.datasets  # noqa: F401
    img = np.random.default_rng(0).integers(
        0, 255, (32, 100, 3)).astype(np.uint8)
    for t in ['Stretch', 'Distort', 'Curve']:
        tr = PIPELINES.build(dict(type=t, prob=1.0))
        out = tr({'img': img.copy()})
        assert out['img'].shape == img.shape
        assert out['img'].dtype == np.uint8


def test_multi_rotate_tta():
    from tps_pp_tpu.datasets.pipelines.test_time_aug import (
        MultiRotateAugOCR, merge_aug_results)
    aug = MultiRotateAugOCR()
    tall = np.zeros((64, 16, 3), np.uint8)
    wide = np.zeros((16, 64, 3), np.uint8)
    assert len(aug.expand(tall)) == 3
    assert len(aug.expand(wide)) == 1
    best = merge_aug_results([
        dict(text='abc', score=[0.5, 0.5, 0.5]),
        dict(text='ab', score=[0.9, 0.9]),
    ])
    assert best['text'] == 'ab'


def test_tps_pallas_mode_is_trainable():
    """The flagship config sets sample_mode='pallas' (serving kernel, no
    autodiff rule); under train=True the module must fall back to the
    differentiable sampler so tools/train.py can train the flagship."""
    import jax
    import jax.numpy as jnp
    from tps_pp_tpu.models.rectifiers.tps_pp import TPS_PP

    mod = TPS_PP(num_img_channel=8, img_size=(16, 32),
                 rectified_img_size=(16, 32), point_size=(2, 8),
                 sample_mode='pallas')
    x = jnp.ones((1, 16, 32, 8), jnp.float32)
    skips = [jnp.ones((1, 32, 64, 4), jnp.float32),
             jnp.ones((1, 32, 64, 4), jnp.float32)]
    v = mod.init(jax.random.PRNGKey(0), x, skips, train=True)

    def f(params):
        out = mod.apply({'params': params['params']}, x, skips, train=True)
        return jnp.mean(jnp.square(out['output'].astype(jnp.float32)))

    loss, grads = jax.value_and_grad(f)({'params': v['params']})
    import numpy as np
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_moran_enhance_iterations_share_weights():
    """enhance >= 1 refines offsets with the SAME offset net (reference
    moran.py:94-103 reuses self.cnn); per-iteration re-declaration raised
    flax NameInUseError."""
    import jax
    import jax.numpy as jnp

    from tps_pp_tpu.models.rectifiers.moran import MORAN

    m = MORAN(num_img_channel=3, img_size=(16, 32), enhance=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 32, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    # one shared set of conv/bn params regardless of enhance count
    assert sum(k.startswith('conv') for k in v['params']) == 5
