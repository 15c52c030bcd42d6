"""Channels-on-sublanes fused conv kernels for the small-channel stem.

STATUS (r5): measured dead end, kept as explicit opt-in machinery only
(``stem_mode='fused'``; 'auto' uses the XLA stem). The r4 premise — that
XLA runs the 32-64-channel stem convs at ~25% MXU — was a measurement
artifact: the timing harness (common.timed_scan) carries a ~4 ms fixed
cost per call (input-perturbation copy + output reduction at these IO
sizes) that swamped standalone conv timings. Chain-delta timing
(scratch/probe_conv_chain.py: (t_18convs - t_2convs)/16) shows XLA's
in-situ stem convs at 85 TFLOP/s (c32) to 162 TFLOP/s (c64), i.e. near
speed-of-light already. The matmul formulation below is additionally
capped at <=25% MXU by its own 32-row output dim (tap construction is
NOT the cost: scratch/probe_stem_taps.py measured rolls+masks ~free and
the dot itself at ~8 TFLOP/s), so no tap-construction variant can win;
a halo-flat DMA-tap variant built to dodge the rolls was removed after
the same probes re-priced the question (git history, r5). Space-to-depth
refolding also loses: 4x FLOPs at 191 TFLOP/s is slower than 1x at 85.

Original design: activations live as (C, P) with the P = N*H*W pixel
index on lanes (W = 128 exactly fills a lane tile at the flagship's
32x128 input), and a 3x3 conv becomes ONE (C_out, 9*C_in) @ (9*C_in, P)
matmul whose contraction is 9*C_in >= 288. The nine shifted taps are
stacked in VMEM with lane rolls + boundary masks: rolling the flat pixel
axis by dx crosses a row boundary exactly where SAME padding wants zeros
(lane % W == edge), and by W*dy where the image (h) boundary wants
zeros, so masked rolls ARE the halo handling.

(Reference ``resnet_v2_large.py:163-196`` runs stock torch NCHW convs.)
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_tap(x2d, dy: int, dx: int, H: int, W: int):
    """x2d (C, P) with P = n*H*W flat: the (dy, dx) conv tap, i.e. the
    input pixel at (h+dy, w+dx) aligned onto (h, w), zero outside."""
    C, P = x2d.shape
    shift = dy * W + dx
    t = x2d if shift == 0 else jnp.roll(x2d, -shift, axis=1)
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ok = jnp.ones((1, P), jnp.bool_)
    w = pix % W
    h = (pix // W) % H
    if dx > 0:
        ok &= w < W - dx
    elif dx < 0:
        ok &= w >= -dx
    if dy > 0:
        ok &= h < H - dy
    elif dy < 0:
        ok &= h >= -dy
    return jnp.where(ok, t, jnp.zeros_like(t))


def _conv3x3_kernel(x_ref, w_ref, b_ref, o_ref, *, H: int, W: int,
                    relu: bool):
    x = x_ref[...]
    C, P = x.shape
    taps = [_shift_tap(x, dy, dx, H, W)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    patches = jnp.concatenate(taps, axis=0)           # (9C, P)
    acc = jax.lax.dot_general(
        w_ref[...], patches, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (Cout, P)
    acc = acc + b_ref[...].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('H', 'W', 'relu', 'bn',
                                             'interpret'))
def conv3x3_cp(x2d, w, b, *, H: int, W: int, relu: bool = False,
               bn: int = 1, interpret: bool = False):
    """3x3 SAME conv in (C, P) layout.

    x2d: (C_in, N*H*W) with W on the fastest axis; w: (C_out, 9*C_in)
    with taps ordered (dy, dx) row-major matching _shift_tap; b: (C_out, 1).
    ``bn`` = batch blocks (grid size over the pixel axis; N must divide).
    """
    C, P = x2d.shape
    Cout = w.shape[0]
    assert P % bn == 0
    pb = P // bn
    assert pb % (H * W) == 0, 'batch blocks must hold whole images'
    return pl.pallas_call(
        functools.partial(_conv3x3_kernel, H=H, W=W, relu=relu),
        grid=(bn,),
        in_specs=[
            pl.BlockSpec((C, pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 9 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cout, pb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cout, P), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2d, w, b)


def nhwc_to_cp(x):
    """(N, H, W, C) -> (C, N*H*W)."""
    N, H, W, C = x.shape
    return x.transpose(3, 0, 1, 2).reshape(C, N * H * W)


def cp_to_nhwc(x2d, shape: Tuple[int, int, int]):
    """(C, N*H*W) -> (N, H, W, C)."""
    N, H, W = shape
    C = x2d.shape[0]
    return x2d.reshape(C, N, H, W).transpose(1, 2, 3, 0)


def hwio_to_taps(w):
    """(3, 3, C_in, C_out) conv weights -> (C_out, 9*C_in) tap-major rows
    matching _shift_tap order ((dy, dx) row-major, C_in fastest)."""
    KH, KW, Cin, Cout = w.shape
    assert KH == 3 and KW == 3
    return w.transpose(3, 0, 1, 2).reshape(Cout, KH * KW * Cin)


def _block_kernel(t_ref, w1_ref, b1_ref, wt_ref, b2_ref, o_ref, *,
                  H: int, W: int, residual: bool):
    """One BasicBlock(use_conv1x1) in (C, P) layout, BN pre-folded:
    y = relu(w1 @ t + b1); z = wtaps @ patches(y) + b2;
    out = relu(z + t) if residual else z (block0's z meets its downsample
    branch outside). Matches models/layers.py BasicBlock eval semantics
    (reference conv_layer.py:31-63)."""
    t = t_ref[...]
    y = jax.lax.dot_general(w1_ref[...], t, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b1_ref[...].astype(jnp.float32), 0.0)
    y = y.astype(t.dtype)
    taps = [_shift_tap(y, dy, dx, H, W)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    patches = jnp.concatenate(taps, axis=0)
    z = jax.lax.dot_general(wt_ref[...], patches, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = z + b2_ref[...].astype(jnp.float32)
    if residual:
        z = jnp.maximum(z + t.astype(jnp.float32), 0.0)
    o_ref[...] = z.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('H', 'W', 'residual', 'bn',
                                             'interpret'))
def basic_block_cp(t, w1, b1, wtaps, b2, *, H: int, W: int,
                   residual: bool = True, bn: int = 1,
                   interpret: bool = False):
    """Fused BasicBlock in (C, P) layout.

    t: (C_in, P); w1: (C_mid, C_in); wtaps: (C_out, 9*C_mid);
    b1/b2: (C_mid, 1)/(C_out, 1) f32 (BN folded). residual requires
    C_out == C_in and applies the final relu; residual=False returns the
    raw post-bn2 main path (block0 adds its downsample branch outside).
    """
    Cin, P = t.shape
    Cmid = w1.shape[0]
    Cout = wtaps.shape[0]
    assert P % bn == 0 and (P // bn) % (H * W) == 0
    pb = P // bn
    return pl.pallas_call(
        functools.partial(_block_kernel, H=H, W=W, residual=residual),
        grid=(bn,),
        in_specs=[
            pl.BlockSpec((Cin, pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cmid, Cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cmid, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 9 * Cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cout, pb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cout, P), t.dtype),
        # the in-kernel patches temporary ((9*C_mid, pb) bf16, ~36 MB at
        # 64ch/32k lanes) exceeds Mosaic's default 16 MB scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(t, w1, b1, wtaps, b2)


def fold_bn(kernel, bn_params, bn_stats, eps: float = 1e-5):
    """Fold an eval-mode BatchNorm into the preceding conv: returns
    (scaled_kernel, bias). kernel HWIO or (Cin, Cout) for 1x1."""
    gamma = bn_params['scale']
    beta = bn_params['bias']
    mean = bn_stats['mean']
    var = bn_stats['var']
    sigma = jnp.sqrt(var + eps)
    return kernel * (gamma / sigma), beta - gamma * mean / sigma


def _pick_bn(n: int, ib: int) -> int:
    """Grid size for a batch of n images targeting ~ib images per block:
    the largest divisor of n whose block still holds >= ib images (the
    kernels require bn | N and whole images per block)."""
    best = 1
    for d in range(1, n + 1):
        if n % d == 0 and n // d >= ib:
            best = d
    return best


def _subsample2(x2d, n: int, H: int, W: int):
    """(C, n*H*W) -> (C, n*(H//2)*(W//2)) taking even h, w."""
    C = x2d.shape[0]
    x4 = x2d.reshape(C, n, H, W)
    return x4[:, :, ::2, ::2].reshape(C, n * (H // 2) * (W // 2))


def fused_stem_forward(bb_params, bb_stats, img, *, dtype=jnp.bfloat16,
                       interpret: bool = False):
    """The flagship stem (conv1+bn1+relu, layer1 x3 @C s1, layer2 x4 @2C
    s2-first) through the (C, P) kernels. Returns (x, skips) exactly like
    ``ResNetABIBase.stem_and_head`` in eval mode (models/backbones/
    resnet_abi.py:81-89) for the v2_large geometry (strides[:2] == (1, 2),
    tps_stage 2). ``bb_params``/``bb_stats`` are the backbone entries of
    the variables pytree; BN is folded at trace time (weights are small).
    """
    N, H, W, _ = img.shape
    assert H % 2 == 0 and W % 2 == 0, (
        f'fused stem needs even H/W for the stride-2 subsample, got '
        f'{H}x{W} — use stem_mode=\'xla\'')
    p, s = bb_params, bb_stats

    # conv1 + bn1 + relu: tiny (3->C), stays an XLA conv
    k1, c1b = fold_bn(p['conv1']['kernel'], p['bn1'], s['bn1'])
    x = jax.lax.conv_general_dilated(
        img.astype(dtype), k1.astype(dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x = jnp.maximum(x + c1b.astype(x.dtype), 0)
    skip0 = x

    ib = max(1, 32768 // (H * W))          # ~32k lanes per grid block
    bn = _pick_bn(N, ib)
    t = nhwc_to_cp(x)

    def block_args(lp, ls, has_ds):
        w1, b1 = fold_bn(lp['conv1']['kernel'][0, 0], lp['bn1'], ls['bn1'])
        w2, b2 = fold_bn(lp['conv2']['kernel'], lp['bn2'], ls['bn2'])
        out = dict(w1=w1.T.astype(dtype), b1=b1[:, None].astype(jnp.float32),
                   wt=hwio_to_taps(w2).astype(dtype),
                   b2=b2[:, None].astype(jnp.float32))
        if has_ds:
            wd, bd = fold_bn(lp['downsample_conv']['kernel'][0, 0],
                             lp['downsample_bn'], ls['downsample_bn'])
            out['wd'] = wd.T.astype(dtype)
            out['bd'] = bd[:, None].astype(jnp.float32)
        return out

    # layer1: stride 1, channels unchanged -> plain residual blocks
    l1p, l1s = p['layer1'], s['layer1']
    for name in sorted(l1p, key=lambda n: int(n[5:])):
        a = block_args(l1p[name], l1s[name], has_ds=False)
        t = basic_block_cp(t, a['w1'], a['b1'], a['wt'], a['b2'],
                           H=H, W=W, residual=True,
                           bn=bn, interpret=interpret)
    skip1 = cp_to_nhwc(t, (N, H, W))

    # layer2 block0: stride-2 main path computed at full res then
    # subsampled (1 of 15 convs; 4x overcompute beats a strided gather
    # in-kernel), downsample branch on the subsampled input
    l2p, l2s = p['layer2'], s['layer2']
    names = sorted(l2p, key=lambda n: int(n[5:]))
    a0 = block_args(l2p[names[0]], l2s[names[0]], has_ds=True)
    z = basic_block_cp(t, a0['w1'], a0['b1'], a0['wt'], a0['b2'],
                       H=H, W=W, residual=False,
                       bn=bn, interpret=interpret)
    z = _subsample2(z, N, H, W)
    t_sub = _subsample2(t, N, H, W)
    idn = jnp.dot(a0['wd'], t_sub.astype(dtype),
                  preferred_element_type=jnp.float32)
    t = jnp.maximum(z.astype(jnp.float32) + idn +
                    a0['bd'], 0).astype(dtype)
    H, W = H // 2, W // 2
    ib = max(1, 32768 // (H * W))
    bn = _pick_bn(N, ib)
    for name in names[1:]:
        a = block_args(l2p[name], l2s[name], has_ds=False)
        t = basic_block_cp(t, a['w1'], a['b1'], a['wt'], a['b2'],
                           H=H, W=W, residual=True,
                           bn=bn, interpret=interpret)
    x = cp_to_nhwc(t, (N, H, W))
    return x, [skip0, skip1]
