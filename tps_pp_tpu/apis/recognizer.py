"""TextRecognizer: config -> (linen module, convertor, loss, jitted fns).

The host-side orchestration layer replacing the reference's
``EncodeDecodeRecognizer`` glue (encode_decode_recognizer.py:18-88 builds;
:131-182 forward_train; :184-225 simple_test) and the
``build_detector`` entry (reference mmocr/models/builder.py:141-152).

Responsibilities:
  * build convertor/backbone/tpsnet/encoder/decoder/loss from a config dict,
    injecting num_classes/start_idx/padding_idx/max_seq_len into the decoder
    and ignore_index into the loss exactly like the reference (:58-79);
  * own the jit boundaries: ``loss_fn`` (train, mutable batch_stats),
    ``predict`` (greedy decode for AR decoders / single pass for CTC);
  * host-side str<->tensor conversion around the device calls.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import convertors as _convertors  # noqa: F401 (registry side effect)
from .. import losses as _losses          # noqa: F401
from .. import models as _models          # noqa: F401
from ..config import ConfigDict
from ..registry import CONVERTORS, MODELS
from ..models.recognizers.encode_decode import EncodeDecodeRecognizerModule
from ..models.decoders.base import greedy_decode

_DTYPES = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}


def _build_module(cfg, dtype, **extra):
    if cfg is None:
        return None
    cfg = dict(cfg)
    return MODELS.build(cfg, dtype=dtype, **extra)


class TextRecognizer:
    """Generic encode-decode recognizer (NRTR/CRNN/SAR/SATRN/RobustScanner,
    with optional TPS++/preprocessor)."""

    def __init__(self, cfg: Dict[str, Any]):
        cfg = ConfigDict._wrap(dict(cfg))
        self.cfg = cfg
        self.max_seq_len = int(cfg.get('max_seq_len', 40))
        dtype = _DTYPES[cfg.get('dtype', 'float32')]
        self.dtype = dtype

        lc_cfg = dict(cfg['label_convertor'])
        lc_cfg['max_seq_len'] = self.max_seq_len
        self.label_convertor = CONVERTORS.build(lc_cfg)

        decoder_cfg = cfg.get('decoder')
        decoder = _build_module(
            decoder_cfg, dtype,
            num_classes=self.label_convertor.num_classes(),
            start_idx=self.label_convertor.start_idx,
            padding_idx=self.label_convertor.padding_idx,
            max_seq_len=self.max_seq_len)
        self.module = EncodeDecodeRecognizerModule(
            backbone=_build_module(cfg['backbone'], dtype),
            decoder=decoder,
            encoder=_build_module(cfg.get('encoder'), dtype),
            preprocessor=_build_module(cfg.get('preprocessor'), dtype),
            tpsnet=_build_module(cfg.get('tpsnet'), dtype),
        )
        loss_cfg = dict(cfg['loss'])
        loss_cfg.setdefault('ignore_index', self.label_convertor.padding_idx)
        self.loss_obj = MODELS.build(loss_cfg)
        self.autoregressive = getattr(type(decoder), 'IS_AUTOREGRESSIVE',
                                      False)
        # stop the decode loop once every row emitted EOS (semantics
        # preserved — the codec ignores everything after the first EOS)
        self.early_exit = bool(cfg.get('early_exit', True))
        # same exit inside the whole-decode pallas kernel. Default ON:
        # measured on-chip (scratch/probe_early_exit.py, B=512 v5e) the
        # while-loop lowering costs ~0.15 ms on the never-exits case
        # (58.73 -> 58.88 ms random weights) and saves ~10 ms on real
        # text (58.72 -> 48.77 ms, +20% img/s on the trained flagship)
        self.fused_early_exit = bool(cfg.get('fused_early_exit', True))
        self.beam_length_norm = bool(cfg.get('beam_length_norm', False))
        # serving stem path: 'auto' == 'xla' (the channels-on-sublanes
        # pallas stem measured SLOWER on-chip — see resolved_stem_mode);
        # 'fused' opts into ops/pallas_stem.py explicitly
        self.stem_mode = cfg.get('stem_mode', 'auto')
        # decode modes:
        #   'auto' (default): pick the fastest serving path for the current
        #     backend — on TPU with a fused-capable decoder this is
        #     'fused40_bf16'; everywhere else 'steps'.
        #   'fused40_bf16': whole greedy decode in one pallas kernel with
        #     bf16 encoder K/V — greedy argmax-identical to 'steps'
        #     (the serving default on TPU, ~5k img/s/chip on the flagship);
        #   'fused40': same kernel with int8-quantized encoder K/V (halves
        #     its VMEM footprint; argmax flips on quantization near-ties);
        #   'steps': XLA KV-cached loop with early exit, bit-matched to the
        #     torch reference greedy semantics.
        self.decode_mode = cfg.get('decode_mode', 'auto')
        # bucketed KV-cache reads during decode (see greedy_decode);
        # pointless when the fused step kernels are on (they mask in-kernel)
        self.kv_bucket = (int(cfg.get('kv_bucket', 8))
                          if getattr(type(decoder), 'SUPPORTS_KV_LIMIT',
                                     False) and
                          not getattr(decoder, 'use_fused_step', False)
                          else 0)
        # beam search (reference: ParallelSARDecoderWithBS) — the decoder
        # config's beam_width, overridable at the model level
        self.beam_width = int(cfg.get(
            'beam_width', getattr(decoder, 'beam_width', 1) or 1))

        self._predict_jit = None

    # ------------------------------------------------------------- init
    def init_variables(self, rng, input_shape: Tuple[int, ...]):
        """input_shape: (N, H, W, C)."""
        img = jnp.zeros(input_shape, self.dtype)
        targets = jnp.full((input_shape[0], self.max_seq_len),
                           self.label_convertor.padding_idx, jnp.int32)
        vr = jnp.ones((input_shape[0],), jnp.float32)
        p_rng, d_rng = jax.random.split(rng)
        return self.module.init({'params': p_rng, 'dropout': d_rng}, img,
                                targets=targets, valid_ratio=vr, train=False)

    # ------------------------------------------------------------ train
    def compute_loss(self, variables, batch, dropout_rng, train: bool = True):
        """Returns (total_loss, (loss_dict, new_model_state)). ``batch``
        carries img/valid_ratio/padded_targets(/target_lengths)."""
        out, new_state = self.module.apply(
            variables, batch['img'], targets=batch.get('padded_targets'),
            valid_ratio=batch.get('valid_ratio'), train=train,
            rngs={'dropout': dropout_rng}, mutable=['batch_stats'])
        targets_dict = {
            'padded_targets': batch.get('padded_targets'),
            'target_lengths': batch.get('target_lengths'),
        }
        losses = self.loss_obj(out, targets_dict,
                               valid_ratio=batch.get('valid_ratio'))
        total = sum(jax.tree.leaves(losses))
        return total, (losses, new_state)

    # -------------------------------------------------------- inference
    def resolved_decode_mode(self) -> str:
        """The decode path ``predict`` actually uses, with 'auto' resolved
        for the current default backend (evaluated lazily — tests switch
        platforms mid-process). Non-AR subclasses (ABINet, Seg) have no
        decode loop — they report 'single_pass'."""
        if not self.autoregressive:
            return 'single_pass'
        mode = getattr(self, 'decode_mode', 'auto')
        if mode != 'auto':
            # explicit fused modes still need a fused-capable decoder and a
            # greedy (beam_width<=1) search — fall back rather than crash
            # deep inside module.apply, and report what actually runs
            if mode in ('fused40', 'fused40_bf16') and not (
                    getattr(self, 'beam_width', 1) <= 1 and
                    hasattr(type(self.module.decoder), 'fused_full_decode')):
                return 'steps'
            return mode
        decoder = self.module.decoder
        if (getattr(self, 'beam_width', 1) <= 1
                and hasattr(type(decoder), 'fused_full_decode')
                # the fused kernels pack q|k|v in one lane layout, which
                # requires d_k == d_v (asserted in the kernels); fall back
                # to the XLA loop for mismatched configs
                and getattr(decoder, 'd_k', None) == getattr(
                    decoder, 'd_v', None)
                # Mosaic blocks need 128-lane shapes: toy dims (e.g. the
                # tiny flagship's d_model=64) fail to lower — explicit
                # fused modes stay available for interpret-mode tests
                and getattr(decoder, 'd_model', 0) % 128 == 0
                and jax.default_backend() not in ('cpu', 'gpu')):
            return 'fused40_bf16'
        return 'steps'

    def resolved_stem_mode(self) -> str:
        """'fused' iff the serving stem runs the (C, P)-layout pallas
        kernels (ops/pallas_stem.py): measured vs XLA's NHWC convs the
        fused stem sidesteps the <=64-lane MXU packing cliff. Needs the
        flagship geometry (TPS hook after two stride-[1,2] stages) and a
        TPU backend; everything else keeps the flax stem."""
        mode = getattr(self, 'stem_mode', 'auto')
        if mode == 'xla':
            return 'xla'
        bb = self.module.backbone
        geometry_ok = (
            self.module.tpsnet is not None
            and self.module.preprocessor is None
            and getattr(bb, 'tps_stage', None) == 2
            and tuple(getattr(bb, 'strides', ()))[:2] == (1, 2)
            and getattr(bb, 'stem_channels', 0) ==
            getattr(bb, 'base_channels', -1))
        if not geometry_ok:
            return 'xla'
        if mode == 'fused':
            return 'fused'
        # Mosaic sublane granularity: toy channel counts (tiny flagship's
        # stem_channels=4) stay on the XLA path under 'auto'; explicit
        # 'fused' remains available for interpret-mode tests
        if getattr(bb, 'stem_channels', 0) % 8:
            return 'xla'
        # CLOSED r5: 'auto' resolves to the XLA stem — the r4 "lane
        # packing cliff" premise was a measurement artifact (the timing
        # harness carries a ~4 ms fixed cost that swamped standalone
        # conv timings; chain-delta timing shows XLA's stem convs run at
        # 85-162 TFLOP/s in situ, scratch/probe_conv_chain.py). There is
        # no headroom for a kernel formulation whose matmul is capped at
        # 25% MXU by the 32-channel output dim; 'fused' stays as an
        # explicit opt-in only.
        return 'xla'

    def _fused_stem(self, variables, img, interpret: bool = None):
        from ..ops.pallas_stem import fused_stem_forward
        if interpret is None:
            # explicit stem_mode='fused' off-TPU degrades to interpret
            # mode instead of a Mosaic unsupported-backend error
            interpret = jax.default_backend() in ('cpu', 'gpu')
        return fused_stem_forward(variables['params']['backbone'],
                                  variables['batch_stats']['backbone'],
                                  img, dtype=self.dtype,
                                  interpret=interpret)

    def _predict_impl(self, variables, img, valid_ratio):
        mode = self.resolved_decode_mode()
        stem = (self._fused_stem(variables, img)
                if self.resolved_stem_mode() == 'fused' else None)
        if (self.autoregressive and getattr(self, 'beam_width', 1) <= 1
                and mode in ('fused40', 'fused40_bf16')):
            enc_dtype = 'int8' if mode == 'fused40' else 'bfloat16'
            fused_enc = getattr(type(self.module.encoder),
                                'SUPPORTS_FUSED_FORWARD', False)
            # in-kernel all-rows-EOS early exit (same contract as
            # greedy_decode's early_exit); cfg 'fused_early_exit' opts out.
            end_idx = (self.label_convertor.end_idx
                       if getattr(self, 'fused_early_exit', False) and
                       self.early_exit else None)
            return self.module.apply(variables, img, valid_ratio,
                                     method='decode_full_fused',
                                     enc_dtype=enc_dtype,
                                     fused_encoder=fused_enc,
                                     end_idx=end_idx, stem=stem)
        if self.autoregressive:
            feat, out_enc = self.module.apply(variables, img, valid_ratio,
                                              method='encode_full',
                                              stem=stem)

            def decoder_apply(method, *args):
                return self.module.apply(variables, *args, method=method)

            if self.beam_width > 1:
                from ..models.decoders.base import beam_decode
                return beam_decode(
                    decoder_apply, feat, out_enc, valid_ratio,
                    max_seq_len=self.max_seq_len,
                    start_idx=self.label_convertor.start_idx,
                    beam_width=self.beam_width,
                    length_norm=bool(getattr(self, 'beam_length_norm',
                                             False)))
            return greedy_decode(
                decoder_apply, feat, out_enc, valid_ratio,
                max_seq_len=self.max_seq_len,
                start_idx=self.label_convertor.start_idx,
                end_idx=(self.label_convertor.end_idx
                         if self.early_exit else None),
                kv_bucket=self.kv_bucket)
        return self.module.apply(variables, img, valid_ratio,
                                 method='forward_test_nar', stem=stem)

    def predict(self, variables, img, valid_ratio=None,
                bucket_batch: bool = True, mesh=None):
        """Jitted device forward: (N,H,W,C) -> (N, T, C') scores.

        ``bucket_batch`` pads the batch up to the next power of two
        (replicating the last row — see utils/batching) before the jitted
        call and slices the result back, bounding the jit cache to
        log2(N_max) programs for serving's variable crop counts. Callers
        with a FIXED batch shape (eval loops that already pad, bench)
        should pass ``bucket_batch=False`` — their one shape compiles
        once either way, and bucketing would only add padded-row work
        (e.g. a constant batch of 100 padded to 128 forever).

        ``mesh``: data-parallel serving over a device mesh. The forward is
        shard_map'd over the 'data' axis — REQUIRED for the fused Pallas
        decode/encoder paths, which XLA's auto-partitioner cannot split
        (pallas_call carries no SPMD rule; auto-sharding would gather the
        global batch onto every device). Params are taken replicated.
        """
        n = int(img.shape[0])
        if valid_ratio is None:
            valid_ratio = jnp.ones((n,), jnp.float32)
        else:
            valid_ratio = jnp.asarray(valid_ratio)
        nd = int(mesh.shape['data']) if mesh is not None else 1
        m = n
        if bucket_batch and n & (n - 1):          # not a power of two
            from ..utils.batching import next_pow2
            m = next_pow2(n)
        m = -(-m // nd) * nd                       # divisible per shard
        if m != n:
            from ..utils.batching import pad_rows
            img, valid_ratio = pad_rows((img, valid_ratio), n, m)
        if mesh is not None:
            # key on equality, not identity: an equal-but-new Mesh per call
            # must reuse the compiled shard_map wrapper
            if getattr(self, '_predict_shmap', None) is None or \
                    self._predict_shmap[0] != mesh:
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P
                fn = jax.jit(shard_map(
                    self._predict_impl, mesh=mesh,
                    in_specs=(P(), P('data'), P('data')),
                    out_specs=P('data'), check_rep=False))
                self._predict_shmap = (mesh, fn)
            out = self._predict_shmap[1](variables, img, valid_ratio)
        else:
            if self._predict_jit is None:
                self._predict_jit = jax.jit(self._predict_impl)
            out = self._predict_jit(variables, img, valid_ratio)
        return jax.tree.map(lambda x: x[:n], out)

    def simple_test(self, variables, img, valid_ratio=None, img_metas=None,
                    bucket_batch: bool = True):
        """Full test path incl. host-side decoding -> [{'text','score'}]
        (reference simple_test, encode_decode_recognizer.py:184-225)."""
        out = np.asarray(self.predict(variables, img, valid_ratio,
                                      bucket_batch=bucket_batch))
        if img_metas is None:
            vr = (np.asarray(valid_ratio).tolist()
                  if valid_ratio is not None else [1.0] * out.shape[0])
            img_metas = [{'valid_ratio': r} for r in vr]
        indexes, scores = self.label_convertor.tensor2idx(out, img_metas)
        strings = self.label_convertor.idx2str(indexes)
        return [dict(text=s, score=sc) for s, sc in zip(strings, scores)]


def build_recognizer(cfg: Dict[str, Any]):
    """Dispatch on the reference's recognizer ``type=`` names."""
    type_name = cfg.get('type', 'EncodeDecodeRecognizer')
    if type_name == 'ABINet':
        from .abinet import ABINetRecognizer
        return ABINetRecognizer(cfg)
    if type_name == 'SegRecognizer':
        from .seg import SegRecognizer
        return SegRecognizer(cfg)
    return TextRecognizer(cfg)
