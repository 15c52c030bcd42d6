"""Import the *reference* PyTorch modules (/root/reference) for numeric
parity testing, shimming their missing deps (mmcv, timm, broken fork
imports).

The reference is an MMOCR-0.4 fork whose heavy deps (mmcv, mmdet, timm) are
not installed here, and whose ``__init__`` files import deleted modules
(SURVEY §2.11). This module installs minimal, behavior-faithful stand-ins in
``sys.modules`` and then loads the individual reference source files under
their real dotted names — WITHOUT executing any reference ``__init__``.

Shimmed surface (only what the loaded files touch):
  * ``mmcv.cnn.ConvModule``      — conv + optional norm + ReLU (mmcv default
    order conv/norm/act, bias='auto')
  * ``mmcv.cnn.resnet.BasicBlock``/``conv3x3`` — the mmcv-1.x resnet block
    used by mmocr's BasicBlock subclass (conv_layer.py:3-33)
  * ``mmcv.runner.BaseModule/ModuleList/Sequential``
  * ``timm.models.layers.DropPath`` — identity at eval time
  * ``mmocr.models.builder`` registries — no-op ``register_module``
  * ``mmocr.utils.is_type_list``
  * dead fork imports (``backbones.tps``, ``decoders.Trans``,
    ``tools.data.textrecog.visual_feat``) — inert placeholders

Loaded reference files (call :func:`load_reference`):
  * common/modules/transformer_module.py   (MHA, FFN, PositionalEncoding)
  * common/layers/transformer_layers.py    (TFEncoderLayer, TFDecoderLayer)
  * textrecog/layers/{conv_layer,lstm_layer}.py
  * textrecog/backbones/tps_pp/{DGAB,tps_pp}.py  (the paper's TPS++)
  * textrecog/backbones/{resnet_v2_large,very_deep_vgg}.py
  * textrecog/{encoders/nrtr_encoder,decoders/nrtr_decoder}.py
  * textrecog/decoders/crnn_decoder.py

Everything runs on CPU at fp32 with random-init weights; the parity tests
convert those weights into our flax models via utils.torch_convert and
assert activation-level agreement.
"""
from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE_ROOT = '/root/reference'


def _module(name: str) -> types.ModuleType:
    """Get-or-create a bare module object registered in sys.modules."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodule imports resolve
        sys.modules[name] = mod
        parent, _, child = name.rpartition('.')
        if parent:
            setattr(_module(parent), child, mod)
    return mod


def _install_mmcv_shim():
    import torch
    import torch.nn as nn

    if 'mmcv' in sys.modules and getattr(sys.modules['mmcv'], '__shim__',
                                         False) is False:
        return  # a real mmcv exists (not the case in this image)

    def build_activation_layer(cfg):
        t = (cfg or {'type': 'ReLU'}).get('type', 'ReLU')
        if 'GELU' in t:
            return nn.GELU()
        if t.lower() in ('relu', 'mmcv.relu'):
            return nn.ReLU(inplace=True)
        raise ValueError(f'shim: unsupported activation {t}')

    class ConvModule(nn.Module):
        """mmcv.cnn.ConvModule subset: Conv2d + optional BN + ReLU.

        Matches mmcv defaults used by the reference (tps_pp.py:126-131,
        538-552): conv_cfg=None, norm_cfg=None, act_cfg=ReLU,
        bias='auto' (True when no norm), order ('conv','norm','act').
        """

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias='auto',
                     conv_cfg=None, norm_cfg=None,
                     act_cfg=dict(type='ReLU'), inplace=True,
                     order=('conv', 'norm', 'act'), **kwargs):
            super().__init__()
            assert conv_cfg is None, 'shim supports plain Conv2d only'
            if bias == 'auto':
                bias = norm_cfg is None
            self.order = order
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding,
                                  dilation=dilation, groups=groups, bias=bias)
            self.with_norm = norm_cfg is not None
            if self.with_norm:
                assert norm_cfg.get('type', 'BN') == 'BN'
                self.bn = nn.BatchNorm2d(out_channels)
            self.with_activation = act_cfg is not None
            if self.with_activation:
                self.activate = build_activation_layer(act_cfg)

        def forward(self, x):
            for layer in self.order:
                if layer == 'conv':
                    x = self.conv(x)
                elif layer == 'norm' and self.with_norm:
                    x = self.bn(x)
                elif layer == 'act' and self.with_activation:
                    x = self.activate(x)
            return x

    def conv3x3(in_planes, out_planes, stride=1, dilation=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                         padding=dilation, dilation=dilation, bias=False)

    class _MMCVBasicBlock(nn.Module):
        """mmcv.cnn.resnet.BasicBlock (mmcv 1.x), the base of mmocr's
        BasicBlock (reference conv_layer.py:12-33)."""
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, dilation=1,
                     downsample=None, style='pytorch', with_cp=False):
            super().__init__()
            assert not with_cp
            self.conv1 = conv3x3(inplanes, planes, stride, dilation)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride
            self.dilation = dilation

        def forward(self, x):
            residual = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                residual = self.downsample(x)
            out = out + residual
            return self.relu(out)

    class BaseModule(nn.Module):
        """mmcv.runner.BaseModule subset (init_cfg is carried, not acted on —
        parity tests copy the torch weights, so init scheme is irrelevant)."""

        def __init__(self, init_cfg=None):
            super().__init__()
            self._is_init = False
            self.init_cfg = init_cfg

        def init_weights(self):
            self._is_init = True

    mmcv = _module('mmcv')
    mmcv.__shim__ = True
    cnn = _module('mmcv.cnn')
    cnn.ConvModule = ConvModule
    cnn.build_activation_layer = build_activation_layer
    resnet = _module('mmcv.cnn.resnet')
    resnet.BasicBlock = _MMCVBasicBlock
    resnet.conv3x3 = conv3x3
    runner = _module('mmcv.runner')
    runner.BaseModule = BaseModule
    runner.ModuleList = nn.ModuleList
    runner.Sequential = nn.Sequential
    mmcv.cnn = cnn
    mmcv.runner = runner

    class DropPath(nn.Module):
        """timm stochastic depth; identity when p=0 or eval (the parity
        tests always run eval-mode)."""

        def __init__(self, drop_prob=0.):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0. or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    layers = _module('timm.models.layers')
    layers.DropPath = DropPath

    # ---- mmcv.cnn.bricks.transformer subset (ABINet uses
    # BaseTransformerLayer with torch MultiheadAttention + FFN;
    # param names kept mmcv-compatible: attentions.N.attn.*, ffns.N.layers.*,
    # norms.N.*) ----
    class _MMCVMultiheadAttention(nn.Module):
        def __init__(self, embed_dims, num_heads, attn_drop=0.,
                     proj_drop=0., dropout_layer=None, batch_first=False,
                     **kwargs):
            super().__init__()
            self.attn = nn.MultiheadAttention(embed_dims, num_heads,
                                              attn_drop)
            self.proj_drop = nn.Dropout(proj_drop)
            p = (dropout_layer or {}).get('drop_prob', 0.)
            self.dropout_layer = nn.Dropout(p) if p else nn.Identity()

        def forward(self, query, key=None, value=None, identity=None,
                    attn_mask=None, key_padding_mask=None, **kwargs):
            key = query if key is None else key
            value = key if value is None else value
            if identity is None:
                identity = query
            out = self.attn(query, key, value, attn_mask=attn_mask,
                            key_padding_mask=key_padding_mask)[0]
            return identity + self.dropout_layer(self.proj_drop(out))

    class _MMCVFFN(nn.Module):
        def __init__(self, embed_dims=256, feedforward_channels=1024,
                     ffn_drop=0., **kwargs):
            super().__init__()
            self.layers = nn.Sequential(
                nn.Sequential(nn.Linear(embed_dims, feedforward_channels),
                              nn.ReLU(inplace=True), nn.Dropout(ffn_drop)),
                nn.Linear(feedforward_channels, embed_dims),
                nn.Dropout(ffn_drop))

        def forward(self, x, identity=None):
            if identity is None:
                identity = x
            return identity + self.layers(x)

    class BaseTransformerLayer(BaseModule):
        """Subset of mmcv's BaseTransformerLayer covering the ABINet
        operation orders ('self_attn'|'cross_attn', 'norm', 'ffn', 'norm')."""

        def __init__(self, attn_cfgs=None, ffn_cfgs=None,
                     operation_order=None, norm_cfg=None, init_cfg=None,
                     **kwargs):
            super().__init__(init_cfg=init_cfg)
            self.operation_order = operation_order
            n_attn = sum(op in ('self_attn', 'cross_attn')
                         for op in operation_order)
            if isinstance(attn_cfgs, dict):
                attn_cfgs = [attn_cfgs] * n_attn
            self.attentions = nn.ModuleList([
                _MMCVMultiheadAttention(**{k: v for k, v in a.items()
                                           if k != 'type'})
                for a in attn_cfgs])
            n_norm = operation_order.count('norm')
            dims = attn_cfgs[0]['embed_dims']
            self.norms = nn.ModuleList(
                [nn.LayerNorm(dims) for _ in range(n_norm)])
            n_ffn = operation_order.count('ffn')
            if isinstance(ffn_cfgs, dict):
                ffn_cfgs = [ffn_cfgs] * n_ffn
            self.ffns = nn.ModuleList([
                _MMCVFFN(**{k: v for k, v in f.items() if k != 'type'})
                for f in ffn_cfgs])

        def forward(self, query, key=None, value=None, attn_masks=None,
                    query_key_padding_mask=None, key_padding_mask=None,
                    **kwargs):
            a = n = f = 0
            for op in self.operation_order:
                if op == 'self_attn':
                    query = self.attentions[a](
                        query, query, query, attn_mask=attn_masks,
                        key_padding_mask=query_key_padding_mask)
                    a += 1
                elif op == 'cross_attn':
                    query = self.attentions[a](
                        query, key, value, attn_mask=attn_masks,
                        key_padding_mask=key_padding_mask)
                    a += 1
                elif op == 'norm':
                    query = self.norms[n](query)
                    n += 1
                elif op == 'ffn':
                    query = self.ffns[f](query)
                    f += 1
            return query

    bricks = _module('mmcv.cnn.bricks.transformer')
    bricks.BaseTransformerLayer = BaseTransformerLayer
    bricks.FFN = _MMCVFFN
    bricks.MultiheadAttention = _MMCVMultiheadAttention


class _Registry:
    """Recording stand-in for mmcv Registry: the decorator returns the
    class unchanged but remembers it so builder.build_* can resolve
    ``dict(type=...)`` configs (RobustScannerDecoder builds its
    sub-decoders that way, robust_scanner_decoder.py:61-84)."""

    def __init__(self):
        self._modules = {}

    def register_module(self, *args, **kwargs):
        if args and isinstance(args[0], type):
            self._modules[args[0].__name__] = args[0]
            return args[0]

        def deco(cls):
            self._modules[cls.__name__] = cls
            return cls

        return deco

    def build(self, cfg):
        cfg = dict(cfg)
        return self._modules[cfg.pop('type')](**cfg)


def _install_mmocr_skeleton():
    import torch.nn as nn

    builder = _module('mmocr.models.builder')
    for reg in ('BACKBONES', 'DECODERS', 'ENCODERS', 'PREPROCESSOR',
                'CONVERTORS', 'LOSSES', 'RECOGNIZERS', 'DETECTORS', 'HEADS',
                'NECKS', 'FUSERS'):
        setattr(builder, reg, _Registry())
    from mmcv.cnn import build_activation_layer  # the shim installed above
    builder.build_activation_layer = build_activation_layer
    builder.build_decoder = builder.DECODERS.build
    builder.build_encoder = builder.ENCODERS.build
    builder.build_loss = builder.LOSSES.build

    utils = _module('mmocr.utils')

    def is_type_list(seq, expected_type):
        return isinstance(seq, list) and all(
            isinstance(item, expected_type) for item in seq)

    utils.is_type_list = is_type_list
    utils.equal_len = lambda *argv: all(len(arg) == len(argv[0])
                                        for arg in argv)

    # dead fork imports (SURVEY §2.11): inert placeholders so module-level
    # `from ... import X` succeeds; instantiating any of them is a test bug
    class _Deleted:
        def __init__(self, *a, **k):
            raise RuntimeError('reference module was deleted upstream')

    tps = _module('mmocr.models.textrecog.backbones.tps')
    for name in ('U_TPSnet', 'Deform_net', 'DAttentionBaseline', 'UDAT_Net',
                 'TPSnet', 'TPSnet_Warp', 'TPSnetv2'):
        setattr(tps, name, _Deleted)
    trans = _module('mmocr.models.textrecog.decoders.Trans')
    trans.TFCommonDecoderLayer = _Deleted
    # resnet_v2_large.py:12 imports the reference's own tools package; give
    # it a no-op draw_feature_map without shadowing our repo's tools/ dir
    vf = _module('tools.data.textrecog.visual_feat')
    vf.draw_feature_map = lambda *a, **k: None
    _ = nn  # keep import local-use explicit


def _load(relpath: str, dotted: str) -> types.ModuleType:
    if dotted in sys.modules and hasattr(sys.modules[dotted], '__file__'):
        return sys.modules[dotted]
    path = f'{REFERENCE_ROOT}/{relpath}'
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    parent, _, child = dotted.rpartition('.')
    if parent:
        setattr(_module(parent), child, mod)
    spec.loader.exec_module(mod)
    return mod


_loaded = None


def load_reference():
    """Install shims + load the reference modules; returns a namespace with
    the classes needed by the parity tests. Idempotent."""
    global _loaded
    if _loaded is not None:
        return _loaded

    _install_mmcv_shim()
    _install_mmocr_skeleton()

    tm = _load('mmocr/models/common/modules/transformer_module.py',
               'mmocr.models.common.modules.transformer_module')
    modules_pkg = _module('mmocr.models.common.modules')
    for name in ('ScaledDotProductAttention', 'MultiHeadAttention',
                 'PositionwiseFeedForward', 'PositionalEncoding'):
        setattr(modules_pkg, name, getattr(tm, name))

    tl = _load('mmocr/models/common/layers/transformer_layers.py',
               'mmocr.models.common.layers.transformer_layers')
    common_pkg = _module('mmocr.models.common')
    for name in ('PositionalEncoding', 'MultiHeadAttention',
                 'PositionwiseFeedForward'):
        setattr(common_pkg, name, getattr(tm, name))
    for name in ('TFEncoderLayer', 'TFDecoderLayer'):
        setattr(common_pkg, name, getattr(tl, name))

    cl = _load('mmocr/models/textrecog/layers/conv_layer.py',
               'mmocr.models.textrecog.layers.conv_layer')
    ll = _load('mmocr/models/textrecog/layers/lstm_layer.py',
               'mmocr.models.textrecog.layers.lstm_layer')
    layers_pkg = _module('mmocr.models.textrecog.layers')
    layers_pkg.BasicBlock = cl.BasicBlock
    layers_pkg.Bottleneck = cl.Bottleneck
    layers_pkg.BidirectionalLSTM = ll.BidirectionalLSTM

    dgab = _load('mmocr/models/textrecog/backbones/tps_pp/DGAB.py',
                 'mmocr.models.textrecog.backbones.tps_pp.DGAB')
    tps_pp = _load('mmocr/models/textrecog/backbones/tps_pp/tps_pp.py',
                   'mmocr.models.textrecog.backbones.tps_pp.tps_pp')
    rv2 = _load('mmocr/models/textrecog/backbones/resnet_v2_large.py',
                'mmocr.models.textrecog.backbones.resnet_v2_large')
    rabi = _load('mmocr/models/textrecog/backbones/resnet_abi.py',
                 'mmocr.models.textrecog.backbones.resnet_abi')
    vgg = _load('mmocr/models/textrecog/backbones/very_deep_vgg.py',
                'mmocr.models.textrecog.backbones.very_deep_vgg')
    r31 = _load('mmocr/models/textrecog/backbones/resnet31_ocr.py',
                'mmocr.models.textrecog.backbones.resnet31_ocr')
    shallow = _load('mmocr/models/textrecog/backbones/shallow_cnn.py',
                    'mmocr.models.textrecog.backbones.shallow_cnn')
    modality = _load(
        'mmocr/models/textrecog/backbones/nrtr_modality_transformer.py',
        'mmocr.models.textrecog.backbones.nrtr_modality_transformer')
    _load('mmocr/models/textrecog/preprocessor/base_preprocessor.py',
          'mmocr.models.textrecog.preprocessor.base_preprocessor')
    tps_pre = _load(
        'mmocr/models/textrecog/preprocessor/tps_preprocessor.py',
        'mmocr.models.textrecog.preprocessor.tps_preprocessor')

    _load('mmocr/models/textrecog/encoders/base_encoder.py',
          'mmocr.models.textrecog.encoders.base_encoder')
    enc = _load('mmocr/models/textrecog/encoders/nrtr_encoder.py',
                'mmocr.models.textrecog.encoders.nrtr_encoder')
    sar_enc = _load('mmocr/models/textrecog/encoders/sar_encoder.py',
                    'mmocr.models.textrecog.encoders.sar_encoder')
    satrn_layers = _load('mmocr/models/textrecog/layers/satrn_layers.py',
                         'mmocr.models.textrecog.layers.satrn_layers')
    layers_pkg.Adaptive2DPositionalEncoding = \
        satrn_layers.Adaptive2DPositionalEncoding
    layers_pkg.SatrnEncoderLayer = satrn_layers.SatrnEncoderLayer
    satrn_enc = _load('mmocr/models/textrecog/encoders/satrn_encoder.py',
                      'mmocr.models.textrecog.encoders.satrn_encoder')
    _load('mmocr/models/textrecog/decoders/base_decoder.py',
          'mmocr.models.textrecog.decoders.base_decoder')
    dec = _load('mmocr/models/textrecog/decoders/nrtr_decoder.py',
                'mmocr.models.textrecog.decoders.nrtr_decoder')
    crnn = _load('mmocr/models/textrecog/decoders/crnn_decoder.py',
                 'mmocr.models.textrecog.decoders.crnn_decoder')
    sar_dec = _load('mmocr/models/textrecog/decoders/sar_decoder.py',
                    'mmocr.models.textrecog.decoders.sar_decoder')
    # sar_decoder_with_bs does `from . import ParallelSARDecoder` — expose
    # it on the decoders package (whose real __init__ is never executed)
    _module('mmocr.models.textrecog.decoders').ParallelSARDecoder = \
        sar_dec.ParallelSARDecoder
    sar_bs = _load('mmocr/models/textrecog/decoders/sar_decoder_with_bs.py',
                   'mmocr.models.textrecog.decoders.sar_decoder_with_bs')
    for extra in ('dot_product_attention_layer', 'position_aware_layer',
                  'robust_scanner_fusion_layer'):
        m = _load(f'mmocr/models/textrecog/layers/{extra}.py',
                  f'mmocr.models.textrecog.layers.{extra}')
        for name in dir(m):
            if not name.startswith('_') and isinstance(getattr(m, name),
                                                       type):
                setattr(layers_pkg, name, getattr(m, name))
    seq_dec = _load(
        'mmocr/models/textrecog/decoders/sequence_attention_decoder.py',
        'mmocr.models.textrecog.decoders.sequence_attention_decoder')
    pos_dec = _load(
        'mmocr/models/textrecog/decoders/position_attention_decoder.py',
        'mmocr.models.textrecog.decoders.position_attention_decoder')
    rs_dec = _load(
        'mmocr/models/textrecog/decoders/robust_scanner_decoder.py',
        'mmocr.models.textrecog.decoders.robust_scanner_decoder')
    cre = _load(
        'mmocr/models/textrecog/encoders/channel_reduction_encoder.py',
        'mmocr.models.textrecog.encoders.channel_reduction_encoder')
    abi_enc = _load('mmocr/models/textrecog/encoders/transformer.py',
                    'mmocr.models.textrecog.encoders.transformer')
    abi_vdec = _load(
        'mmocr/models/textrecog/decoders/abinet_vision_decoder.py',
        'mmocr.models.textrecog.decoders.abinet_vision_decoder')
    abi_ldec = _load(
        'mmocr/models/textrecog/decoders/abinet_language_decoder.py',
        'mmocr.models.textrecog.decoders.abinet_language_decoder')
    abi_fuser = _load('mmocr/models/textrecog/fusers/abi_fuser.py',
                      'mmocr.models.textrecog.fusers.abi_fuser')
    ce_loss = _load('mmocr/models/textrecog/losses/ce_loss.py',
                    'mmocr.models.textrecog.losses.ce_loss')
    ctc_loss = _load('mmocr/models/textrecog/losses/ctc_loss.py',
                     'mmocr.models.textrecog.losses.ctc_loss')
    mix_loss = _load('mmocr/models/textrecog/losses/mix_loss.py',
                     'mmocr.models.textrecog.losses.mix_loss')

    ns = types.SimpleNamespace(
        TPS_PP=tps_pp.TPS_PP,
        DGAB=dgab.DGAB,
        TFEncoderLayer=tl.TFEncoderLayer,
        TFDecoderLayer=tl.TFDecoderLayer,
        MultiHeadAttention=tm.MultiHeadAttention,
        PositionwiseFeedForward=tm.PositionwiseFeedForward,
        PositionalEncoding=tm.PositionalEncoding,
        ResNetABI_v2_large=rv2.ResNetABI_v2_large,
        VeryDeepVgg=vgg.VeryDeepVgg,
        ResNet31OCR=r31.ResNet31OCR,
        ShallowCNN=shallow.ShallowCNN,
        NRTRModalityTransform=modality.NRTRModalityTransform,
        TPSPreprocessor=tps_pre.TPSPreprocessor,
        NRTREncoder=enc.NRTREncoder,
        NRTRDecoder=dec.NRTRDecoder,
        CRNNDecoder=crnn.CRNNDecoder,
        BidirectionalLSTM=ll.BidirectionalLSTM,
        SAREncoder=sar_enc.SAREncoder,
        ParallelSARDecoder=sar_dec.ParallelSARDecoder,
        SequentialSARDecoder=sar_dec.SequentialSARDecoder,
        ParallelSARDecoderWithBS=sar_bs.ParallelSARDecoderWithBS,
        ResNetABI=rabi.ResNetABI,
        SatrnEncoder=satrn_enc.SatrnEncoder,
        SequenceAttentionDecoder=seq_dec.SequenceAttentionDecoder,
        PositionAttentionDecoder=pos_dec.PositionAttentionDecoder,
        RobustScannerDecoder=rs_dec.RobustScannerDecoder,
        ChannelReductionEncoder=cre.ChannelReductionEncoder,
        TransformerEncoder=abi_enc.TransformerEncoder,
        ABIVisionDecoder=abi_vdec.ABIVisionDecoder,
        ABILanguageDecoder=abi_ldec.ABILanguageDecoder,
        ABIFuser=abi_fuser.ABIFuser,
        CELoss=ce_loss.CELoss,
        TFLoss=ce_loss.TFLoss,
        SARLoss=ce_loss.SARLoss,
        CTCLoss=ctc_loss.CTCLoss,
        ABILoss=mix_loss.ABILoss,
    )
    _loaded = ns
    return ns


# ---------------------------------------------------------------------------
# Evaluation-side reference loading (hmean protocols)
# ---------------------------------------------------------------------------

def _install_shapely_shim():
    """Minimal shapely.geometry.Polygon stand-in (shapely is not in this
    image): shoelace area + Sutherland–Hodgman convex intersection. Exact
    for the CONVEX polygons the eval parity tests feed it (rotated
    rectangles); `is_valid` is True for those by construction."""
    import numpy as np

    if 'shapely.geometry' in sys.modules:
        return

    class _Poly:
        def __init__(self, pts):
            pts = np.asarray(pts, np.float64).reshape(-1, 2)
            # signed shoelace; normalize to CCW so the clipper's
            # inside-test (left of each directed edge) is consistent
            x, y = pts[:, 0], pts[:, 1]
            signed = 0.5 * (np.dot(x, np.roll(y, -1)) -
                            np.dot(y, np.roll(x, -1)))
            self._pts = pts if signed >= 0 else pts[::-1]
            self.area = abs(float(signed))
            self.is_valid = True

        def buffer(self, dist):
            return self

        def intersection(self, other):
            poly = [tuple(p) for p in self._pts]
            clip = [tuple(p) for p in other._pts]
            n = len(clip)
            for k in range(n):
                if not poly:
                    break
                ax, ay = clip[k]
                bx, by = clip[(k + 1) % n]
                out = []
                m = len(poly)
                for i in range(m):
                    cx, cy = poly[i]
                    dx, dy = poly[(i + 1) % m]
                    cin = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) >= 0
                    nin = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax) >= 0
                    if cin != nin:
                        denom = ((bx - ax) * (dy - cy) -
                                 (by - ay) * (dx - cx))
                        t = (((cx - ax) * (dy - cy) -
                              (cy - ay) * (dx - cx)) / denom
                             if denom else 0.0)
                        ix = ax + t * (bx - ax)
                        iy = ay + t * (by - ay)
                    if cin:
                        out.append((cx, cy))
                        if not nin:
                            out.append((ix, iy))
                    elif nin:
                        out.append((ix, iy))
                poly = out
            return _Poly(poly) if len(poly) >= 3 else _EmptyGeom()

        def union(self, other):
            inter = self.intersection(other)
            u = _EmptyGeom()
            u.area = self.area + other.area - inter.area
            return u

    class _EmptyGeom:
        area = 0.0
        is_valid = True

    geom = _module('shapely.geometry')
    geom.Polygon = _Poly
    sys.modules['shapely'].geometry = geom


_eval_loaded = None


def _install_rapidfuzz_shim():
    """rapidfuzz.string_metric.levenshtein backed by the repo's own C++
    levenshtein (native.py) — ocr_metric.py:5,65 is its only reference
    call site, with the plain unweighted signature."""
    if 'rapidfuzz' in sys.modules and not getattr(
            sys.modules['rapidfuzz'], '__shim__', False):
        return
    from ..native import levenshtein
    rf = _module('rapidfuzz')
    rf.__shim__ = True
    sm = _module('rapidfuzz.string_metric')
    sm.levenshtein = lambda a, b: levenshtein(a, b)
    rf.string_metric = sm


def load_reference_eval():
    """Load the reference evaluation modules (hmean_ic13 + ocr_metric +
    helpers) with the shapely/rapidfuzz shims installed; returns a
    namespace. Idempotent."""
    global _eval_loaded
    if _eval_loaded is not None:
        return _eval_loaded
    _install_shapely_shim()
    _install_rapidfuzz_shim()
    utils_mod = _module('mmocr.utils')
    ca = _load('mmocr/utils/check_argument.py', 'mmocr.utils.check_argument')
    for name in ('is_3dlist', 'is_2dlist', 'is_type_list', 'is_none_or_type',
                 'equal_len', 'valid_boundary'):
        if hasattr(ca, name):
            setattr(utils_mod, name, getattr(ca, name))
    ev_utils = _load('mmocr/core/evaluation/utils.py',
                     'mmocr.core.evaluation.utils')
    ic13 = _load('mmocr/core/evaluation/hmean_ic13.py',
                 'mmocr.core.evaluation.hmean_ic13')
    ocr_metric = _load('mmocr/core/evaluation/ocr_metric.py',
                       'mmocr.core.evaluation.ocr_metric')
    hmean_iou = _load('mmocr/core/evaluation/hmean_iou.py',
                      'mmocr.core.evaluation.hmean_iou')
    ns = types.SimpleNamespace(eval_hmean_ic13=ic13.eval_hmean_ic13,
                               eval_hmean_iou=hmean_iou.eval_hmean_iou,
                               compute_recall_precision=(
                                   ic13.compute_recall_precision),
                               eval_utils=ev_utils,
                               eval_ocr_metric=ocr_metric.eval_ocr_metric,
                               count_matches=ocr_metric.count_matches)
    _eval_loaded = ns
    return ns
