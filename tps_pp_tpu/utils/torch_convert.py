"""PyTorch .pth -> flax pytree weight conversion.

The BASELINE north star requires loading the reference's released
checkpoints. This module provides the layout transforms plus name-mapping
machinery:

  * conv:   torch (O, I, kh, kw)  -> flax HWIO (kh, kw, I, O)
  * linear: torch (O, I)          -> flax kernel (I, O)
  * bn:     weight/bias -> params scale/bias; running stats -> batch_stats
  * lstm:   torch weight_ih_l{k}[_reverse] -> TorchLSTMCellScan params
            (same gate order i,f,g,o — no re-ordering needed)
  * embed:  direct copy

``convert_state_dict(state_dict, rules)`` walks mapping rules of the form
(torch_prefix, flax_path, kind) and produces flat {'params': ..,
'batch_stats': ..} dicts mergeable into a model's variables via
``merge_flat``. Model-specific rule tables live next to the model configs;
``crnn_rules()`` / ``nrtr_tps_pp_rules()`` cover the two reference release
checkpoints (CRNN zoo + NRTR+TPS++ paper weights).

Layout transforms are validated against torch layers in
tests/test_torch_convert.py.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import numpy as np


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def convert_module(state_dict: Dict[str, np.ndarray], torch_prefix: str,
                   flax_path: str, kind: str):
    """Yield (tree, flat_path, array) triples for one module.

    kinds: conv, conv_nobias, linear, linear_nobias, bn, ln, embed, lstm,
    lstm_reverse, raw
    """
    sd = state_dict
    p = torch_prefix
    out: List[Tuple[str, str, np.ndarray]] = []

    def g(name):
        key = f'{p}.{name}' if name else p
        return np.asarray(sd[key])

    if kind in ('conv', 'conv_nobias'):
        out.append(('params', f'{flax_path}/kernel', t_conv(g('weight'))))
        if kind == 'conv':
            out.append(('params', f'{flax_path}/bias', g('bias')))
    elif kind in ('conv1x1_as_dense', 'conv1x1_as_dense_nobias'):
        # torch Conv2d(I, O, 1) used where we have a Dense: (O,I,1,1)->(I,O)
        out.append(('params', f'{flax_path}/kernel',
                    np.transpose(g('weight')[:, :, 0, 0], (1, 0))))
        if kind == 'conv1x1_as_dense':
            out.append(('params', f'{flax_path}/bias', g('bias')))
    elif kind in ('linear', 'linear_nobias'):
        out.append(('params', f'{flax_path}/kernel', t_linear(g('weight'))))
        if kind == 'linear':
            out.append(('params', f'{flax_path}/bias', g('bias')))
    elif kind == 'bn':
        out.append(('params', f'{flax_path}/scale', g('weight')))
        out.append(('params', f'{flax_path}/bias', g('bias')))
        out.append(('batch_stats', f'{flax_path}/mean', g('running_mean')))
        out.append(('batch_stats', f'{flax_path}/var', g('running_var')))
    elif kind == 'ln':
        out.append(('params', f'{flax_path}/scale', g('weight')))
        out.append(('params', f'{flax_path}/bias', g('bias')))
    elif kind == 'embed':
        out.append(('params', f'{flax_path}/embedding', g('weight')))
    elif kind.startswith('lstm') and kind not in ('lstm_cell',):
        # 'lstm' / 'lstm_reverse' / 'lstm_l{k}' / 'lstm_l{k}_reverse' —
        # one direction of one layer of a torch nn.LSTM
        sfx = '_reverse' if kind.endswith('_reverse') else ''
        layer = 0
        if '_l' in kind:
            layer = int(kind.split('_l')[1].split('_')[0])
        out.append(('params', f'{flax_path}/weight_ih',
                    g(f'weight_ih_l{layer}{sfx}')))
        out.append(('params', f'{flax_path}/weight_hh',
                    g(f'weight_hh_l{layer}{sfx}')))
        out.append(('params', f'{flax_path}/bias_ih',
                    g(f'bias_ih_l{layer}{sfx}')))
        out.append(('params', f'{flax_path}/bias_hh',
                    g(f'bias_hh_l{layer}{sfx}')))
    elif kind == 'lstm_cell':
        out.append(('params', f'{flax_path}/weight_ih', g('weight_ih')))
        out.append(('params', f'{flax_path}/weight_hh', g('weight_hh')))
        out.append(('params', f'{flax_path}/bias_ih', g('bias_ih')))
        out.append(('params', f'{flax_path}/bias_hh', g('bias_hh')))
    elif kind == 'torch_mha':
        # torch nn.MultiheadAttention: packed in_proj (3E, E) rows [q;k;v]
        # -> separate linear_q/k/v + fc (out_proj)
        W = g('in_proj_weight')
        b = g('in_proj_bias')
        E = W.shape[1]
        for i, nm in enumerate(('linear_q', 'linear_k', 'linear_v')):
            out.append(('params', f'{flax_path}/{nm}/kernel',
                        t_linear(W[i * E:(i + 1) * E])))
            out.append(('params', f'{flax_path}/{nm}/bias',
                        b[i * E:(i + 1) * E]))
        out.append(('params', f'{flax_path}/fc/kernel',
                    t_linear(g('out_proj.weight'))))
        out.append(('params', f'{flax_path}/fc/bias', g('out_proj.bias')))
    elif kind == 'raw':
        out.append(('params', flax_path, g('')))
    else:
        raise ValueError(kind)
    return out


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       rules: Iterable[Tuple[str, str, str]]):
    """Apply rules -> {'params': {flat_path: arr}, 'batch_stats': {...}}."""
    flat = {'params': {}, 'batch_stats': {}}
    for torch_prefix, flax_path, kind in rules:
        for tree, path, arr in convert_module(state_dict, torch_prefix,
                                              flax_path, kind):
            flat[tree][path] = arr
    return flat


def merge_flat(variables, flat: Dict[str, Dict[str, np.ndarray]],
               strict: bool = True):
    """Merge flat {'params': {path: arr}} into a nested variables pytree."""
    import logging

    import jax.numpy as jnp

    def set_path(tree, path: str, value):
        parts = path.split('/')
        node = tree
        for part in parts[:-1]:
            node = node[part]
        leaf = node[parts[-1]]
        if leaf.shape != value.shape:
            raise ValueError(
                f'{path}: checkpoint shape {value.shape} != model shape '
                f'{leaf.shape}')
        node[parts[-1]] = jnp.asarray(value, leaf.dtype)

    # unfreeze-style: convert to plain nested dicts (leaves untouched —
    # materializing every parameter to host numpy here would force a
    # full device->host round trip for weights the merge never touches)
    def to_dict(t):
        if isinstance(t, dict):
            return {k: to_dict(v) for k, v in t.items()}
        return t

    out = to_dict(variables)
    missing = []
    for tree_name, entries in flat.items():
        tree = out.get(tree_name)
        if tree is None:
            if strict and entries:
                raise ValueError(f'variables has no {tree_name} collection')
            continue
        for path, arr in entries.items():
            try:
                set_path(tree, path, arr)
            except (KeyError, IndexError, TypeError):
                # TypeError/IndexError: a rule path descending into an
                # ndarray leaf — same 'path not in model' failure class
                if strict:
                    raise
                missing.append(path)
    if missing:
        logging.getLogger('tps_pp_tpu').warning(
            'checkpoint merge skipped %d paths not in the model '
            '(strict=False): %s%s', len(missing), missing[:5],
            ' ...' if len(missing) > 5 else '')
    return out


def resnet_abi_rules(prefix: str = 'backbone',
                     flax_prefix: str = 'backbone',
                     arch=(3, 4, 6, 6, 3)) -> List[Tuple[str, str, str]]:
    """Name map for ResNetABI / ResNetABI_v2_large
    (reference resnet_v2_large.py module names conv1/bn1/layer{i}.{j})."""
    rules = [
        (f'{prefix}.conv1', f'{flax_prefix}/conv1', 'conv'),
        (f'{prefix}.bn1', f'{flax_prefix}/bn1', 'bn'),
    ]
    for li, blocks in enumerate(arch):
        for b in range(blocks):
            tp = f'{prefix}.layer{li + 1}.{b}'
            fp = f'{flax_prefix}/layer{li + 1}/block{b}'
            rules += [
                (f'{tp}.conv1', f'{fp}/conv1', 'conv_nobias'),
                (f'{tp}.bn1', f'{fp}/bn1', 'bn'),
                (f'{tp}.conv2', f'{fp}/conv2', 'conv_nobias'),
                (f'{tp}.bn2', f'{fp}/bn2', 'bn'),
            ]
            # first block of a stage may carry a downsample
            rules += [
                (f'{tp}.downsample.0', f'{fp}/downsample_conv',
                 'conv_nobias'),
                (f'{tp}.downsample.1', f'{fp}/downsample_bn', 'bn'),
            ] if b == 0 else []
    return rules


def crnn_rules() -> List[Tuple[str, str, str]]:
    """VeryDeepVgg + CRNNDecoder (reference very_deep_vgg.py:27-64 names
    cnn.conv{i}/cnn.batchnorm{i}; crnn_decoder.py decoder.0/decoder.1)."""
    rules = []
    for i in range(7):
        rules.append((f'backbone.cnn.conv{i}', f'backbone/conv{i}', 'conv'))
    for i in (2, 4, 6):
        rules.append((f'backbone.cnn.batchnorm{i}',
                      f'backbone/batchnorm{i}', 'bn'))
    for j, name in ((0, 'rnn0'), (1, 'rnn1')):
        rules += [
            (f'decoder.decoder.{j}.rnn', f'decoder/{name}/fwd', 'lstm'),
            (f'decoder.decoder.{j}.rnn', f'decoder/{name}/bwd',
             'lstm_reverse'),
            (f'decoder.decoder.{j}.embedding', f'decoder/{name}/embedding',
             'linear'),
        ]
    return rules


def _tf_encoder_layer_rules(tp, fp):
    """reference TFEncoderLayer (transformer_layers.py:9-53)."""
    return [
        (f'{tp}.attn.linear_q', f'{fp}/attn/linear_q', 'linear_nobias'),
        (f'{tp}.attn.linear_k', f'{fp}/attn/linear_k', 'linear_nobias'),
        (f'{tp}.attn.linear_v', f'{fp}/attn/linear_v', 'linear_nobias'),
        (f'{tp}.attn.fc', f'{fp}/attn/fc', 'linear_nobias'),
        (f'{tp}.norm1', f'{fp}/norm1', 'ln'),
        (f'{tp}.norm2', f'{fp}/norm2', 'ln'),
        (f'{tp}.mlp.w_1', f'{fp}/mlp/w_1', 'linear'),
        (f'{tp}.mlp.w_2', f'{fp}/mlp/w_2', 'linear'),
    ]


def _tf_decoder_layer_rules(tp, fp):
    """reference TFDecoderLayer (transformer_layers.py:76-130)."""
    rules = []
    for attn in ('self_attn', 'enc_attn'):
        rules += [
            (f'{tp}.{attn}.linear_q', f'{fp}/{attn}/linear_q',
             'linear_nobias'),
            (f'{tp}.{attn}.linear_k', f'{fp}/{attn}/linear_k',
             'linear_nobias'),
            (f'{tp}.{attn}.linear_v', f'{fp}/{attn}/linear_v',
             'linear_nobias'),
            (f'{tp}.{attn}.fc', f'{fp}/{attn}/fc', 'linear_nobias'),
        ]
    rules += [
        (f'{tp}.norm1', f'{fp}/norm1', 'ln'),
        (f'{tp}.norm2', f'{fp}/norm2', 'ln'),
        (f'{tp}.norm3', f'{fp}/norm3', 'ln'),
        (f'{tp}.mlp.w_1', f'{fp}/mlp/w_1', 'linear'),
        (f'{tp}.mlp.w_2', f'{fp}/mlp/w_2', 'linear'),
    ]
    return rules


def tps_pp_rules(prefix='tpsnet', fp='tpsnet'):
    """TPS_PP module map (reference tps_pp.py:499-626 names -> ours)."""
    rules = []
    for name in ('down0', 'down1', 'down2', 'down0_1', 'down1_1',
                 'down_feat'):
        rules.append((f'{prefix}.{name}.conv', f'{fp}/{name}/conv', 'conv'))
    # MSFA encoder/decoder ConvModules (tps_pp.py:94-119)
    for i in range(4):
        rules.append((f'{prefix}.MSFA.conv.k_encoder.{i}.conv',
                      f'{fp}/MSFA/enc{i}/conv', 'conv'))
    for i in range(3):
        rules.append((f'{prefix}.MSFA.conv.k_decoder.{i}.1.conv',
                      f'{fp}/MSFA/dec{i}/conv', 'conv'))
    rules.append((f'{prefix}.MSFA.conv.k_decoder.3.1.conv',
                  f'{fp}/MSFA/dec3/conv', 'conv'))
    # CBAM (tps_pp.py:27-82)
    at, af = f'{prefix}.MSFA.conv.atten', f'{fp}/MSFA/atten'
    rules += [
        (f'{at}.channel_attention.shared_MLP.0',
         f'{af}/channel_attention/fc1', 'conv1x1_as_dense_nobias'),
        (f'{at}.channel_attention.shared_MLP.2',
         f'{af}/channel_attention/fc2', 'conv1x1_as_dense_nobias'),
        (f'{at}.spatial_attention.conv2d',
         f'{af}/spatial_attention/conv', 'conv'),
    ]
    # TPE (tps_pp.py:231-325) + DGAB (DGAB.py)
    tpe, tf = f'{prefix}.TPE', f'{fp}/TPE'
    rules += [
        (f'{tpe}.atten.0.norm1', f'{tf}/atten0/norm1', 'ln'),
        (f'{tpe}.atten.0.norm2', f'{tf}/atten0/norm2', 'ln'),
        (f'{tpe}.atten.0.attn.mlp_w.0', f'{tf}/atten0/attn/mlp_w',
         'linear_nobias'),
        (f'{tpe}.atten.0.attn.mlp_h.0', f'{tf}/atten0/attn/mlp_h',
         'linear_nobias'),
        (f'{tpe}.atten.0.attn.proj', f'{tf}/atten0/attn/proj', 'linear'),
        (f'{tpe}.atten.0.mlp.fc1', f'{tf}/atten0/mlp_fc1', 'linear'),
        (f'{tpe}.atten.0.mlp.fc2', f'{tf}/atten0/mlp_fc2', 'linear'),
        (f'{tpe}.localization_fc1.0', f'{tf}/loc_fc1_0', 'linear'),
        (f'{tpe}.localization_fc1.2', f'{tf}/loc_fc1_1', 'linear'),
        (f'{tpe}.localization_fc2', f'{tf}/loc_fc2', 'linear'),
        (f'{tpe}.p_linear.0', f'{tf}/p_linear_0', 'linear'),
        (f'{tpe}.p_linear.1', f'{tf}/p_linear_1', 'linear'),
        (f'{tpe}.feat_linear.0', f'{tf}/feat_linear_0', 'linear'),
        (f'{tpe}.feat_linear.1', f'{tf}/feat_linear_1', 'linear'),
    ]
    return rules


def nrtr_tps_pp_rules(n_enc=6, n_dec=6, arch=(3, 4, 6, 6, 3)):
    """Complete name map for the flagship NRTR+TPS++ checkpoint
    (reference configs/textrecog/nrtr/nrtr_tps++.py model)."""
    rules = resnet_abi_rules('backbone', 'backbone', arch)
    rules += tps_pp_rules('tpsnet', 'tpsnet')
    for i in range(n_enc):
        rules += _tf_encoder_layer_rules(f'encoder.layer_stack.{i}',
                                         f'encoder/layer{i}')
    rules.append(('encoder.layer_norm', 'encoder/layer_norm', 'ln'))
    for i in range(n_dec):
        rules += _tf_decoder_layer_rules(f'decoder.layer_stack.{i}',
                                         f'decoder/layer_stack_{i}')
    rules += [
        ('decoder.trg_word_emb', 'decoder/trg_word_emb', 'embed'),
        ('decoder.layer_norm', 'decoder/layer_norm', 'ln'),
        ('decoder.classifier', 'decoder/classifier', 'linear'),
    ]
    return rules


def sar_rules(n_layers=2):
    """SAREncoder (reference sar_encoder.py:53-69 rnn_encoder + linear) +
    ParallelSARDecoder (sar_decoder.py:27-135 conv1x1_1/conv3x3_1/conv1x1_2/
    rnn_decoder/embedding/prediction)."""
    rules = []
    for i in range(n_layers):
        rules.append(('encoder.rnn_encoder', f'encoder/rnn{i}_fwd',
                      f'lstm_l{i}' if i else 'lstm'))
    rules.append(('encoder.linear', 'encoder/linear', 'linear'))
    rules += [
        ('decoder.conv1x1_1', 'decoder/conv1x1_1', 'linear'),
        ('decoder.conv3x3_1', 'decoder/conv3x3_1', 'conv'),
        ('decoder.conv1x1_2', 'decoder/conv1x1_2', 'linear'),
        ('decoder.rnn_decoder', 'decoder/rnn0', 'lstm'),
        ('decoder.rnn_decoder', 'decoder/rnn1', 'lstm_l1'),
        ('decoder.embedding', 'decoder/embedding', 'embed'),
        ('decoder.prediction', 'decoder/prediction', 'linear'),
    ]
    return rules


def sequential_sar_rules():
    """SequentialSARDecoder (reference sar_decoder.py:269-347) -> our
    ParallelSARDecoder-alias params. The reference sequential class stores
    the SAME math under different parameter containers: LSTMCell pairs
    (rnn_decoder_layer1/2) instead of a 2-layer nn.LSTM, and 1x1 Conv2d
    attention projections (conv1x1_1/conv1x1_2) instead of Linears —
    torch LSTMCell and one layer of nn.LSTM share weight names/shapes, and
    a 1x1 conv IS a dense over channels, so both map losslessly."""
    return [
        ('decoder.conv1x1_1', 'decoder/conv1x1_1', 'conv1x1_as_dense'),
        ('decoder.conv3x3_1', 'decoder/conv3x3_1', 'conv'),
        ('decoder.conv1x1_2', 'decoder/conv1x1_2', 'conv1x1_as_dense'),
        ('decoder.rnn_decoder_layer1', 'decoder/rnn0', 'lstm_cell'),
        ('decoder.rnn_decoder_layer2', 'decoder/rnn1', 'lstm_cell'),
        ('decoder.embedding', 'decoder/embedding', 'embed'),
        ('decoder.prediction', 'decoder/prediction', 'linear'),
    ]


def satrn_rules(n_layers=12, prefix='encoder', fp='encoder'):
    """SatrnEncoder (reference satrn_encoder.py:13-85 + satrn_layers.py:
    Adaptive2DPositionalEncoding scale convs, SatrnEncoderLayer attn +
    LocalityAwareFeedforward ConvModules)."""
    pe = f'{prefix}.position_enc'
    rules = [
        (f'{pe}.h_scale.0', f'{fp}/position_enc/h_scale_0', 'conv'),
        (f'{pe}.h_scale.2', f'{fp}/position_enc/h_scale_1', 'conv'),
        (f'{pe}.w_scale.0', f'{fp}/position_enc/w_scale_0', 'conv'),
        (f'{pe}.w_scale.2', f'{fp}/position_enc/w_scale_1', 'conv'),
    ]
    for i in range(n_layers):
        tp, lp = f'{prefix}.layer_stack.{i}', f'{fp}/layer{i}'
        rules += [
            (f'{tp}.norm1', f'{lp}/norm1', 'ln'),
            (f'{tp}.norm2', f'{lp}/norm2', 'ln'),
            (f'{tp}.attn.linear_q', f'{lp}/attn/linear_q', 'linear_nobias'),
            (f'{tp}.attn.linear_k', f'{lp}/attn/linear_k', 'linear_nobias'),
            (f'{tp}.attn.linear_v', f'{lp}/attn/linear_v', 'linear_nobias'),
            (f'{tp}.attn.fc', f'{lp}/attn/fc', 'linear_nobias'),
            (f'{tp}.feed_forward.conv1.conv', f'{lp}/feed_forward/conv1/conv',
             'conv_nobias'),
            (f'{tp}.feed_forward.conv1.bn', f'{lp}/feed_forward/conv1/bn',
             'bn'),
            (f'{tp}.feed_forward.depthwise_conv.conv',
             f'{lp}/feed_forward/depthwise_conv', 'conv_nobias'),
            (f'{tp}.feed_forward.depthwise_conv.bn',
             f'{lp}/feed_forward/depthwise_bn', 'bn'),
            (f'{tp}.feed_forward.conv2.conv', f'{lp}/feed_forward/conv2/conv',
             'conv_nobias'),
            (f'{tp}.feed_forward.conv2.bn', f'{lp}/feed_forward/conv2/bn',
             'bn'),
        ]
    rules.append((f'{prefix}.layer_norm', f'{fp}/layer_norm', 'ln'))
    return rules


def robust_scanner_rules(rnn_layers=2):
    """ChannelReductionEncoder + RobustScannerDecoder (reference
    channel_reduction_encoder.py:24, sequence_attention_decoder.py:69-85,
    position_attention_decoder.py:62-73, robust_scanner_decoder.py:75-93,
    position_aware_layer.py:12-24, robust_scanner_fusion_layer.py:15)."""
    rules = [('encoder.layer', 'encoder/layer', 'conv')]
    hd = 'decoder.hybrid_decoder'
    rules.append((f'{hd}.embedding', 'decoder/hybrid/embedding', 'embed'))
    for i in range(rnn_layers):
        rules.append((f'{hd}.sequence_layer', f'decoder/hybrid/rnns_{i}',
                      f'lstm_l{i}' if i else 'lstm'))
    pd = 'decoder.position_decoder'
    rules.append((f'{pd}.embedding', 'decoder/position/embedding', 'embed'))
    for i in range(rnn_layers):
        rules.append(
            (f'{pd}.position_aware_module.rnn',
             f'decoder/position/position_aware_module/rnn{i}',
             f'lstm_l{i}' if i else 'lstm'))
    rules += [
        (f'{pd}.position_aware_module.mixer.0',
         'decoder/position/position_aware_module/mixer0', 'conv'),
        (f'{pd}.position_aware_module.mixer.2',
         'decoder/position/position_aware_module/mixer1', 'conv'),
        ('decoder.fusion_module.linear_layer',
         'decoder/fusion_module/linear_layer', 'linear'),
        ('decoder.prediction', 'decoder/prediction', 'linear'),
    ]
    return rules


def _mmcv_btl_rules(tp, fp):
    """One mmcv BaseTransformerLayer ('*_attn','norm','ffn','norm') ->
    our post-norm layer params (attn via torch_mha, ffns.0.layers...)."""
    return [
        (f'{tp}.attentions.0.attn', f'{fp}@attn', 'torch_mha'),
        (f'{tp}.norms.0', f'{fp}@norm1', 'ln'),
        (f'{tp}.norms.1', f'{fp}@norm2', 'ln'),
        (f'{tp}.ffns.0.layers.0.0', f'{fp}@ffn1', 'linear'),
        (f'{tp}.ffns.0.layers.1', f'{fp}@ffn2', 'linear'),
    ]


def abinet_rules(n_enc_layers=3, n_lang_layers=4,
                 enc_tp='encoder.transformer', enc_fp='encoder/layer',
                 vis_tp='vision', vis_fp='vision',
                 lang_tp='language', lang_fp='language',
                 fuser_tp='fuser', fuser_fp='fuser'):
    """ABINet: TransformerEncoder (reference encoders/transformer.py:12-82)
    + ABIVisionDecoder (abinet_vision_decoder.py) + ABILanguageDecoder
    (abinet_language_decoder.py) + ABIFuser (abi_fuser.py).

    Default prefixes address standalone components (the parity tests);
    a full released ABINet recognizer checkpoint nests the vision model
    (reference abinet.py:58-91 + abinet_vision_model.py:26-27) — use
    enc_tp='encoder.encoder.transformer', vis_tp='encoder.decoder',
    lang_tp='decoder' (rules_for_config does)."""
    rules = []
    for i in range(n_enc_layers):
        for tp, fp, kind in _mmcv_btl_rules(f'{enc_tp}.{i}',
                                            f'{enc_fp}{i}'):
            fp = (fp.replace('@attn', '/attn')
                  .replace('@norm1', '/norm1').replace('@norm2', '/norm2')
                  .replace('@ffn1', '/ffn_fc1').replace('@ffn2', '/ffn_fc2'))
            rules.append((tp, fp, kind))
    # vision decoder mini-UNet + projections
    for i in range(4):
        rules += [
            (f'{vis_tp}.k_encoder.{i}.conv', f'{vis_fp}/k_enc{i}/conv',
             'conv_nobias'),
            (f'{vis_tp}.k_encoder.{i}.bn', f'{vis_fp}/k_enc{i}/bn', 'bn'),
            (f'{vis_tp}.k_decoder.{i}.1.conv', f'{vis_fp}/k_dec{i}/conv',
             'conv_nobias'),
            (f'{vis_tp}.k_decoder.{i}.1.bn', f'{vis_fp}/k_dec{i}/bn', 'bn'),
        ]
    rules += [
        (f'{vis_tp}.project', f'{vis_fp}/project', 'linear'),
        (f'{vis_tp}.cls', f'{vis_fp}/cls', 'linear'),
    ]
    # language decoder
    rules.append((f'{lang_tp}.proj', f'{lang_fp}/proj', 'linear_nobias'))
    for i in range(n_lang_layers):
        for tp, fp, kind in _mmcv_btl_rules(f'{lang_tp}.decoder_layers.{i}',
                                            lang_fp):
            fp = (fp.replace('@attn', f'/cross{i}')
                  .replace('@norm1', f'/norm{i}_1')
                  .replace('@norm2', f'/norm{i}_2')
                  .replace('@ffn1', f'/ffn{i}_fc1')
                  .replace('@ffn2', f'/ffn{i}_fc2'))
            rules.append((tp, fp, kind))
    rules.append((f'{lang_tp}.cls', f'{lang_fp}/cls', 'linear'))
    rules += [
        (f'{fuser_tp}.w_att', f'{fuser_fp}/w_att', 'linear'),
        (f'{fuser_tp}.cls', f'{fuser_fp}/cls', 'linear'),
    ]
    return rules


def resnet31_rules(prefix: str = 'backbone', fp: str = 'backbone',
                   layers=(1, 2, 5, 3)) -> List[Tuple[str, str, str]]:
    """ResNet31OCR (reference resnet31_ocr.py:46-93 names conv1_1/bn1_1,
    conv1_2/bn1_2, block{2..5}.{b}.*, conv{2..5}/bn{2..5}) — the NRTR/SAR/
    SATRN-alt/RobustScanner/seg standard backbone."""
    rules = [
        (f'{prefix}.conv1_1', f'{fp}/stem1/conv', 'conv'),
        (f'{prefix}.bn1_1', f'{fp}/stem1/bn', 'bn'),
        (f'{prefix}.conv1_2', f'{fp}/stem2/conv', 'conv'),
        (f'{prefix}.bn1_2', f'{fp}/stem2/bn', 'bn'),
    ]
    for si, blocks in enumerate(layers):
        k = si + 2
        for b in range(blocks):
            tp, bp = f'{prefix}.block{k}.{b}', f'{fp}/block{k}/block{b}'
            rules += [
                (f'{tp}.conv1', f'{bp}/conv1', 'conv_nobias'),
                (f'{tp}.bn1', f'{bp}/bn1', 'bn'),
                (f'{tp}.conv2', f'{bp}/conv2', 'conv_nobias'),
                (f'{tp}.bn2', f'{bp}/bn2', 'bn'),
                # channel-change blocks carry a 1x1 downsample
                (f'{tp}.downsample.0', f'{bp}/downsample_conv',
                 'conv_nobias'),
                (f'{tp}.downsample.1', f'{bp}/downsample_bn', 'bn'),
            ]
        rules += [
            (f'{prefix}.conv{k}', f'{fp}/conv{k}/conv', 'conv'),
            (f'{prefix}.bn{k}', f'{fp}/conv{k}/bn', 'bn'),
        ]
    return rules


def nrtr_modality_rules(prefix: str = 'backbone',
                        fp: str = 'backbone') -> List[Tuple[str, str, str]]:
    """NRTRModalityTransform (reference nrtr_modality_transformer.py:19-37:
    conv_1/bn_1/conv_2/bn_2/linear)."""
    return [
        (f'{prefix}.conv_1', f'{fp}/conv_1', 'conv'),
        (f'{prefix}.bn_1', f'{fp}/bn_1', 'bn'),
        (f'{prefix}.conv_2', f'{fp}/conv_2', 'conv'),
        (f'{prefix}.bn_2', f'{fp}/bn_2', 'bn'),
        (f'{prefix}.linear', f'{fp}/linear', 'linear'),
    ]


def shallow_cnn_rules(prefix: str = 'backbone',
                      fp: str = 'backbone') -> List[Tuple[str, str, str]]:
    """ShallowCNN (reference shallow_cnn.py:34-52: two mmcv ConvModules
    conv1/conv2, each conv+bn)."""
    return [
        (f'{prefix}.conv1.conv', f'{fp}/conv1', 'conv_nobias'),
        (f'{prefix}.conv1.bn', f'{fp}/bn1', 'bn'),
        (f'{prefix}.conv2.conv', f'{fp}/conv2', 'conv_nobias'),
        (f'{prefix}.conv2.bn', f'{fp}/bn2', 'bn'),
    ]


def tps_preprocessor_rules(prefix: str = 'preprocessor',
                           fp: str = 'preprocessor'
                           ) -> List[Tuple[str, str, str]]:
    """Classic RARE TPS-STN (reference tps_preprocessor.py:101-128:
    LocalizationNetwork.conv Sequential [conv,bn,relu,pool]x3+[conv,bn,
    relu,adaptivepool] + localization_fc1.0 + localization_fc2; the
    GridGenerator holds only static buffers — nothing to convert)."""
    ln = f'{prefix}.LocalizationNetwork'
    fl = f'{fp}/localization'
    rules = []
    for i, idx in enumerate((0, 4, 8, 12)):
        rules += [
            (f'{ln}.conv.{idx}', f'{fl}/conv{i}', 'conv_nobias'),
            (f'{ln}.conv.{idx + 1}', f'{fl}/bn{i}', 'bn'),
        ]
    rules += [
        (f'{ln}.localization_fc1.0', f'{fl}/fc1', 'linear'),
        (f'{ln}.localization_fc2', f'{fl}/fc2', 'linear'),
    ]
    return rules


def nrtr_decoder_rules(n_dec: int = 6) -> List[Tuple[str, str, str]]:
    """NRTRDecoder/TFDecoder alone (reference nrtr_decoder.py:14-129)."""
    rules = []
    for i in range(n_dec):
        rules += _tf_decoder_layer_rules(f'decoder.layer_stack.{i}',
                                         f'decoder/layer_stack_{i}')
    rules += [
        ('decoder.trg_word_emb', 'decoder/trg_word_emb', 'embed'),
        ('decoder.layer_norm', 'decoder/layer_norm', 'ln'),
        ('decoder.classifier', 'decoder/classifier', 'linear'),
    ]
    return rules


def rules_for_config(model_cfg: Dict) -> List[Tuple[str, str, str]]:
    """Auto-assemble the complete rule table for a reference model config
    (the one-command conversion path: tools/convert_checkpoint.py and
    init_recognizer(checkpoint='*.pth')). Components are keyed on the
    config's reference ``type=`` names; layer counts and archs are read
    from the config so satrn_small (6 layers) vs satrn_academic (12)
    resolve correctly. Composable families:

      backbone: VeryDeepVgg · ResNet31OCR · ResNetABI[_v2_large] ·
                NRTRModalityTransform · ShallowCNN
      rectifier: tpsnet (TPS_PP) · preprocessor (TPSPreprocessor)
      heads: NRTR/TFDecoder transformer · CRNN BiLSTM · SAR (parallel/
             sequential/beam-search aliases) · RobustScanner · ABINet

    Use ``filter_rules_to_state`` on the result — optional submodules
    (downsamples, preprocessors) drop out against the real state_dict.
    """
    def _t(key):
        sub = model_cfg.get(key) or {}
        return sub.get('type') if isinstance(sub, dict) else None

    rules: List[Tuple[str, str, str]] = []
    bb_cfg = model_cfg.get('backbone') or {}
    bb = bb_cfg.get('type')
    if bb == 'VeryDeepVgg':
        pass   # covered by crnn_rules below (backbone+decoder table)
    elif bb == 'ResNet31OCR':
        rules += resnet31_rules(layers=tuple(bb_cfg.get('layers',
                                                        (1, 2, 5, 3))))
    elif bb in ('ResNetABI', 'ResNetABI_v2_large'):
        rules += resnet_abi_rules(
            arch=tuple(bb_cfg.get('arch_settings', (3, 4, 6, 6, 3))))
    elif bb == 'NRTRModalityTransform':
        rules += nrtr_modality_rules()
    elif bb == 'ShallowCNN':
        rules += shallow_cnn_rules()
    elif bb is not None:
        raise ValueError(f'no conversion rules for backbone type {bb!r}')

    if model_cfg.get('tpsnet'):
        rules += tps_pp_rules('tpsnet', 'tpsnet')
    if _t('preprocessor') == 'TPSPreprocessor':
        rules += tps_preprocessor_rules()

    enc, dec = _t('encoder'), _t('decoder')
    enc_cfg = model_cfg.get('encoder') or {}
    dec_cfg = model_cfg.get('decoder') or {}
    if dec == 'CRNNDecoder':
        rules += crnn_rules()   # includes the VGG backbone table
    if enc == 'NRTREncoder':
        for i in range(int(enc_cfg.get('n_layers', 6))):
            rules += _tf_encoder_layer_rules(f'encoder.layer_stack.{i}',
                                             f'encoder/layer{i}')
        rules.append(('encoder.layer_norm', 'encoder/layer_norm', 'ln'))
    elif enc == 'SatrnEncoder':
        rules += satrn_rules(n_layers=int(enc_cfg.get('n_layers', 12)))
    elif enc == 'SAREncoder':
        rules += [r for r in sar_rules() if r[0].startswith('encoder.')]
    elif enc == 'ChannelReductionEncoder':
        rules.append(('encoder.layer', 'encoder/layer', 'conv'))
    if dec in ('NRTRDecoder', 'TFDecoder', 'TFCommonDecoder'):
        rules += nrtr_decoder_rules(int(dec_cfg.get('n_layers', 6)))
    elif dec in ('ParallelSARDecoder', 'ParallelSARDecoderWithBS'):
        rules += [r for r in sar_rules() if r[0].startswith('decoder.')]
    elif dec == 'SequentialSARDecoder':
        rules += sequential_sar_rules()
    elif dec == 'RobustScannerDecoder':
        rules += [r for r in robust_scanner_rules()
                  if r[0].startswith('decoder.')]

    if model_cfg.get('type') == 'ABINet':
        # encoder=ABIVisionModel nests the TransformerEncoder config
        n_enc = int((enc_cfg.get('encoder') or {}).get('n_layers', 3))
        n_lang = int(dec_cfg.get('n_layers', 4))
        rules += abinet_rules(
            n_enc_layers=n_enc, n_lang_layers=n_lang,
            enc_tp='encoder.encoder.transformer', enc_fp='encoder/enc/layer',
            vis_tp='encoder.decoder', vis_fp='encoder/dec',
            lang_tp='decoder', lang_fp='decoder')

    if not rules:
        raise ValueError(
            f"no conversion rules derivable from model config "
            f"type={model_cfg.get('type')!r}")
    # de-dup while preserving order (VGG backbone may be added twice)
    seen, out = set(), []
    for r in rules:
        if r not in seen:
            seen.add(r)
            out.append(r)
    return out


def convert_checkpoint(state_dict: Dict[str, np.ndarray], rec, variables,
                       rules=None, strict_coverage: bool = True):
    """state_dict + built recognizer -> merged variables.

    Auto-selects rules from ``rec.cfg`` (the model config the recognizer
    was built from) when not given; raises if the checkpoint leaves model
    params uncovered (strict_coverage) so a wrong config/checkpoint
    pairing fails loudly instead of predicting garbage."""
    rules = rules if rules is not None else rules_for_config(rec.cfg)
    rules = filter_rules_to_state(rules, state_dict)
    flat = convert_state_dict(state_dict, rules)
    merged = merge_flat(variables, flat)
    if strict_coverage:
        def leaf_paths(t, prefix=''):
            if isinstance(t, dict):
                out = set()
                for k, v in t.items():
                    out |= leaf_paths(v, f'{prefix}/{k}' if prefix else k)
                return out
            return {prefix}
        missing = leaf_paths(variables.get('params', {})) \
            - set(flat['params'])
        if missing:
            raise ValueError(
                f'{len(missing)} model params not covered by the '
                f'checkpoint (config/checkpoint mismatch?): '
                f'{sorted(missing)[:8]}')
    return merged


def filter_rules_to_state(rules, state_dict):
    """Drop rules whose torch keys are absent (e.g. downsample-less
    blocks)."""
    kept = []
    import re as _re
    for tp, fp, kind in rules:
        m = _re.fullmatch(r'lstm(?:_l(\d+))?(_reverse)?', kind)
        if m:   # any layer index, fwd or reverse
            probe = (f"weight_ih_l{m.group(1) or 0}"
                     f"{'_reverse' if m.group(2) else ''}")
        else:
            probe = {'conv': 'weight', 'conv_nobias': 'weight',
                     'conv1x1_as_dense': 'weight',
                     'conv1x1_as_dense_nobias': 'weight',
                     'linear': 'weight', 'linear_nobias': 'weight',
                     'bn': 'weight', 'ln': 'weight', 'embed': 'weight',
                     'lstm_cell': 'weight_ih',
                     'torch_mha': 'in_proj_weight',
                     'raw': ''}[kind]
        key = f'{tp}.{probe}' if probe else tp
        if key in state_dict:
            kept.append((tp, fp, kind))
    return kept


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy (handles mmcv's {'state_dict': ...}
    wrapper and 'module.' DDP prefixes)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        out[k] = v.detach().cpu().numpy()
    return out
