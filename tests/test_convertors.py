"""Codec unit tests — token layout parity with the reference convertors
(reference tests analog: tests/test_models/test_label_convertor/*)."""
import numpy as np
import pytest

from tps_pp_tpu.convertors import (ABIConvertor, AttnConvertor, BaseConvertor,
                                   CTCConvertor)


def test_dict_sizes():
    assert len(BaseConvertor.DICT36) == 36
    assert len(BaseConvertor.DICT90) == 90


def test_attn_convertor_token_layout():
    c = AttnConvertor(dict_type='DICT90', with_unknown=True, max_seq_len=40)
    # layout: 90 chars, <UKN>=90, <BOS/EOS>=91, <PAD>=92 (reference
    # attn.py:48-73; nrtr configs assume num_classes=93)
    assert c.num_classes() == 93
    assert c.unknown_idx == 90
    assert c.start_idx == 91 and c.end_idx == 91
    assert c.padding_idx == 92


def test_attn_convertor_start_end_not_same():
    c = AttnConvertor(dict_type='DICT36', with_unknown=False,
                      start_end_same=False)
    assert c.start_idx == 36 and c.end_idx == 37 and c.padding_idx == 38


def test_attn_str2tensor_roundtrip():
    c = AttnConvertor(dict_type='DICT90', with_unknown=True, max_seq_len=10)
    out = c.str2tensor(['ab', 'Z!'])
    pt = out['padded_targets']
    assert pt.shape == (2, 10)
    assert pt[0, 0] == c.start_idx
    assert pt[0, 3] == c.end_idx
    assert pt[0, 4] == c.padding_idx
    # greedy decode of one-hot scores recovers the string
    scores = np.zeros((1, 10, c.num_classes()), np.float32)
    for t, ch in enumerate('ab'):
        scores[0, t, c.char2idx[ch]] = 1.0
    scores[0, 2, c.end_idx] = 1.0
    scores[0, 3:, c.padding_idx] = 1.0
    idxs, _ = c.tensor2idx(scores)
    assert c.idx2str(idxs) == ['ab']


def test_ctc_convertor_layout_and_collapse():
    c = CTCConvertor(dict_type='DICT36', with_unknown=False, lower=True)
    assert c.blank_idx == 0
    assert c.char2idx['0'] == 1  # shifted by blank
    assert c.num_classes() == 37
    # greedy collapse: blanks and repeats removed
    T, C = 8, c.num_classes()
    scores = np.zeros((1, T, C), np.float32)
    seq = [c.char2idx['h'], 0, c.char2idx['i'], c.char2idx['i'], 0, 0,
           c.char2idx['i'], 0]
    for t, k in enumerate(seq):
        scores[0, t, k] = 5.0
    idxs, _ = c.tensor2idx(scores, [{'valid_ratio': 1.0}])
    assert c.idx2str(idxs) == ['hii']
    # valid_ratio clips decode length (reference ctc.py:119-126)
    idxs, _ = c.tensor2idx(scores, [{'valid_ratio': 0.25}])
    assert c.idx2str(idxs) == ['h']


def test_ctc_str2tensor():
    c = CTCConvertor(dict_type='DICT36', with_unknown=False, lower=True)
    out = c.str2tensor(['ab', 'c'])
    assert out['target_lengths'].tolist() == [2, 1]
    assert out['flatten_targets'].tolist() == [
        c.char2idx['a'], c.char2idx['b'], c.char2idx['c']]
    assert out['padded_targets'].shape == (2, 40)


def test_abi_convertor_targets_end_with_eos():
    c = ABIConvertor(dict_type='DICT36', with_unknown=False, max_seq_len=6,
                     lower=True)
    out = c.str2tensor(['abc', 'toolongword'])
    assert out['targets'][0].tolist()[-1] == c.end_idx
    assert out['padded_targets'][0, 3] == c.end_idx
    # truncation keeps max_seq_len-1 chars + EOS
    assert len(out['targets'][1]) == 6
    assert out['targets'][1][-1] == c.end_idx


def test_unknown_char_raises_without_ukn():
    c = AttnConvertor(dict_type='DICT36', with_unknown=False)
    with pytest.raises(ValueError):
        c.str2idx(['@'])


def test_mask_convertors():
    from tps_pp_tpu.convertors import MaskCTCConvertor, Mask_ABIConvertor
    c = MaskCTCConvertor(dict_type='DICT36', with_unknown=True, lower=True)
    out = c.str2tensor_mask(['abc'], [[1]])
    assert out['masked_targets'][0][1] == c.unknown_idx
    assert out['masked_targets'][0][0] == c.char2idx['a']
    assert out['other_targets'][0][0] == c.unknown_idx
    assert out['other_targets'][0][1] == c.char2idx['b']
    m = Mask_ABIConvertor(dict_type='DICT36', with_unknown=True, lower=True)
    out = m.str2tensor_mask(['abc'], [[0]])
    assert out['masked_targets'][0][0] == m.unknown_idx
