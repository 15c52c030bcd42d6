"""ABINet codec: AttnConvertor variant matching ABINet's target format.

Mirrors reference ``convertors/abi.py:28-68``: targets are char indexes
(truncated to max_seq_len-1) followed by EOS; padded_targets pad with EOS
(no BOS prefix, unlike AttnConvertor).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..registry import CONVERTORS
from .attn import AttnConvertor


@CONVERTORS.register_module()
class ABIConvertor(AttnConvertor):

    def str2tensor(self, strings: List[str]):
        indexes = self.str2idx(strings)
        padded = np.full((len(strings), self.max_seq_len), self.end_idx,
                         dtype=np.int32)
        targets = []
        lengths = np.zeros((len(strings),), dtype=np.int32)
        for i, index in enumerate(indexes):
            src = list(index[:self.max_seq_len - 1]) + [self.end_idx]
            targets.append(np.asarray(src, dtype=np.int32))
            n = min(len(src), self.max_seq_len)
            padded[i, :n] = src[:n]
            lengths[i] = n
        return {'targets': targets, 'padded_targets': padded,
                'target_lengths': lengths}
