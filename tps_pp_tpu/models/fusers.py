"""ABIFuser — gated blend of vision and language features
(reference ``fusers/abi_fuser.py:10-51``)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import FUSERS


@FUSERS.register_module()
class ABIFuser(nn.Module):
    d_model: int = 512
    max_seq_len: int = 40
    num_chars: int = 90
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, l_feature, v_feature):
        f = jnp.concatenate([l_feature, v_feature], axis=2)
        f_att = jax.nn.sigmoid(
            nn.Dense(self.d_model, dtype=self.dtype, name='w_att')(f))
        output = f_att * v_feature + (1 - f_att) * l_feature
        logits = nn.Dense(self.num_chars, dtype=self.dtype,
                          name='cls')(output)
        return {'logits': logits, 'feature': output}
