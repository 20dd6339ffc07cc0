"""LSTM cell with TF1 weight conventions.

The reference's generator decodes with ``tf.nn.rnn_cell.LSTMCell`` /
``BasicLSTMCell`` (SURVEY.md §2.1 #4). For bit-comparable outputs on
converted reference checkpoints (BASELINE.json:5, SURVEY.md §7 hard part #3)
this cell reproduces TF1's exact conventions:

  - single kernel of shape ``[input_dim + hidden, 4*hidden]`` applied to
    ``concat([x, h])``;
  - gate order **i, j, f, o** (input, candidate, forget, output);
  - ``forget_bias`` (default 1.0) added to the forget-gate pre-activation
    and NOT stored in the bias variable.

so a reference checkpoint's kernel/bias arrays drop in unchanged.

TPU note: the four gate matmuls are one fused ``[B, I+H] @ [I+H, 4H]``
matmul — a single MXU call per step; the 3-step decode unrolls statically
under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TF1LSTMCell(nn.Module):
    """LSTM cell matching tf.compat.v1.nn.rnn_cell.BasicLSTMCell semantics."""

    hidden: int
    forget_bias: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        concat = jnp.concatenate([x, h], axis=-1).astype(self.dtype)
        kernel = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (concat.shape[-1], 4 * self.hidden),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (4 * self.hidden,), self.param_dtype
        )
        gates = concat @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        i, j, f, o = jnp.split(gates, 4, axis=-1)  # TF1 i,j,f,o order
        new_c = c * nn.sigmoid(f + self.forget_bias) + nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * nn.sigmoid(o)
        return (new_c, new_h), new_h
