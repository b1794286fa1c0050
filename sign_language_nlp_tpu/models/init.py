"""Parameter initializers matching the torch modules the reference
builds on, so training dynamics are comparable fit-for-fit:

  * torch Linear: kernel & bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  * torch RNN/LSTM/GRU: all weights & biases ~ U(-1/sqrt(H), 1/sqrt(H))
  * torch Embedding: N(0, 1)
  * torch nn.Transformer: Xavier-uniform on matrices
    (torch _reset_parameters), Linear-default on biases
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax


def uniform_init(limit: float):
    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def torch_dense(features: int, in_features: int, use_bias: bool = True,
                name: str | None = None, xavier: bool = False,
                dtype=None) -> nn.Dense:
    """A Dense layer initialized like torch nn.Linear (or with
    Xavier-uniform kernels for transformer blocks). `dtype` is the
    compute dtype (params stay float32; bfloat16 compute engages the
    MXU's high-throughput path)."""
    k = 1.0 / math.sqrt(in_features)
    kernel_init = (nn.initializers.xavier_uniform() if xavier
                   else uniform_init(k))
    return nn.Dense(features, use_bias=use_bias, kernel_init=kernel_init,
                    bias_init=uniform_init(k), name=name, dtype=dtype)


def embedding_init():
    return nn.initializers.normal(stddev=1.0)


def rnn_uniform(hidden_size: int):
    return uniform_init(1.0 / math.sqrt(hidden_size))
