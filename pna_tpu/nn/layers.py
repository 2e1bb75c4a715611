"""Generic NN building blocks — TPU-native equivalents of ``models/layers.py``.

Parity notes (reference: models/layers.py):
* ``FCLayer`` order is Linear -> activation -> dropout -> batchnorm
  (models/layers.py:181-192), with xavier-uniform init at gain 1/in_size and zero
  bias (models/layers.py:174-177).
* ``MLP`` chains FCLayers with mid/last activation & batch-norm flags
  (models/layers.py:200-234).
* ``GRU``/``Set2Set`` replace cuDNN RNNs with flax cells under ``lax.scan`` —
  sequential but tiny; the Set2Set attention matmuls run on the MXU.
* BatchNorm matches torch BatchNorm1d defaults (momentum 0.1 torch == 0.9 flax,
  eps 1e-5).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def xavier_uniform_gain(gain: float):
    """torch.nn.init.xavier_uniform_ with explicit gain: U(-a, a),
    a = gain * sqrt(6 / (fan_in + fan_out)).  FCLayer uses gain = 1/in_size
    (models/layers.py:174-177)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)
    return init


def torch_linear_init():
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in); used by GCN/readout layers that keep torch defaults."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def get_activation(name: Optional[str]) -> Optional[Callable]:
    """Activation lookup matching SUPPORTED_ACTIVATION_MAP (models/layers.py:5-20).
    LeakyReLU uses the torch default negative_slope=0.01."""
    if name is None or callable(name):
        return name
    key = name.lower()
    table = {
        'relu': jax.nn.relu,
        'sigmoid': jax.nn.sigmoid,
        'tanh': jnp.tanh,
        'elu': jax.nn.elu,
        'selu': jax.nn.selu,
        'glu': jax.nn.glu,
        'leakyrelu': lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
        'softplus': jax.nn.softplus,
        'none': None,
    }
    if key not in table:
        raise ValueError(f"Unhandled activation function: {name}")
    return table[key]


class BatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis with torch BatchNorm1d defaults.

    ``axis_name`` psums batch statistics over the named mesh axes so
    data-parallel training matches single-device statistics."""
    momentum: float = 0.9  # flax convention == torch momentum 0.1
    eps: float = 1e-5
    axis_name: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=self.momentum, epsilon=self.eps,
                            axis_name=self.axis_name)(x)


class FCLayer(nn.Module):
    """Linear -> activation -> dropout -> batchnorm (models/layers.py:101-197)."""
    out_size: int
    activation: Optional[str] = 'relu'
    dropout: float = 0.0
    b_norm: bool = False
    bias: bool = True
    init_gain_inverse_in: bool = True  # xavier gain = 1/in_size (reference default)
    bn_axis_name: Optional[Any] = None  # cross-device BN statistics

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = x.shape[-1]
        kernel_init = (xavier_uniform_gain(1.0 / in_size)
                       if self.init_gain_inverse_in else torch_linear_init())
        h = nn.Dense(self.out_size, use_bias=self.bias,
                     kernel_init=kernel_init,
                     bias_init=nn.initializers.zeros)(x)
        act = get_activation(self.activation)
        if act is not None:
            h = act(h)
        if self.dropout:
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        if self.b_norm:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.bn_axis_name)(h)
        return h


class MLP(nn.Module):
    """Stack of FCLayers (models/layers.py:200-234)."""
    hidden_size: int
    out_size: int
    layers: int
    mid_activation: str = 'relu'
    last_activation: Optional[str] = 'none'
    dropout: float = 0.0
    mid_b_norm: bool = False
    last_b_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.layers <= 1:
            return FCLayer(self.out_size, activation=self.last_activation,
                           b_norm=self.last_b_norm, dropout=self.dropout)(x, train)
        x = FCLayer(self.hidden_size, activation=self.mid_activation,
                    b_norm=self.mid_b_norm, dropout=self.dropout)(x, train)
        for _ in range(self.layers - 2):
            x = FCLayer(self.hidden_size, activation=self.mid_activation,
                        b_norm=self.mid_b_norm, dropout=self.dropout)(x, train)
        return FCLayer(self.out_size, activation=self.last_activation,
                       b_norm=self.last_b_norm, dropout=self.dropout)(x, train)


class GRUUpdate(nn.Module):
    """Shared GRU update between conv layers.

    Reference wraps nn.GRU over a length-1 sequence with B*N as batch
    (models/layers.py:237-268 and realworld_benchmark/nets/gru.py:5-27), i.e. a
    plain GRU cell per node.  Works on [..., D] — leading dims are flattened.
    ``x`` is the input (conv output y in gnn_framework.py:94), ``h`` the hidden
    state (previous node features).
    """
    hidden_size: int

    @nn.compact
    def __call__(self, h, y):
        shape = h.shape
        h2 = h.reshape(-1, shape[-1])
        y2 = y.reshape(-1, y.shape[-1])
        # reference pads input/hidden up to input_size/hidden_size with zeros
        # (models/layers.py:258-261)
        if h2.shape[-1] < self.hidden_size:
            h2 = jnp.pad(h2, ((0, 0), (0, self.hidden_size - h2.shape[-1])))
        if y2.shape[-1] < self.hidden_size:
            y2 = jnp.pad(y2, ((0, 0), (0, self.hidden_size - y2.shape[-1])))
        # reference: gru(input=x, hidden=y) at models/layers.py:263 — the *input*
        # is the previous state x and the *hidden* is the conv output y.
        new = nn.GRUCell(features=self.hidden_size)(y2, h2)[0]
        return new.reshape(shape[:-1] + (self.hidden_size,))


class _Set2SetStep(nn.Module):
    """One Set2Set iteration: LSTM -> attention over nodes -> readout concat.
    Wrapped by nn.scan in Set2Set (params broadcast across steps)."""

    @nn.compact
    def __call__(self, carry, inputs):
        x, mask = inputs
        (c, h), q_star = carry
        (c, h), q = nn.OptimizedLSTMCell(features=x.shape[-1],
                                         name='lstm')((c, h), q_star)
        e = jnp.einsum('bnd,bd->bn', x, q)
        if mask is not None:
            e = jnp.where(mask, e, -jnp.inf)
        a = jax.nn.softmax(e, axis=1)
        r = jnp.einsum('bn,bnd->bd', a, x)
        q_star = jnp.concatenate([q, r], axis=-1)
        return ((c, h), q_star), ()


class Set2Set(nn.Module):
    """Set2Set pooling (models/layers.py:22-98): LSTM-attention over node sets.

    x: [B, N, D] -> [B, 2*D].  ``steps`` defaults to N.  ``mask`` [B, N]
    excludes padded nodes from the attention softmax (the dense reference has no
    padding so mask=None reproduces it exactly).
    """
    steps: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, N, D = x.shape
        steps = self.steps or N

        c0 = jnp.zeros((B, D), x.dtype)
        h0 = jnp.zeros((B, D), x.dtype)
        q_star0 = jnp.zeros((B, 2 * D), x.dtype)

        scan = nn.scan(_Set2SetStep,
                       variable_broadcast='params',
                       split_rngs={'params': False},
                       in_axes=nn.broadcast, out_axes=0,
                       length=steps)
        ((c, h), q_star), _ = scan(name='step')(((c0, h0), q_star0), (x, mask))
        return q_star


class S2SReadout(nn.Module):
    """Set2Set + MLP graph readout (models/layers.py:271-289)."""
    hidden_size: int
    out_size: int
    fc_layers: int = 3
    final_activation: Optional[str] = 'relu'

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jnp.ndarray] = None):
        x = Set2Set()(x, mask=mask)
        return MLP(hidden_size=self.hidden_size, out_size=self.out_size,
                   layers=self.fc_layers, mid_activation='relu',
                   last_activation=self.final_activation,
                   mid_b_norm=True, last_b_norm=False)(x, train)


class MLPReadout(nn.Module):
    """Halving-width readout (realworld_benchmark/nets/mlp_readout_layer.py:14-29):
    L+1 Linear layers in//2^l -> in//2^(l+1) (last -> out), ReLU between."""
    out_size: int
    L: int = 2

    @nn.compact
    def __call__(self, x):
        in_size = x.shape[-1]
        for l in range(self.L):
            y = nn.Dense(in_size // 2 ** (l + 1), use_bias=True,
                         kernel_init=torch_linear_init(),
                         bias_init=torch_linear_bias_init(in_size // 2 ** l))(x)
            x = jax.nn.relu(y)
        return nn.Dense(self.out_size, use_bias=True,
                        kernel_init=torch_linear_init(),
                        bias_init=torch_linear_bias_init(in_size // 2 ** self.L))(x)
