"""Max pooling with a vectorized backward (no select-and-scatter).

XLA lowers the gradient of ``reduce_window(max)`` to a SelectAndScatter
op: 35 us of the flagship 893 us train step on TPU v5e (NOTES.md round-3
profile), a serial window scan that does not fuse. For the one pooling
shape this framework uses — the ResNet stem's k3/s2/pad1 over NWC
(resnet.py stem, reference src/models/backbones/resnet.py:206-257) — the
gradient has closed form as three strided compare masks:

window ``o`` reads padded positions ``2o, 2o+1, 2o+2``; with
``a/b/c`` those three strided views and ``y = max(a, b, c)``, the
first-max-wins routing (XLA's GE-select semantics, ties to the earliest
element) is::

    m_a = (a == y)                 # earliest element wins ties
    m_b = (b == y) & ~m_a
    m_c = (c == y) & ~m_a & ~m_b

and ``dx`` scatters back as an interleave: even padded positions collect
``g*m_a`` from their own window plus ``g*m_c`` from the previous one,
odd positions are ``g*m_b`` alone. Everything is elementwise + static
slices — one VPU fusion instead of a window scan.

The forward is untouched (same ``reduce_window`` HLO); the backward is
bit-exact against ``jax.grad`` of ``nn.max_pool`` including tie routing
(pinned in tests/test_ops.py). Double differentiation is not defined
(custom_vjp) — nothing in the framework differentiates twice.

Tried and rejected (round-4 A/B on v5e): expressing the interleave as
three ``lax.pad``-with-interior-padding upsamples summed elementwise
instead of ``stack + reshape``. It does eliminate the 20.5 MB
bf16[128,626,2,64] layout-flip copy the reshape forces at B=64 (the
size-2 stacked axis is only bitcast-mergeable in one layout), but the
pad kernels cost more inside the surrounding loop fusions than the copy
did: device-busy 3,017 -> 3,036 us/step, bench 21,253 -> 20,550
samples/s. Keep the reshape form; don't re-attempt without a profile
showing that copy on the critical path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _fwd(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3,), strides=(2,), padding=[(1, 1)])


@jax.custom_vjp
def max_pool_k3s2(x: jnp.ndarray) -> jnp.ndarray:
    """k3/s2/pad1 max pool over the time axis of an NWC ``(B, T, C)``
    batch — the ResNet stem pool — with a select-and-scatter-free VJP."""
    return _fwd(x)


def _mp_fwd(x):
    return _fwd(x), x


def _strided_views(x_p, t_out):
    a = x_p[:, 0:2 * t_out:2]
    b = x_p[:, 1:2 * t_out + 1:2]
    c = x_p[:, 2:2 * t_out + 2:2]
    return a, b, c


def _mp_bwd(x, g):
    b_, t, c_ = x.shape
    t_out = (t + 1) // 2  # floor((t + 2*pad - k) / s) + 1 for k3 s2 p1
    # pad with -inf, nn.max_pool's own identity: finfo.min would TIE with
    # a real finfo.min element and steal its gradient into the pad
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    x_p = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), constant_values=neg)
    a, b, c = _strided_views(x_p, t_out)
    y = jnp.maximum(jnp.maximum(a, b), c)
    m_a = a == y
    m_b = (b == y) & ~m_a
    m_c = (c == y) & ~m_a & ~m_b
    ga = jnp.where(m_a, g, 0)
    gb = jnp.where(m_b, g, 0)
    gc = jnp.where(m_c, g, 0)
    # padded even positions 0..2*t_out: window o's own `a` term plus the
    # previous window's `c` term (they overlap by one element)
    even = jnp.concatenate(
        [ga, jnp.zeros((b_, 1, c_), g.dtype)], axis=1
    ) + jnp.concatenate([jnp.zeros((b_, 1, c_), g.dtype), gc], axis=1)
    # interleave even/odd back into the padded axis; odd positions end at
    # 2*t_out - 1, so pad odd to the same length before stacking
    odd = jnp.concatenate([gb, jnp.zeros((b_, 1, c_), g.dtype)], axis=1)
    dx_p = jnp.stack([even, odd], axis=2).reshape(b_, -1, c_)
    return (dx_p[:, 1:t + 1],)


max_pool_k3s2.defvjp(_mp_fwd, _mp_bwd)
