"""Blockwise (flash) attention as a Pallas TPU kernel.

The shipped ECG configs run ~101 patches, where XLA's fused attention is
already optimal (vision_transformer.py softmax attention is O(n²) but tiny —
SURVEY §5 long-context row). This kernel exists for the *long-sequence*
regime the ViT supports (small ``patch_size`` / long ``seq_len``): it never
materialises the (N, N) score matrix, streaming KV blocks through VMEM with
the usual running-max/sum rescaling.

Forward is the Pallas kernel; backward is a rematerialised standard
attention (custom VJP) — the memory win is in the forward activations, and
the backward recompute is the classic flash trade.

Shapes: ``q, k, v`` are ``(B, H, N, D)``; output matches ``q``. ``N`` and
``D`` are padded internally to TPU tile multiples; padded KV columns are
masked to -inf before the softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                  block_q: int, block_k: int):
    # all refs: (1, N_pad, D) — one (batch, head) per grid program; K/V are
    # loaded into VMEM once and reused across every q block
    _, n_pad, d = q_ref.shape
    num_qb = n_pad // block_q
    num_kb = n_pad // block_k

    def q_block(qb, _):
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        q = q * scale

        def body(kb, carry):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(
                jnp.float32)
            v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(
                jnp.float32)
            s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), dimension=1
            )
            s = jnp.where(col < n_valid, s, -jnp.inf)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p, v_blk, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)
        _, l_fin, acc_fin = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
        o_ref[0, pl.ds(qb * block_q, block_q), :] = (
            acc_fin / jnp.maximum(l_fin, 1e-30)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_qb, q_block, 0)


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    b, h, n, d = q.shape
    n_pad = _round_up(n, max(block_q, block_k))
    d_pad = _round_up(d, 128)
    if not interpret and 4 * n_pad * d_pad * 4 > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"flash_attention working set for n={n}, d={d} exceeds the VMEM "
            "budget; use the XLA attention path for this shape"
        )

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp = pad(q).reshape(b * h, n_pad, d_pad)
    kp = pad(k).reshape(b * h, n_pad, d_pad)
    vp = pad(v).reshape(b * h, n_pad, d_pad)

    kernel = functools.partial(
        _flash_kernel, scale=scale, n_valid=n, block_q=block_q,
        block_k=block_k,
    )
    spec = pl.BlockSpec((1, n_pad, d_pad), lambda bh: (bh, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


def _reference_attention(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


# the kernel keeps Q, K, V, O for one (batch, head) resident in VMEM;
# stay well under the ~16 MB/core budget (4 buffers × n_pad × d_pad × 4B
# fp32 worst case + double buffering)
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def fits_vmem(n: int, d: int, block_q: int = DEFAULT_BLOCK_Q,
              block_k: int = DEFAULT_BLOCK_K) -> bool:
    n_pad = _round_up(n, max(block_q, block_k))
    d_pad = _round_up(d, 128)
    return 4 * n_pad * d_pad * 4 <= _VMEM_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale: float, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K, interpret: bool = False):
    """softmax(q kᵀ · scale) v without materialising the score matrix.

    Raises if the per-(batch, head) working set exceeds the VMEM budget —
    callers should check :func:`fits_vmem` (the ViT's ``auto`` mode does).
    """
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


def _fwd(q, k, v, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _bwd(scale, block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_attention(q_, k_, v_,
                                                             scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
