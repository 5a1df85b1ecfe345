"""The one dense softmax-attention formulation every path shares.

Three call sites need plain softmax(QK^T * scale)V — the ViT's short-
sequence branch (models/backbones/vision_transformer.py), ring
attention's no-mesh fallback (ops/ring_attention.py), and the flash
kernel's test/benchmark reference (ops/pallas/flash_attention.py).
Keeping them on one implementation stops dtype/scale fixes from
drifting apart. Reference semantics anchor: the torch attention in
src/models/backbones/vision_transformer.py:73-136 (fp32 softmax, matmul
dtype per the fp16_enabled escape hatch).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def dense_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    *,
    mm_dtype: Optional[jnp.dtype] = None,
    attn_transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """softmax(q kᵀ · scale) v over (B, H, N, D), returned in fp32.

    Matmuls run in ``mm_dtype`` (default: q's dtype) with fp32
    accumulation; the softmax is always fp32. ``attn_transform`` hooks
    between softmax and the value matmul (the ViT's attention dropout).
    """
    if mm_dtype is None:
        mm_dtype = q.dtype
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q.astype(mm_dtype), k.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    if attn_transform is not None:
        attn = attn_transform(attn)
    return jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(mm_dtype), v.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
