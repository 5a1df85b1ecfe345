"""1-D Vision Transformer backbone (flax.linen, NWC, bf16-compute ready).

Capability parity with the reference ViT-1D
(src/models/backbones/vision_transformer.py:19-366): patchify + LN/Linear/LN
embedding (vision_transformer.py:234-239), learned cls + pos embeddings
(:241-244), pre-norm blocks with optional qk-norm, an fp32-attention escape
hatch (``fp16_enabled=False`` path :122-127), stochastic depth (DropPath,
:19-36), LayerScale (:185-189), multi-scale features at ``out_indices``
with the cls token dropped (:296-306), ``no_weight_decay`` =
{cls_embedding, pos_embedding} (:308-309), and tiny/small/base factories.

TPU-first choices:
- attention is a fused einsum chain over static shapes (seq ≈ 101 patches:
  far below the threshold where a Pallas flash kernel pays off — XLA fuses
  the softmax into the matmuls already);
- softmax always runs in fp32 (free on VPU, removes the bf16 overflow case
  the reference's escape hatch exists for, which stays available as
  ``fp16_enabled=False`` to also force the QK/AV matmuls to fp32);
- weights fp32, activations in ``dtype`` (bf16 by default).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DropPath(nn.Module):
    """Per-sample stochastic depth (vision_transformer.py:19-36)."""

    rate: float
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate <= 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def _dense(quantize, features, dtype, name, use_bias=True):
    """nn.Dense, or its int8-contraction stand-in when ``quantize='int8'``
    (inference/serving; models/quant_layers.py). Names are pinned to
    nn.Dense's auto-names so the param tree is identical either way."""
    if quantize:
        assert quantize == "int8", quantize
        from ..quant_layers import Int8Dense

        return Int8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


class FeedForward(nn.Module):
    """LN → Linear → GELU → dropout → Linear → dropout
    (vision_transformer.py:49-70 with the PreNorm wrapper folded in)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = _dense(self.quantize, self.hidden_dim, self.dtype, "Dense_0")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = _dense(self.quantize, self.output_dim, self.dtype, "Dense_1")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Attention(nn.Module):
    """Pre-norm multi-head self-attention (vision_transformer.py:73-136)."""

    output_dim: int
    heads: int = 8
    dim_head: int = 64
    qkv_bias: bool = True
    qk_norm: bool = False
    fp16_enabled: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    attention_impl: str = "auto"  # 'auto' | 'xla' | 'flash' | 'ring'
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None

    def _use_ring(self, train: bool) -> bool:
        """'auto'/'ring': sequence-parallel ring attention whenever the
        live mesh shards tokens over a ``seq`` axis — the dense and flash
        paths would make GSPMD all-gather the sharded token axis (and the
        dense path re-materialise (N, N) scores per device), erasing the
        memory saving seq_parallel exists for. Skipped under attention
        dropout (the ring never materialises the full (N, N) matrix the
        dropout mask would need) — that combination falls back to the
        dense path, which stays correct via GSPMD's gathers."""
        if self.attention_impl not in ("auto", "ring"):
            return False
        from ...parallel.mesh import get_current_mesh, seq_parallel_size

        mesh = get_current_mesh()
        seq = mesh is not None and seq_parallel_size(mesh) > 1
        if seq and self.attn_dropout > 0 and train:
            import logging

            # trace-time (once per compile): the dense fallback will
            # all-gather the seq-sharded token axis and re-materialise
            # O(N^2) scores per device — correct, but it erases the
            # memory saving seq_parallel exists for
            logging.getLogger(__name__).warning(
                "ring attention skipped: attn_dropout > 0 needs the full "
                "(N, N) attention matrix — falling back to dense "
                "attention, which all-gathers the seq-sharded token axis "
                "(set attn_drop_out_rate: 0 to keep tokens sharded)")
            return False
        return seq

    def _use_flash(self, n: int, train: bool) -> bool:
        """'auto': Pallas blockwise kernel only where it pays — long
        sequences on TPU, no attention dropout (the kernel never
        materialises the (N, N) matrix the dropout mask would need)."""
        from ...ops.pallas.flash_attention import fits_vmem

        if self.attention_impl in ("xla", "ring"):
            # explicit 'ring' without a live seq mesh falls back to the
            # dense path (ring_attention's documented fallback), never to
            # a third, unrequested implementation
            return False
        if self.attn_dropout > 0 and train:
            return False
        if not fits_vmem(n, self.dim_head):
            return False
        if self.attention_impl == "flash":
            from ...parallel.mesh import get_current_mesh, seq_parallel_size

            mesh = get_current_mesh()
            if mesh is not None and seq_parallel_size(mesh) > 1:
                import logging

                # trace-time (once per compile): the flash shard_map spec
                # omits the seq axis, so q/k/v get all-gathered and the
                # kernel runs redundantly on every seq rank — correct,
                # but it silently erases the seq_parallel saving
                logging.getLogger(__name__).warning(
                    "attention_impl='flash' under a seq>1 mesh all-gathers "
                    "the seq-sharded token axis and computes the kernel "
                    "redundantly on every seq rank — use "
                    "attention_impl: auto (or ring) to keep tokens sharded")
            return True
        on_tpu = jax.default_backend() == "tpu"
        # crossover swept on v5e (d=64, bf16): flash 1.25x at n=512,
        # 2.8x at n=1024, loses below (0.47x at n=256)
        return on_tpu and n >= 512

    @nn.compact
    def __call__(self, x, train: bool):
        input_dim = x.shape[-1]
        inner_dim = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == input_dim)

        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        qkv = _dense(self.quantize, inner_dim * 3, self.dtype, "Dense_0",
                     use_bias=self.qkv_bias)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if self.qk_norm:
            q = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="q_norm")(q)
            k = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="k_norm")(k)

        mm_dtype = self.dtype if self.fp16_enabled else jnp.float32
        scale = self.dim_head**-0.5
        if self._use_ring(train):
            from ...ops.ring_attention import ring_attention

            out = ring_attention(q, k, v, scale,
                                 mm_dtype=mm_dtype).astype(self.dtype)
        elif self._use_flash(q.shape[2], train):
            # mesh-aware: shards the kernel over (data, model) so TP runs
            # head-parallel with zero collectives around the pallas_call
            from ...ops.pallas.flash_attention import (
                sharded_flash_attention as flash_attention,
            )

            interpret = jax.default_backend() != "tpu"
            out = flash_attention(
                q.astype(mm_dtype), k.astype(mm_dtype), v.astype(mm_dtype),
                scale, None, None, interpret,  # blocks: pick_blocks(n, d)
            ).astype(self.dtype)
        else:
            from ...ops.attention import dense_attention

            dropout = nn.Dropout(self.attn_dropout, deterministic=not train)
            out = dense_attention(  # fp32 softmax always
                q, k, v, scale, mm_dtype=mm_dtype, attn_transform=dropout,
            ).astype(self.dtype)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        if project_out:
            out = _dense(self.quantize, self.output_dim, self.dtype,
                         "Dense_1")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class TransformerBlock(nn.Module):
    output_dim: int
    hidden_dim: int
    heads: int = 8
    dim_head: int = 32
    qkv_bias: bool = True
    qk_norm: bool = False
    fp16_enabled: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    attention_impl: str = "auto"
    drop_path: float = 0.0
    layer_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        ls_init = self.layer_scale

        def scaled(branch, name):
            if ls_init is None:
                return branch
            gamma = self.param(
                name, nn.initializers.constant(ls_init), (x.shape[-1],),
                jnp.float32,
            )
            return branch * gamma.astype(branch.dtype)

        attn_out = Attention(
            output_dim=self.output_dim,
            heads=self.heads,
            dim_head=self.dim_head,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            fp16_enabled=self.fp16_enabled,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            quantize=self.quantize,
        )(x, train)
        x = DropPath(self.drop_path)(scaled(attn_out, "ls_1"), train) + x
        ff_out = FeedForward(
            hidden_dim=self.hidden_dim,
            output_dim=self.output_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            quantize=self.quantize,
        )(x, train)
        x = DropPath(self.drop_path)(scaled(ff_out, "ls_2"), train) + x
        return x


class VisionTransformer1D(nn.Module):
    """Input ``(B, T, leads)`` NWC → tuple of ``(B, num_patches, width)``
    features at ``out_indices`` (cls token dropped, :301)."""

    seq_len: int
    patch_size: int
    num_leads: int
    width: int = 768
    depth: int = 12
    mlp_dim: int = 3072
    heads: int = 12
    dim_head: int = 64
    qkv_bias: bool = True
    qk_norm: bool = False
    fp16_enabled: bool = True
    drop_out_rate: float = 0.0
    attn_drop_out_rate: float = 0.0
    drop_path_rate: float = 0.0
    uniform_dpr: bool = False
    layer_scale: Optional[float] = None
    attention_impl: str = "auto"
    frozen_stages: int = -1
    out_indices: Sequence[int] = (3, 5, 7, 11)
    final_norm: bool = False
    output_cls_token: bool = False
    # activation checkpointing (jax.checkpoint) per transformer block:
    # trades recompute FLOPs for HBM — the memory lever for deep/wide or
    # long-sequence variants. Param tree, outputs and gradients are
    # identical either way.
    remat: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None

    @property
    def num_patches(self) -> int:
        return self.seq_len // self.patch_size

    @property
    def feature_dim(self) -> int:
        return self.width

    def no_weight_decay(self) -> set:
        return {"cls_embedding", "pos_embedding"}

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        assert self.seq_len % self.patch_size == 0, \
            "The sequence length must be divisible by the patch size."
        b, t, c = x.shape
        n = t // self.patch_size
        x = x.astype(self.dtype)
        # patchify: (B, T, C) -> (B, n, patch*C); trailing channel keeps the
        # reference's '(p c)' element order (vision_transformer.py:235)
        x = x.reshape(b, n, self.patch_size * c)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = _dense(self.quantize, self.width, self.dtype, "Dense_0")(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, self.num_patches + 1, self.width), jnp.float32,
        )
        cls = self.param(
            "cls_embedding", nn.initializers.normal(1.0), (self.width,),
            jnp.float32,
        )
        cls_tok = jnp.broadcast_to(
            cls.astype(self.dtype)[None, None, :], (b, 1, self.width)
        )
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + pos[:, : n + 1].astype(self.dtype)
        x = nn.Dropout(self.drop_out_rate, deterministic=not train)(x)

        if self.uniform_dpr:
            dpr = [self.drop_path_rate] * self.depth
        else:
            import numpy as np

            # host-side: rates are static module hyperparameters
            dpr = np.linspace(0, self.drop_path_rate, self.depth).tolist()
        block_cls = TransformerBlock
        if self.remat:
            # static_argnums=(2,): `train` is a Python bool, not a tracer
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        features = []
        for i in range(self.depth):
            # frozen blocks run deterministically (vision_transformer.py:
            # 280-284 `.eval()` parity; param freezing is the optimizer's job)
            block_train = train and i >= self.frozen_stages
            x = block_cls(
                output_dim=self.width,
                hidden_dim=self.mlp_dim,
                heads=self.heads,
                dim_head=self.dim_head,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                fp16_enabled=self.fp16_enabled,
                dropout=self.drop_out_rate,
                attn_dropout=self.attn_drop_out_rate,
                attention_impl=self.attention_impl,
                drop_path=dpr[i],
                layer_scale=self.layer_scale,
                dtype=self.dtype,
                quantize=self.quantize,
                name=f"block{i}",
            )(x, block_train)
            if i == self.depth - 1 and self.final_norm:
                x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                 name="norm")(x)
            if i in self.out_indices:
                patches = x[:, 1:, :]  # NWC feature, cls dropped
                if self.output_cls_token:
                    features.append((patches, x[:, 0]))
                else:
                    features.append(patches)
        return tuple(features)


def _factory(width, depth, heads, mlp_dim):
    def make(num_leads, seq_len=2250, patch_size=75, **kwargs):
        args = dict(width=width, depth=depth, heads=heads, mlp_dim=mlp_dim)
        args.update(kwargs)  # explicit kwargs win over family defaults
        return VisionTransformer1D(
            seq_len=seq_len,
            patch_size=patch_size,
            num_leads=num_leads,
            **args,
        )

    return make


vit_tiny = _factory(192, 12, 3, 768)
vit_small = _factory(384, 12, 6, 1536)
vit_base = _factory(768, 12, 12, 3072)
