"""Ring attention (ops/ring_attention.py): sequence-parallel exact attention.

The reference has no sequence parallelism (DDP only, src/main_train.py:64-101);
these tests pin that the ring reassociation is *exact* attention — dense-path
parity for values and gradients, including the zero-pad/mask path for token
counts that don't divide the ring (the ViT's N patches + 1 cls token) — and
that the full ViT train step under ``parallel.seq_parallel`` still reproduces
the single-device update when attention goes through the ring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_seg_ecg_tpu.ops.ring_attention import ring_attention
from semi_seg_ecg_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    set_current_mesh,
    shard_batch,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _dense_attention(q, k, v, scale):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                      preferred_element_type=jnp.float32)


def _qkv(rng, b, h, n, d):
    return tuple(
        rng.standard_normal((b, h, n, d)).astype(np.float32)
        for _ in range(3)
    )


@pytest.mark.parametrize("n", [64, 31, 101])  # 31/101: pad+mask path (N % s != 0)
def test_ring_matches_dense_forward(rng, n):
    q, k, v = _qkv(rng, b=4, h=2, n=n, d=16)
    scale = 16**-0.5
    mesh = make_mesh({"parallel": {"seq_parallel": 4}},
                     devices=jax.devices()[:8])
    try:
        out = jax.jit(lambda q, k, v: ring_attention(q, k, v, scale))(q, k, v)
        ref = _dense_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
    finally:
        set_current_mesh(None)


def test_ring_matches_dense_gradients(rng):
    """Autodiff flows through the scan of ppermutes (transpose = reverse
    ring) and matches the dense path's gradients for q, k AND v — k/v see
    the ring's rotation, so this pins the collective's transpose too."""
    n = 33  # indivisible: grads must also be exact through the pad/mask
    q, k, v = _qkv(rng, b=2, h=2, n=n, d=8)
    g = rng.standard_normal((2, 2, n, 8)).astype(np.float32)
    scale = 8**-0.5

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, scale) * g).sum()

    def loss_dense(q, k, v):
        return (_dense_attention(q, k, v, scale) * g).sum()

    mesh = make_mesh({"parallel": {"seq_parallel": 4}},
                     devices=jax.devices()[:8])
    try:
        grads = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    finally:
        set_current_mesh(None)
    ref = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(grads, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_ring_no_mesh_fallback(rng):
    """Without a live seq mesh the op is the plain dense attention."""
    set_current_mesh(None)
    q, k, v = _qkv(rng, b=2, h=2, n=32, d=8)
    out = ring_attention(q, k, v, 8**-0.5)
    ref = _dense_attention(q, k, v, 8**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("n", [64, 101])
def test_ring_subblocked_matches_dense(rng, n, monkeypatch):
    """Forcing the key-sub-block fold (_SCORE_CAP tiny) must stay exact —
    forward AND gradients — including when the extra s*blk padding kicks
    in (n=101 with blk=16, s=4 pads to 112)."""
    import semi_seg_ecg_tpu.ops.ring_attention as ra

    monkeypatch.setattr(ra, "_SCORE_CAP", 64)   # nq0^2 > 64 -> sub-block
    monkeypatch.setattr(ra, "_MIN_BLK", 16)
    q, k, v = _qkv(rng, b=2, h=2, n=n, d=8)
    g = rng.standard_normal((2, 2, n, 8)).astype(np.float32)
    scale = 8**-0.5

    mesh = make_mesh({"parallel": {"seq_parallel": 4}},
                     devices=jax.devices()[:8])
    try:
        out = jax.jit(lambda q, k, v: ring_attention(q, k, v, scale))(q, k, v)
        grads = jax.jit(jax.grad(
            lambda q, k, v: (ring_attention(q, k, v, scale) * g).sum(),
            argnums=(0, 1, 2)))(q, k, v)
    finally:
        set_current_mesh(None)
    ref = _dense_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    ref_g = jax.jit(jax.grad(
        lambda q, k, v: (_dense_attention(q, k, v, scale) * g).sum(),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(grads, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_ring_uses_collective_permute(rng):
    """The compiled HLO moves K/V with collective-permute (neighbour ICI
    traffic), not all-gather of the token axis."""
    q, k, v = _qkv(rng, b=4, h=2, n=64, d=16)
    mesh = make_mesh({"parallel": {"seq_parallel": 4}},
                     devices=jax.devices()[:8])
    try:
        fn = jax.jit(lambda q, k, v: ring_attention(q, k, v, 0.25))
        hlo = fn.lower(q, k, v).compile().as_text()
    finally:
        set_current_mesh(None)
    assert "collective-permute" in hlo


def _vit_sp_config():
    return {
        "seed": 0, "algorithm": "base", "mode": "scratch", "use_amp": False,
        "precision": "fp32",
        "dataset": {"signal_length": 256},
        # fp32 matmuls: the ring's online softmax reorders reductions, and
        # in bf16 that flips the sign of near-zero grads, which one Adam
        # step amplifies to +-2*lr — fp32 keeps the parity check tight
        "backbone": {"vit_tiny": {"seq_len": 256, "patch_size": 16,
                                  "num_leads": 1, "fp16_enabled": False,
                                  "heads": 2, "dim_head": 32,
                                  "attention_impl": "ring"}},
        "decode_head": {"FCNHead": {"in_channels": 192, "in_index": 0,
                                    "channels": 16, "num_convs": 1,
                                    "concat_input": False,
                                    "dropout_ratio": 0.0, "num_classes": 4,
                                    "align_corners": False}},
        "train": {"epochs": 2, "accum_iter": 1, "warmup_epochs": 0,
                  "min_lr": 1e-4, "blr": None, "lr": 1e-3,
                  "weight_decay": 0.05, "max_norm": None,
                  "layer_decay": None, "optimizer": "adamw",
                  "optimizer_kwargs": {"betas": [0.9, 0.999]}},
        "dataloader": {"batch_size": 1},
        "parallel": {"model_parallel": 1, "seq_parallel": 2},
    }


def test_vit_seq_parallel_ring_step_matches_single_device(rng):
    """Full ViT train step on a (data=4, seq=2) mesh with ring attention
    reproduces the single-device update: 17 tokens (16 patches + cls) ride
    the pad/mask path, and the rest of the block (patch embed, MLPs, LN)
    stays GSPMD-partitioned over the same seq axis."""
    from semi_seg_ecg_tpu.algorithms.base import SPEC, make_train_step
    from semi_seg_ecg_tpu.algorithms.common import build_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.utils.optimizer import build_optimizer

    batch = {
        "ecg": rng.standard_normal((8, 1, 256)).astype(np.float32),
        "target": rng.integers(0, 4, (8, 256)),
    }

    def run(cfg, devices):
        mesh = make_mesh(cfg, devices=devices)
        model = build_model_from_config(cfg, train=True)
        tx = build_optimizer(cfg, None, 10, model=model)
        state = jax.device_put(build_state(cfg, model, tx, SPEC, seed=0),
                               replicated(mesh))
        step = jax.jit(make_train_step(model, tx, cfg, 10))
        out_state, m = step(state, shard_batch(mesh, batch))
        return out_state, m

    cfg_sp = _vit_sp_config()
    try:
        sp_state, sp_m = run(cfg_sp, jax.devices()[:8])
    finally:
        set_current_mesh(None)

    cfg_1 = _vit_sp_config()
    cfg_1["parallel"] = {"model_parallel": 1, "seq_parallel": 1}
    cfg_1["backbone"]["vit_tiny"]["attention_impl"] = "xla"
    try:
        one_state, one_m = run(cfg_1, jax.devices()[:1])
    finally:
        set_current_mesh(None)

    np.testing.assert_allclose(float(sp_m["loss"]), float(one_m["loss"]),
                               rtol=1e-5)
    # atol 5e-5: the ring's online softmax reorders fp32 reductions, and
    # Adam's first-step normaliser amplifies that on near-cancelling grads
    for a, b in zip(jax.tree.leaves(sp_state.model.params),
                    jax.tree.leaves(one_state.model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
