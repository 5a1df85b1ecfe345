"""Pallas flash attention vs reference softmax attention (interpret mode on
the CPU mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.ops.pallas.flash_attention import (
    _reference_attention,
    flash_attention,
)


def _qkv(rng, b=2, h=3, n=100, d=64, dtype=np.float32):
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("n", [100, 128, 257, 500])
def test_flash_matches_reference(rng, n):
    q, k, v = _qkv(rng, n=n)
    scale = 64**-0.5
    ours = flash_attention(q, k, v, scale, 128, 128, True)
    ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_auto_blocks_match_reference(rng):
    """block_q/block_k=None resolves via pick_blocks (the TPU production
    path after the 128-block mis-blocking fix) and stays correct,
    forward and backward."""
    q, k, v = _qkv(rng, b=1, h=2, n=640, d=32)
    scale = 32**-0.5
    ours = flash_attention(q, k, v, scale, None, None, True)
    ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g_auto = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, scale, None, None, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(_reference_attention(q, k, v, scale) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_auto, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_pick_blocks_properties():
    from semi_seg_ecg_tpu.ops.pallas.flash_attention import (
        _VMEM_BUDGET_BYTES,
        _round_up,
        _workset_bytes,
        fits_vmem,
        pick_blocks,
    )

    # flagship benchmark shape gets the big block and passes the guard
    assert pick_blocks(2048, 64) == (512, 512)
    assert fits_vmem(2048, 64)
    # short sequences never pad past one block
    bq, bk = pick_blocks(100, 64)
    assert bq == bk == 128
    # a wide head dim downshifts the block instead of overflowing
    picked = pick_blocks(2048, 128)
    assert picked is not None
    bq, bk = picked
    n_pad = _round_up(2048, max(bq, bk))
    assert _workset_bytes(n_pad, 128, bq, bk) <= _VMEM_BUDGET_BYTES
    # an impossible shape is rejected rather than guessed at
    assert pick_blocks(1 << 20, 512) is None
    assert not fits_vmem(1 << 20, 512)


def test_flash_nontrivial_dim(rng):
    q, k, v = _qkv(rng, b=1, h=2, n=300, d=32)
    scale = 32**-0.5
    ours = flash_attention(q, k, v, scale, 128, 128, True)
    ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_reference(rng):
    q, k, v = _qkv(rng, b=1, h=1, n=130, d=32)
    scale = 32**-0.5

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, 128, 128, True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_attention_impl_flash_through_model(rng):
    """attention_impl='flash' flows from backbone kwargs into the ViT and
    produces the same features as the XLA path (CPU: interpret mode)."""
    from semi_seg_ecg_tpu.models.backbones.vision_transformer import vit_tiny

    x = jnp.asarray(rng.standard_normal((2, 500, 1)), jnp.float32)
    outs = {}
    for impl in ("xla", "flash"):
        model = vit_tiny(num_leads=1, seq_len=500, patch_size=25,
                         attention_impl=impl, dtype=jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, train=False,
        )
        outs[impl] = np.asarray(model.apply(variables, x, train=False)[-1])
    np.testing.assert_allclose(outs["flash"], outs["xla"], atol=2e-4,
                               rtol=2e-4)


def test_use_flash_auto_threshold(monkeypatch):
    """'auto' dispatches to flash from n>=512 on TPU (hardware-swept
    crossover), never on CPU, never when fits_vmem rejects."""
    from semi_seg_ecg_tpu.models.backbones import vision_transformer as vt

    attn = vt.Attention(64, heads=2, dim_head=64, attention_impl="auto")
    monkeypatch.setattr(vt.jax, "default_backend", lambda: "tpu")
    assert not attn._use_flash(256, train=True)
    assert attn._use_flash(512, train=True)
    assert attn._use_flash(2048, train=True)
    monkeypatch.setattr(vt.jax, "default_backend", lambda: "cpu")
    assert not attn._use_flash(2048, train=True)
    # explicit 'flash' bypasses the threshold but not the VMEM guard
    forced = vt.Attention(64, heads=2, dim_head=64, attention_impl="flash")
    assert forced._use_flash(256, train=True)
    huge = vt.Attention(64, heads=2, dim_head=512, attention_impl="flash")
    assert not huge._use_flash(1 << 20, train=True)


@pytest.fixture()
def dp_tp_mesh():
    """(data=2, model=4) mesh registered as the current training mesh."""
    from jax.sharding import Mesh

    from semi_seg_ecg_tpu.parallel import mesh as mesh_mod

    prev = mesh_mod.get_current_mesh()
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS))
    mesh_mod.set_current_mesh(mesh)
    yield mesh
    mesh_mod.set_current_mesh(prev)


def test_sharded_flash_matches_reference(rng, dp_tp_mesh):
    """shard_map wrapper: batch on data, heads on model, no collectives —
    forward and gradients must match the unsharded reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semi_seg_ecg_tpu.ops.pallas.flash_attention import (
        sharded_flash_attention,
    )

    q, k, v = _qkv(rng, b=4, h=8, n=256, d=32)
    scale = 32**-0.5
    spec = NamedSharding(dp_tp_mesh, P("data", "model", None, None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))

    fn = jax.jit(lambda q, k, v: sharded_flash_attention(q, k, v, scale,
                                                         128, 128, True))
    out = fn(qs, ks, vs)
    ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)

    def loss(q, k, v):
        return jnp.sum(
            sharded_flash_attention(q, k, v, scale, 128, 128, True) ** 2
        )

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(_reference_attention(q, k, v, scale) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4)


def test_sharded_flash_falls_back_on_indivisible_shapes(rng, dp_tp_mesh):
    """heads not divisible by model axis → bare-kernel fallback, still
    correct."""
    from semi_seg_ecg_tpu.ops.pallas.flash_attention import (
        sharded_flash_attention,
    )

    q, k, v = _qkv(rng, b=2, h=3, n=130, d=32)
    scale = 32**-0.5
    out = sharded_flash_attention(q, k, v, scale, 128, 128, True)
    ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_flash_through_vit_on_tp_mesh(rng, dp_tp_mesh):
    """attention_impl='flash' inside a TP-sharded ViT forward: the kernel
    runs head-parallel under shard_map and matches the XLA attention path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semi_seg_ecg_tpu.models.backbones.vision_transformer import vit_tiny
    from semi_seg_ecg_tpu.parallel.sharding_rules import shard_state

    x = jnp.asarray(rng.standard_normal((4, 512, 1)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(dp_tp_mesh, P("data")))
    outs = {}
    for impl in ("xla", "flash"):
        # heads=4 so the model axis (4) divides the head count
        model = vit_tiny(num_leads=1, seq_len=512, patch_size=16, heads=4,
                         dim_head=48, attention_impl=impl, dtype=jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, train=False,
        )
        variables = shard_state(dp_tp_mesh, variables)
        fwd = jax.jit(lambda v, x, m=model: m.apply(v, x, train=False)[-1])
        outs[impl] = np.asarray(fwd(variables, xs))
    np.testing.assert_allclose(outs["flash"], outs["xla"], atol=2e-4,
                               rtol=2e-4)


def test_flash_jittable(rng):
    q, k, v = _qkv(rng, n=256)
    scale = 64**-0.5
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale, 128, 128,
                                                True))
    a = f(q, k, v)
    b = f(q, k, v)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
