"""Long-record memory scaling (tools/bench_longrec.py): sequence
parallelism must actually cut the per-device compiled memory of the full
ViT train step ~1/s — the capability the reference cannot reach at all
(its attention is dense O(N^2), src/models/backbones/
vision_transformer.py:129-132, and DDP cannot shard a single record's
time axis). The headline T=65,536 tables live in docs/PERFORMANCE.md;
this pins the scaling law at a test-sized T so regressions in the mesh
specs, ring attention, or GSPMD partitioning show up in CI.
"""

import numpy as np
import pytest

import jax

from tools.bench_longrec import _batch, _mem_row, make_config

T = 8192          # 512 patch tokens — small enough to compile in seconds
KW = dict(depth=2, width=192, heads=3, dim_head=64, mlp_dim=768, batch=2)


@pytest.fixture(scope="module")
def rows():
    batch = _batch(T, KW["batch"])
    out = {}
    for s, impl in [(1, "xla"), (2, "ring"), (4, "ring")]:
        cfg = make_config(T, s, impl, **KW)
        out[s] = _mem_row(cfg, jax.devices()[:s], batch)
    return out


def test_ring_temp_memory_halves_with_s(rows):
    """Ring+SP per-device temp bytes scale ~1/s (slack for the fixed
    per-device overhead: replicated params' grads, the ring's resident
    K/V chunk pair)."""
    ratio = rows[4]["temp_bytes"] / rows[2]["temp_bytes"]
    assert ratio < 0.65, f"s=4/s=2 temp ratio {ratio:.3f} — SP lost its 1/s"
    # and not degenerate (a broken spec that shards nothing would be ~1.0,
    # one that all-gathers would exceed 1.0)
    assert ratio > 0.25


def test_sp_beats_single_device_dense(rows):
    """s=2 ring already needs less per-device memory than the s=1 dense
    step (the reference's algorithm on one device)."""
    assert rows[2]["temp_bytes"] < rows[1]["temp_bytes"]


def test_replicated_state_bytes_constant(rows):
    """Params/opt-state stay replicated: argument bytes must not grow
    with s (a regression here means something started gathering state
    per-shard)."""
    args = [rows[s]["arg_bytes"] for s in (1, 2, 4)]
    assert max(args) - min(args) < 0.02 * args[0]
