"""Compiled collective-traffic signatures per parallelism recipe.

The GSPMD silent-replication bug class (NOTES.md "(fixed)
attention_impl: flash inside a multi-device mesh": XLA all-gathered the
kernel operands and computed attention fully replicated, passing every
numeric test) previously had NO regression guard — these pins are it.
Signatures measured by tools/audit_collectives.py on the 8-device CPU
mesh (identical GSPMD passes to a TPU slice), 2026-08-20
(bench_logs/collectives_audit.json):

- dp:              all-reduce ~= params bytes (one fused grad reduce),
                   ZERO all-gathers
- dp_tp_vit_flash: ZERO all-gathers — a regression to the replicated
                   flash kernel re-inserts them
- dp_sp_ring:      ppermutes carry the K/V ring; any all-gather stays
                   tiny (cls/pos bookkeeping), never the token axis

ZeRO-1's signature (all-gather of the param delta present, sharded
moments) is exercised by the tool's `zero1` recipe and pinned at the
memory level in tests/test_zero1.py.
"""

import pytest

from tools.audit_collectives import audit_recipe


@pytest.fixture(scope="module")
def audits():
    return {name: audit_recipe(name)
            for name in ("dp", "dp_tp_vit_flash", "dp_sp_ring")}


def test_dp_gradient_reduce_is_fused_and_gather_free(audits):
    ops, summary, ctx = audits["dp"]
    assert "all-gather" not in summary, summary
    ar = summary["all-reduce"]
    params = ctx["param_bytes"]
    # one fused fp32 gradient all-reduce dominates (smaller per-leaf
    # reduces for stragglers are fine); total stays ~params-sized —
    # a re-materialized activation reduce would blow this up
    assert ar["largest"] >= 0.8 * params, (ar, params)
    assert ar["bytes"] <= 1.6 * params, (ar, params)
    for rec in ops:
        if rec["op"] != "all-reduce":
            assert rec["bytes"] < 1 << 20, rec  # no giant stray collective


def test_tp_flash_step_inserts_no_all_gather(audits):
    """THE flash-replication pin: the sharded Pallas attention must not
    make GSPMD gather activations around it."""
    _, summary, _ = audits["dp_tp_vit_flash"]
    assert "all-gather" not in summary, summary
    # Megatron-style activation redistribution exists instead
    assert summary.get("all-to-all", {}).get("count", 0) > 0, summary


def test_ring_attention_rides_ppermute_not_gather(audits):
    ops, summary, ctx = audits["dp_sp_ring"]
    # the K/V ring: >= 2 hops per attention layer (12 layers, s=2)
    assert summary["collective-permute"]["count"] >= 24, summary
    # grads reduce over data AND seq; the token axis itself is never
    # gathered (largest observed all-gather: 20 KB of cls/pos
    # bookkeeping; a dense-attention regression gathers whole
    # (batch, tokens, width) activations)
    big_gathers = [r for r in ops
                   if r["op"] == "all-gather" and r["bytes"] > 200_000]
    assert not big_gathers, big_gathers
