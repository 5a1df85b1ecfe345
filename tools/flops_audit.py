"""Cross-check bench.py's MFU denominator with an analytic FLOP count.

bench.py's MFU divides XLA's ``compiled.cost_analysis()['flops']`` by the
chip's spec-sheet bf16 peak. If XLA's cost model over-counted (e.g. counted
discarded branches of the pseudo-label forward) the 0.52/0.67 MFU headline
would be soft (VERDICT r3 weak #5). This tool recounts the flagship FixMatch
step's FLOPs *independently of XLA's cost model*: it walks the step's jaxpr
— the program as JAX emitted it, before XLA sees it — and sums
``2*M*N*K``-style FLOPs from the shapes of every ``conv_general_dilated``
and ``dot_general`` primitive (descending into pjit / scan / remat /
custom-vjp sub-jaxprs, scaling scan bodies by trip count).

The two counts measure slightly different things, by design:

- jaxpr count  = MXU work JAX asked for (matmul/conv only; elementwise,
  BN, softmax, loss arithmetic excluded — the convention MFU uses);
- XLA count    = everything the optimized HLO executes, elementwise
  included, minus whatever XLA dead-code-eliminated or CSE'd away.

Agreement within ~10% ⇒ the MFU denominator is sound. A large
XLA-over-jaxpr gap would mean the headline divides by inflated FLOPs.

Usage::

    python tools/flops_audit.py            # CPU (platform-independent count)
    python tools/flops_audit.py --tpu      # also compile on the live TPU
    python tools/flops_audit.py --batch 64 # the peak operating point

Reference context: the reference publishes no FLOP/MFU accounting at all
(SURVEY §6 — no benchmark numbers in-repo); this audit exists because our
BASELINE.md quotes MFU as a headline.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from collections import defaultdict

sys.path.insert(0, ".")


def _prod(xs):
    return math.prod(int(x) for x in xs)


def _conv_flops(eqn) -> int:
    """2 * batch * out_spatial * C_out * (C_in / groups) * kernel_spatial.

    Shapes come from the equation's avals; the layout from
    ``dimension_numbers`` — this is the textbook MAC count, no cost model.
    """
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    batch = int(eqn.params.get("batch_group_count", 1))

    out_spatial = _prod(out.shape[d] for d in dn.out_spec[2:])
    n = out.shape[dn.out_spec[0]]
    c_out = out.shape[dn.out_spec[1]]
    c_in = lhs.shape[dn.lhs_spec[1]] // groups
    k_spatial = _prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    return 2 * n * out_spatial * c_out * c_in * k_spatial // max(batch, 1)


def _dot_flops(eqn) -> int:
    """2 * prod(batch) * M * N * K from dot_general dimension numbers."""
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = _prod(lhs.shape[d] for d in lb)
    contract = _prod(lhs.shape[d] for d in lc)
    m = _prod(lhs.shape[d] for d in range(lhs.ndim)
              if d not in set(lc) | set(lb))
    n = _prod(rhs.shape[d] for d in range(rhs.ndim)
              if d not in set(rc) | set(rb))
    return 2 * batch * m * n * contract


def _sub_jaxprs(eqn):
    """(jaxpr, multiplier) pairs nested under one equation."""
    out = []
    for name, v in eqn.params.items():
        mult = 1
        if eqn.primitive.name == "scan" and name == "jaxpr":
            mult = int(eqn.params.get("length", 1))
        if hasattr(v, "jaxpr"):          # ClosedJaxpr
            out.append((v.jaxpr, mult))
        elif hasattr(v, "eqns"):         # raw Jaxpr
            out.append((v, mult))
        elif isinstance(v, (list, tuple)):
            for item in v:
                if hasattr(item, "jaxpr"):
                    out.append((item.jaxpr, mult))
                elif hasattr(item, "eqns"):
                    out.append((item, mult))
    return out


def count_jaxpr(jaxpr, mult: int = 1, table=None):
    """Recursively sum conv/dot FLOPs over a jaxpr; fills ``table`` with
    per-shape contributions for the report."""
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            f = _conv_flops(eqn) * mult
            total += f
            if table is not None:
                lhs, rhs = (tuple(v.aval.shape) for v in eqn.invars[:2])
                table[("conv", lhs, rhs)] += f
        elif prim == "dot_general":
            f = _dot_flops(eqn) * mult
            total += f
            if table is not None:
                lhs, rhs = (tuple(v.aval.shape) for v in eqn.invars[:2])
                table[("dot", lhs, rhs)] += f
        else:
            for sub, submult in _sub_jaxprs(eqn):
                total += count_jaxpr(sub, mult * submult, table)
    return total


def audit(batch_per_replica: int = 16, use_tpu: bool = False):
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _build, _flops_per_call

    # aot=False returns the jitted-but-uncompiled step + inputs
    step, state, batch, _, global_batch = _build(
        1, aot=False, batch_per_replica=batch_per_replica)

    closed = jax.make_jaxpr(step)(state, batch)
    table: dict = defaultdict(int)
    analytic = count_jaxpr(closed.jaxpr, 1, table)

    compiled = step.lower(state, batch).compile()
    # cost_analysis reports the PER-DEVICE partitioned program; the jaxpr
    # count is the global program — scale by the mesh size to compare
    # (bench.py's MFU does the same implicitly: per-device FLOPs over
    # per-chip peak). On the single-chip TPU the factor is 1.
    n_dev = len(jax.devices())
    xla = _flops_per_call(compiled) * n_dev

    rows = sorted(table.items(), key=lambda kv: -kv[1])
    return {
        "batch_per_replica": batch_per_replica,
        "global_batch": global_batch,
        "n_devices": n_dev,
        "analytic_matmul_flops": analytic,
        "xla_cost_analysis_flops_global": xla,
        "xla_over_analytic": round(xla / analytic, 4) if analytic else None,
        "platform": jax.default_backend(),
        "top_contributors": [
            {"op": k[0], "lhs": list(k[1]), "rhs": list(k[2]),
             "gflops": round(v / 1e9, 2),
             "share": round(v / analytic, 4)}
            for k, v in rows[:12]
        ],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tpu", action="store_true",
                   help="compile on the live backend instead of forcing CPU")
    args = p.parse_args(argv)
    out = audit(args.batch, args.tpu)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
