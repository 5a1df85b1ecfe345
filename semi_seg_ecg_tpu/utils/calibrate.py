"""Post-training calibration of int8 activation scales (serving).

The dynamically quantized serving graph (``quantize: int8``) computes a
per-layer absmax over the live batch before every conv/dense — profiled
at ~20% of the int8 serving step's device time at batch 256
(``tools/profile_step.py --inference --int8``). Calibration replaces
those reductions with constants: run the forward over a few
representative batches with the ``quant`` variable collection mutable —
every :class:`~semi_seg_ecg_tpu.models.quant_layers.Int8Conv` /
``Int8Dense`` records its running activation absmax — then serve with
the collected collection bound, which switches every layer to static
scales (see ``quant_layers._act_scale``).

Static scales are an approximation (an activation exceeding the
calibrated absmax clips at ±127 instead of rescaling), standard for
post-training quantization; calibrate on data distributed like the
serving traffic. No reference counterpart — the reference has no
quantization at all (its serving story ends at a numpy dump,
/root/reference/src/inference.py:112-125).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax.numpy as jnp


def calibrate_quant(model, params, batch_stats,
                    batches: Iterable[jnp.ndarray]) -> Dict[str, Any]:
    """Collect per-layer activation absmax over ``batches`` (arrays shaped
    like the model input). Returns the ``quant`` variable collection to
    bind at serving time::

        quant = calibrate_quant(model, params, batch_stats, cal_batches)
        out = model.apply({"params": params, "batch_stats": batch_stats,
                           "quant": quant}, x, train=False)
    """
    import jax

    # jitted: an eager apply is thousands of per-op dispatches on a
    # remote accelerator. Two traces total (first batch has no quant
    # collection yet; subsequent batches thread it through).
    @jax.jit
    def step(variables, x):
        _, updated = model.apply(variables, x, train=False,
                                 mutable=["quant"])
        return updated["quant"]

    quant = None
    n = 0
    for x in batches:
        variables = {"params": params, "batch_stats": batch_stats}
        if quant is not None:
            variables["quant"] = quant
        quant = step(variables, x)
        n += 1
    if n == 0:
        raise ValueError("calibrate_quant needs at least one batch")
    return quant
