"""Supervised baseline (``algorithm: base``).

Parity with the reference's canonical loop (src/algorithms/base.py:83-181):
per-iteration cosine-warmup LR, CE on the labeled batch (+ weighted
auxiliary-head CE), NaN abort, grad-accumulation, checkpoint-on-best — all
of which live in the shared driver; this module contributes only the pure
``train_step``.
"""

from __future__ import annotations

import jax

from .common import (
    AlgorithmSpec,
    apply_train,
    run_test,
    run_training,
    sgd_update,
    step_rngs,
)
from ..utils.train_state import ModelState


def aux_loss_weights(train_cfg, n):
    # the reference writes 'auxiliary_loss_weight' in configs but reads
    # 'auxiliary_loss_weights' in code (base.py:126-128 vs scratch.yaml:87);
    # accept both
    ws = train_cfg.get("auxiliary_loss_weights",
                       train_cfg.get("auxiliary_loss_weight", [0.4]))
    return list(ws)[:n] if n else []


def make_train_step(model, tx, config, updates_per_epoch):
    seed = config["seed"]
    train_cfg = config["train"]

    def train_step(state, batch):
        rngs = step_rngs(seed, state.step)

        def loss_fn(params):
            out, new_stats = apply_train(
                model, params, state.model.batch_stats, batch["ecg"], rngs,
                labels=batch["target"], return_loss=True,
            )
            loss = out["loss"]
            if "loss_aux" in out:
                for w, l in zip(aux_loss_weights(train_cfg,
                                                 len(out["loss_aux"])),
                                out["loss_aux"]):
                    loss = loss + w * l
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.model.params)
        new_params, new_opt = sgd_update(
            tx, grads, state.opt_state, state.model.params
        )
        new_state = state.replace(
            step=state.step + 1,
            model=ModelState(new_params, new_stats),
            opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    return train_step


SPEC = AlgorithmSpec(name="base", make_train_step=make_train_step)


def train(config):
    run_training(config, SPEC)


def test(config):
    return run_test(config)
