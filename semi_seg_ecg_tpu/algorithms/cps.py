"""Cross Pseudo Supervision (``algorithm: cps``).

Parity with the reference (src/algorithms/cps.py:28-240,346-364): two
independently initialised peers with separate optimizers; each peer's
hard pseudo-labels on the weak unlabeled view supervise the *other* peer
(label swap at cps.py:108-112); per peer, loss = (CE(labeled) +
CE(unlabeled-weak, other's mask)) / 2. Evaluation and checkpoint selection
use model_1 only (cps.py:346-364) — the peer rides along in the checkpoint.

Both peers' pseudo-label passes, forwards, backwards and updates fuse into
one jitted step, so XLA can overlap the two networks' compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (
    AlgorithmSpec,
    apply_eval,
    apply_train,
    run_test,
    run_training,
    sgd_update,
    step_rngs,
)
from ..ops.losses import cross_entropy
from ..utils.train_state import ModelState
from .base import aux_loss_weights


def make_train_step(model, tx, config, updates_per_epoch):
    seed = config["seed"]
    train_cfg = config["train"]

    def one_model_loss(params, batch_stats, rngs, ecg_x, mask_x, ecg_u_w,
                       mask_u_other):
        num_lb = ecg_x.shape[0]

        def loss_fn(p):
            out, new_stats = apply_train(
                model, p, batch_stats,
                jnp.concatenate([ecg_x, ecg_u_w], axis=0), rngs,
            )
            pred_x = out["seg_logits"][:num_lb]
            pred_u = out["seg_logits"][num_lb:]
            loss_x = cross_entropy(pred_x, mask_x)
            if "aux_seg_logits" in out:
                for w, aux in zip(
                    aux_loss_weights(train_cfg, len(out["aux_seg_logits"])),
                    out["aux_seg_logits"],
                ):
                    loss_x = loss_x + w * cross_entropy(aux[:num_lb], mask_x)
            loss_u = cross_entropy(pred_u, mask_u_other)
            loss = (loss_x + loss_u) / 2.0
            return loss, (new_stats, loss_x, loss_u)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state, batch):
        rngs1 = step_rngs(seed, state.step)
        rngs2 = step_rngs(seed + 1, state.step)
        ecg_x, mask_x = batch["ecg"], batch["target"]
        ecg_u_w = batch["ecg_u_w"]

        # cross pseudo-labels, inference mode (cps.py:96-102)
        mask_1 = jnp.argmax(
            apply_eval(model, state.model, ecg_u_w)["seg_logits"], axis=1
        )
        mask_2 = jnp.argmax(
            apply_eval(model, state.peer, ecg_u_w)["seg_logits"], axis=1
        )
        mask_1 = jax.lax.stop_gradient(mask_1)
        mask_2 = jax.lax.stop_gradient(mask_2)

        # model_1 learns from model_2's labels and vice versa (cps.py:108-112)
        (l1, (stats1, lx1, lu1)), g1 = one_model_loss(
            state.model.params, state.model.batch_stats, rngs1,
            ecg_x, mask_x, ecg_u_w, mask_2,
        )
        (l2, (stats2, lx2, lu2)), g2 = one_model_loss(
            state.peer.params, state.peer.batch_stats, rngs2,
            ecg_x, mask_x, ecg_u_w, mask_1,
        )
        p1, opt1 = sgd_update(tx, g1, state.opt_state, state.model.params)
        p2, opt2 = sgd_update(tx, g2, state.peer_opt_state, state.peer.params)

        new_state = state.replace(
            step=state.step + 1,
            model=ModelState(p1, stats1),
            opt_state=opt1,
            peer=ModelState(p2, stats2),
            peer_opt_state=opt2,
        )
        metrics = {
            "loss_total": (l1 + l2) / 2,
            "loss_x": (lx1 + lx2) / 2,
            "loss_u_s": (lu1 + lu2) / 2,
            "loss": (l1 + l2) / 2,
        }
        return new_state, metrics

    return train_step


SPEC = AlgorithmSpec(
    name="cps",
    make_train_step=make_train_step,
    uses_unlabeled=True,
    uses_peer=True,
)


def train(config):
    run_training(config, SPEC)


def test(config):
    return run_test(config)
