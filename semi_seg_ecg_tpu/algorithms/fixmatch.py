"""FixMatch (``algorithm: fixmatch``).

Parity with the reference (src/algorithms/fixmatch.py:28-192): one network;
hard pseudo-labels + confidence from an inference-mode forward on the weak
view (fixmatch.py:87-91); student trains on ``concat(labeled, strong)`` in a
single forward (:98-102); unsupervised CE is masked by
``confidence >= conf_thresh`` (:114-116); ``mask_ratio`` is logged (:123).

The pseudo-label forward, the student forward, the loss, and the update are
one jitted program — the teacher pass costs no extra host round-trip.
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
    conf_thresh = train_cfg["conf_thresh"]

    def train_step(state, batch):
        rngs = step_rngs(seed, state.step)
        ecg_x, mask_x = batch["ecg"], batch["target"]
        ecg_u_w, ecg_u_s = batch["ecg_u_w"], batch["ecg_u_s"]
        num_lb = ecg_x.shape[0]

        # pseudo-label generation: inference mode, no gradient
        # (fixmatch.py:87-91 — model.eval() + torch.no_grad())
        pred_u_w = apply_eval(model, state.model, ecg_u_w)["seg_logits"]
        prob_u_w = jax.nn.softmax(pred_u_w.astype(jnp.float32), axis=1)
        conf_u_w = jnp.max(prob_u_w, axis=1)
        mask_u_w = jnp.argmax(prob_u_w, axis=1)
        conf_mask = (conf_u_w >= conf_thresh).astype(jnp.float32)
        conf_mask = jax.lax.stop_gradient(conf_mask)
        mask_u_w = jax.lax.stop_gradient(mask_u_w)

        def loss_fn(params):
            out, new_stats = apply_train(
                model, params, state.model.batch_stats,
                jnp.concatenate([ecg_x, ecg_u_s], axis=0), rngs,
            )
            pred_x = out["seg_logits"][:num_lb]
            pred_u_s = out["seg_logits"][num_lb:]
            loss_x = cross_entropy(pred_x, mask_x)
            if "aux_seg_logits" in out:
                for w, aux in zip(
                    aux_loss_weights(train_cfg, len(out["aux_seg_logits"])),
                    out["aux_seg_logits"],
                ):
                    loss_x = loss_x + w * cross_entropy(aux[:num_lb], mask_x)
            loss_u_s = cross_entropy(pred_u_s, mask_u_w, mask=conf_mask)
            loss = (loss_x + loss_u_s) / 2.0
            return loss, (new_stats, loss_x, loss_u_s)

        (loss, (new_stats, loss_x, loss_u_s)), grads = jax.value_and_grad(
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
        metrics = {
            "loss_total": loss,
            "loss_x": loss_x,
            "loss_u_s": loss_u_s,
            "mask_ratio": jnp.mean(conf_mask),
            # NaN abort keys on 'loss'
            "loss": loss,
        }
        return new_state, metrics

    return train_step


SPEC = AlgorithmSpec(
    name="fixmatch", make_train_step=make_train_step, uses_unlabeled=True
)


def train(config):
    run_training(config, SPEC)


def test(config):
    return run_test(config)
