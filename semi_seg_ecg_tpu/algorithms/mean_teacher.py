"""Mean Teacher (``algorithm: mean_teacher``).

Parity with the reference (src/algorithms/mean_teacher.py:28-190,281-291):
teacher = frozen copy of the student at init; teacher predicts *soft*
pseudo-labels on the weak view (:90-92); student sees
``concat(labeled, strong)``; loss = (CE(pred_x) + softCE(pred_u_s,
prob_u_w)) / 2 (:106-117); after each optimizer update the teacher is EMA'd
over params *and* BN buffers (:138-149). The EMA fold is a ``tree_map``
inside the same jitted step — zero extra launches.

**Teacher forward mode.** The reference never calls
``model_teacher.eval()`` in mean_teacher.py — unlike ReCo (reco.py:187)
and ST++ (stpp.py:120), which do — so its teacher predicts in TRAIN
mode: BatchNorm uses the current unlabeled batch's statistics and the
decode head's dropout stays active. That is the original Mean Teacher's
"noisy teacher", and it measurably helps (round-5 head-to-head on the
shared synthetic set: train-mode teacher ≈ +1 pt converged mIoU, 3× the
seed std). The default here replicates it (batch-stat + dropout forward,
its BN-stat mutations discarded — the reference's teacher-buffer
contamination feeds nothing: predictions use batch stats and eval/test
use the student). ``train.mt_teacher_eval: true`` selects the clean
eval-mode teacher (running stats, no dropout) — also what the lockstep
equivalence tests pin, since a dropout-noised teacher cannot be
step-pinned across frameworks.
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
from ..ops.losses import cross_entropy, soft_cross_entropy
from ..utils.train_state import ModelState, ema_update
from .base import aux_loss_weights


def make_train_step(model, tx, config, updates_per_epoch):
    seed = config["seed"]
    train_cfg = config["train"]
    # code default 0.999 (mean_teacher.py:46); configs ship 0.99
    ema_decay = train_cfg.get("ema_decay", 0.999)
    accum = train_cfg.get("accum_iter", 1) or 1

    teacher_eval = bool(train_cfg.get("mt_teacher_eval", False))

    def train_step(state, batch):
        rngs = step_rngs(seed, state.step)
        ecg_x, mask_x = batch["ecg"], batch["target"]
        ecg_u_w, ecg_u_s = batch["ecg_u_w"], batch["ecg_u_s"]
        num_lb = ecg_x.shape[0]

        if teacher_eval:
            teacher_logits = apply_eval(model, state.ema,
                                        ecg_u_w)["seg_logits"]
        else:
            # reference parity: train-mode teacher (module docstring) —
            # batch-stat BN + live dropout, stat mutations discarded.
            # Distinct rng fold keeps teacher noise independent of the
            # student's dropout draws within the step.
            t_key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(seed), state.step), 3)
            t_rngs = {"dropout": jax.random.fold_in(t_key, 1),
                      "droppath": jax.random.fold_in(t_key, 2)}
            teacher_logits, _ = apply_train(
                model, state.ema.params, state.ema.batch_stats,
                ecg_u_w, t_rngs)
            teacher_logits = teacher_logits["seg_logits"]
        prob_u_w = jax.nn.softmax(teacher_logits.astype(jnp.float32),
                                  axis=1)
        prob_u_w = jax.lax.stop_gradient(prob_u_w)

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
            loss_u_s = soft_cross_entropy(pred_u_s, prob_u_w)
            loss = (loss_x + loss_u_s) / 2.0
            return loss, (new_stats, loss_x, loss_u_s)

        (loss, (new_stats, loss_x, loss_u_s)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.model.params)
        new_params, new_opt = sgd_update(
            tx, grads, state.opt_state, state.model.params
        )
        new_model = ModelState(new_params, new_stats)
        # EMA only after a real optimizer update (accum boundary,
        # mean_teacher.py:135-149)
        new_ema = ema_update(new_model, state.ema, ema_decay)
        if accum > 1:
            did_update = ((state.step + 1) % accum) == 0
            new_ema = jax.tree.map(
                lambda new, old: jnp.where(did_update, new, old),
                new_ema, state.ema,
            )
        new_state = state.replace(
            step=state.step + 1,
            model=new_model,
            opt_state=new_opt,
            ema=new_ema,
        )
        metrics = {
            "loss_total": loss,
            "loss_x": loss_x,
            "loss_u_s": loss_u_s,
            "loss": loss,
        }
        return new_state, metrics

    return train_step


SPEC = AlgorithmSpec(
    name="mean_teacher",
    make_train_step=make_train_step,
    uses_unlabeled=True,
    uses_ema=True,
)


def train(config):
    run_training(config, SPEC)


def test(config):
    return run_test(config)
