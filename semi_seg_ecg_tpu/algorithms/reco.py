"""ReCo: Mean Teacher + regional contrastive loss (``algorithm: reco``).

Parity with the reference (src/algorithms/reco.py:157-330): EMA teacher
gives soft pseudo-labels + confidence on the weak view; the student forward
additionally returns the projected latent (``use_latent_projection``,
configs/base/resnet18/reco.yaml:33-35); loss = (CE(labeled) +
confidence-masked softCE(strong) + contrastive) / 3 (reco.py:264); teacher
EMA'd after each update. The contrastive term is the static-shape
:func:`~semi_seg_ecg_tpu.ops.reco_loss.compute_reco_loss`.

Config keys (reco.py:253-262): ``conf_thresh``, ``eash_conf_thresh`` (the
reference's typo key, aliased to ``easy_conf_thresh``), ``hard_conf_thresh``,
``contr_temp``, ``contr_num_queries``, ``contr_num_negatives``.
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
from ..ops.reco_loss import compute_reco_loss
from ..utils.train_state import ModelState, ema_update
from .base import aux_loss_weights


def make_train_step(model, tx, config, updates_per_epoch):
    seed = config["seed"]
    train_cfg = config["train"]
    ema_decay = train_cfg.get("ema_decay", 0.99)
    accum = train_cfg.get("accum_iter", 1) or 1
    conf_thresh = train_cfg["conf_thresh"]
    easy_thresh = train_cfg.get("easy_conf_thresh",
                                train_cfg.get("eash_conf_thresh", 0.65))
    hard_thresh = train_cfg.get("hard_conf_thresh", 0.80)
    temp = train_cfg.get("contr_temp", 0.25)
    num_queries = train_cfg.get("contr_num_queries", 256)
    num_negatives = train_cfg.get("contr_num_negatives", 512)

    def train_step(state, batch):
        rngs = step_rngs(seed, state.step)
        reco_rng = jax.random.fold_in(jax.random.key(seed + 7), state.step)
        ecg_x, mask_x = batch["ecg"], batch["target"]
        ecg_u_w, ecg_u_s = batch["ecg_u_w"], batch["ecg_u_s"]
        num_lb = ecg_x.shape[0]

        pred_u_w = apply_eval(model, state.ema, ecg_u_w)["seg_logits"]
        prob_u_w = jax.nn.softmax(pred_u_w.astype(jnp.float32), axis=1)
        conf_u_w = jnp.max(prob_u_w, axis=1)
        conf_mask = (conf_u_w >= conf_thresh).astype(jnp.float32)
        prob_u_w = jax.lax.stop_gradient(prob_u_w)
        conf_mask = jax.lax.stop_gradient(conf_mask)

        def loss_fn(params):
            out, new_stats = apply_train(
                model, params, state.model.batch_stats,
                jnp.concatenate([ecg_x, ecg_u_s], axis=0), rngs,
                return_latent=True,
            )
            pred_x = out["seg_logits"][:num_lb]
            pred_u_s = out["seg_logits"][num_lb:]
            latent_u_s = out["latent"][num_lb:]
            loss_x = cross_entropy(pred_x, mask_x)
            if "aux_seg_logits" in out:
                for w, aux in zip(
                    aux_loss_weights(train_cfg, len(out["aux_seg_logits"])),
                    out["aux_seg_logits"],
                ):
                    loss_x = loss_x + w * cross_entropy(aux[:num_lb], mask_x)
            loss_u_s = soft_cross_entropy(pred_u_s, prob_u_w, mask=conf_mask)
            contr = compute_reco_loss(
                reco_rng,
                latent_u_s,
                prob_u_w,
                jax.nn.softmax(pred_u_s.astype(jnp.float32), axis=1),
                easy_threshold=easy_thresh,
                hard_threshold=hard_thresh,
                temp=temp,
                num_queries=num_queries,
                num_negatives=num_negatives,
            )
            loss = (loss_x + loss_u_s + contr) / 3.0
            return loss, (new_stats, loss_x, loss_u_s, contr)

        (loss, (new_stats, loss_x, loss_u_s, contr)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.model.params)
        )
        new_params, new_opt = sgd_update(
            tx, grads, state.opt_state, state.model.params
        )
        new_model = ModelState(new_params, new_stats)
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
            "contr_loss": contr,
            "mask_ratio": jnp.mean(conf_mask),
            "loss": loss,
        }
        return new_state, metrics

    return train_step


SPEC = AlgorithmSpec(
    name="reco",
    make_train_step=make_train_step,
    uses_unlabeled=True,
    uses_ema=True,
)


def train(config):
    run_training(config, SPEC)


def test(config):
    return run_test(config)
