"""ST++: 3-stage self-training with reliability-ranked pseudo-labels
(``algorithm: stpp``).

Parity with the reference pipeline (src/algorithms/stpp.py:737-752):

1. ``train_sup`` — supervised stage saving snapshot checkpoints at ⅓ / ⅔ /
   final epochs (stpp.py:377-386) under ``{exp}/stage1``;
2. ``prepare_semisup`` — rank unlabeled samples by the mean per-sample mIoU
   agreement of the ⅓/⅔ snapshots against the final snapshot
   (``select_reliable``, stpp.py:45-88), keep the top half. The reference's
   shadowed-loop-index bug (stpp.py:51 vs :72 — stored ids are wrong) is
   fixed: ranking uses true dataset indices. The pass is batched and
   mesh-sharded instead of batch-size-1 (stpp.py:56-57);
3. ``train_semisup`` stage 2 (reliable half, teacher = stage-1 best) under
   ``{exp}/stage2``, then stage 3 (all unlabeled, teacher = stage-2 best) in
   the experiment root (stpp.py:544-548).

Stage teachers are frozen (stpp.py:593-594) and live in the state's ``ema``
slot without EMA updates. The semi-supervised loss is hard CE on the *weak*
unlabeled view (stpp.py:150-178).

Host-side orchestration stays sequential by nature, but there is no process
-group teardown dance (stpp.py:739-748): one JAX runtime spans all stages.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    AlgorithmSpec,
    apply_eval,
    apply_train,
    init_model_state,
    run_test,
    run_training,
    sgd_update,
    step_rngs,
)
from ..config import experiment_dir, test_cfg
from ..data.dataset import build_seg_dataset
from ..data.loader import get_dataloader
from ..models import build_model_from_config
from ..ops.losses import cross_entropy
from ..ops.metrics import per_sample_miou, segmentation_stats
from ..parallel.mesh import data_parallel_size, make_mesh, shard_batch
from ..utils import checkpoint as ckpt
from ..utils.logging import log
from ..utils.train_state import ModelState
from .base import SPEC as BASE_SPEC, aux_loss_weights


def calculate_miou(inter: np.ndarray, psum: np.ndarray, tsum: np.ndarray,
                   ignore_background: bool = False) -> np.ndarray:
    """Per-sample mIoU between two prediction maps (stpp.py:32-42 parity:
    classes with empty union contribute 0) — shared with the MeanIoU
    metric via :func:`..ops.metrics.per_sample_miou`."""
    return per_sample_miou(inter, psum, tsum,
                           include_background=not ignore_background)


def select_reliable(
    model, snapshot_states: List[ModelState], loader, mesh, num_classes: int,
    return_values: bool = False,
):
    """Reliability ranking (stpp.py:45-88): agreement of each earlier
    snapshot with the final one, averaged; descending sort; top half.

    ``return_values`` additionally returns the per-sample reliability
    array (dataset order) — used by parity tests to distinguish real
    ranking divergence from fp32 near-ties."""

    @jax.jit
    def agreement_fn(states, batch):
        """One program: every snapshot's forward + argmax + pairwise count
        stats vs the final snapshot → (S-1, B, C) int arrays. One D2H
        fetch per batch instead of a device→host→device bounce."""
        preds = [
            jnp.argmax(apply_eval(model, s, batch["ecg"])["seg_logits"],
                       axis=1)
            for s in states
        ]
        stats = [segmentation_stats(p, preds[-1], num_classes)
                 for p in preds[:-1]]
        return tuple(jnp.stack([s[i] for s in stats]) for i in range(3))

    n = len(loader.dataset)
    mat = loader.step_indices()
    reliability = np.zeros(n)
    local_rows = []
    for step, batch in enumerate(loader):
        counts = agreement_fn(snapshot_states, shard_batch(mesh, batch))
        if jax.process_count() > 1:
            # (S-1, B, C) global arrays, batch sharded on dim 1: fetch only
            # this host's rows (others' shards are non-addressable)
            from jax.experimental.multihost_utils import (
                global_array_to_host_local_array,
            )
            from jax.sharding import PartitionSpec

            from ..parallel.mesh import DATA_AXIS

            counts = tuple(
                global_array_to_host_local_array(
                    c, mesh, PartitionSpec(None, DATA_AXIS))
                for c in counts
            )
        inter, psum, tsum = (np.asarray(c) for c in counts)
        flat = mat[step].reshape(-1)
        local_rows.append(flat)
        mious = [calculate_miou(inter[s], psum[s], tsum[s])
                 for s in range(inter.shape[0])]
        reliability[flat] = np.mean(mious, axis=0)
    if jax.process_count() > 1:
        # each host ranked its own shards; exchange (row, value) pairs and
        # scatter peers' rows in place — O(N) total, not O(N x n_hosts)
        from .common import _allgather_rows

        rows = (np.concatenate(local_rows) if local_rows
                else np.zeros((0,), np.int64))
        _allgather_rows(rows, [reliability])
    order = np.argsort(-reliability, kind="stable")
    half = len(order) // 2
    if return_values:
        return order[:half].tolist(), order[half:].tolist(), reliability
    return order[:half].tolist(), order[half:].tolist()


def snapshot_epoch_list(num_epochs: int) -> List[int]:
    """Stage-1 snapshot epochs 1/3, 2/3, final (stpp.py:377-386), clamped to
    >= 1: checkpoints are written after epoch ``e`` completes (key
    ``epoch + 1``), so epoch 0 can never be saved and tiny-epoch smoke runs
    would otherwise crash loading ``checkpoint-0.ckpt``. Duplicates are fine
    — the same snapshot just participates twice in the agreement mean."""
    return [max(num_epochs // 3, 1), max(num_epochs * 2 // 3, 1),
            max(num_epochs, 1)]


def prepare_semisup(config, return_values: bool = False):
    """Load the 3 stage-1 snapshots and rank the unlabeled set
    (stpp.py:452-484). Returns the reliable ids (plus the per-sample
    reliability array when ``return_values``)."""
    mesh = make_mesh(config)
    ds = build_seg_dataset(config["dataset"], split="train_unlabeled",
                           mode="eval")
    from .common import _host_shard_args, loader_worker_type, loader_workers

    num_shards = data_parallel_size(mesh)
    loader = get_dataloader(
        ds, mode="eval", batch_size=config["dataloader"]["batch_size"],
        seed=config["seed"], num_shards=num_shards,
        num_workers=loader_workers(config["dataloader"]),
        worker_type=loader_worker_type(config["dataloader"]),
        **_host_shard_args(num_shards),
    )
    model = build_model_from_config(config, train=False)
    template = init_model_state(model, config, config["seed"])
    num_epochs = config["train"]["epochs"]
    states = []
    stage1 = os.path.join(experiment_dir(config), "stage1")
    for e in snapshot_epoch_list(num_epochs):
        payload = ckpt.load_checkpoint(
            os.path.join(stage1, f"checkpoint-{e}.ckpt")
        )
        states.append(ckpt.restore_model_state(payload["model"], template))
    reliable, _unreliable, values = select_reliable(
        model, states, loader, mesh, config["metric"]["num_classes"],
        return_values=True,
    )
    log(f"ST++ reliability ranking: {len(reliable)} reliable / "
        f"{len(_unreliable)} unreliable unlabeled samples")
    if return_values:
        return reliable, values
    return reliable


def make_train_step(model, tx, config, updates_per_epoch):
    """Self-training step: frozen teacher's hard labels on the weak view
    (stpp.py:150-178)."""
    seed = config["seed"]
    train_cfg = config["train"]

    def train_step(state, batch):
        rngs = step_rngs(seed, state.step)
        ecg_x, mask_x = batch["ecg"], batch["target"]
        ecg_u_w = batch["ecg_u_w"]
        num_lb = ecg_x.shape[0]

        mask_u_w = jnp.argmax(
            apply_eval(model, state.ema, ecg_u_w)["seg_logits"], axis=1
        )
        mask_u_w = jax.lax.stop_gradient(mask_u_w)

        def loss_fn(params):
            out, new_stats = apply_train(
                model, params, state.model.batch_stats,
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
            loss_u_s = cross_entropy(pred_u, mask_u_w)
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
            # state.ema (the stage teacher) is intentionally untouched
        )
        return new_state, {"loss_total": loss, "loss_x": loss_x,
                           "loss_u_s": loss_u_s, "loss": loss}

    return train_step


def _load_stage_teacher(stage_id: int):
    def hook(config, model, state):
        target_metric = test_cfg(config).get("target_metric", "MeanIoU")
        path = os.path.join(
            experiment_dir(config), f"stage{stage_id - 1}",
            f"best-{target_metric}.ckpt",
        )
        payload = ckpt.load_checkpoint(path)
        log(f"Load teacher model from {path}")
        teacher = ckpt.restore_model_state(payload["model"], state.model)
        return state.replace(ema=teacher)

    return hook


SEMISUP_SPEC = AlgorithmSpec(
    name="stpp",
    make_train_step=make_train_step,
    uses_unlabeled=True,
    uses_ema=True,  # the slot holds the frozen stage teacher
)


def train_sup(config):
    """Stage 1 (stpp.py:248-449): supervised + ⅓/⅔/final snapshots."""
    snapshots = set(snapshot_epoch_list(config["train"]["epochs"]))
    run_training(config, BASE_SPEC, output_subdir="stage1",
                 snapshot_epochs=snapshots)


def train_semisup(config, stage_id: int, unlabeled_subset_ids=None):
    """Stages 2/3 (stpp.py:488-735)."""
    run_training(
        config,
        SEMISUP_SPEC,
        output_subdir=("stage2" if stage_id == 2 else None),
        unlabeled_subset_ids=unlabeled_subset_ids,
        state_hook=_load_stage_teacher(stage_id),
    )


def train(config):
    train_sup(config)
    reliable_ids = prepare_semisup(config)
    train_semisup(config, stage_id=2, unlabeled_subset_ids=reliable_ids)
    train_semisup(config, stage_id=3)


def test(config):
    return run_test(config)
