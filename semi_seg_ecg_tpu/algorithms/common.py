"""Shared training machinery for every algorithm.

The reference repeats a ~300-line imperative train loop per algorithm
(base.py:248-439, fixmatch.py:195-408, ...). Here the loop exists once:
algorithms differ only in (a) whether they consume unlabeled batches /
an EMA teacher / a peer model, and (b) the body of one pure
``train_step(state, batch) → (state, metrics)`` that jit compiles over the
mesh. Everything an epoch does on device — forward(s), loss composition,
backward, optimizer update, EMA fold, BN stat sync — is one XLA program per
step; the host only feeds sharded batches and drains scalar metrics at the
print cadence (no per-step blocking sync like the reference's
``torch.cuda.synchronize``, base.py:150).

Evaluation is sharded over the mesh: the jitted eval step emits per-sample
losses + per-sample per-class counts, the host scatters them back into
dataset order via the loader's index matrix (de-duplicating padded rows),
then replays metric updates in the reference's eval batch grouping so
MeanIoU matches a single-process torchmetrics run exactly (SURVEY §2 ⑯
fixes the ×world_size duplicated-gather quirk).
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..config import experiment_dir, test_cfg
from ..data.dataset import build_seg_dataset
from ..data.loader import get_dataloader
from ..models import build_model_from_config
from ..ops.losses import per_sample_cross_entropy
from ..ops.metrics import (
    build_metric_fn,
    flatten_metric_dict,
    is_best_metric,
    segmentation_stats,
)
from ..parallel.dist import init_distributed_mode, is_main_process
from ..parallel.mesh import (
    data_parallel_size,
    make_mesh,
    shard_batch,
)
from ..utils import checkpoint as ckpt
from ..utils.logging import JsonlLogger, MetricLogger, TensorBoardWriter, log
from ..utils.optimizer import build_optimizer, make_lr_schedule, resolve_lr
from ..utils.profiling import ProfileSchedule, device_memory_mb
from ..utils.train_state import ModelState, TrainState

PRINT_FREQ = 20


# ---------------------------------------------------------------------------
# Spec: what varies between algorithms
# ---------------------------------------------------------------------------


@dataclass
class AlgorithmSpec:
    """Hooks + flags a training algorithm plugs into the shared driver."""

    name: str
    # (model, tx, config, steps_per_epoch) -> fn(state, batch) -> (state, metrics)
    make_train_step: Callable[..., Callable]
    uses_unlabeled: bool = False
    uses_ema: bool = False
    uses_peer: bool = False
    # extra state initialisation tweaks, e.g. loading a stage teacher (ST++)
    post_init_state: Optional[Callable] = None
    extra: Dict[str, Any] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# Model/state assembly
# ---------------------------------------------------------------------------


def model_rngs(seed: int):
    k = jax.random.key(seed)
    return {
        "params": jax.random.fold_in(k, 0),
        "dropout": jax.random.fold_in(k, 1),
        "droppath": jax.random.fold_in(k, 2),
    }


def init_model_state(model, config, seed: int) -> ModelState:
    sig_len = config["dataset"].get("signal_length", 2500)
    num_leads = 1
    dummy = jnp.zeros((2, num_leads, sig_len), jnp.float32)
    # trace every param-creating path: the latent projection (ReCo) and the
    # auxiliary heads, which only run when train=True
    # (encoder_decoder.py:108) — init in eval mode would skip their params
    # and crash the first jitted train step
    variables = model.init(
        model_rngs(seed), dummy,
        train=model.with_auxiliary_heads,
        return_latent=model.with_projection,
    )
    batch_stats = variables.get("batch_stats", {})
    return ModelState(params=variables["params"], batch_stats=batch_stats)


def load_pretrained_backbone(config, model_state: ModelState) -> ModelState:
    """``mode != scratch`` backbone warm-start (base.py:289-303).

    Accepts a framework checkpoint whose ``model.params`` contains a
    ``backbone`` subtree (or is itself a backbone tree), or a reference-format
    torch ``.pth`` — either a full-model or a bare-backbone state_dict
    (base.py:296 loads the latter with ``model.backbone.load_state_dict``)."""
    path = config["pretrained_backbone"]
    payload = ckpt.load_checkpoint(path)
    log(f"Load backbone from {path}")
    model_payload = payload.get("model", payload) \
        if isinstance(payload, dict) else payload
    if ckpt.is_torch_state_dict(model_payload):
        from ..utils.torch_interop import torch_sd_to_trees

        sd = model_payload
        if any(k.startswith("backbone.") for k in sd):
            sd = {k[len("backbone."):]: v for k, v in sd.items()
                  if k.startswith("backbone.")}
        bb_params, bb_stats = torch_sd_to_trees(
            sd, model_state.params["backbone"],
            model_state.batch_stats.get("backbone", {}), backbone_only=True,
        )
        params = dict(model_state.params)
        params["backbone"] = bb_params
        stats = dict(model_state.batch_stats)
        if "backbone" in stats:
            stats["backbone"] = bb_stats
        return ModelState(params=params, batch_stats=stats)
    src = model_payload["params"]
    src_stats = model_payload.get("batch_stats", {})
    if "backbone" in src:
        src, src_stats = src["backbone"], src_stats.get("backbone", {})
    params = dict(model_state.params)
    params["backbone"] = ckpt._restore_by_path(
        src, model_state.params["backbone"], "backbone"
    )
    stats = dict(model_state.batch_stats)
    if "backbone" in stats and src_stats:
        stats["backbone"] = ckpt._restore_by_path(
            src_stats, stats["backbone"], "backbone_stats"
        )
    return ModelState(params=params, batch_stats=stats)


def build_state(
    config, model, tx, spec: AlgorithmSpec, seed: int, student=None
) -> TrainState:
    if student is None:
        student = init_model_state(model, config, seed)
        if config.get("mode", "scratch") != "scratch":
            student = load_pretrained_backbone(config, student)
    ema = None
    if spec.uses_ema:
        # teacher starts as a frozen copy of the student
        # (mean_teacher.py:281-291)
        ema = ModelState(
            params=jax.tree.map(jnp.array, student.params),
            batch_stats=jax.tree.map(jnp.array, student.batch_stats),
        )
    peer = None
    peer_opt = None
    if spec.uses_peer:
        # CPS: an independently initialised second network (cps.py:270-276)
        peer = init_model_state(model, config, seed + 10_000)
        if config.get("mode", "scratch") != "scratch":
            peer = load_pretrained_backbone(config, peer)
        peer_opt = tx.init(peer.params)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        model=student,
        opt_state=tx.init(student.params),
        ema=ema,
        peer=peer,
        peer_opt_state=peer_opt,
    )


def apply_train(model, params, batch_stats, x, rngs, labels=None,
                return_loss=False, return_latent=False):
    """One training-mode forward with mutable BN stats."""
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x, labels=labels, return_loss=return_loss,
        return_latent=return_latent, train=True,
        rngs=rngs, mutable=["batch_stats"],
    )
    return out, mutated["batch_stats"]


def apply_eval(model, model_state: ModelState, x, return_latent=False):
    """Inference-mode forward (running BN stats, no dropout) — the analogue
    of the reference's ``model.eval()`` pseudo-label passes."""
    return model.apply(
        {"params": model_state.params, "batch_stats": model_state.batch_stats},
        x, train=False, return_latent=return_latent,
    )


def step_rngs(seed: int, step):
    k = jax.random.fold_in(jax.random.key(seed), step)
    return {
        "dropout": jax.random.fold_in(k, 1),
        "droppath": jax.random.fold_in(k, 2),
    }


def sgd_update(tx, grads, opt_state, params):
    import optax

    updates, new_opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


# ---------------------------------------------------------------------------
# Data plumbing
# ---------------------------------------------------------------------------


def loader_workers(dataloader_cfg: Dict[str, Any]) -> int:
    """num_workers with an unset default of 4 — an EXPLICIT 0 means
    synchronous single-threaded loading and must not be coerced back."""
    n = dataloader_cfg.get("num_workers", 4)
    return 4 if n is None else int(n)


def loader_worker_type(dataloader_cfg: Dict[str, Any]) -> str:
    """``worker_type``: ``thread`` (default) or ``process`` — forked worker
    processes, the reference torch DataLoader's own mechanism, for
    multi-core hosts where the pipeline's Python fraction is GIL-bound."""
    return dataloader_cfg.get("worker_type", None) or "thread"


def _host_shard_args(num_shards: int) -> Dict[str, int]:
    """Each process materialises only its own slice of the data-parallel
    shards (multi-host input sharding; single-process: the full range)."""
    procs = jax.process_count()
    assert num_shards % procs == 0, (
        f"data-parallel shards ({num_shards}) must divide evenly across "
        f"processes ({procs}); uneven splits would silently drop shards"
    )
    local = num_shards // procs
    return {
        "shard_offset": jax.process_index() * local,
        "local_shards": local,
    }


def build_train_loaders(config, mesh, spec: AlgorithmSpec,
                        unlabeled_subset_ids=None):
    eval_cfg = ds_cfg = config["dataset"]
    lab_cfg = unlab_cfg = ds_cfg
    if ds_cfg.get("device_augment", False):
        # the plan decides per branch what the host still computes and what
        # runs fused on device (ops/preprocess.py); ops without a device
        # equivalent stay host-side instead of failing the run. Eval keeps
        # the standard host path.
        from ..ops.preprocess import plan_device_augment

        plan = plan_device_augment(ds_cfg)
        lab_cfg = {**ds_cfg, **plan.labeled_overrides}
        unlab_cfg = {**ds_cfg, **plan.unlabeled_overrides}
    seed = config["seed"]
    num_shards = data_parallel_size(mesh)
    shard_args = _host_shard_args(num_shards)
    batch_size = config["dataloader"]["batch_size"]
    num_workers = loader_workers(config["dataloader"])
    worker_type = loader_worker_type(config["dataloader"])
    drop_last = config["dataloader"].get("drop_last", None)

    loaders: Dict[str, Any] = {}
    if spec.uses_unlabeled:
        ds_unlab = build_seg_dataset(unlab_cfg, split="train_unlabeled")
        if unlabeled_subset_ids is not None:
            from ..data.dataset import Subset

            ds_unlab = Subset(ds_unlab, unlabeled_subset_ids)
        num_unlabeled = len(ds_unlab)
        ds_lab = build_seg_dataset(
            lab_cfg, split="train_labeled", num_unlabeled=num_unlabeled
        )
        loaders["unlabeled"] = get_dataloader(
            ds_unlab, mode="train", batch_size=batch_size, seed=seed,
            num_shards=num_shards, num_workers=num_workers, rng_salt=1,
            drop_last=drop_last, worker_type=worker_type, **shard_args,
        )
        log(f"Unlabeled: {num_unlabeled} samples / "
            f"{len(loaders['unlabeled'])} batches")
    else:
        ds_lab = build_seg_dataset(lab_cfg, split="train_labeled")
    loaders["labeled"] = get_dataloader(
        ds_lab, mode="train", batch_size=batch_size, seed=seed,
        num_shards=num_shards, num_workers=num_workers, rng_salt=0,
        drop_last=drop_last, worker_type=worker_type, **shard_args,
    )
    log(f"Labeled: {len(ds_lab)} samples / {len(loaders['labeled'])} batches")
    ds_valid = build_seg_dataset(eval_cfg, split="valid")
    loaders["valid"] = get_dataloader(
        ds_valid, mode="valid", batch_size=batch_size, seed=seed,
        num_shards=num_shards, num_workers=num_workers, rng_salt=2,
        worker_type=worker_type, **shard_args,
    )
    if spec.uses_unlabeled:
        assert len(loaders["labeled"]) == len(loaders["unlabeled"]), \
            "The number of labeled and unlabeled data should be the same"
    return loaders


def combined_batches(loaders, spec: AlgorithmSpec):
    """Yield merged step dicts: labeled ``ecg``/``target`` + unlabeled
    weak/strong views (``ecg_u_w``/``ecg_u_s``)."""
    if not spec.uses_unlabeled:
        yield from loaders["labeled"]
        return
    for labeled, unlabeled in zip(loaders["labeled"], loaders["unlabeled"]):
        if "idx" in labeled:  # device_cache mode: index-only batches
            yield {"idx": labeled["idx"], "idx_u": unlabeled["idx_u"]}
            continue
        batch = {"ecg": labeled["ecg"], "target": labeled["target"],
                 "ecg_u_w": unlabeled["ecg"]}
        if "ecg_aug" in unlabeled:
            batch["ecg_u_s"] = unlabeled["ecg_aug"]
        yield batch


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def make_eval_step(model, num_classes: int):
    def eval_step(model_state: ModelState, batch):
        out = apply_eval(model, model_state, batch["ecg"])
        logits = out["seg_logits"].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=1)
        preds = jnp.argmax(probs, axis=1)
        labels = batch["target"]
        inter, psum, tsum = segmentation_stats(preds, labels, num_classes)
        loss = per_sample_cross_entropy(logits, labels)
        return {"probs": probs, "loss": loss, "inter": inter, "psum": psum,
                "tsum": tsum}

    return jax.jit(eval_step)


def _allgather_rows(rows: np.ndarray, arrays):
    """Cross-host reassembly of per-sample arrays by (row-index, row-value)
    exchange. ``rows`` are the dataset indices this host computed; every
    ``arrays[i]`` is the full-size (N, ...) buffer with only those rows
    filled. Hosts exchange compacted rows — equal counts per host, thanks to
    the padded DistributedSampler — and scatter peers' rows in place.
    Replaces a full-array allgather (O(N x n_hosts) peak) with O(N) total.
    """
    from jax.experimental import multihost_utils

    payload = {"rows": rows.astype(np.int64)}
    for i, a in enumerate(arrays):
        payload[str(i)] = a[rows]
    gathered = multihost_utils.process_allgather(payload)
    for i, a in enumerate(arrays):
        vals = gathered[str(i)]
        for p in range(vals.shape[0]):
            if p == jax.process_index():
                continue  # own rows are already in place
            a[gathered["rows"][p]] = vals[p]
    return arrays


def evaluate(
    model,
    model_state: ModelState,
    loader,
    metric_fn,
    mesh,
    num_classes: int,
    eval_batch_size: Optional[int] = None,
    collect_outputs: bool = True,
    eval_step=None,
):
    """Sharded full-dataset evaluation (base.py:184-245 capability parity).

    Returns ``(valid_stats, metric_dict, outputs, labels_onehot)`` where
    ``outputs`` are softmax probabilities ``(N, C, T)`` in dataset order and
    ``labels_onehot`` is ``(N, C, T)`` int8 — the arrays the reference dumps
    as ``test_outputs.npy`` / ``test_labels.npy`` (base.py:484-498)."""
    if eval_step is None:
        eval_step = make_eval_step(model, num_classes)
    n = len(loader.dataset)
    mat = loader.step_indices()
    loss_ps = np.zeros(n)
    inter = np.zeros((n, num_classes), np.int64)
    psum = np.zeros((n, num_classes), np.int64)
    tsum = np.zeros((n, num_classes), np.int64)
    outputs = None
    labels_np = None
    local_rows: list = []  # dataset indices this host computed, in order
    t0 = time.time()

    def _absorb(step, batch, out):
        nonlocal outputs, labels_np
        if jax.process_count() > 1:
            # global arrays span other hosts' devices; fetch only the rows
            # this host computed (its loader shards, in shard order)
            from jax.experimental.multihost_utils import (
                global_array_to_host_local_array,
            )
            from ..parallel.mesh import DATA_AXIS
            from jax.sharding import PartitionSpec

            out = {
                k: global_array_to_host_local_array(
                    v, mesh, PartitionSpec(DATA_AXIS))
                for k, v in out.items()
            }
        out = jax.device_get(out)
        flat = mat[step].reshape(-1)
        local_rows.append(flat)
        loss_ps[flat] = out["loss"]
        inter[flat] = out["inter"]
        psum[flat] = out["psum"]
        tsum[flat] = out["tsum"]
        if collect_outputs:
            if outputs is None:
                outputs = np.zeros((n,) + out["probs"].shape[1:], np.float32)
                labels_np = np.zeros((n,) + batch["target"].shape[1:],
                                     np.int64)
            outputs[flat] = out["probs"]
            labels_np[flat] = batch["target"]

    # double-buffered: dispatch batch i+1 before pulling batch i's results,
    # so D2H transfer + host scatter overlap the next forward
    from collections import deque

    inflight: deque = deque()
    for step, batch in enumerate(loader):
        sharded = shard_batch(mesh, batch)
        fut = eval_step(
            ModelState(model_state.params, model_state.batch_stats), sharded
        )
        inflight.append((step, batch, fut))
        if len(inflight) >= 2:
            _absorb(*inflight.popleft())
    while inflight:
        _absorb(*inflight.popleft())

    if jax.process_count() > 1:
        # Streaming reassembly: every host ships only the rows it computed
        # (the DistributedSampler pads shards to equal size, so per-host row
        # counts match) plus their dataset indices; hosts scatter each
        # other's rows into place. Peak memory is O(N) rows total per host —
        # not O(N x n_hosts) as a full-array allgather would be. Duplicated
        # (padded) rows carry identical values, so write order is free.
        arrays = [loss_ps, inter, psum, tsum]
        if collect_outputs:
            arrays += [outputs, labels_np]
        rows = (np.concatenate(local_rows) if local_rows
                else np.zeros((0,), np.int64))
        _allgather_rows(rows, arrays)  # scatters peers' rows in place
    # replay metric updates in the reference's sequential batch grouping
    if eval_batch_size is None:
        eval_batch_size = loader.batch_size
    for lo in range(0, n, eval_batch_size):
        sel = slice(lo, lo + eval_batch_size)
        metric_fn.update(inter[sel], psum[sel], tsum[sel])
    metrics = metric_fn.compute()
    metric_dict = flatten_metric_dict(metrics)
    metric_fn.reset()
    valid_stats = {"loss": float(loss_ps.mean())}
    metric_str = "  ".join(f"{k}: {v:.3f}" for k, v in metric_dict.items())
    log(f"* {metric_str}  loss: {valid_stats['loss']:.3f}  "
        f"({time.time() - t0:.1f}s)")
    labels_onehot = None
    if collect_outputs:
        eye = np.eye(num_classes, dtype=np.int64)
        labels_onehot = eye[labels_np].transpose(0, 2, 1)  # (N, C, T)
    return valid_stats, metric_dict, outputs, labels_onehot


# ---------------------------------------------------------------------------
# The shared train driver
# ---------------------------------------------------------------------------


def run_training(config: Dict[str, Any], spec: AlgorithmSpec,
                 output_subdir: Optional[str] = None,
                 unlabeled_subset_ids=None,
                 snapshot_epochs=(), state_hook=None) -> None:
    """End-to-end training (base.py:248-439 and its five siblings).

    ``output_subdir``/``snapshot_epochs``/``unlabeled_subset_ids`` serve the
    ST++ pipeline (stage dirs, ⅓/⅔/full snapshots, reliable-subset stage 2).
    """
    init_distributed_mode(config.get("ddp"))
    log(f"job dir: {os.getcwd()}")
    log(yaml.dump(config, default_flow_style=False, sort_keys=False))

    mesh = make_mesh(config)
    seed = config["seed"]
    dp = data_parallel_size(mesh)

    from ..parallel.mesh import seq_parallel_size

    if seq_parallel_size(mesh) > 1 and any(
            config["dataset"].get(k, False)
            for k in ("device_augment", "device_cache")):
        # the fused device-augment/cache paths gather along the time axis
        # through data-axis-only shard_map wrappers (ops/pallas/gather1d);
        # under sequence parallelism they would silently all-gather the
        # sharded time axis every step — run them on the host instead.
        # Override on a local copy: the caller's config dict must not be
        # mutated (a sweep reusing one config across runs would otherwise
        # silently lose the fused paths on later non-SP runs).
        config = {**config, "dataset": dict(config["dataset"])}
        for knob in ("device_augment", "device_cache"):
            if config["dataset"].get(knob, False):
                log(f"{knob} disabled: seq_parallel shards the time axis "
                    "and the fused augment path assumes data-only "
                    "sharding — using the host augmentation path",
                    force=True)
                config["dataset"][knob] = False

    loaders = build_train_loaders(config, mesh, spec, unlabeled_subset_ids)
    steps_per_epoch = len(loaders["labeled"])
    assert steps_per_epoch > 0, "empty train loader"

    out_dir = experiment_dir(config)
    if out_dir and output_subdir:
        out_dir = os.path.join(out_dir, output_subdir)
    log_writer = None
    if is_main_process() and out_dir:
        os.makedirs(out_dir, exist_ok=True)
        log_writer = TensorBoardWriter(out_dir)
    jsonl = JsonlLogger(out_dir if is_main_process() else None)

    model = build_model_from_config(config, train=True)
    resolve_lr(config, dp)
    eff = config["train"]["eff_batch_size"]
    log(f"base lr: {config['train']['lr'] * 256 / eff}")
    log(f"actual lr: {config['train']['lr']}")
    log(f"accumulate grad iterations: {config['train'].get('accum_iter', 1)}")
    log(f"effective batch size: {eff}")

    accum = config["train"].get("accum_iter", 1) or 1
    updates_per_epoch = max(steps_per_epoch // accum, 1)
    student = init_model_state(model, config, seed)
    if config.get("mode", "scratch") != "scratch":
        student = load_pretrained_backbone(config, student)
    tx = build_optimizer(config, student.params, updates_per_epoch,
                         model=model)
    if accum > 1:
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    state = build_state(config, model, tx, spec, seed, student=student)
    if spec.post_init_state is not None:
        state = spec.post_init_state(config, model, state)
    if state_hook is not None:
        state = state_hook(config, model, state)
    state = ckpt.maybe_resume(config, state)
    from ..parallel.sharding_rules import shard_state, state_shardings

    # DP: everything replicated; with a model axis the TP rules shard the
    # transformer projections (and their Adam moments / EMA / peer copies);
    # parallel.shard_optimizer adds ZeRO-1 moment sharding over `data`
    shard_opt = bool(config.get("parallel", {}).get(
        "shard_optimizer", False)) and dp > 1
    if shard_opt and jax.process_count() > 1 and \
            config.get("checkpoint_backend", "pickle") != "orbax":
        # the native single-file writer fetches whole arrays; moment
        # shards on other hosts are not addressable from rank 0
        log("shard_optimizer: multi-host runs need checkpoint_backend: "
            "orbax - proceeding with replicated optimizer state",
            force=True)
        shard_opt = False
    state = shard_state(mesh, state, shard_optimizer=shard_opt)

    lr_fn = make_lr_schedule(config["train"], updates_per_epoch)
    inner_step = spec.make_train_step(model, tx, config, updates_per_epoch)
    if config["dataset"].get("device_augment", False):
        from ..ops.preprocess import plan_device_augment

        plan = plan_device_augment(config["dataset"])
        log(f"device_augment: {plan.summary}")
        if plan.augment is not None:
            aug_fn = plan.augment
            aug_seed = seed + 0x5EED

            def _aug_step(state, batch, _inner=inner_step):
                key = jax.random.fold_in(jax.random.key(aug_seed),
                                         state.step)
                return _inner(state, aug_fn(key, batch))

            inner_step = _aug_step
        if config["dataset"].get("device_cache", False):
            from ..data.device_cache import (
                DeviceCache, plan_allows_device_cache,
            )

            reason = plan_allows_device_cache(config, spec)
            if reason is None:
                cache = DeviceCache.build(loaders, mesh)
                loaders.update(cache.index_loaders)
                inner_step = cache.wrap_step(inner_step)
                log(f"device_cache: {cache.bytes_uploaded / 1e6:.1f} MB "
                    "raw prefix resident in HBM; steps ship indices only")
            else:
                log(f"device_cache disabled: {reason}")
    if config.get("debug", {}).get("nan_checks", False):
        # NaN localisation beyond the reference's loss-only abort
        # (base.py:135-137): jax_debug_nans re-runs the offending op
        # un-jitted and raises at its source. Debug mode — slow.
        jax.config.update("jax_debug_nans", True)
    if shard_opt:
        # pin the output state's shardings: without the constraint the
        # partitioner is free to re-replicate the moments on the way out,
        # which silently undoes the ZeRO-1 memory saving
        _zero1_shardings = state_shardings(mesh, state,
                                           shard_optimizer=True)

        def _zero1_step(state, batch, _inner=inner_step):
            new_state, metrics = _inner(state, batch)
            new_state = jax.lax.with_sharding_constraint(
                new_state, _zero1_shardings)
            return new_state, metrics

        inner_step = _zero1_step
        log("shard_optimizer: Adam moments sharded over the data axis "
            f"({dp}-way); weight update runs reduce-scatter/all-gather")
    if bool(config["train"].get("fused_state", True)):
        # flat fused state buffers: the donated update writes one array per
        # dtype instead of ~430 tiny leaves, eliminating the per-leaf
        # aliasing copy pairs (6.9% of the B=64 step — NOTES.md). Layout
        # only; equivalent to the tree step (tests/test_fused_state.py).
        from ..utils.fused_state import (
            FuseMeta, FusedTrainState, fused_state_blocker, wrap_step,
        )

        fuse_reason = fused_state_blocker(mesh, shard_opt)
        if fuse_reason is None:
            fuse_meta = FuseMeta(state)
            _bufs, _pass = fuse_meta._jit_pack(state)
            state = FusedTrainState(buffers=_bufs, passthrough=_pass,
                                    meta=fuse_meta)
            inner_step = wrap_step(inner_step, fuse_meta)
            log(f"fused_state: {fuse_meta.summary()}")
        else:
            log(f"fused_state disabled: {fuse_reason}")
    train_step = jax.jit(inner_step, donate_argnums=0)
    # device-side multi-step loop: K steps per dispatch via lax.scan —
    # amortises host dispatch (2.3x vs per-step through a high-latency
    # link, slope-based timing in NOTES.md; a real win whenever per-step
    # dispatch latency rivals the step's compute time)
    scan_steps = int(config["train"].get("scan_steps", 1) or 1)
    scan_step = None
    if scan_steps > 1:
        def _scanned(state, stacked):
            return jax.lax.scan(
                lambda s, b: inner_step(s, b), state, stacked
            )

        scan_step = jax.jit(_scanned, donate_argnums=0)
    num_classes = config["metric"]["num_classes"]
    eval_step = make_eval_step(model, num_classes)
    metric_fn, best_metrics = build_metric_fn(config["metric"])

    num_epochs = config["train"]["epochs"]
    log(f"Start training for {num_epochs} epochs")
    best_loss = float("inf")
    resume_best = config.pop("_resume_best", None)
    if resume_best:
        # resumed runs keep their pre-crash thresholds: the first
        # post-resume epoch must not overwrite the true best-*.ckpt files
        best_loss = resume_best.get("loss", best_loss)
        for k, v in resume_best.items():
            if k in best_metrics:
                best_metrics[k] = v
        log(f"Resume: best-checkpoint thresholds restored: {resume_best}")
    start_time = time.time()

    for epoch in range(config.get("start_epoch", 0), num_epochs):
        for name in ("labeled", "unlabeled"):
            if name in loaders:
                loaders[name].set_epoch(epoch)
        state, train_stats = _train_one_epoch(
            train_step, state, loaders, spec, mesh, epoch, steps_per_epoch,
            lr_fn, accum, log_writer, config,
            scan_step=scan_step, scan_steps=scan_steps,
        )
        valid_stats, metrics, _, _ = evaluate(
            model, state.model, loaders["valid"], metric_fn, mesh,
            num_classes, collect_outputs=False, eval_step=eval_step,
        )
        curr_loss = valid_stats["loss"]

        # decide every checkpoint target first, then pull the state host-side
        # ONCE — device→host of params+optimizer is the expensive part
        save_paths = []
        if out_dir and (epoch + 1) in snapshot_epochs:
            save_paths.append(os.path.join(out_dir,
                                           f"checkpoint-{epoch + 1}.ckpt"))
        if out_dir and curr_loss < best_loss:
            best_loss = curr_loss
            save_paths.append(os.path.join(out_dir, "best-loss.ckpt"))
        for metric_name, metric_obj in metric_fn.items():
            if metric_obj.per_class:
                continue
            curr = metrics[metric_name]
            log(f"{metric_name}: {curr:.3f}")
            if out_dir and is_best_metric(
                metric_obj, best_metrics[metric_name], curr
            ):
                best_metrics[metric_name] = curr
                save_paths.append(
                    os.path.join(out_dir, f"best-{metric_name}.ckpt"))
            log(f"Best {metric_name}: {best_metrics[metric_name]:.3f}")
        if save_paths:
            # device-side snapshot (HBM copy, microseconds): the writer
            # thread fetches it D2H in the background, so checkpointing
            # never blocks the epoch loop on host-link bandwidth, and the
            # copies are immune to next-step buffer donation. One _save for
            # ALL paths: the payload (and its D2H fetch) is built once and
            # written to each destination.
            snap_state = jax.tree.map(jnp.copy, state)
            _save(config, save_paths, epoch, snap_state,
                  {"loss": curr_loss, **metrics},
                  best={"loss": best_loss, **best_metrics})

        if log_writer is not None:
            log_writer.add_scalar("perf/valid_loss", curr_loss, epoch)
            for k, v in metrics.items():
                log_writer.add_scalar(f"perf/{k}", v, epoch)
            log_writer.flush()
        jsonl.write({
            **{f"train_{k}": v for k, v in train_stats.items()},
            **{f"valid_{k}": v for k, v in valid_stats.items()},
            **metrics,
            "epoch": epoch,
            # cumulative wall clock: diffing consecutive rows gives honest
            # per-epoch times from ONE process/compile (the reference logs
            # only a final total, base.py:434-436)
            "wall_s": round(time.time() - start_time, 3),
        })

    ckpt.wait_for_pending()
    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    log(f"Training time {total}")
    if log_writer is not None:
        log_writer.close()


def _save(config, path, epoch, state: TrainState, metrics, best=None):
    from ..utils.fused_state import maybe_unfuse

    state = maybe_unfuse(state)  # checkpoints always see the tree view
    ckpt.save_checkpoint(
        path, epoch, state.model, opt_state=state.opt_state, config=config,
        metrics=metrics, ema_state=state.ema, peer_state=state.peer,
        peer_opt_state=state.peer_opt_state, step=int(state.step),
        async_write=bool(config.get("async_checkpoint", True)),
        backend=config.get("checkpoint_backend", "pickle"),
        defer_host_fetch=True,  # state is a device-side snapshot
        best=best,
    )


def _train_one_epoch(train_step, state, loaders, spec, mesh, epoch,
                     steps_per_epoch, lr_fn, accum, log_writer, config,
                     scan_step=None, scan_steps=1):
    from ..parallel.mesh import shard_stacked_batch

    logger = MetricLogger()
    pending = []  # (first_iter_index, device_metrics, inner_step_count)
    t_epoch = time.time()
    t_last = time.time()
    data_wait = 0.0
    profiler = ProfileSchedule(config.get("profile"))

    def drain():
        nonlocal pending
        if not pending:
            return
        host_vals = jax.device_get([m for _, m, _ in pending])
        for (first, _, count), vals in zip(pending, host_vals):
            for j in range(count):
                i = first + j
                scalars = {
                    k: float(v[j]) if count > 1 else float(v)
                    for k, v in vals.items()
                }
                if not math.isfinite(
                    scalars.get("loss", scalars.get("loss_total", 0.0))
                ):
                    log(f"Loss is {scalars}, stopping training", force=True)
                    # Detection is async (drain cadence), but always fires
                    # before this epoch's checkpoint decisions run, so no
                    # poisoned state is ever queued for writing. Flush the
                    # pending writes — they all predate this epoch — and
                    # point the operator at the last healthy checkpoint
                    # (reference base.py:135-137 aborts on-step; this is
                    # the pipelined equivalent with a restart story).
                    ckpt.wait_for_pending()
                    last_good = ckpt.last_written_checkpoint()
                    if last_good:
                        log(f"Last good checkpoint: {last_good}", force=True)
                    sys.exit(1)
                update_step = (epoch * steps_per_epoch + i) // accum
                scalars["lr"] = float(lr_fn(update_step))
                logger.update(**scalars)
                if log_writer is not None and (i + 1) % accum == 0:
                    # epoch_1000x x-axis (base.py:160-172 convention)
                    epoch_1000x = int((epoch + i / steps_per_epoch) * 1000)
                    for k, v in scalars.items():
                        log_writer.add_scalar(k, v, epoch_1000x)
        pending = []

    def progress(it):
        dt = time.time() - t_epoch
        per_it = dt / (it + 1)
        eta = str(datetime.timedelta(
            seconds=int(per_it * (steps_per_epoch - it - 1))
        ))
        mem = device_memory_mb()
        mem_part = f"  max mem: {mem:.0f}MB" if mem is not None else ""
        log(f"Epoch: [{epoch}]  [{it + 1}/{steps_per_epoch}]  "
            f"eta: {eta}  {logger}  time: {per_it:.4f}  "
            f"data: {data_wait / (it + 1):.4f}{mem_part}")

    from collections import deque

    def dispatch_units():
        """Yield ``(step_fn, device_payload, n_inner_steps)`` units.

        The scan path groups ``scan_steps`` host batches into one stacked
        upload + one K-step device program (the epoch tail shorter than the
        window falls back to per-step dispatch). Collation and the async
        H2D transfer happen here, ahead of dispatch, so the depth-2
        prefetch below overlaps them with the running program (the torch
        analogue is pin_memory + non_blocking H2D, base.py:119-120).
        """
        if scan_step is None:
            for b in combined_batches(loaders, spec):
                yield train_step, shard_batch(mesh, b), 1
            return
        buf = []
        for b in combined_batches(loaders, spec):
            buf.append(b)
            if len(buf) == scan_steps:
                stacked = {k: np.stack([x[k] for x in buf]) for k in buf[0]}
                yield scan_step, shard_stacked_batch(mesh, stacked), scan_steps
                buf = []
        for b in buf:
            yield train_step, shard_batch(mesh, b), 1

    def prefetched(units, depth: int = 2):
        q = deque()
        for unit in units:
            q.append(unit)
            if len(q) >= depth:
                yield q.popleft()
        while q:
            yield q.popleft()

    it = -1  # index of the last train step dispatched
    for step_fn, payload, count in prefetched(dispatch_units()):
        data_wait += time.time() - t_last
        first = it + 1
        it += count
        profiler.step(epoch * steps_per_epoch + first)
        state, metrics = step_fn(state, payload)
        pending.append((first, metrics, count))
        if (it + 1) // PRINT_FREQ != first // PRINT_FREQ \
                or it == steps_per_epoch - 1:
            drain()
            progress(it)
        t_last = time.time()
    drain()
    profiler.close()
    log(f"Averaged stats: {logger}")
    return state, logger.stats()


# ---------------------------------------------------------------------------
# Shared test / inference entries
# ---------------------------------------------------------------------------


def load_eval_model(config):
    """Build an eval-mode model and restore the requested checkpoint
    (base.py:455-469: best-{target_metric} by default, aux heads dropped)."""
    model = build_model_from_config(config, train=False, serving=True)
    model_state = init_model_state(model, config, config.get("seed", 0))
    if test_cfg(config).get("model_path", None):
        checkpoint_path = config["test"]["model_path"]
    else:
        target_metric = test_cfg(config).get("target_metric", "loss")
        checkpoint_path = os.path.join(
            experiment_dir(config), f"best-{target_metric}.ckpt"
        )
    assert os.path.exists(checkpoint_path), \
        f"Checkpoint not found: {checkpoint_path}"
    payload = ckpt.load_checkpoint(checkpoint_path)
    model_state = ckpt.restore_model_state(payload["model"], model_state)
    log(f"Loaded checkpoint {checkpoint_path}")
    return model, model_state


def run_test(config: Dict[str, Any]) -> Dict[str, float]:
    """test() parity (base.py:442-499): evaluate best checkpoint on the test
    split, write ``test_metrics.csv`` + ``test_outputs.npy`` +
    ``test_labels.npy``."""
    import pandas as pd

    init_distributed_mode(config.get("ddp"))
    out_dir = experiment_dir(config)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    mesh = make_mesh(config)
    ds_test = build_seg_dataset(config["dataset"], split="test")
    num_shards = data_parallel_size(mesh)
    loader = get_dataloader(
        ds_test, mode="test", batch_size=config["dataloader"]["batch_size"],
        seed=config["seed"], num_shards=num_shards,
        num_workers=loader_workers(config["dataloader"]),
        worker_type=loader_worker_type(config["dataloader"]),
        **_host_shard_args(num_shards),
    )
    model, model_state = load_eval_model(config)
    metric_fn, _ = build_metric_fn(config["metric"])
    num_classes = config["metric"]["num_classes"]
    test_stats, metrics, outputs, labels = evaluate(
        model, model_state, loader, metric_fn, mesh, num_classes,
        eval_batch_size=config["dataloader"]["batch_size"],
    )
    metrics = dict(metrics)
    metrics["loss"] = test_stats["loss"]
    if out_dir and is_main_process():
        pd.DataFrame([metrics]).to_csv(
            os.path.join(out_dir, "test_metrics.csv"), index=False,
            float_format="%.4f",
        )
        np.save(os.path.join(out_dir, "test_outputs.npy"), outputs)
        np.save(os.path.join(out_dir, "test_labels.npy"), labels)
    log("Done!")
    return metrics


def run_inference(config: Dict[str, Any]) -> np.ndarray:
    """inference() parity (inference.py:77-126): softmax outputs over the
    test split → ``test_outputs.npy`` (no labels, no metrics)."""
    init_distributed_mode(config.get("ddp"))
    out_dir = experiment_dir(config)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    mesh = make_mesh(config)
    ds_test = build_seg_dataset(config["dataset"], split="test")
    num_shards = data_parallel_size(mesh)
    loader = get_dataloader(
        ds_test, mode="test", batch_size=config["dataloader"]["batch_size"],
        seed=config["seed"], num_shards=num_shards,
        num_workers=loader_workers(config["dataloader"]),
        worker_type=loader_worker_type(config["dataloader"]),
        **_host_shard_args(num_shards),
    )
    # inference defaults to full precision unless test.use_amp is set
    # (reference inference.py:110)
    if not test_cfg(config).get("use_amp", False):
        config = {**config, "precision": "fp32"}
    model, model_state = load_eval_model(config)

    # int8 + quantize_calibration: N — collect static activation scales
    # from the first N test batches, removing the per-layer absmax
    # reductions from the serving graph (utils/calibrate.py)
    quant = None
    n_cal = int(config.get("quantize_calibration", 0) or 0)
    if config.get("quantize") == "int8" and n_cal > 0:
        from ..utils.calibrate import calibrate_quant

        cal = []
        for i, b in enumerate(loader):
            if i >= n_cal:
                break
            cal.append(jnp.asarray(b["ecg"]))
        quant = calibrate_quant(
            model, model_state.params, model_state.batch_stats, cal)
        log(f"int8 calibration: static activation scales from "
            f"{len(cal)} batch(es)")

    @jax.jit
    def infer_step(mstate: ModelState, batch):
        variables = {"params": mstate.params,
                     "batch_stats": mstate.batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, batch["ecg"], train=False)
        return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=1)

    n = len(ds_test)
    mat = loader.step_indices()
    outputs = None
    local_rows = []
    for step, batch in enumerate(loader):
        probs = infer_step(model_state, shard_batch(mesh, batch))
        if jax.process_count() > 1:
            # fetch only this host's rows (other hosts' shards are
            # non-addressable), then exchange rows below — same pattern
            # as evaluate()
            from jax.experimental.multihost_utils import (
                global_array_to_host_local_array,
            )
            from jax.sharding import PartitionSpec

            from ..parallel.mesh import DATA_AXIS

            probs = global_array_to_host_local_array(
                probs, mesh, PartitionSpec(DATA_AXIS))
        probs = np.asarray(probs)
        flat = mat[step].reshape(-1)
        local_rows.append(flat)
        if outputs is None:
            outputs = np.zeros((n,) + probs.shape[1:], np.float32)
        outputs[flat] = probs
    if jax.process_count() > 1:
        rows = (np.concatenate(local_rows) if local_rows
                else np.zeros((0,), np.int64))
        _allgather_rows(rows, [outputs])
    if out_dir and is_main_process():
        np.save(os.path.join(out_dir, "test_outputs.npy"), outputs)
    log("Done!")
    return outputs
