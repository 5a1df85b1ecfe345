"""Single-file checkpoint save / load.

Capability parity with ``misc.save_model`` / ``misc.load_model``
(reference src/utils/misc.py:281-321): one file per checkpoint holding
``{epoch, model, optimizer, config, metrics?, model_ema?, peer?}``, written
rank-0-only, with resume restoring model (+ema/peer) + optimizer and setting
``start_epoch = epoch + 1``. File naming keeps the reference layout with a
``.ckpt`` suffix (``best-loss.ckpt``, ``best-MeanIoU.ckpt``,
``checkpoint-{E}.ckpt``).

Format: a pickled nested dict whose leaves are NumPy arrays (device arrays
are pulled host-side first). Optimizer state (an optax pytree of
namedtuples) is stored as flattened leaves and re-attached to a freshly
initialised treedef on load — robust to optax's internal class names.
"""

from __future__ import annotations

import atexit
import os
import pickle
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..parallel.dist import is_main_process
from .logging import log

# Async writes go through ONE ordered writer thread: concurrent writes to
# the same path (best-loss.ckpt improving on consecutive epochs) must not
# race each other's tmp files, and the LAST enqueued write must win.
_QUEUE: "queue.Queue" = None  # type: ignore[assignment]
_WORKER: threading.Thread = None  # type: ignore[assignment]

# Most recent checkpoint that fully hit disk — the "last good" pointer the
# NaN-abort path reports so a run can be restarted from a healthy state.
_LAST_WRITTEN: Optional[str] = None
_LAST_WRITTEN_LOCK = threading.Lock()


def _record_written(path: str) -> None:
    global _LAST_WRITTEN
    with _LAST_WRITTEN_LOCK:
        _LAST_WRITTEN = path


def last_written_checkpoint() -> Optional[str]:
    """Path of the most recently *completed* checkpoint write (async writes
    count only once the atomic rename lands), or None."""
    with _LAST_WRITTEN_LOCK:
        return _LAST_WRITTEN


def _ensure_worker():
    global _QUEUE, _WORKER
    import queue

    if _WORKER is not None and _WORKER.is_alive():
        return
    # bounded: each deferred-fetch entry pins a full on-device state
    # snapshot until written, so backpressure (a blocking put) keeps at
    # most a couple of copies alive in HBM on a slow host link
    _QUEUE = queue.Queue(maxsize=2)

    def loop():
        while True:
            fn = _QUEUE.get()
            try:
                if fn is not None:
                    fn()
            except Exception as e:  # pragma: no cover - logged, not fatal
                log(f"async checkpoint write failed: {e!r}", force=True)
            finally:
                _QUEUE.task_done()

    _WORKER = threading.Thread(target=loop, daemon=True,
                               name="ckpt-writer")
    _WORKER.start()


def wait_for_pending() -> None:
    """Block until every queued async checkpoint write has hit disk (call
    before reading the files back, e.g. post-train test)."""
    if _QUEUE is not None:
        backlog = _QUEUE.qsize()
        if backlog:
            # deferred-fetch writes pull device state over the host link
            # here — on a slow link this is where a run appears to "hang"
            log(f"flushing {backlog} pending checkpoint write(s)...")
        _QUEUE.join()


atexit.register(wait_for_pending)


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path,  # one destination path, or a list sharing ONE payload/D2H fetch
    epoch: int,
    model_state,
    opt_state=None,
    config: Optional[Dict[str, Any]] = None,
    metrics: Optional[Dict[str, Any]] = None,
    ema_state=None,
    peer_state=None,
    peer_opt_state=None,
    step: Optional[int] = None,
    async_write: bool = False,
    backend: str = "pickle",
    defer_host_fetch: bool = False,
    best: Optional[Dict[str, Any]] = None,
) -> None:
    if not is_main_process():
        return
    paths = [path] if isinstance(path, str) else list(path)
    if not paths:
        return

    def build_payload() -> Dict[str, Any]:
        payload: Dict[str, Any] = {
            "epoch": epoch,
            "step": int(step) if step is not None else None,
            "model": {
                "params": _to_host(model_state.params),
                "batch_stats": _to_host(model_state.batch_stats),
            },
            "config": config,
        }
        if opt_state is not None:
            payload["optimizer"] = jax.tree.leaves(_to_host(opt_state))
        if metrics is not None:
            payload["metrics"] = metrics
        if best is not None:
            # best-so-far thresholds: a resumed run must not let its first
            # epoch overwrite the true best-*.ckpt files
            payload["best"] = best
        if ema_state is not None:
            payload["model_ema"] = {
                "params": _to_host(ema_state.params),
                "batch_stats": _to_host(ema_state.batch_stats),
            }
        if peer_state is not None:
            payload["model_peer"] = {
                "params": _to_host(peer_state.params),
                "batch_stats": _to_host(peer_state.batch_stats),
            }
            if peer_opt_state is not None:
                payload["peer_optimizer"] = jax.tree.leaves(
                    _to_host(peer_opt_state))
        return payload

    def write(payload: Dict[str, Any]) -> None:
        for p in paths:
            if backend == "orbax":
                _save_checkpoint_orbax(p, payload)
            else:
                tmp = p + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(payload, f,
                                protocol=pickle.HIGHEST_PROTOCOL)
                os.replace(tmp, p)  # atomic: no torn ckpts on preemption
            _record_written(p)

    if async_write and defer_host_fetch:
        # the caller passed device-side snapshots (safe against donation):
        # the writer thread pulls them D2H off the critical path, so a slow
        # host link never stalls the epoch loop
        _ensure_worker()
        _QUEUE.put(lambda: write(build_payload()))
    elif async_write:
        # fetch now (arrays may be donated to the next step), write later
        payload = build_payload()
        _ensure_worker()
        _QUEUE.put(lambda: write(payload))
    else:
        write(build_payload())


def load_checkpoint(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):
        return _load_checkpoint_orbax(path)
    if path.endswith((".pth", ".pt")):
        # reference-format torch checkpoint (misc.py:281-302); its 'model' /
        # 'model_ema' stay flat state_dicts here and are translated against
        # the model template inside restore_model_state
        from .torch_interop import load_torch_checkpoint

        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def is_torch_state_dict(payload_model) -> bool:
    """True when a checkpoint's model entry is a torch state_dict (flat
    dotted keys) rather than this framework's {params, batch_stats} trees."""
    return isinstance(payload_model, dict) and "params" not in payload_model


# ---------------------------------------------------------------------------
# Orbax backend (``checkpoint_backend: orbax``): directory checkpoints via
# orbax's async TensorStore writer — the ecosystem-standard format for
# preemptible TPU jobs (SURVEY §5 checkpoint row). Array subtrees go through
# orbax; scalar/dict metadata (epoch, config, metrics, the optimizer's
# step counters) ride a pickle sidecar.
# ---------------------------------------------------------------------------


def _save_checkpoint_orbax(path: str, payload: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    arrays = {}
    meta = {}
    for key, val in payload.items():
        if key in ("model", "model_ema", "model_peer"):
            arrays[key] = val
        elif key in ("optimizer", "peer_optimizer"):
            # flat leaf list → indexed dict (orbax wants string keys)
            arrays[key] = {str(i): leaf for i, leaf in enumerate(val)}
            meta[f"_{key}_len"] = len(val)
        else:
            meta[key] = val
    path = os.path.abspath(path)
    tmp = path + ".orbax-tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, arrays)
    with open(os.path.join(tmp, "meta.pkl"), "wb") as f:
        pickle.dump(meta, f)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.replace(tmp, path)


def _load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        arrays = ckptr.restore(os.path.abspath(path))
    payload = dict(meta)
    for key in ("model", "model_ema", "model_peer"):
        if key in arrays:
            payload[key] = arrays[key]
    for key in ("optimizer", "peer_optimizer"):
        if key in arrays:
            n = meta.pop(f"_{key}_len")
            payload[key] = [arrays[key][str(i)] for i in range(n)]
            payload.pop(f"_{key}_len", None)
    return payload


def restore_opt_state(template_opt_state, leaves):
    treedef = jax.tree.structure(template_opt_state)
    return jax.tree.unflatten(treedef, leaves)


def _restore_by_path(payload: Any, template: Any, path: str = ""):
    """Walk the template structure, pulling values from the payload by key.

    Keys present in the payload but absent from the template are ignored —
    this is how auxiliary-head weights get dropped when loading a training
    checkpoint into an eval model (reference base.py:464-468 strips
    ``auxiliary_head*`` keys)."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            assert isinstance(payload, dict) and k in payload, \
                f"checkpoint missing key: {path}/{k}"
            out[k] = _restore_by_path(payload[k], v, f"{path}/{k}")
        return out
    arr = np.asarray(payload)
    assert arr.shape == tuple(template.shape), \
        f"shape mismatch at {path}: ckpt {arr.shape} vs model {template.shape}"
    return arr.astype(template.dtype)


def restore_model_state(payload_model: Dict[str, Any], template_model_state):
    """Rebuild a ModelState from checkpoint dicts, matching by path so that
    submodule additions/removals (aux heads) restore cleanly. Torch-format
    state_dicts (reference ``.pth``) are translated transparently."""
    from .train_state import ModelState

    if is_torch_state_dict(payload_model):
        from .torch_interop import torch_sd_to_trees

        params, stats = torch_sd_to_trees(
            payload_model, template_model_state.params,
            template_model_state.batch_stats,
        )
        return ModelState(params=params, batch_stats=stats)
    return ModelState(
        params=_restore_by_path(
            payload_model["params"], template_model_state.params, "params"
        ),
        batch_stats=_restore_by_path(
            payload_model["batch_stats"], template_model_state.batch_stats,
            "batch_stats",
        ),
    )


def resolve_checkpoint_url(path: str) -> str:
    """URL-resume capability (reference misc.py:307-309 uses torch.hub).

    This build runs with zero network egress, so URLs resolve against the
    torch-hub download cache instead of the network: ``file://`` maps to the
    local path, and ``http(s)://`` URLs are looked up by filename in
    ``$TORCH_HOME/hub/checkpoints`` (the directory ``torch.hub`` populates).
    A cache miss raises with instructions rather than attempting a fetch."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if not path.startswith(("http://", "https://")):
        return path
    fname = os.path.basename(path.split("?", 1)[0])
    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache", "torch")
    )
    cached = os.path.join(torch_home, "hub", "checkpoints", fname)
    if os.path.exists(cached):
        log(f"URL resume served from torch-hub cache: {cached}")
        return cached
    raise FileNotFoundError(
        f"URL resume requires a pre-downloaded checkpoint (no network "
        f"egress). Place the file at {cached} or pass a local path."
    )


def maybe_resume(config: Dict[str, Any], state, build_opt_template=None):
    """``--resume`` handling (misc.py:305-321 parity): restores model
    (+ema/+peer) and optimizer, sets ``config['start_epoch'] = epoch + 1``.
    Returns the (possibly updated) state."""
    resume = config.get("resume")
    if not resume:
        return state
    resume = resolve_checkpoint_url(str(resume))
    payload = load_checkpoint(resume)
    state = state.replace(
        model=restore_model_state(payload["model"], state.model)
    )
    if payload.get("best"):
        # consumed by run_training to seed best_loss / best_metrics
        config["_resume_best"] = payload["best"]
    if state.ema is not None and "model_ema" in payload:
        state = state.replace(
            ema=restore_model_state(payload["model_ema"], state.ema)
        )
    if state.peer is not None and "model_peer" in payload:
        state = state.replace(
            peer=restore_model_state(payload["model_peer"], state.peer)
        )
    log(f"Resume checkpoint {resume}")
    if is_torch_state_dict(payload["model"]):
        # torch optimizer state is structurally foreign to optax — model
        # weights warm-start, optimizer statistics restart (documented in
        # tools/convert_checkpoint.py). The epoch counter DOES carry over
        # (reference misc.py:315-320): resuming an 80/100-epoch .pth must
        # continue at epoch 81, not re-run from 0.
        if payload.get("epoch") is not None:
            config["start_epoch"] = payload["epoch"] + 1
            log(f"Torch-format checkpoint: model restored, optimizer "
                f"restarted, resuming at epoch {config['start_epoch']}")
        else:
            log("Torch-format checkpoint: model restored, optimizer "
                "restarted")
        return state
    if "optimizer" in payload and payload.get("epoch") is not None:
        state = state.replace(
            opt_state=restore_opt_state(state.opt_state, payload["optimizer"])
        )
        if state.peer_opt_state is not None and "peer_optimizer" in payload:
            state = state.replace(
                peer_opt_state=restore_opt_state(
                    state.peer_opt_state, payload["peer_optimizer"]
                )
            )
        if payload.get("step") is not None:
            import jax.numpy as jnp

            state = state.replace(step=jnp.asarray(payload["step"], jnp.int32))
        config["start_epoch"] = payload["epoch"] + 1
        log("With optim & sched!")
    return state
