"""Checkpoint save/restore roundtrips, aux-head dropping, resume wiring."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from semi_seg_ecg_tpu.utils import checkpoint as ckpt
from semi_seg_ecg_tpu.utils.train_state import ModelState, TrainState, ema_update


def _model_state(seed=0, extra_key=None):
    rng = np.random.default_rng(seed)
    params = {
        "backbone": {"conv": {"kernel": rng.standard_normal((3, 1, 8))}},
        "decode_head": {"cls": {"kernel": rng.standard_normal((1, 8, 4))}},
    }
    if extra_key:
        params[extra_key] = {"conv": {"kernel": rng.standard_normal((3, 8, 8))}}
    stats = {"backbone": {"bn": {"mean": rng.standard_normal((8,)),
                                 "var": np.abs(rng.standard_normal((8,)))}}}
    return ModelState(params=jax.tree.map(jnp.asarray, params),
                      batch_stats=jax.tree.map(jnp.asarray, stats))


def test_roundtrip(tmp_path):
    ms = _model_state()
    tx = optax.adamw(1e-3)
    opt_state = tx.init(ms.params)
    path = os.path.join(tmp_path, "best-loss.ckpt")
    ckpt.save_checkpoint(path, epoch=7, model_state=ms, opt_state=opt_state,
                         config={"seed": 0}, metrics={"loss": 0.5}, step=99)
    payload = ckpt.load_checkpoint(path)
    assert payload["epoch"] == 7
    assert payload["step"] == 99
    assert payload["metrics"]["loss"] == 0.5
    restored = ckpt.restore_model_state(payload["model"], ms)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(ms.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    opt_restored = ckpt.restore_opt_state(opt_state, payload["optimizer"])
    assert jax.tree.structure(opt_restored) == jax.tree.structure(opt_state)


def test_aux_head_dropped_on_eval_restore(tmp_path):
    train_ms = _model_state(extra_key="auxiliary_head_0")
    path = os.path.join(tmp_path, "ck.ckpt")
    ckpt.save_checkpoint(path, 0, train_ms)
    eval_ms = _model_state()  # no aux head
    payload = ckpt.load_checkpoint(path)
    restored = ckpt.restore_model_state(payload["model"], eval_ms)
    assert "auxiliary_head_0" not in restored.params


def test_missing_key_raises(tmp_path):
    small = _model_state()
    path = os.path.join(tmp_path, "ck.ckpt")
    ckpt.save_checkpoint(path, 0, small)
    bigger = _model_state(extra_key="new_module")
    payload = ckpt.load_checkpoint(path)
    with pytest.raises(AssertionError, match="missing key"):
        ckpt.restore_model_state(payload["model"], bigger)


def test_shape_mismatch_raises(tmp_path):
    ms = _model_state()
    path = os.path.join(tmp_path, "ck.ckpt")
    ckpt.save_checkpoint(path, 0, ms)
    other = _model_state()
    other.params["backbone"]["conv"]["kernel"] = jnp.zeros((5, 1, 8))
    payload = ckpt.load_checkpoint(path)
    with pytest.raises(AssertionError, match="shape mismatch"):
        ckpt.restore_model_state(payload["model"], other)


def test_maybe_resume(tmp_path):
    ms = _model_state(seed=1)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(ms.params)
    path = os.path.join(tmp_path, "resume.ckpt")
    ckpt.save_checkpoint(path, epoch=4, model_state=ms, opt_state=opt_state,
                         step=50)
    fresh = TrainState(step=jnp.asarray(0, jnp.int32),
                       model=_model_state(seed=2),
                       opt_state=tx.init(ms.params))
    config = {"resume": path}
    restored = ckpt.maybe_resume(config, fresh)
    assert config["start_epoch"] == 5
    assert int(restored.step) == 50
    np.testing.assert_array_equal(
        np.asarray(restored.model.params["backbone"]["conv"]["kernel"]),
        np.asarray(ms.params["backbone"]["conv"]["kernel"]),
    )
    # no resume path → untouched
    config2 = {"resume": None}
    assert ckpt.maybe_resume(config2, fresh) is fresh


def test_ema_update_mixes_params_and_stats():
    student = _model_state(seed=3)
    teacher = _model_state(seed=4)
    mixed = ema_update(student, teacher, decay=0.9)
    s = np.asarray(student.params["backbone"]["conv"]["kernel"])
    t = np.asarray(teacher.params["backbone"]["conv"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(mixed.params["backbone"]["conv"]["kernel"]),
        t * 0.9 + s * 0.1, rtol=1e-6,
    )
    sm = np.asarray(student.batch_stats["backbone"]["bn"]["mean"])
    tm = np.asarray(teacher.batch_stats["backbone"]["bn"]["mean"])
    np.testing.assert_allclose(
        np.asarray(mixed.batch_stats["backbone"]["bn"]["mean"]),
        tm * 0.9 + sm * 0.1, rtol=1e-6,
    )


def test_nan_step_aborts_after_flushing_good_checkpoints(tmp_path, capsys):
    """A non-finite loss at drain time must (a) flush queued async writes —
    they all predate the poisoned epoch — and (b) report the last healthy
    checkpoint path before exiting (reference base.py:135-137 analogue)."""
    from types import SimpleNamespace

    from semi_seg_ecg_tpu.algorithms.common import _train_one_epoch
    from semi_seg_ecg_tpu.parallel.mesh import make_mesh

    good = os.path.join(tmp_path, "checkpoint-1.ckpt")
    ckpt.save_checkpoint(good, epoch=1, model_state=_model_state(),
                         async_write=True)

    mesh = make_mesh(devices=jax.devices()[:1])
    batch = {"ecg": np.zeros((2, 1, 16), np.float32)}

    def nan_step(state, b):
        return state, {"loss": jnp.float32(float("nan"))}

    with pytest.raises(SystemExit) as exc:
        _train_one_epoch(
            nan_step, SimpleNamespace(step=0), {"labeled": [batch]},
            SimpleNamespace(uses_unlabeled=False), mesh, epoch=0,
            steps_per_epoch=1, lr_fn=lambda s: 0.1, accum=1,
            log_writer=None, config={},
        )
    assert exc.value.code == 1
    # the queued good write landed before exit and is reported
    assert os.path.exists(good)
    assert ckpt.last_written_checkpoint() == good
    out = capsys.readouterr().out
    assert "Last good checkpoint" in out and good in out


def test_deferred_host_fetch_roundtrip(tmp_path):
    """defer_host_fetch builds the payload inside the writer thread; the
    file must still land complete and readable after wait_for_pending."""
    ms = _model_state(seed=8)
    path = os.path.join(tmp_path, "deferred.ckpt")
    ckpt.save_checkpoint(path, epoch=2, model_state=ms, metrics={"m": 1.0},
                         async_write=True, defer_host_fetch=True)
    ckpt.wait_for_pending()
    payload = ckpt.load_checkpoint(path)
    assert payload["epoch"] == 2 and payload["metrics"]["m"] == 1.0
    np.testing.assert_array_equal(
        payload["model"]["params"]["backbone"]["conv"]["kernel"],
        np.asarray(ms.params["backbone"]["conv"]["kernel"]))
    assert ckpt.last_written_checkpoint() == path


def test_resume_restores_best_thresholds(tmp_path):
    """best-*.ckpt thresholds ride the checkpoint: a resumed run must not
    let its first epoch overwrite the true best files."""
    ms = _model_state()
    tx = optax.adamw(1e-3)
    path = os.path.join(tmp_path, "best-MeanIoU.ckpt")
    ckpt.save_checkpoint(path, epoch=3, model_state=ms,
                         opt_state=tx.init(ms.params),
                         best={"loss": 0.125, "MeanIoU": 0.875})
    fresh = TrainState(step=jnp.asarray(0, jnp.int32),
                       model=_model_state(seed=9),
                       opt_state=tx.init(ms.params))
    config = {"resume": path}
    ckpt.maybe_resume(config, fresh)
    assert config["_resume_best"] == {"loss": 0.125, "MeanIoU": 0.875}
