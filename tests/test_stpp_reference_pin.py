"""ST++ reference-equivalence pins (VERDICT r2 #4).

Three levels, matching how the reference composes the algorithm
(src/algorithms/stpp.py):

1. ``calculate_miou`` function-level parity — our count-based
   :func:`ops.metrics.per_sample_miou` vs the reference's one-hot
   ``calculate_miou`` (stpp.py:32-42) on identical predictions, including
   the empty-union→0 branch.
2. ``select_reliable`` ranking parity — both sides see IDENTICAL snapshot
   weights over the same eval-mode unlabeled set; the torch side runs the
   reference's agreement + stable-descending-sort semantics with the
   shadowed-loop-index bug (stpp.py:51 vs :72) patched to its documented
   intent (true dataset ids — what our implementation ships). Rankings
   must agree element-for-element, through our batched + 8-device-sharded
   pass vs the reference's batch-size-1 loop.
3. Stage-2 trajectory lockstep — the teacher-pseudo-label CE path
   (stpp.py:91-244) is deterministic, so the standard perturbed-twin chaos
   envelope applies: per-step loss_x / loss_u_s / loss_total and final
   params must track the reference's ``train_one_epoch`` run verbatim.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_compat import import_reference_module  # noqa: E402
from test_lockstep_reference import (  # noqa: E402
    STEPS_PER_EPOCH,
    _assert_final_params_close,
    _assert_series_close,
    _config,
    _make_batches,
    _our_setup,
    _perturbed_clone,
    _Recorder,
    _reference_setup,
    _torch_loader,
)
from semi_seg_ecg_tpu.utils.torch_interop import torch_sd_to_trees  # noqa: E402
from semi_seg_ecg_tpu.utils.train_state import ModelState, TrainState  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_torch():
    torch.manual_seed(0)


def test_calculate_miou_parity(rng):
    """ops.metrics.per_sample_miou == reference calculate_miou
    (stpp.py:32-42) on random prediction pairs, batch by batch."""
    import torch.nn.functional as F

    stpp_ref = import_reference_module("algorithms.stpp")
    from semi_seg_ecg_tpu.algorithms.stpp import calculate_miou
    from semi_seg_ecg_tpu.ops.metrics import segmentation_stats

    c, t = 4, 200
    for case in range(8):
        pred = rng.integers(0, c, (1, t))
        target = rng.integers(0, c, (1, t))
        if case >= 6:
            # force empty classes on both sides → union==0 → contributes 0
            pred = pred % 2
            target = target % 2
        ref = stpp_ref.calculate_miou(
            F.one_hot(torch.from_numpy(pred), c).movedim(-1, 1).numpy(),
            F.one_hot(torch.from_numpy(target), c).movedim(-1, 1).numpy(),
        )
        inter, psum, tsum = segmentation_stats(
            jnp.asarray(pred), jnp.asarray(target), c)
        ours = calculate_miou(np.asarray(inter), np.asarray(psum),
                              np.asarray(tsum))
        np.testing.assert_allclose(ours[0], ref, rtol=1e-6,
                                   err_msg=f"case {case}")


def _pin_config(e2e_data):
    """Shared model/dataset config for the ranking-parity test: the e2e
    synthetic dataset at length 500, resnet18 + FCN head (reference
    architecture schema — init_model_from_cfg consumes it verbatim)."""
    config = _config("resnet18")
    config["dataset"] = {
        **e2e_data,
        "transforms": [
            {"standardize": {"axis": [-1, -2]}},
            {"to_tensor": {"dtype": "float"}},
        ],
        "signal_length": 500,
    }
    config["dataloader"] = {"batch_size": 1, "num_workers": 0}
    config["metric"] = {"task": "segmentation", "num_classes": 4,
                        "include_background": True, "per_class": False,
                        "input_format": "one-hot",
                        "target_metrics": ["MeanIoU"]}
    return config


def test_select_reliable_ranking_parity(e2e_data):
    """Identical snapshot weights → identical reliability ranking.

    Torch side = the reference's per-sample agreement loop at batch size 1
    (stpp.py:45-88) with true dataset ids; ours = the batched, mesh-sharded
    single-program pass. The full descending ranking (not just the
    top-half set) must match."""
    base_ref = import_reference_module("algorithms.stpp")
    ref_base = import_reference_module("algorithms.base")
    import torch.nn.functional as F

    from semi_seg_ecg_tpu.algorithms.common import _host_shard_args
    from semi_seg_ecg_tpu.algorithms.stpp import select_reliable
    from semi_seg_ecg_tpu.data.dataset import build_seg_dataset
    from semi_seg_ecg_tpu.data.loader import get_dataloader
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.parallel.mesh import data_parallel_size, make_mesh

    config = _pin_config(e2e_data)

    # three distinct "snapshot" models (stand-ins for the 1/3, 2/3, final
    # stage-1 checkpoints)
    tmodels = []
    for s in range(3):
        torch.manual_seed(100 + s)
        tmodels.append(ref_base.init_model_from_cfg(config, train=True)
                       .float().eval())

    model = build_model_from_config(config, train=False)
    dummy = jnp.zeros((1, 1, 500), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, dummy, train=False)
    states = []
    for tm in tmodels:
        params, stats = torch_sd_to_trees(
            {k: v.numpy() for k, v in tm.state_dict().items()},
            variables["params"], variables.get("batch_stats", {}),
        )
        states.append(ModelState(params=params, batch_stats=stats))

    mesh = make_mesh(config)
    ds = build_seg_dataset(config["dataset"], split="train_unlabeled",
                           mode="eval")
    num_shards = data_parallel_size(mesh)
    loader = get_dataloader(
        ds, mode="eval", batch_size=1, seed=0, num_shards=num_shards,
        num_workers=0, **_host_shard_args(num_shards),
    )
    reliable, unreliable = select_reliable(model, states, loader, mesh, 4)

    # reference semantics, de-bugged ids: batch-size-1 agreement loop using
    # the reference's own calculate_miou + stable descending sort
    id_to_reliability = []
    for i in range(len(ds)):
        ecg = torch.from_numpy(
            np.asarray(ds[i]["ecg"], np.float32)[None])
        onehot_preds = []
        for tm in tmodels:
            with torch.no_grad():
                logits = tm(ecg, return_loss=False)["seg_logits"]
            pred = torch.argmax(logits, dim=1)
            onehot_preds.append(
                F.one_hot(pred, num_classes=4).movedim(-1, 1).numpy())
        mious = [base_ref.calculate_miou(onehot_preds[s], onehot_preds[-1])
                 for s in range(len(onehot_preds) - 1)]
        id_to_reliability.append((i, sum(mious) / len(mious)))
    id_to_reliability.sort(key=lambda elem: elem[1], reverse=True)
    ref_reliable = [e[0] for e in
                    id_to_reliability[:len(id_to_reliability) // 2]]
    ref_unreliable = [e[0] for e in
                      id_to_reliability[len(id_to_reliability) // 2:]]

    assert reliable == ref_reliable, (
        f"reliable ranking mismatch:\nours {reliable}\nref  {ref_reliable}\n"
        f"ref values {id_to_reliability}")
    assert unreliable == ref_unreliable


def test_lockstep_stpp_stage2(rng):
    """Stage-2/3 self-training loop vs reference stpp.train_one_epoch
    (stpp.py:91-244): frozen teacher hard pseudo-labels on the weak view,
    (loss_x + loss_u_s)/2, no EMA update."""
    import copy

    config = _config("resnet18")
    batches = _make_batches(rng, unlabeled=True)
    stpp_ref = import_reference_module("algorithms.stpp")
    base = import_reference_module("algorithms.base")
    misc = import_reference_module("utils.misc")
    opt_mod = import_reference_module("utils.optimizer")

    tmodel, optimizer, scaler = _reference_setup(config)
    init_sd = copy.deepcopy(tmodel.state_dict())
    model, tx, mstate = _our_setup(config, tmodel)

    # the frozen stage teacher: an independent init (stands in for the
    # previous stage's best checkpoint, stpp.py:578-594)
    torch.manual_seed(42)
    tteacher = base.init_model_from_cfg(config, train=True).float()
    for p in tteacher.parameters():
        p.requires_grad = False
    tteacher.eval()
    teacher_init_sd = copy.deepcopy(tteacher.state_dict())
    _, _, teacher_mstate = _our_setup(config, tteacher)

    device = torch.device("cpu")

    def run_reference(m, teacher, opt, sc):
        rec = _Recorder()
        for epoch, epoch_steps in enumerate(batches):
            labeled, unlabeled = _torch_loader(epoch_steps, unlabeled=True)
            # the reference's unlabeled loader yields {'ecg': weak_view}
            unlabeled = [{"ecg": u["ecg"]} for u in unlabeled]
            stpp_ref.train_one_epoch(
                m, teacher, labeled, unlabeled, opt, device, epoch, sc,
                log_writer=rec, use_amp=False, config=config["train"],
            )
        return rec

    recorder = run_reference(tmodel, tteacher, optimizer, scaler)
    control = _perturbed_clone(config, init_sd)
    # perturb the control's teacher too: frozen-teacher argmax flips on
    # near-tied logits are part of the fp32 noise channel under test
    ctl_teacher = _perturbed_clone(config, teacher_init_sd)
    ctl_teacher.eval()
    ctl_rec = run_reference(
        control, ctl_teacher,
        opt_mod.get_optimizer_from_config(config["train"],
                                          control.parameters()),
        misc.NativeScalerWithGradNormCount())

    from semi_seg_ecg_tpu.algorithms.stpp import make_train_step

    state = TrainState(
        step=jnp.asarray(0, jnp.int32), model=mstate,
        opt_state=tx.init(mstate.params), ema=teacher_mstate,
        peer=None, peer_opt_state=None,
    )
    step_fn = jax.jit(make_train_step(model, tx, config, STEPS_PER_EPOCH))
    series = {k: [] for k in ("loss_total", "loss_x", "loss_u_s")}
    teacher_before = jax.device_get(state.ema.params)
    for epoch_steps in batches:
        for b in epoch_steps:
            state, m = step_fn(state, b)
            for k in series:
                series[k].append(float(m[k]))
    for name, ours in series.items():
        _assert_series_close(ours, recorder.series[name],
                             ctl_rec.series[name], what=name)
    _assert_final_params_close(state, tmodel, control)
    # the stage teacher must be bit-frozen across the epoch (stpp.py:120)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        teacher_before, jax.device_get(state.ema.params),
    )
