"""Lockstep N-step train-loop equivalence against the ACTUAL reference code.

The strongest LUDB-free evidence for quality parity (VERDICT r1 #1): import
`/root/reference/src` (torch-CPU), transplant a common initialization through
the checkpoint converter, feed BOTH train loops the same synthetic batches
(bypassing both data pipelines), and assert per-step losses and final
parameters agree within fp32 tolerance. This pins the full loop
*composition*: per-iteration LR timing (reference lr_sched.py:6-18 applied at
base.py:113-118), BN batch-stat accumulation across steps, AdamW+decoupled-wd
stepping, pseudo-label masking (fixmatch.py:87-116), soft-CE + post-step EMA
cadence (mean_teacher.py:106-149).

The reference loops run verbatim (`train_one_epoch` from algorithms/base.py:
83-181, fixmatch.py:58-192, mean_teacher.py:28-190) with two documented
shims (see reference_compat.py) and one deliberate init deviation: the
reference's teacher init `param_k.data = param_q.data`
(mean_teacher.py:287-291) ALIASES teacher params to student storage, so the
in-place optimizer step of iteration 0 silently rewrites the "frozen" teacher
until the first EMA assignment breaks the aliasing — a latent bug (SURVEY §7
"do not replicate" policy). The harness clones at init, which is the
documented intent (a frozen copy) and what this framework implements.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_compat import import_reference_module  # noqa: E402
from semi_seg_ecg_tpu.models import build_model_from_config  # noqa: E402
from semi_seg_ecg_tpu.utils.torch_interop import (  # noqa: E402
    torch_sd_to_trees,
    trees_to_torch_sd,
)
from semi_seg_ecg_tpu.utils.train_state import ModelState, TrainState  # noqa: E402
from semi_seg_ecg_tpu.utils.optimizer import build_optimizer  # noqa: E402

SIG_LEN = 512
BATCH = 4
STEPS_PER_EPOCH = 5
EPOCHS = 2
NUM_CLASSES = 4


@pytest.fixture(autouse=True)
def _seed_torch():
    """Reference model inits/draws come from torch's GLOBAL rng — pin it so
    trajectories (and the chaos envelopes measured from them) are
    reproducible across runs."""
    torch.manual_seed(0)


def _config(backbone="resnet18", **train_overrides):
    if backbone == "resnet18":
        backbone_cfg = {"resnet18": {
            "num_leads": 1, "num_stages": 4, "out_indices": [0, 1, 2, 3],
            "dilations": [1, 1, 1, 1], "strides": [1, 2, 2, 2],
            "deep_stem": False, "avg_down": False, "contract_dilation": False,
        }}
        head_in = 512
    else:
        backbone_cfg = {"vit_tiny": {
            "seq_len": SIG_LEN, "patch_size": 32, "num_leads": 1,
            "out_indices": [3, 5, 7, 11], "final_norm": True,
        }}
        head_in = 192
    return {
        "seed": 0,
        "precision": "fp32",
        "use_amp": False,
        "mode": "scratch",
        "backbone": backbone_cfg,
        "decode_head": {"FCNHead": {
            "in_channels": head_in, "in_index": 3, "channels": 32,
            "num_convs": 1, "concat_input": False, "dropout_ratio": 0.0,
            "num_classes": NUM_CLASSES, "align_corners": False,
        }},
        "dataloader": {"batch_size": BATCH},
        "train": {
            "epochs": EPOCHS, "accum_iter": 1, "warmup_epochs": 1,
            "min_lr": 1e-4, "blr": None, "lr": 1e-3, "weight_decay": 0.05,
            "max_norm": None, "layer_decay": None, "optimizer": "adamw",
            "optimizer_kwargs": {"betas": [0.9, 0.999]},
            "conf_thresh": 0.8, "ema_decay": 0.9,
            **train_overrides,
        },
    }


def _make_batches(rng, unlabeled: bool):
    """Per-epoch lists of identical synthetic batches for both frameworks.

    Signals are structured (noisy sines + square pulses) so the nets learn
    something non-degenerate within a few steps."""
    epochs = []
    for _ in range(EPOCHS):
        steps = []
        for _ in range(STEPS_PER_EPOCH):
            t = np.linspace(0, 8 * np.pi, SIG_LEN, dtype=np.float32)
            x = (np.sin(t)[None, None, :]
                 + 0.3 * rng.standard_normal((BATCH, 1, SIG_LEN))
                 ).astype(np.float32)
            y = (np.cumsum(rng.integers(0, 2, (BATCH, SIG_LEN)), axis=1)
                 % NUM_CLASSES).astype(np.int64)
            step = {"ecg": x, "target": y}
            if unlabeled:
                u = (np.cos(t)[None, None, :]
                     + 0.3 * rng.standard_normal((BATCH, 1, SIG_LEN))
                     ).astype(np.float32)
                step["ecg_u_w"] = u
                step["ecg_u_s"] = (
                    u + 0.2 * rng.standard_normal(u.shape)).astype(np.float32)
            steps.append(step)
        epochs.append(steps)
    return epochs


def _torch_loader(epoch_batches, unlabeled: bool):
    labeled = [{"ecg": torch.from_numpy(b["ecg"]),
                "target": torch.from_numpy(b["target"])}
               for b in epoch_batches]
    if not unlabeled:
        return labeled, None
    unlab = [{"ecg": torch.from_numpy(b["ecg_u_w"]),
              "ecg_aug": torch.from_numpy(b["ecg_u_s"])}
             for b in epoch_batches]
    return labeled, unlab


class _Recorder:
    """Stand-in SummaryWriter capturing the reference's per-step scalars."""

    log_dir = "<recorder>"

    def __init__(self):
        self.series = {}

    def add_scalar(self, tag, value, step):
        self.series.setdefault(tag, []).append(float(value))


def _reference_setup(config, backbone="resnet18"):
    base = import_reference_module("algorithms.base")
    misc = import_reference_module("utils.misc")
    opt_mod = import_reference_module("utils.optimizer")
    tmodel = base.init_model_from_cfg(config, train=True)
    tmodel = tmodel.float()
    optimizer = opt_mod.get_optimizer_from_config(
        config["train"], tmodel.parameters())
    scaler = misc.NativeScalerWithGradNormCount()
    return tmodel, optimizer, scaler


def _our_setup(config, torch_model):
    model = build_model_from_config(config, train=True)
    dummy = jnp.zeros((1, 1, SIG_LEN), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "droppath": jax.random.key(2)},
        dummy, train=False,
        # trace the ReCo projection head's params too (no-op without
        # use_latent_projection; cf. common.init_model_state)
        return_latent=model.with_projection,
    )
    params, stats = torch_sd_to_trees(
        {k: v.numpy() for k, v in torch_model.state_dict().items()},
        variables["params"], variables.get("batch_stats", {}),
    )
    tx = build_optimizer(config, params, STEPS_PER_EPOCH, model=model)
    mstate = ModelState(params=params, batch_stats=stats)
    return model, tx, mstate


def _our_state(mstate, tx, with_ema=False):
    ema = None
    if with_ema:
        ema = ModelState(
            params=jax.tree.map(jnp.array, mstate.params),
            batch_stats=jax.tree.map(jnp.array, mstate.batch_stats),
        )
    return TrainState(step=jnp.asarray(0, jnp.int32), model=mstate,
                      opt_state=tx.init(mstate.params), ema=ema,
                      peer=None, peer_opt_state=None)


def _run_ours(make_train_step, model, tx, config, state, batches,
              loss_key="loss"):
    step_fn = jax.jit(make_train_step(model, tx, config, STEPS_PER_EPOCH))
    losses = []
    for epoch_steps in batches:
        for b in epoch_steps:
            state, metrics = step_fn(state, b)
            losses.append(float(metrics[loss_key]))
    return state, losses


def _assert_series_close(ours, ref_series, ctl_series, factor=4.0,
                         atol=5e-4, rtol=1e-3, what="", cummax=False):
    """Per-step scalar series must track the reference within its own chaos
    envelope: early steps are tight (rtol), later steps are bounded by
    ``factor ×`` the reference-vs-perturbed-twin divergence at that step.

    ``cummax`` bounds by the twin divergence's running max instead: a
    single twin draw can transiently re-cross the reference trajectory
    (|ref-ctl| ≈ 0 mid-run) without the underlying chaos having shrunk —
    used by envelopes driven by sampling noise (ReCo) rather than a 1e-6
    init perturbation."""
    ours = np.asarray(ours)
    ref = np.asarray(ref_series)
    ctl = np.asarray(ctl_series)
    env = np.abs(ref - ctl)
    if cummax:
        env = np.maximum.accumulate(env)
    bound = np.maximum(factor * env,
                       np.maximum(atol, rtol * np.abs(ref)))
    bad = np.abs(ours - ref) > bound
    if bad.any():
        print(f"{what}: |ours-ref|={np.abs(ours-ref).round(5).tolist()}")
        print(f"{what}: |ctl-ref| ={np.abs(ref-ctl).round(5).tolist()}")
    assert not bad.any(), (
        f"{what} diverges beyond the chaos envelope at steps "
        f"{np.nonzero(bad)[0].tolist()}: ours {ours[bad]}, ref {ref[bad]}, "
        f"bound {bound[bad]}"
    )


def _perturbed_clone(config, init_sd):
    """A reference model restarted from ``init_sd`` with a 1e-6 perturbation
    on one tensor — the chaos-control twin."""
    import copy

    base = import_reference_module("algorithms.base")
    control = base.init_model_from_cfg(config, train=True).float()
    control.load_state_dict(copy.deepcopy(init_sd))
    gen = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for w in control.parameters():
            # every tensor, like the ~1-ulp-per-op differences between two
            # fp32 conv implementations the envelope stands in for
            w += 1e-6 * torch.randn(w.shape, generator=gen)
    return control


def _assert_final_params_close(state, torch_model, control_model,
                               factor=4.0, floor=2e-4, rtol=2e-3):
    """Final params must agree within the reference's OWN fp32 chaos
    envelope.

    The reference loop is chaotic at the parameter level: restarting it from
    a 1e-6-perturbed init diverges by ~1e-3 in early-layer params and up to
    ~1e-1 in BN running variances within 10 steps (AdamW's normalized step
    turns sign-flips of noise-level gradient elements into ±lr jumps), while
    the loss trajectory stays tight. So the meaningful parameter bound is
    measured, not chosen: per leaf, ``factor ×`` the self-divergence between
    the reference and its perturbed twin (with a small floor for leaves the
    twin run leaves identical)."""
    ours_sd = trees_to_torch_sd(
        jax.device_get(state.model.params),
        jax.device_get(state.model.batch_stats),
    )
    ref_sd = {k: v.numpy() for k, v in torch_model.state_dict().items()
              if not k.endswith("num_batches_tracked")}
    ctl_sd = {k: v.numpy() for k, v in control_model.state_dict().items()}
    assert set(ours_sd) - {k for k in ours_sd
                           if k.endswith("num_batches_tracked")} >= set(ref_sd)
    worst = 0.0
    for k, ref in ref_sd.items():
        diff = float(np.max(np.abs(ours_sd[k] - ref)))
        self_div = float(np.max(np.abs(ctl_sd[k] - ref)))
        bound = max(factor * self_div, floor,
                    rtol * float(np.max(np.abs(ref))))
        worst = max(worst, diff / bound)
        assert diff < bound, (
            f"final param mismatch at {k}: ours-vs-ref {diff:.2e} exceeds "
            f"{bound:.2e} (reference self-divergence {self_div:.2e})"
        )
    print(f"worst final-param diff vs chaos bound: {worst:.2f}")


@pytest.mark.parametrize("backbone", ["resnet18", "vit_tiny"])
def test_lockstep_base(backbone, rng):
    """Supervised loop lockstep vs reference base.train_one_epoch
    (base.py:83-181)."""
    import copy

    config = _config(backbone)
    batches = _make_batches(rng, unlabeled=False)
    base = import_reference_module("algorithms.base")
    misc = import_reference_module("utils.misc")
    opt_mod = import_reference_module("utils.optimizer")
    tmodel, optimizer, scaler = _reference_setup(config, backbone)
    init_sd = copy.deepcopy(tmodel.state_dict())
    model, tx, mstate = _our_setup(config, tmodel)

    device = torch.device("cpu")

    def run_reference(m, opt, sc):
        rec = _Recorder()
        for epoch, epoch_steps in enumerate(batches):
            loader, _ = _torch_loader(epoch_steps, unlabeled=False)
            base.train_one_epoch(
                m, loader, opt, device, epoch, sc,
                log_writer=rec, use_amp=False, config=config["train"],
            )
        return rec

    recorder = run_reference(tmodel, optimizer, scaler)
    control = _perturbed_clone(config, init_sd)
    ctl_rec = run_reference(
        control,
        opt_mod.get_optimizer_from_config(config["train"],
                                          control.parameters()),
        misc.NativeScalerWithGradNormCount())
    ref_losses = recorder.series["loss"]

    from semi_seg_ecg_tpu.algorithms.base import make_train_step

    state = _our_state(mstate, tx)
    state, losses = _run_ours(make_train_step, model, tx, config, state,
                              batches)
    assert len(losses) == len(ref_losses) == EPOCHS * STEPS_PER_EPOCH
    _assert_series_close(losses, ref_losses, ctl_rec.series["loss"],
                         what="loss")
    _assert_final_params_close(state, tmodel, control)
    # LR trajectory: the reference logs per-step lr; ours is baked into the
    # optimizer schedule — compare via the recorded series
    from semi_seg_ecg_tpu.utils.optimizer import make_lr_schedule

    lr_fn = make_lr_schedule(config["train"], STEPS_PER_EPOCH)
    ours_lr = [float(lr_fn(i)) for i in range(EPOCHS * STEPS_PER_EPOCH)]
    np.testing.assert_allclose(ours_lr, recorder.series["lr"], rtol=1e-6)


def test_lockstep_fixmatch(rng):
    """FixMatch loop lockstep vs reference fixmatch.train_one_epoch
    (fixmatch.py:58-192): eval-mode pseudo-labels, confidence masking,
    mask_ratio, (loss_x + loss_u_s)/2 composition."""
    import copy

    config = _config("resnet18", conf_thresh=0.8)
    batches = _make_batches(rng, unlabeled=True)
    fixmatch_ref = import_reference_module("algorithms.fixmatch")
    misc = import_reference_module("utils.misc")
    opt_mod = import_reference_module("utils.optimizer")
    tmodel, optimizer, scaler = _reference_setup(config)
    init_sd = copy.deepcopy(tmodel.state_dict())
    model, tx, mstate = _our_setup(config, tmodel)

    device = torch.device("cpu")

    def run_reference(m, opt, sc):
        rec = _Recorder()
        for epoch, epoch_steps in enumerate(batches):
            labeled, unlabeled = _torch_loader(epoch_steps, unlabeled=True)
            fixmatch_ref.train_one_epoch(
                m, labeled, unlabeled, opt, device, epoch, sc,
                log_writer=rec, use_amp=False, config=config["train"],
            )
        return rec

    recorder = run_reference(tmodel, optimizer, scaler)
    control = _perturbed_clone(config, init_sd)
    ctl_rec = run_reference(
        control,
        opt_mod.get_optimizer_from_config(config["train"],
                                          control.parameters()),
        misc.NativeScalerWithGradNormCount())

    from semi_seg_ecg_tpu.algorithms.fixmatch import make_train_step

    state = _our_state(mstate, tx)
    step_fn = jax.jit(make_train_step(model, tx, config, STEPS_PER_EPOCH))
    losses, loss_x, loss_u_s, mask_ratio = [], [], [], []
    for epoch_steps in batches:
        for b in epoch_steps:
            state, m = step_fn(state, b)
            losses.append(float(m["loss_total"]))
            loss_x.append(float(m["loss_x"]))
            loss_u_s.append(float(m["loss_u_s"]))
            mask_ratio.append(float(m["mask_ratio"]))
    for name, ours in (("loss_total", losses), ("loss_x", loss_x),
                       ("loss_u_s", loss_u_s), ("mask_ratio", mask_ratio)):
        _assert_series_close(ours, recorder.series[name],
                             ctl_rec.series[name], what=name)
    _assert_final_params_close(state, tmodel, control)


def test_lockstep_mean_teacher(rng):
    """Mean Teacher loop lockstep vs reference mean_teacher.train_one_epoch
    (mean_teacher.py:28-190): teacher soft pseudo-labels, soft-CE, post-step
    EMA of params AND buffers. Teacher init is a *cloned* copy (see module
    docstring for the reference's aliasing quirk), and BOTH teachers run
    eval-mode (``mt_teacher_eval: true``): the reference's real train()
    leaves its teacher in train mode (noisy teacher — our mean_teacher
    module docstring), but a dropout-noised teacher cannot be step-pinned
    across frameworks, so the lockstep controls that variable out; the
    train-mode default is validated at convergence by
    tools/validate_vs_reference.py instead."""
    import copy

    config = _config("resnet18", ema_decay=0.9, mt_teacher_eval=True)
    batches = _make_batches(rng, unlabeled=True)
    mt_ref = import_reference_module("algorithms.mean_teacher")
    base = import_reference_module("algorithms.base")
    misc = import_reference_module("utils.misc")
    opt_mod = import_reference_module("utils.optimizer")
    tmodel, optimizer, scaler = _reference_setup(config)
    init_sd = copy.deepcopy(tmodel.state_dict())
    model, tx, mstate = _our_setup(config, tmodel)

    def make_teacher(student):
        teacher = base.init_model_from_cfg(config, train=True).float()
        with torch.no_grad():
            for pq, pk in zip(student.parameters(), teacher.parameters()):
                pk.data = pq.data.clone()
            for bq, bk in zip(student.buffers(), teacher.buffers()):
                bk.data = bq.data.clone()
        for p in teacher.parameters():
            p.requires_grad = False
        teacher.eval()
        return teacher

    tteacher = make_teacher(tmodel)

    device = torch.device("cpu")

    def run_reference(m, teacher, opt, sc):
        rec = _Recorder()
        for epoch, epoch_steps in enumerate(batches):
            labeled, unlabeled = _torch_loader(epoch_steps, unlabeled=True)
            mt_ref.train_one_epoch(
                m, teacher, labeled, unlabeled, opt, device, epoch,
                sc, log_writer=rec, use_amp=False, config=config["train"],
            )
        return rec

    recorder = run_reference(tmodel, tteacher, optimizer, scaler)
    control = _perturbed_clone(config, init_sd)
    ctl_rec = run_reference(
        control, make_teacher(control),
        opt_mod.get_optimizer_from_config(config["train"],
                                          control.parameters()),
        misc.NativeScalerWithGradNormCount())

    from semi_seg_ecg_tpu.algorithms.mean_teacher import make_train_step

    state = _our_state(mstate, tx, with_ema=True)
    step_fn = jax.jit(make_train_step(model, tx, config, STEPS_PER_EPOCH))
    losses = []
    for epoch_steps in batches:
        for b in epoch_steps:
            state, m = step_fn(state, b)
            losses.append(float(m["loss_total"]))
    _assert_series_close(losses, recorder.series["loss_total"],
                         ctl_rec.series["loss_total"], what="loss_total")
    _assert_final_params_close(state, tmodel, control)

    # the EMA teacher must match too (params and BN buffers); the student's
    # chaos envelope bounds the teacher (EMA is a contraction of it)
    ema_sd = trees_to_torch_sd(
        jax.device_get(state.ema.params),
        jax.device_get(state.ema.batch_stats),
    )
    ctl_sd = {k: v.numpy() for k, v in control.state_dict().items()}
    for k, v in tteacher.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        ref = v.numpy()
        tref = tmodel.state_dict()[k].numpy()
        self_div = float(np.max(np.abs(ctl_sd[k] - tref)))
        bound = max(4.0 * self_div, 2e-4,
                    2e-3 * float(np.max(np.abs(ref))))
        assert float(np.max(np.abs(ema_sd[k] - ref))) < bound, \
            f"teacher mismatch at {k}"


def test_lockstep_cps(rng):
    """CPS loop lockstep vs reference cps.train_one_epoch (cps.py:27-209):
    two independent peers, eval-mode cross pseudo-labels with the label
    swap, per-peer (loss_x + loss_u_s)/2, two optimizers stepping in one
    iteration. Both peers' final params must track their torch twins."""
    import copy

    config = _config("resnet18")
    batches = _make_batches(rng, unlabeled=True)  # CPS uses the weak view
    cps_ref = import_reference_module("algorithms.cps")
    base = import_reference_module("algorithms.base")
    misc = import_reference_module("utils.misc")
    opt_mod = import_reference_module("utils.optimizer")

    t1, opt1, scaler = _reference_setup(config)
    t2 = base.init_model_from_cfg(config, train=True).float()  # distinct init
    opt2 = opt_mod.get_optimizer_from_config(config["train"], t2.parameters())
    init_sd1 = copy.deepcopy(t1.state_dict())
    init_sd2 = copy.deepcopy(t2.state_dict())

    model, tx, mstate1 = _our_setup(config, t1)
    _, _, mstate2 = _our_setup(config, t2)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), model=mstate1,
        opt_state=tx.init(mstate1.params), ema=None,
        peer=mstate2, peer_opt_state=tx.init(mstate2.params),
    )

    device = torch.device("cpu")

    def run_reference(m1, m2, o1, o2, sc):
        rec = _Recorder()
        for epoch, epoch_steps in enumerate(batches):
            labeled, unlabeled = _torch_loader(epoch_steps, unlabeled=True)
            cps_ref.train_one_epoch(
                m1, m2, labeled, unlabeled, o1, o2, device, epoch, sc,
                log_writer=rec, use_amp=False, config=config["train"],
            )
        return rec

    recorder = run_reference(t1, t2, opt1, opt2, scaler)
    ctl1 = _perturbed_clone(config, init_sd1)
    ctl2 = _perturbed_clone(config, init_sd2)
    ctl_rec = run_reference(
        ctl1, ctl2,
        opt_mod.get_optimizer_from_config(config["train"], ctl1.parameters()),
        opt_mod.get_optimizer_from_config(config["train"], ctl2.parameters()),
        misc.NativeScalerWithGradNormCount())

    from semi_seg_ecg_tpu.algorithms.cps import make_train_step

    step_fn = jax.jit(make_train_step(model, tx, config, STEPS_PER_EPOCH))
    series = {"loss_total": [], "loss_x": [], "loss_u_s": []}
    for epoch_steps in batches:
        for b in epoch_steps:
            state, m = step_fn(state, b)
            for k in series:
                series[k].append(float(m[k]))
    # factor 8 (vs 4 single-model): two independently-chaotic peers
    # cross-feed argmax pseudo-labels, so label flips compound the
    # divergence through twice as many channels as base/fixmatch
    for name, ours in series.items():
        _assert_series_close(ours, recorder.series[name],
                             ctl_rec.series[name], factor=8.0, what=name)
    _assert_final_params_close(state, t1, ctl1, factor=8.0)
    peer_state = TrainState(step=state.step, model=state.peer,
                            opt_state=state.peer_opt_state, ema=None,
                            peer=None, peer_opt_state=None)
    _assert_final_params_close(peer_state, t2, ctl2, factor=8.0)
