"""Lockstep + statistical reference-equivalence for ReCo (VERDICT r2 #3).

ReCo is the one algorithm whose loss was structurally redesigned (the
reference's ragged per-class Python loop with data-dependent tensor sizes,
src/algorithms/reco.py:43-154, became the static-shape vectorised
``ops/reco_loss.compute_reco_loss``), so plain trajectory lockstep cannot
work draw-for-draw: the contrastive term consumes RNG through a different
sampler. The evidence here is therefore two-pronged:

1. **Trajectory lockstep with a sampling-twin envelope**
   (``test_lockstep_reco``): the reference loop runs twice from the SAME
   init with two different RNG streams for the contrastive draws; the
   divergence between those two runs IS the contrastive-sampling noise
   channel — exactly the channel our implementation differs in. Our
   trajectory must track run A within ``factor ×`` the A-vs-B envelope,
   per step and on final params. At step 0 the deterministic series
   (loss_x / loss_u_s / mask_ratio) have ZERO A-vs-B divergence, so ours
   is pinned to fp32 tolerance there — that locks the non-contrastive
   composition (teacher soft pseudo-labels reco.py:219-222, confidence
   masking :248-250, (loss_x+loss_u_s+contr)/3 :264, post-step EMA of
   params+buffers :287-298) bit-tight before any sampling noise enters.

2. **Statistical parity of the contrastive term itself**
   (``test_reco_loss_statistical_parity``): on FIXED inputs, N independent
   draws of the reference ``compute_reco_loss`` (reco.py:43-154) vs N of
   ours must agree in mean within a combined confidence interval, and the
   Monte-Carlo-mean gradients w.r.t. the latent must point the same way
   (cosine). This pins the redesigned sampler's *distribution*, which is
   the quantity the training dynamics actually see.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_compat import import_reference_module  # noqa: E402
from test_lockstep_reference import (  # noqa: E402
    BATCH,
    EPOCHS,
    SIG_LEN,
    STEPS_PER_EPOCH,
    _assert_final_params_close,
    _assert_series_close,
    _config,
    _make_batches,
    _our_setup,
    _our_state,
    _Recorder,
    _reference_setup,
    _torch_loader,
)
from semi_seg_ecg_tpu.utils.torch_interop import trees_to_torch_sd  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_torch():
    """Reference inits draw from torch's GLOBAL rng (autouse fixtures don't
    cross modules — this mirrors test_lockstep_reference's)."""
    torch.manual_seed(0)


def _reco_config():
    config = _config(
        "resnet18",
        conf_thresh=0.8,
        ema_decay=0.9,
        # small contrastive head keeps the 3 full runs fast; the statistical
        # test below covers the sampler at its recipe-scale behavior
        contr_temp=0.25,
        contr_num_queries=32,
        contr_num_negatives=64,
    )
    # reference reads the typo key (reco.py:257); exercise the alias on
    # purpose — our config layer maps eash_conf_thresh <-> easy_conf_thresh.
    # Thresholds are set so the contrastive term FIRES from step 0 on a
    # fresh model (max softmax conf ~0.25-0.5 with 4 classes): easy below
    # that range, hard above it — otherwise the term is identically zero
    # and the lockstep never exercises the sampler
    config["train"]["eash_conf_thresh"] = 0.25
    config["train"]["hard_conf_thresh"] = 0.95
    config["use_latent_projection"] = True
    config["projection_in_dim"] = 512
    config["projection_out_dim"] = 64
    return config


def test_lockstep_reco(rng):
    """ReCo loop vs reference reco.train_one_epoch (reco.py:157-359)."""
    import copy

    config = _reco_config()
    batches = _make_batches(rng, unlabeled=True)
    reco_ref = import_reference_module("algorithms.reco")
    base = import_reference_module("algorithms.base")
    misc = import_reference_module("utils.misc")
    opt_mod = import_reference_module("utils.optimizer")

    tmodel, optimizer, scaler = _reference_setup(config)
    init_sd = copy.deepcopy(tmodel.state_dict())
    model, tx, mstate = _our_setup(config, tmodel)

    def make_teacher(student):
        # cloned frozen copy — the documented intent of the reference's
        # param_k.data = param_q.data init (reco.py:451-456), minus its
        # storage-aliasing quirk (see test_lockstep_reference docstring)
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

    device = torch.device("cpu")

    def run_reference(m, teacher, opt, sc, sample_seed):
        # the contrastive term draws from torch's AND numpy's global RNGs
        # (torch.randint/Categorical reco.py:96-119, np.random.randint
        # :30-39) — seeding both here defines one sampling stream
        torch.manual_seed(sample_seed)
        np.random.seed(sample_seed)
        rec = _Recorder()
        for epoch, epoch_steps in enumerate(batches):
            labeled, unlabeled = _torch_loader(epoch_steps, unlabeled=True)
            reco_ref.train_one_epoch(
                m, teacher, labeled, unlabeled, opt, device, epoch, sc,
                log_writer=rec, use_amp=False, config=config["train"],
            )
        return rec

    tteacher = make_teacher(tmodel)
    recorder = run_reference(tmodel, tteacher, optimizer, scaler,
                             sample_seed=1000)
    # sampling twin: IDENTICAL init, different contrastive draw stream — its
    # divergence from run A measures exactly the noise channel our
    # different-sampler implementation lives in
    twin = base.init_model_from_cfg(config, train=True).float()
    twin.load_state_dict(copy.deepcopy(init_sd))
    twin_teacher = make_teacher(twin)
    twin_rec = run_reference(
        twin, twin_teacher,
        opt_mod.get_optimizer_from_config(config["train"], twin.parameters()),
        misc.NativeScalerWithGradNormCount(), sample_seed=2000)

    from semi_seg_ecg_tpu.algorithms.reco import make_train_step

    state = _our_state(mstate, tx, with_ema=True)
    step_fn = jax.jit(make_train_step(model, tx, config, STEPS_PER_EPOCH))
    series = {k: [] for k in
              ("loss_total", "loss_x", "loss_u_s", "contr_loss", "mask_ratio")}
    for epoch_steps in batches:
        for b in epoch_steps:
            state, m = step_fn(state, b)
            for k in series:
                series[k].append(float(m[k]))
    assert len(series["loss_total"]) == EPOCHS * STEPS_PER_EPOCH

    for name, ours in series.items():
        _assert_series_close(ours, recorder.series[name],
                             twin_rec.series[name], factor=6.0, what=name,
                             cummax=True)
    _assert_final_params_close(state, tmodel, twin, factor=6.0)

    # the EMA teacher: bound each leaf by the divergence between the two
    # reference runs' OWN teachers (the EMA path is itself path-dependent,
    # so the student's endpoint divergence is not a valid proxy)
    ema_sd = trees_to_torch_sd(
        jax.device_get(state.ema.params),
        jax.device_get(state.ema.batch_stats),
    )
    twin_t_sd = {k: v.numpy() for k, v in twin_teacher.state_dict().items()}
    for k, v in tteacher.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        ref = v.numpy()
        self_div = float(np.max(np.abs(twin_t_sd[k] - ref)))
        bound = max(6.0 * self_div, 2e-4, 2e-3 * float(np.max(np.abs(ref))))
        assert float(np.max(np.abs(ema_sd[k] - ref))) < bound, \
            f"EMA teacher mismatch at {k}"


def _stat_inputs(seed=0, b=2, t=256, d=32, c=4):
    """Structured fixed inputs giving all four regimes: confident easy
    pixels in several classes, hard anchors, and sub-threshold pixels."""
    r = np.random.default_rng(seed)
    latent = r.standard_normal((b, d, t)).astype(np.float32)
    # logits scaled so teacher max-prob spans ~0.3..0.97 around the 0.65
    # easy threshold; class identity varies by segment so every class has
    # a region
    seg_cls = (np.arange(t) * c // t)
    logits_t = r.standard_normal((b, c, t)).astype(np.float32)
    for ci in range(c):
        logits_t[:, ci, seg_cls == ci] += 3.0
    logits_t += r.standard_normal((b, c, t)).astype(np.float32) * 1.5
    prob_teacher = np.exp(logits_t) / np.exp(logits_t).sum(1, keepdims=True)
    logits_s = logits_t * 0.5 + r.standard_normal((b, c, t)).astype(
        np.float32)
    prob_student = np.exp(logits_s) / np.exp(logits_s).sum(1, keepdims=True)
    return latent, prob_teacher.astype(np.float32), \
        prob_student.astype(np.float32)


def test_reco_loss_statistical_parity():
    """ops/reco_loss.compute_reco_loss vs the reference's (reco.py:43-154)
    on fixed inputs: N draws each side → means within a combined CI, and
    Monte-Carlo-mean latent gradients aligned (cosine)."""
    reco_ref = import_reference_module("algorithms.reco")

    latent_np, prob_t_np, prob_s_np = _stat_inputs()
    kwargs = dict(easy_threshold=0.65, hard_threshold=0.80, temp=0.25,
                  num_queries=64, num_negatives=96)
    n_draws = 40

    # reference side: global torch+numpy RNG advances across draws
    torch.manual_seed(7)
    np.random.seed(7)
    ref_losses, ref_grad_sum = [], np.zeros_like(latent_np)
    for _ in range(n_draws):
        lat = torch.from_numpy(latent_np).requires_grad_(True)
        loss = reco_ref.compute_reco_loss(
            lat, torch.from_numpy(prob_t_np), torch.from_numpy(prob_s_np),
            **kwargs)
        (g,) = torch.autograd.grad(loss, lat)
        ref_losses.append(float(loss))
        ref_grad_sum += g.numpy()

    from semi_seg_ecg_tpu.ops.reco_loss import compute_reco_loss

    def ours(key):
        def f(lat):
            return compute_reco_loss(
                key, lat, jnp.asarray(prob_t_np), jnp.asarray(prob_s_np),
                **kwargs)
        return jax.value_and_grad(f)(jnp.asarray(latent_np))

    ours_jit = jax.jit(ours)
    keys = jax.random.split(jax.random.key(7), n_draws)
    our_losses, our_grad_sum = [], np.zeros_like(latent_np)
    for k in keys:
        loss, g = ours_jit(k)
        our_losses.append(float(loss))
        our_grad_sum += np.asarray(g)

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)
    assert np.isfinite(ref_losses).all() and np.isfinite(our_losses).all()
    assert (ref_losses > 0).all() and (our_losses > 0).all()

    # means within 4 combined standard errors (seeded, so deterministic)
    se = np.sqrt(ref_losses.var(ddof=1) / n_draws
                 + our_losses.var(ddof=1) / n_draws)
    diff = abs(ref_losses.mean() - our_losses.mean())
    print(f"reco loss: ref {ref_losses.mean():.4f}±{ref_losses.std():.4f} "
          f"ours {our_losses.mean():.4f}±{our_losses.std():.4f} "
          f"(|Δmean|={diff:.4f}, 4·SE={4 * se:.4f})")
    assert diff < 4.0 * max(se, 1e-3), (
        f"contrastive-loss means differ: ref {ref_losses.mean():.4f} vs "
        f"ours {our_losses.mean():.4f} (4·SE {4 * se:.4f})")
    # draw-to-draw spread should be the same order (sampler shape, not just
    # its mean); generous factor — different samplers, same distribution
    assert our_losses.std() < 3.0 * ref_losses.std() + 1e-3
    assert ref_losses.std() < 3.0 * our_losses.std() + 1e-3

    # Monte-Carlo-mean gradient direction w.r.t. the latent must agree
    rg = ref_grad_sum.ravel() / n_draws
    og = our_grad_sum.ravel() / n_draws
    cos = float(rg @ og / (np.linalg.norm(rg) * np.linalg.norm(og) + 1e-12))
    print(f"mean-grad cosine: {cos:.4f}")
    assert cos > 0.9, f"mean latent-gradient cosine {cos:.3f} <= 0.9"


def test_reco_loss_degenerate_parity():
    """Both implementations return exactly 0 when <2 classes are valid
    (reco.py:86-87) — the arithmetic-masking equivalent of the reference's
    early exit."""
    reco_ref = import_reference_module("algorithms.reco")
    b, t, d, c = 1, 64, 8, 4
    r = np.random.default_rng(3)
    latent = r.standard_normal((b, d, t)).astype(np.float32)
    # all confidence mass on class 0 → exactly one valid class
    prob_t = np.full((b, c, t), 0.01, np.float32)
    prob_t[:, 0] = 0.97
    prob_s = np.full((b, c, t), 1.0 / c, np.float32)
    kwargs = dict(easy_threshold=0.65, hard_threshold=0.80, temp=0.25,
                  num_queries=8, num_negatives=16)
    torch.manual_seed(0)
    np.random.seed(0)
    ref = float(reco_ref.compute_reco_loss(
        torch.from_numpy(latent), torch.from_numpy(prob_t),
        torch.from_numpy(prob_s), **kwargs))

    from semi_seg_ecg_tpu.ops.reco_loss import compute_reco_loss

    ours = float(compute_reco_loss(
        jax.random.key(0), jnp.asarray(latent), jnp.asarray(prob_t),
        jnp.asarray(prob_s), **kwargs))
    assert ref == 0.0 and ours == 0.0
