"""Long-record (Holter-scale) windowed inference
(semi_seg_ecg_tpu/ops/stitch.py + serving.long_record_inference).

Contracts:
- the on-device scan/overlap-add engine reproduces a plain numpy oracle
  (window → standardize → model → taper-weighted blend → normalize)
  for overlapped, non-overlapped and tail-padded geometries;
- regions covered by a single window reproduce that window's
  probabilities exactly (w/w == 1), so hop == window degenerates to
  per-window inference;
- results are invariant to the scan batch size (batching is an
  implementation detail, not a semantic);
- the serving wrapper runs a real model end-to-end on a record many
  windows long and returns a valid probability field + labels.

The reference has no counterpart surface — its inference stops at fixed
pre-cut windows (src/inference.py:112-125); these tests pin OUR spec.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from semi_seg_ecg_tpu.ops import stitch

C = 3
LEADS = 2
WINDOW = 32


def _fake_infer(x):
    """Deterministic, batch-polymorphic stand-in model: softmax over a
    lead-mixed, position-dependent linear map. Position dependence makes
    any window-offset bug visible in the stitched output."""
    rng = np.random.default_rng(7)
    lead_mix = jnp.asarray(rng.standard_normal((x.shape[1], C)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((C, x.shape[2])), jnp.float32)
    logits = jnp.einsum("blt,lc->bct", x, lead_mix) + 0.3 * pos[None]
    e = jnp.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _oracle(ecg, window, hop, taper="hann", standardize=True):
    """Straight-line numpy re-statement of the stitching spec."""
    leads, total = ecg.shape
    n_win = max(0, math.ceil((total - window) / hop)) + 1
    reach = (n_win - 1) * hop + window
    pad = reach - total
    x = np.pad(ecg, ((0, 0), (0, pad)),
               mode="reflect" if pad < total else "edge")
    if taper == "flat":
        w = np.ones(window, np.float32)
    else:
        h = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(window) + 0.5) / window)
        w = (0.05 + 0.95 * h).astype(np.float32)
    acc = np.zeros((C, reach), np.float64)
    wacc = np.zeros(reach, np.float64)
    for i in range(n_win):
        s = i * hop
        win = x[:, s:s + window].copy()
        if standardize:
            mu, sd = win.mean(), win.std()
            win = (win - mu) / sd if sd != 0 else np.zeros_like(win)
        probs = np.asarray(_fake_infer(jnp.asarray(win[None])))[0]
        acc[:, s:s + window] += probs * w
        wacc[s:s + window] += w
    return (acc[:, :total] / wacc[:total]).astype(np.float32)


def test_matches_numpy_oracle_overlapped():
    rng = np.random.default_rng(0)
    ecg = rng.standard_normal((LEADS, 83)).astype(np.float32)  # ragged tail
    probs, labels = stitch.overlap_add_infer(
        _fake_infer, ecg, window=WINDOW, hop=16, batch=4)
    want = _oracle(ecg, WINDOW, 16)
    np.testing.assert_allclose(np.asarray(probs), want, atol=2e-6)
    assert labels.shape == (83,)
    np.testing.assert_array_equal(np.asarray(labels), want.argmax(axis=0))


def test_matches_oracle_no_overlap_and_quarter_hop():
    rng = np.random.default_rng(1)
    ecg = rng.standard_normal((LEADS, 3 * WINDOW)).astype(np.float32)
    for hop in (WINDOW, WINDOW // 4):
        probs, _ = stitch.overlap_add_infer(
            _fake_infer, ecg, window=WINDOW, hop=hop, batch=2)
        np.testing.assert_allclose(
            np.asarray(probs), _oracle(ecg, WINDOW, hop), atol=2e-6)


def test_single_window_record_is_direct_inference():
    """T == window, hop == window: stitching must be the identity —
    exactly the standardized window's probabilities."""
    rng = np.random.default_rng(2)
    ecg = rng.standard_normal((LEADS, WINDOW)).astype(np.float32)
    probs, _ = stitch.overlap_add_infer(
        _fake_infer, ecg, window=WINDOW, hop=WINDOW, batch=4)
    win = (ecg - ecg.mean()) / ecg.std()
    want = np.asarray(_fake_infer(jnp.asarray(win[None])))[0]
    np.testing.assert_allclose(np.asarray(probs), want, atol=1e-6)


def test_batch_size_is_not_a_semantic():
    rng = np.random.default_rng(3)
    ecg = rng.standard_normal((LEADS, 150)).astype(np.float32)
    a, _ = stitch.overlap_add_infer(_fake_infer, ecg, window=WINDOW,
                                    hop=16, batch=1)
    b, _ = stitch.overlap_add_infer(_fake_infer, ecg, window=WINDOW,
                                    hop=16, batch=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_one_dim_record_promotes_to_single_lead():
    rng = np.random.default_rng(4)
    sig = rng.standard_normal(70).astype(np.float32)

    def infer_1lead(x):
        assert x.shape[1] == 1
        return _fake_infer(jnp.concatenate([x, x], axis=1))

    probs, labels = stitch.overlap_add_infer(
        infer_1lead, sig, window=WINDOW, hop=16, batch=4)
    assert probs.shape == (C, 70) and labels.shape == (70,)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=0), 1.0, atol=1e-5)


def _data_mesh():
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    return Mesh(devs.reshape(len(devs), 1, 1), ("data", "seq", "model"))


def test_sharded_stitch_matches_single_device():
    """mesh= fans the window scan over the data axis; per-rank slabs
    overlap-add at the seams, so the result matches the single-device
    program (and the oracle) to addition-order tolerance."""
    rng = np.random.default_rng(6)
    ecg = rng.standard_normal((LEADS, 9 * WINDOW + 11)).astype(np.float32)
    mesh = _data_mesh()
    single, _ = stitch.overlap_add_infer(
        _fake_infer, ecg, window=WINDOW, hop=16, batch=2)
    sharded, labels = stitch.overlap_add_infer(
        _fake_infer, ecg, window=WINDOW, hop=16, batch=2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded),
                               _oracle(ecg, WINDOW, 16), atol=2e-5)
    assert labels.shape == (ecg.shape[1],)


def test_sharded_stitch_short_record_idle_ranks():
    """Fewer windows than ranks×batch: trailing ranks see only padding
    (weight 0) and must not perturb the result."""
    rng = np.random.default_rng(7)
    ecg = rng.standard_normal((LEADS, WINDOW + 7)).astype(np.float32)
    sharded, _ = stitch.overlap_add_infer(
        _fake_infer, ecg, window=WINDOW, hop=WINDOW // 2, batch=2,
        mesh=_data_mesh())
    np.testing.assert_allclose(np.asarray(sharded),
                               _oracle(ecg, WINDOW, WINDOW // 2), atol=2e-5)


def test_streaming_matches_batch_stitcher():
    """StreamingSegmenter fed arbitrary-size chunks reproduces the
    offline overlap_add_infer output — same grid, taper, standardization
    and tail rule — across overlap factors and ragged lengths."""
    from semi_seg_ecg_tpu.serving import StreamingSegmenter

    rng = np.random.default_rng(8)
    for hop in (WINDOW, WINDOW // 2, WINDOW // 4):
        for total in (WINDOW - 5, 2 * WINDOW, 3 * WINDOW + 7):
            ecg = rng.standard_normal((LEADS, total)).astype(np.float32)
            want, want_labels = stitch.overlap_add_infer(
                _fake_infer, ecg, window=WINDOW, hop=hop, batch=3)
            seg = StreamingSegmenter(_fake_infer, window=WINDOW, hop=hop,
                                     num_leads=LEADS)
            got_p, got_l = [], []
            off = 0
            while off < total:
                n = int(rng.integers(1, 23))
                p, l = seg.push(ecg[:, off:off + n])
                got_p.append(p)
                got_l.append(l)
                off += n
            p, l = seg.flush()
            got_p.append(p)
            got_l.append(l)
            probs = np.concatenate(got_p, axis=1)
            labels = np.concatenate(got_l)
            assert probs.shape == (C, total), (hop, total, probs.shape)
            np.testing.assert_allclose(
                probs, np.asarray(want), atol=2e-6,
                err_msg=f"hop={hop} total={total}")
            np.testing.assert_array_equal(labels, probs.argmax(axis=0))
            np.testing.assert_array_equal(labels, np.asarray(want_labels))


def test_streaming_latency_bound_and_reuse():
    """Samples finalize within one window of arrival; flush resets the
    segmenter for the next stream."""
    from semi_seg_ecg_tpu.serving import StreamingSegmenter

    rng = np.random.default_rng(9)
    seg = StreamingSegmenter(_fake_infer, window=WINDOW, hop=WINDOW // 2,
                             num_leads=LEADS)
    emitted = 0
    for i in range(6):
        p, _ = seg.push(rng.standard_normal((LEADS, 16)).astype(np.float32))
        emitted += p.shape[1]
        pushed = 16 * (i + 1)
        assert pushed - emitted <= WINDOW, (pushed, emitted)
    seg.flush()
    # stream 2 after reset: same results as a fresh stream
    ecg = rng.standard_normal((LEADS, 2 * WINDOW)).astype(np.float32)
    p1, _ = seg.push(ecg)
    f1, _ = seg.flush()
    want, _ = stitch.overlap_add_infer(_fake_infer, ecg, window=WINDOW,
                                       hop=WINDOW // 2, batch=2)
    np.testing.assert_allclose(np.concatenate([p1, f1], axis=1),
                               np.asarray(want), atol=2e-6)


def test_multi_stream_lockstep_independence():
    """num_streams=S batches concurrent streams through one step; each
    stream's output is identical to running it alone."""
    from semi_seg_ecg_tpu.serving import StreamingSegmenter

    rng = np.random.default_rng(10)
    S, total = 3, 2 * WINDOW + 9
    ecgs = rng.standard_normal((S, LEADS, total)).astype(np.float32)
    seg = StreamingSegmenter(_fake_infer, window=WINDOW, hop=WINDOW // 2,
                             num_leads=LEADS, num_streams=S)
    got_p, got_l = [], []
    off = 0
    while off < total:
        n = min(19, total - off)
        p, l = seg.push(ecgs[:, :, off:off + n])
        got_p.append(p)
        got_l.append(l)
        off += n
    p, l = seg.flush()
    got_p.append(p)
    got_l.append(l)
    probs = np.concatenate(got_p, axis=2)
    labels = np.concatenate(got_l, axis=1)
    assert probs.shape == (S, C, total)
    for s in range(S):
        want, want_l = stitch.overlap_add_infer(
            _fake_infer, ecgs[s], window=WINDOW, hop=WINDOW // 2, batch=2)
        np.testing.assert_allclose(probs[s], np.asarray(want), atol=2e-6,
                                   err_msg=f"stream {s}")
        np.testing.assert_array_equal(labels[s], np.asarray(want_l))


def test_multi_stream_sharded_over_mesh():
    """mesh= shards the stream batch over the data axis; results match
    the unsharded segmenter."""
    from semi_seg_ecg_tpu.serving import StreamingSegmenter

    rng = np.random.default_rng(11)
    S, total = 8, WINDOW + 40
    ecgs = rng.standard_normal((S, LEADS, total)).astype(np.float32)

    def run(seg):
        parts = [seg.push(ecgs[:, :, :total // 2])[0],
                 seg.push(ecgs[:, :, total // 2:])[0],
                 seg.flush()[0]]
        return np.concatenate(parts, axis=2)

    plain = run(StreamingSegmenter(_fake_infer, window=WINDOW,
                                   hop=WINDOW // 2, num_leads=LEADS,
                                   num_streams=S))
    sharded = run(StreamingSegmenter(_fake_infer, window=WINDOW,
                                     hop=WINDOW // 2, num_leads=LEADS,
                                     num_streams=S, mesh=_data_mesh()))
    np.testing.assert_allclose(sharded, plain, atol=1e-6)

    with pytest.raises(ValueError, match="must divide"):
        StreamingSegmenter(_fake_infer, window=WINDOW, hop=WINDOW // 2,
                           num_leads=LEADS, num_streams=3,
                           mesh=_data_mesh())


def test_geometry_fuzz_against_oracle():
    """Randomized window/hop/length/batch geometries (fixed seeds) all
    match the numpy oracle — guards the padding/validity/fold edge cases
    no single hand-picked geometry exercises."""
    rng = np.random.default_rng(12)
    for trial in range(12):
        window = int(rng.choice([8, 16, 24, 32]))
        k = int(rng.choice([1, 2, 4]))
        if window % k:
            window = k * max(1, window // k)
        hop = window // k
        total = int(rng.integers(max(2, window // 2), 6 * window))
        batch = int(rng.choice([1, 2, 5]))
        ecg = rng.standard_normal((LEADS, total)).astype(np.float32)
        got, _ = stitch.overlap_add_infer(
            _fake_infer, ecg, window=window, hop=hop, batch=batch)
        want = _oracle(ecg, window, hop)
        np.testing.assert_allclose(
            np.asarray(got), want, atol=3e-6,
            err_msg=f"trial {trial}: w={window} h={hop} T={total} b={batch}")


def test_hop_must_divide_window():
    with pytest.raises(ValueError, match="must divide"):
        stitch.plan_windows(100, WINDOW, 10, 4)


def test_long_record_inference_end_to_end(tmp_path):
    """serving.long_record_inference on a real (random-weight) model: a
    record 9 windows long goes filter → window → stitch in one program;
    output is a valid probability field at full record length."""
    from semi_seg_ecg_tpu import serving
    from semi_seg_ecg_tpu.algorithms.common import init_model_state
    from semi_seg_ecg_tpu.models import build_model_from_config
    from semi_seg_ecg_tpu.utils import checkpoint as ckpt

    from tests.test_models import RESNET_CFG

    sig_len = 256
    config = {
        **{k: dict(v) if isinstance(v, dict) else v
           for k, v in RESNET_CFG.items()},
        "seed": 11,
        "dataset": {
            "signal_length": sig_len,
            "filter": [
                {"highpass_filter": {"fs": 250, "cutoff": 0.67}},
                {"lowpass_filter": {"fs": 250, "cutoff": 40}},
            ],
            "transforms": [{"standardize": {"axis": [-1, -2]}},
                           {"to_tensor": {"dtype": "float"}}],
        },
        "test": {"model_path": str(tmp_path / "model.ckpt"),
                 "target_metric": "MeanIoU"},
        "output_dir": str(tmp_path), "exp_name": "exp",
    }
    model = build_model_from_config(config, train=False, serving=True)
    ms = init_model_state(model, config, seed=11)
    ckpt.save_checkpoint(str(tmp_path / "model.ckpt"), epoch=0,
                         model_state=ms)

    total = int(8.5 * sig_len)
    rng = np.random.default_rng(5)
    record = rng.standard_normal(total).astype(np.float32)
    out = serving.long_record_inference(config, record, batch=4)
    assert out["probs"].shape == (4, total)
    assert out["labels"].shape == (total,)
    assert out["labels"].dtype == np.int32
    np.testing.assert_allclose(out["probs"].sum(axis=0), 1.0, atol=1e-4)
    np.testing.assert_array_equal(out["labels"],
                                  out["probs"].argmax(axis=0))
