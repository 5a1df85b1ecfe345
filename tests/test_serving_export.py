"""StableHLO serving export (semi_seg_ecg_tpu/serving.py).

Contracts:
- the exported artifact reproduces ``inference.py``'s outputs (same math,
  weights baked in; the batch-polymorphic program compiles separately from
  the batch-specialized jit, so equality is to float tolerance, not bits);
- the default export is batch-polymorphic — one artifact serves any
  batch size;
- ``quantize: int8`` configs export (dynamic quantization is plain XLA);
- the loader rejects non-artifact files instead of mis-parsing them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu import serving
from semi_seg_ecg_tpu.algorithms.common import init_model_state
from semi_seg_ecg_tpu.models import build_model_from_config
from semi_seg_ecg_tpu.utils import checkpoint as ckpt

from tests.test_models import RESNET_CFG

SIG_LEN = 512


@pytest.fixture(scope="module")
def exported_config(tmp_path_factory):
    """A config whose best-checkpoint exists on disk (random weights —
    export semantics don't care about training)."""
    root = tmp_path_factory.mktemp("serving")
    config = {
        **{k: dict(v) if isinstance(v, dict) else v
           for k, v in RESNET_CFG.items()},
        "seed": 3,
        "dataset": {"signal_length": SIG_LEN},
        "test": {"model_path": str(root / "model.ckpt"),
                 "target_metric": "MeanIoU"},
        "output_dir": str(root), "exp_name": "exp",
    }
    model = build_model_from_config(config, train=False, serving=True)
    ms = init_model_state(model, config, seed=3)
    ckpt.save_checkpoint(str(root / "model.ckpt"), epoch=0, model_state=ms)
    # the shared symbolic-batch artifact several tests load
    serving.export_serving(config, str(root / "model.shlo"))
    return config, str(root)


def test_export_matches_inference_forward(exported_config):
    config, root = exported_config
    path = root + "/model.shlo"
    header = serving.export_serving(config, path)
    assert header["input_shape"] == [None, 1, SIG_LEN]
    assert header["num_classes"] == 4
    assert header["precision"] == "fp32"

    serve, loaded_header = serving.load_serving(path)
    assert loaded_header == header

    infer, _ = serving.make_serving_fn(config)
    rng = np.random.default_rng(0)
    for batch in (1, 3):  # symbolic batch: one artifact, several sizes
        x = jnp.asarray(rng.standard_normal((batch, 1, SIG_LEN)),
                        jnp.float32)
        got = np.asarray(serve(x))
        want = np.asarray(infer(x))
        assert got.shape == (batch, 4, SIG_LEN)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_export_pinned_batch(exported_config):
    config, root = exported_config
    path = root + "/model-b2.shlo"
    header = serving.export_serving(config, path, batch_size=2)
    assert header["input_shape"] == [2, 1, SIG_LEN]
    serve, _ = serving.load_serving(path)
    x = jnp.zeros((2, 1, SIG_LEN), jnp.float32)
    assert np.asarray(serve(x)).shape == (2, 4, SIG_LEN)


def test_export_int8(exported_config):
    config, root = exported_config
    path = root + "/model-int8.shlo"
    header = serving.export_serving({**config, "quantize": "int8"}, path,
                                    batch_size=2)
    assert header["quantize"] == "int8"
    serve, _ = serving.load_serving(path)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1, SIG_LEN)),
                    jnp.float32)
    probs = np.asarray(serve(x))
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
    assert header["act_scales"] == "dynamic"


def test_export_int8_static_scales(exported_config):
    """quantize_calibration bakes calibrated activation scales into the
    artifact: the exported graph serves, tracks the dynamic-scale export,
    and declares itself static in the header."""
    config, root = exported_config
    # calibration reads the config's test split — give it one
    from semi_seg_ecg_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(root + "/cal_data", num_train_labeled=2,
                                num_train_unlabeled=2, num_valid=2,
                                num_test=4, length=SIG_LEN, seed=5)
    config = {**config,
              "dataset": {**ds, "signal_length": SIG_LEN},
              "dataloader": {"batch_size": 2, "num_workers": 0}}
    path = root + "/model-int8-static.shlo"
    header = serving.export_serving(
        {**config, "quantize": "int8", "quantize_calibration": 2}, path,
        batch_size=2)
    assert header["act_scales"] == "static"
    dyn_path = root + "/model-int8-dyn.shlo"
    serving.export_serving({**config, "quantize": "int8"}, dyn_path,
                           batch_size=2)
    serve, _ = serving.load_serving(path)
    dyn_serve, _ = serving.load_serving(dyn_path)
    # probe with in-distribution data (a real test-split batch): static
    # scales are only valid for inputs distributed like the calibration
    # traffic — that is the documented contract, not a defect
    x = serving._calibration_batches(config, 1)[0]
    p_sta = np.asarray(serve(x))
    np.testing.assert_allclose(p_sta.sum(axis=1), 1.0, rtol=1e-4)
    p_dyn = np.asarray(dyn_serve(x))
    agree = (p_sta.argmax(axis=1) == p_dyn.argmax(axis=1)).mean()
    assert agree > 0.9, agree


def test_cross_platform_export(exported_config):
    """--platforms tpu cpu: one artifact lowered for both backends (the
    CPU test host can still execute its cpu lowering)."""
    config, root = exported_config
    path = root + "/model-xplat.shlo"
    header = serving.export_serving(config, path, batch_size=2,
                                    platforms=("cpu", "tpu"))
    assert header["platforms"] == ["cpu", "tpu"]
    serve, _ = serving.load_serving(path)
    assert np.asarray(serve(jnp.zeros((2, 1, SIG_LEN)))).shape \
        == (2, 4, SIG_LEN)


def test_serve_batched_buckets(exported_config):
    """Ragged batches route through fixed buckets; outputs match the
    direct call row-for-row and padding rows never leak."""
    config, root = exported_config
    path = root + "/model.shlo"  # reuse the symbolic artifact
    serve, _ = serving.load_serving(path)
    rng = np.random.default_rng(2)
    calls = []

    def counting_serve(x):
        calls.append(x.shape[0])
        return serve(x)

    x = rng.standard_normal((11, 1, SIG_LEN)).astype(np.float32)
    got = serving.serve_batched(counting_serve, x, bucket_sizes=(4, 8))
    want = np.asarray(serve(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # 11 rows through buckets {4, 8}: one 8-chunk + one padded 4-chunk
    assert calls == [8, 4]
    with pytest.raises(ValueError, match="non-empty"):
        serving.serve_batched(serve, x, bucket_sizes=())


def test_header_precision_reflects_traced_graph(exported_config):
    """A bf16 training config without test.use_amp exports an fp32 graph
    (inference.py rule) — the header must say fp32, not echo the config."""
    config, root = exported_config
    path = root + "/model-bf16cfg.shlo"
    header = serving.export_serving({**config, "precision": "bf16"}, path,
                                    batch_size=1)
    assert header["precision"] == "fp32"


def test_serve_batched_empty_batch(exported_config):
    config, root = exported_config
    serve, _ = serving.load_serving(root + "/model.shlo")
    x = np.zeros((0, 1, SIG_LEN), np.float32)
    out = serving.serve_batched(serve, x, bucket_sizes=(4,))
    assert out.shape == (0, 4, SIG_LEN)


def test_http_server_predict_and_metadata(exported_config):
    """tools/serve.py surface: metadata + npy-in/npy-out prediction over
    a real socket, matching the direct artifact call."""
    import io
    import json
    import threading
    import urllib.request

    config, root = exported_config
    path = root + "/model.shlo"
    server = serving.make_http_server(path, port=0, bucket_sizes=(4,))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        meta = json.loads(urllib.request.urlopen(
            base + "/v1/metadata", timeout=30).read())
        assert meta["num_classes"] == 4 and meta["bucket_sizes"] == [4]

        rng = np.random.default_rng(4)
        x = rng.standard_normal((3, 1, SIG_LEN)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(base + "/v1/predict",
                                     data=buf.getvalue(), method="POST")
        probs = np.load(io.BytesIO(
            urllib.request.urlopen(req, timeout=120).read()))
        serve, _ = serving.load_serving(path)
        want = serving.serve_batched(serve, x, bucket_sizes=(4,))
        np.testing.assert_allclose(probs, want, atol=1e-6)

        # malformed body and wrong shape are 400s, unknown path 404
        for body, code in [(b"junk", 400), (None, 404)]:
            url = base + ("/v1/predict" if body else "/nope")
            req = urllib.request.Request(url, data=body or b"",
                                         method="POST" if body else "GET")
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, "expected HTTPError"
            except urllib.error.HTTPError as e:
                assert e.code == code
    finally:
        server.shutdown()
        server.server_close()


def test_loader_rejects_non_artifact(tmp_path):
    bad = tmp_path / "not_an_artifact.shlo"
    bad.write_bytes(b"definitely not stablehlo")
    with pytest.raises(ValueError, match="bad magic"):
        serving.load_serving(str(bad))
    truncated = tmp_path / "truncated.shlo"
    truncated.write_bytes(b"ECGSHLO1\x10")  # magic + partial length word
    with pytest.raises(ValueError, match="truncated"):
        serving.load_serving(str(truncated))
