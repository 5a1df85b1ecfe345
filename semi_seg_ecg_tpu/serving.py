"""Self-contained serving artifacts via StableHLO export.

Beyond the reference (whose serving story ends at ``src/inference.py``
writing ``test_outputs.npy``): `export_serving` compiles the eval-mode
model — checkpoint weights baked in as constants — to a serialized
StableHLO program (``jax.export``) that any JAX runtime can load and run
WITHOUT this framework's Python code, model classes, or checkpoint
machinery. That is the TPU-native deployment unit: ship one file to the
serving fleet, `load_serving` it, call it on ``(B, leads, T)`` float32
batches, get softmax probabilities ``(B, C, T)``.

Semantics match ``inference.py`` exactly: fp32 unless ``test.use_amp``,
``quantize: int8`` honored (the dynamic-quantization graph exports like
any other jitted program — it is plain XLA ops, ``ops/quant.py``).

The batch dimension is exported symbolically by default, so one artifact
serves any batch size; pass ``batch_size`` to pin it (marginally better
compile-time specialization at load).

Artifact layout: ``ECGSHLO1`` magic, 4-byte little-endian JSON-header
length, JSON header (shapes, classes, precision, platforms, vjp order),
then the StableHLO blob.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"ECGSHLO1"


def _calibration_batches(config, n):
    """First ``n`` test-split batches for int8 activation calibration."""
    import jax.numpy as jnp

    from .data.dataset import build_seg_dataset
    from .data.loader import get_dataloader

    ds = build_seg_dataset(config["dataset"], split="test")
    loader = get_dataloader(
        ds, mode="test", batch_size=config["dataloader"]["batch_size"],
        seed=config.get("seed", 0), num_shards=1, num_workers=0)
    out = []
    for i, b in enumerate(loader):
        if i >= n:
            break
        out.append(jnp.asarray(b["ecg"]))
    return out


def make_serving_fn(config: Dict[str, Any]):
    """``(infer, model_state)`` for a config: eval-mode model with the
    requested checkpoint restored; ``infer(ecg) -> softmax (B, C, T)``
    with inference.py's precision rule (fp32 unless ``test.use_amp``).

    ``quantize: int8`` + ``quantize_calibration: N`` calibrates static
    activation scales on the first N test batches (utils/calibrate.py) —
    in the export path the scales become constants baked into the
    artifact alongside the weights."""
    import jax
    import jax.numpy as jnp

    from .algorithms.common import load_eval_model, test_cfg

    if not test_cfg(config).get("use_amp", False):
        config = {**config, "precision": "fp32"}
    model, model_state = load_eval_model(config)

    quant = None
    n_cal = int(config.get("quantize_calibration", 0) or 0)
    if config.get("quantize") == "int8" and n_cal > 0:
        from .utils.calibrate import calibrate_quant

        quant = calibrate_quant(
            model, model_state.params, model_state.batch_stats,
            _calibration_batches(config, n_cal))

    def infer(ecg):
        variables = {"params": model_state.params,
                     "batch_stats": model_state.batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, ecg, train=False)
        return jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=1)

    return infer, model_state


def long_record_inference(
    config: Dict[str, Any],
    ecg,
    *,
    batch: int = 64,
    hop: Optional[int] = None,
    taper: str = "hann",
    infer: Optional[Callable] = None,
    mesh=None,
):
    """Segment one arbitrarily long record (Holter/telemetry scale).

    Completes the long-record story end-to-end: training scales past the
    2,500-sample window via seq-parallel ring attention; this is the
    inference side — the reference stops at per-window rows
    (``src/inference.py:112-125``), while real monitor output is hours
    long. The record is filtered ONCE at full length with the config's
    ``dataset.filter`` chain (no window-edge filter artifacts, unlike
    filtering pre-cut windows), then windowed at ``signal_length``,
    per-window standardized, batched through the eval model and
    taper-stitched entirely on device (:func:`ops.stitch.overlap_add_infer`
    — one XLA program, one D2H fetch).

    ``ecg``: ``(leads, T)`` or ``(T,)`` raw signal at the model's
    sampling rate. ``infer`` overrides the model function (e.g. a loaded
    export artifact's ``serve``); by default the config's best checkpoint
    is loaded via :func:`make_serving_fn` (``quantize: int8`` honored) —
    when segmenting MANY records, build ``infer`` once and pass it, or
    every call pays the checkpoint load and compiles a fresh program
    (the engine's program cache keys on the ``infer`` object).
    ``mesh`` (a ``parallel.make_mesh`` mesh) fans the window scan out
    over the data axis — N chips segment one record ~N× faster.
    Per-window standardization follows the config's
    ``dataset.transforms`` (applied iff a ``standardize`` entry is
    present, as in every shipped recipe — axes other than the full
    ``[-1, -2]`` window are not representable per-window and are
    rejected).
    Returns ``{"probs": (C, T) float32, "labels": (T,) int32}`` numpy.
    """
    from .data.transforms import get_transforms_from_config
    from .ops.stitch import overlap_add_infer

    ecg = np.asarray(ecg, np.float32)
    if ecg.ndim == 1:
        ecg = ecg[None, :]
    for t in (get_transforms_from_config(
            config["dataset"].get("filter") or []) or []):
        ecg = t(ecg)
    standardize = False
    for entry in config["dataset"].get("transforms") or []:
        name = entry if isinstance(entry, str) else next(iter(entry))
        # the transforms parser accepts both the MAPPING key
        # ('standardize') and the class-name spelling ('Standardize')
        if name.lower() == "standardize":
            axis = (entry.get(name) or {}).get("axis", (-1, -2)) \
                if isinstance(entry, dict) else (-1, -2)
            axis = tuple(axis) if isinstance(axis, (list, tuple)) else (axis,)
            if axis not in ((-1, -2), (-2, -1)):
                raise ValueError(
                    f"long_record_inference: per-window standardize over "
                    f"axis {axis} is not supported (whole-window axes only)")
            standardize = True
    if infer is None:
        infer, _ = make_serving_fn(config)
    window = int(config["dataset"].get("signal_length", 2500))
    probs, labels = overlap_add_infer(
        infer, ecg, window=window, hop=hop, batch=batch, taper=taper,
        standardize=standardize, mesh=mesh)
    return {"probs": np.asarray(probs), "labels": np.asarray(labels)}


class StreamingSegmenter:
    """Online (real-time) segmentation of an unbounded ECG stream.

    The live-telemetry counterpart of :func:`long_record_inference`:
    samples arrive in arbitrary-size chunks (``push``), and class
    probabilities are finalized and returned with bounded latency — a
    sample is emitted once the last window covering it has run, i.e.
    worst-case latency of one ``window`` plus the chunk period. The
    window grid, per-window standardization, taper blend and tail rule
    are EXACTLY :mod:`ops.stitch`'s, so streaming a record chunk by
    chunk reproduces ``overlap_add_infer``'s output (pinned in
    tests/test_longrec_infer.py).

    TPU-shaped by construction: ONE jitted step of static shapes — the
    windowed forward plus carry of the ``window - hop`` overlap
    accumulator — serves a stream of any length with no recompiles and
    O(window) state. ``infer`` maps ``(B, leads, window) -> (B, C,
    window)`` probabilities (:func:`make_serving_fn` or a loaded
    artifact).

    ``num_streams`` batches S concurrent live streams through the same
    step — the batch dimension IS the stream dimension, so a monitoring
    fleet rides the MXU at serving-batch efficiency. Streams advance in
    lockstep (``push`` takes ``(S, leads, n)``; a frontend tick
    aggregates one chunk per stream); per-stream standardization and
    overlap carries are independent, so each stream's output is
    identical to running it alone (pinned in tests).
    """

    def __init__(self, infer: Callable, *, window: int,
                 hop: Optional[int] = None, num_leads: int = 1,
                 taper: str = "hann", standardize: bool = True,
                 num_streams: int = 1, mesh=None):
        import jax
        import jax.numpy as jnp

        from .ops.stitch import _taper

        hop = window // 2 if hop is None else hop
        if window % hop != 0:
            raise ValueError(f"hop ({hop}) must divide window ({window})")
        if num_streams < 1:
            raise ValueError("num_streams must be >= 1")
        self.window, self.hop, self.leads = window, hop, num_leads
        self.num_streams = num_streams
        # mesh: shard the stream batch over the data axis — a monitoring
        # fleet spreads S concurrent streams across N chips (GSPMD: the
        # step's batch dim carries the sharding; carries stay sharded
        # device-side between ticks, only raw chunks upload each push)
        self._shardings = (None, None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if num_streams % int(mesh.shape["data"]) != 0:
                raise ValueError(
                    f"num_streams ({num_streams}) must divide by the mesh's "
                    f"data axis ({int(mesh.shape['data'])})")
            self._shardings = (NamedSharding(mesh, P("data")),
                               NamedSharding(mesh, P()))
        out = jax.eval_shape(infer, jax.ShapeDtypeStruct(
            (num_streams, num_leads, window), np.float32))
        self.num_classes = int(out.shape[1])
        wvec = jnp.asarray(_taper(window, taper))

        def step(win, acc_carry, wacc_carry):
            # win: (S, leads, window) raw samples; acc_carry (S, C,
            # window-hop): accumulated contributions to the overlap
            # samples from earlier windows; wacc_carry (window-hop,):
            # their taper weights (data-independent, shared by streams)
            if standardize:
                mu = win.mean(axis=(1, 2), keepdims=True)
                sd = win.std(axis=(1, 2), keepdims=True)
                win = jnp.where(sd != 0.0,
                                (win - mu) / jnp.where(sd != 0.0, sd, 1.0),
                                0.0)
            probs = infer(win).astype(jnp.float32)  # (S, C, window)
            acc = jnp.pad(acc_carry,
                          ((0, 0), (0, 0), (0, hop))) + probs * wvec
            wacc = jnp.pad(wacc_carry, (0, hop)) + wvec
            out = acc[:, :, :hop] / jnp.maximum(wacc[:hop], 1e-8)
            return (out, jnp.argmax(out, axis=1).astype(jnp.int32),
                    acc[:, :, hop:], wacc[hop:])

        self._step_fn = step  # unjitted: benchmarks scan it (one dispatch/K)
        self._step = jax.jit(step)
        self.reset()

    def reset(self):
        S = self.num_streams
        self._buf = np.zeros((S, self.leads, 0), np.float32)  # unprocessed
        self._last = np.zeros((S, self.leads, 0), np.float32)  # reflect src
        self._acc = np.zeros((S, self.num_classes, self.window - self.hop),
                             np.float32)
        self._wacc = np.zeros(self.window - self.hop, np.float32)
        self._total = 0  # samples pushed per stream
        self._emitted = 0  # samples finalized per stream
        if self._shardings[0] is not None:
            import jax

            self._acc = jax.device_put(self._acc, self._shardings[0])
            self._wacc = jax.device_put(self._wacc, self._shardings[1])

    def _squeeze(self, probs, labels):
        if self.num_streams == 1:
            return probs[0], labels[0]
        return probs, labels

    def _run_window(self, win):
        if self._shardings[0] is not None:
            import jax

            win = jax.device_put(np.ascontiguousarray(win),
                                 self._shardings[0])
        out, labels, acc, wacc = self._step(win, self._acc, self._wacc)
        self._acc, self._wacc = acc, wacc
        return np.asarray(out), np.asarray(labels)

    def _empty(self):
        S = self.num_streams
        return self._squeeze(np.zeros((S, self.num_classes, 0), np.float32),
                             np.zeros((S, 0), np.int32))

    def push(self, chunk):
        """Feed ``n`` new samples per stream — ``(S, leads, n)``; with
        ``num_streams == 1`` also ``(leads, n)`` or ``(n,)``. Returns
        ``(probs, labels)`` for the samples finalized by this chunk —
        ``(S, C, m)`` / ``(S, m)``, leading axis squeezed for a single
        stream, possibly with m == 0."""
        chunk = np.asarray(chunk, np.float32)
        if self.num_streams == 1:
            if chunk.ndim == 1:
                chunk = chunk[None]
            if chunk.ndim == 2:
                chunk = chunk[None]
        want = (self.num_streams, self.leads)
        if chunk.ndim != 3 or chunk.shape[:2] != want:
            raise ValueError(f"expected (streams, leads, n) = (*{want}, n), "
                             f"got shape {chunk.shape}")
        self._total += chunk.shape[2]
        self._buf = np.concatenate([self._buf, chunk], axis=2)
        self._last = np.concatenate([self._last, chunk],
                                    axis=2)[:, :, -self.window:]
        probs_out, labels_out = [], []
        while self._buf.shape[2] >= self.window:
            p, l = self._run_window(self._buf[:, :, :self.window])
            probs_out.append(p)
            labels_out.append(l)
            self._buf = self._buf[:, :, self.hop:]
            self._emitted += self.hop
        if not probs_out:
            return self._empty()
        return self._squeeze(np.concatenate(probs_out, axis=2),
                             np.concatenate(labels_out, axis=1))

    def flush(self):
        """End of stream: run the remaining tail windows (content-padded
        with the same reflect/edge rule as the offline stitcher) and
        return ``(probs, labels)`` for all not-yet-finalized samples up
        to the stream length. The segmenter then resets."""
        from .ops.stitch import plan_windows

        total, window, hop = self._total, self.window, self.hop
        if total < 1:
            self.reset()
            return self._empty()
        # the offline engine owns the window-grid/tail rule; batch=1 — the
        # batch-rounding padding windows it adds carry zero weight there
        # and do not exist here
        n_win, _, _, _ = plan_windows(total, window, hop, 1)
        reach = (n_win - 1) * hop + window
        pad = reach - total
        if pad > 0:
            if pad < total:  # reflect from the retained tail (pad < window)
                ext = self._last[:, :, -(pad + 1):-1][:, :, ::-1]
            else:  # tiny record: edge values
                ext = np.repeat(self._last[:, :, -1:], pad, axis=2)
            self._buf = np.concatenate([self._buf, ext], axis=2)
        probs_out, labels_out = [], []
        n_run = (self._emitted // hop)
        for i in range(n_run, n_win):
            p, l = self._run_window(self._buf[:, :, :window])
            probs_out.append(p)
            labels_out.append(l)
            self._buf = self._buf[:, :, hop:]
        # the final window's trailing overlap is covered by no later
        # window: normalize the carry directly
        tail = np.asarray(self._acc) / np.maximum(np.asarray(self._wacc),
                                                  1e-8)
        probs_out.append(tail)
        labels_out.append(tail.argmax(axis=1).astype(np.int32))
        probs = np.concatenate(probs_out, axis=2)
        labels = np.concatenate(labels_out, axis=1)
        keep = total - self._emitted
        self.reset()
        return self._squeeze(probs[:, :, :keep], labels[:, :keep])


def export_serving(
    config: Dict[str, Any],
    out_path: str,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Export the config's serving model to ``out_path``; returns the
    artifact header. ``platforms`` defaults to the current backend; pass
    e.g. ``("tpu", "cpu")`` for a cross-platform artifact (works for the
    standard conv/dense graphs; Pallas attention kernels are TPU-only —
    export ViT configs with ``attention_impl: xla`` for portability)."""
    import jax
    from jax import export as jexport

    from .algorithms.common import test_cfg

    infer, _ = make_serving_fn(config)
    # the header must state the precision of the graph actually traced:
    # make_serving_fn forces fp32 unless test.use_amp (inference.py rule),
    # regardless of the config's training-time precision key
    effective_precision = (config.get("precision", "bf16")
                           if test_cfg(config).get("use_amp", False)
                           else "fp32")

    num_leads = 1
    length = config["dataset"].get("signal_length", 2500)
    if batch_size is None:
        shape = jexport.symbolic_shape(f"b, {num_leads}, {length}")
    else:
        shape = (batch_size, num_leads, length)
    spec = jax.ShapeDtypeStruct(shape, np.float32)

    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jexport.export(jax.jit(infer), **kwargs)(spec)
    blob = exported.serialize()

    header = {
        "format": "stablehlo/jax.export",
        "input_shape": [None if batch_size is None else batch_size,
                        num_leads, length],
        "num_classes": int(exported.out_avals[0].shape[1]),
        "output": "softmax_probs (B, C, T) float32",
        "precision": effective_precision,
        "quantize": config.get("quantize", None),
        "act_scales": ("static"
                       if config.get("quantize") == "int8"
                       and int(config.get("quantize_calibration", 0) or 0)
                       else "dynamic" if config.get("quantize") == "int8"
                       else None),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    payload = json.dumps(header).encode("utf-8")
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
        f.write(blob)
    os.replace(tmp, out_path)  # atomic, same discipline as checkpoints
    return header


def load_serving(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Load an exported artifact: ``(serve, header)`` where
    ``serve(ecg) -> probs`` runs the baked-in weights on the current
    backend. Needs only jax — none of this framework's model code."""
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a serving artifact "
                             f"(bad magic {magic!r})")
        raw_len = f.read(4)
        if len(raw_len) != 4:
            raise ValueError(f"{path}: truncated serving artifact")
        (hlen,) = struct.unpack("<I", raw_len)
        raw_header = f.read(hlen)
        blob = f.read()
        if len(raw_header) != hlen or not blob:
            raise ValueError(f"{path}: truncated serving artifact")
        try:
            header = json.loads(raw_header.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"{path}: corrupt artifact header: {e}") from e
    exported = jexport.deserialize(blob)

    def serve(ecg):
        return exported.call(ecg)

    return serve, header


def make_http_server(artifact_path: str, host: str = "127.0.0.1",
                     port: int = 8000,
                     bucket_sizes: Sequence[int] = (16, 64, 256)):
    """An HTTP server over an exported artifact (``tools/serve.py`` CLI).

    Endpoints:
    - ``GET /v1/metadata`` → the artifact header (JSON) + bucket sizes;
    - ``POST /v1/predict`` with an ``.npy``-serialized float32 array
      ``(B, leads, T)`` body → ``.npy`` softmax probabilities ``(B, C, T)``.

    Requests route through :func:`serve_batched` (so ragged client batch
    sizes compile at most ``len(bucket_sizes)`` programs) under a lock —
    one device, one program at a time; HTTP I/O itself is threaded.
    Returns the server; call ``serve_forever()`` (or ``shutdown()``).
    """
    import io
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    serve, header = load_serving(artifact_path)
    meta = json.dumps({**header, "bucket_sizes": list(bucket_sizes),
                       "endpoints": ["GET /v1/metadata",
                                     "POST /v1/predict"]}).encode()
    device_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: stdout is the CLI's channel
            pass

        def _reply(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code, msg):
            self._reply(code, json.dumps({"error": msg}).encode(),
                        "application/json")

        def do_GET(self):
            if self.path == "/v1/metadata":
                self._reply(200, meta, "application/json")
            else:
                self._error(404, f"unknown path {self.path}")

        def do_POST(self):
            if self.path != "/v1/predict":
                self._error(404, f"unknown path {self.path}")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                x = np.load(io.BytesIO(self.rfile.read(length)),
                            allow_pickle=False)
            except Exception as e:
                self._error(400, f"body must be a .npy array: {e}")
                return
            want = header["input_shape"]
            if (x.ndim != 3 or list(x.shape[1:]) != want[1:] or
                    (want[0] is not None and x.shape[0] != want[0])):
                self._error(400, f"expected shape {want}, got {list(x.shape)}")
                return
            with device_lock:
                if want[0] is not None:  # pinned batch: exact size, no pad
                    probs = np.asarray(serve(x.astype(np.float32)))
                else:
                    probs = serve_batched(serve, x.astype(np.float32),
                                          bucket_sizes)
            buf = io.BytesIO()
            np.save(buf, probs, allow_pickle=False)
            self._reply(200, buf.getvalue(), "application/x-npy")

    return ThreadingHTTPServer((host, port), Handler)


def serve_batched(serve: Callable, ecg: np.ndarray,
                  bucket_sizes: Sequence[int] = (16, 64, 256)):
    """Run ``serve`` on an arbitrary-size batch through fixed size buckets.

    A batch-polymorphic artifact recompiles per distinct batch size at
    call time; in production ragged request sizes would each pay that
    compile. This pads the batch up to the smallest admitting bucket
    (largest bucket repeated for the overflow), so at most
    ``len(bucket_sizes)`` programs ever compile, and slices the padding
    back off. Rows are independent in this model family, so padding rows
    never change real outputs."""
    if not bucket_sizes:
        raise ValueError("bucket_sizes must be non-empty")
    buckets = sorted(bucket_sizes)
    n = ecg.shape[0]
    if n == 0:
        # output row shape (C, T) is only knowable from the program: run
        # the smallest bucket once and keep zero rows
        probe = np.zeros((buckets[0],) + tuple(ecg.shape[1:]), ecg.dtype)
        return np.asarray(serve(probe))[:0]
    outs = []
    off = 0
    while off < n:
        rest = n - off
        size = next((b for b in buckets if b >= rest), buckets[-1])
        take = min(rest, size)
        chunk = ecg[off:off + take]
        if take < size:
            pad = np.zeros((size - take,) + tuple(ecg.shape[1:]),
                           dtype=ecg.dtype)
            chunk = np.concatenate([np.asarray(chunk), pad], axis=0)
        outs.append(np.asarray(serve(chunk))[:take])
        off += take
    return np.concatenate(outs, axis=0)
