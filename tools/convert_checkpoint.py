#!/usr/bin/env python
"""Convert checkpoints between the reference's torch ``.pth`` format and this
framework's ``.ckpt`` format — both directions.

The reference stores ``{epoch, model: state_dict, optimizer, scaler, config,
metrics?, model_ema?}`` (src/utils/misc.py:281-302); pretrained-backbone
files store a bare backbone state_dict under ``model`` (consumed at
src/algorithms/base.py:289-300). This framework's ``.ckpt`` holds the same
metadata with ``model`` = ``{params, batch_stats}`` flax trees
(semi_seg_ecg_tpu/utils/checkpoint.py).

Usage:
  # reference .pth -> framework .ckpt (config read from the checkpoint when
  # embedded; pass -f for config-less pretrained-backbone files)
  python tools/convert_checkpoint.py to-framework best-loss.pth out.ckpt
  python tools/convert_checkpoint.py to-framework pretrain.pth out.ckpt \
      -f configs/base/resnet18/scratch.yaml --backbone-only

  # framework .ckpt -> reference-loadable .pth
  python tools/convert_checkpoint.py to-torch best-loss.ckpt out.pth

Optimizer statistics are not translated (torch Adam state and optax state
are structurally different); converted checkpoints warm-start the model and
restart the optimizer — the reference itself only restores the optimizer on
same-format resume (misc.py:315-320).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _model_templates(config):
    import jax
    import jax.numpy as jnp

    from semi_seg_ecg_tpu.models import build_model_from_config

    model = build_model_from_config(config, train=True)
    sig_len = config["dataset"].get("signal_length", 2500)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "droppath": jax.random.key(2)},
        jnp.zeros((1, 1, sig_len), jnp.float32), train=False,
        return_latent=model.with_projection,
    )
    return variables["params"], variables.get("batch_stats", {})


def _load_config(args, embedded):
    import yaml

    if args.config:
        with open(args.config) as f:
            return yaml.safe_load(f)
    if embedded is not None:
        return embedded
    raise SystemExit(
        "checkpoint embeds no config; pass -f/--config to describe the model"
    )


def to_framework(args) -> None:
    from semi_seg_ecg_tpu.utils import checkpoint as ckpt
    from semi_seg_ecg_tpu.utils.torch_interop import (
        load_torch_checkpoint,
        torch_sd_to_trees,
    )
    from semi_seg_ecg_tpu.utils.train_state import ModelState

    payload = load_torch_checkpoint(args.src)
    sd = payload.get("model", payload)
    backbone_only = args.backbone_only or not any(
        k.startswith(("backbone.", "decode_head.")) for k in sd
    )
    config = _load_config(args, payload.get("config"))
    params_t, stats_t = _model_templates(config)
    if backbone_only:
        params_t, stats_t = params_t["backbone"], stats_t.get("backbone", {})
    params, stats = torch_sd_to_trees(sd, params_t, stats_t,
                                      backbone_only=backbone_only)
    if backbone_only:
        params, stats = {"backbone": params}, {"backbone": stats}
    ema = None
    if isinstance(payload, dict) and payload.get("model_ema"):
        # mirror the main model's handling: same (possibly backbone-only)
        # templates, same backbone re-wrapping — the two trees must share
        # one structure or restore_model_state fails on resume
        ema_p, ema_s = torch_sd_to_trees(payload["model_ema"], params_t,
                                         stats_t,
                                         backbone_only=backbone_only)
        if backbone_only:
            ema_p, ema_s = {"backbone": ema_p}, {"backbone": ema_s}
        ema = ModelState(params=ema_p, batch_stats=ema_s)
    ckpt.save_checkpoint(
        args.dst,
        epoch=payload.get("epoch", 0) if isinstance(payload, dict) else 0,
        model_state=ModelState(params=params, batch_stats=stats),
        config=config,
        metrics=payload.get("metrics") if isinstance(payload, dict) else None,
        ema_state=ema,
    )
    print(f"wrote {args.dst} "
          f"({'backbone-only' if backbone_only else 'full model'})")


def to_torch(args) -> None:
    from semi_seg_ecg_tpu.utils import checkpoint as ckpt
    from semi_seg_ecg_tpu.utils.torch_interop import (
        save_torch_checkpoint,
        trees_to_torch_sd,
    )

    payload = ckpt.load_checkpoint(args.src)
    model = payload["model"]
    backbone_only = args.backbone_only
    params, stats = model["params"], model.get("batch_stats", {})
    if backbone_only:
        params, stats = params["backbone"], stats.get("backbone", {})
    out = {
        "epoch": payload.get("epoch", 0),
        "model": trees_to_torch_sd(params, stats,
                                   backbone_only=backbone_only),
        "optimizer": None,
        "scaler": None,
        "config": payload.get("config"),
    }
    if payload.get("metrics") is not None:
        out["metrics"] = payload["metrics"]
    if payload.get("model_ema") is not None:
        ema = payload["model_ema"]
        out["model_ema"] = trees_to_torch_sd(
            ema["params"], ema.get("batch_stats", {}))
    save_torch_checkpoint(args.dst, out)
    print(f"wrote {args.dst}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, fn in (("to-framework", to_framework), ("to-torch", to_torch)):
        p = sub.add_parser(name)
        p.add_argument("src")
        p.add_argument("dst")
        p.add_argument("-f", "--config", default=None,
                       help="YAML config describing the model (defaults to "
                            "the config embedded in the checkpoint)")
        p.add_argument("--backbone-only", action="store_true",
                       help="treat the checkpoint as a bare backbone "
                            "state_dict (auto-detected for .pth inputs)")
        p.set_defaults(fn=fn)
    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
