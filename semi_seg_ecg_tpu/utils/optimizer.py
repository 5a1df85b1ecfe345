"""Optimizer factory: config → optax gradient transformation.

Parity with ``get_optimizer_from_config`` (reference src/utils/
optimizer.py:8-37: sgd / adamw with betas, eps, momentum) plus the pieces
torch keeps outside the optimizer:

- the per-iteration warmup+cosine LR schedule (lr_sched.py:6-18) is baked in
  as an optax schedule over the step counter, so the whole update runs
  inside the jitted train step (no host → device hyperparameter traffic);
- layer-wise lr scales and selective weight decay (lr_decay.py:3-50) become
  per-leaf multiplier / mask pytrees;
- ``max_norm`` gradient clipping (misc.py:245-248) is a chained
  ``clip_by_global_norm``.

Matching torch AdamW exactly: decoupled weight decay scaled by the
*effective* (scheduled × layer-scaled) lr, i.e.
``p -= lr_g * (adam_update + wd * p)``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax

from . import lr_sched
from .treepath import key_path_names


def make_lr_schedule(train_cfg: Dict[str, Any], steps_per_epoch: int):
    """Step → lr, applying the reference's fractional-epoch convention
    (epoch = step / steps_per_epoch, updated every iteration —
    base.py:113-118)."""

    def schedule(step):
        epoch = step / steps_per_epoch
        return lr_sched.cosine_warmup_lr(epoch, train_cfg)

    return schedule


def zero_frozen_grads(frozen_mask) -> optax.GradientTransformation:
    """Zero gradients of frozen leaves *before* the optimizer statistics —
    the analogue of ``requires_grad=False`` (reference base.py:301-303
    ``freeze_backbone``, resnet.py:341-351 ``frozen_stages``)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (
            jax.tree.map(
                lambda u, frozen: jax.numpy.zeros_like(u) if frozen else u,
                updates, frozen_mask,
            ),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def frozen_param_mask(params, config, backbone_frozen_stages: int = -1,
                      backbone_type: str = "resnet"):
    """Pytree of bools: True = frozen.

    - ``mode: freeze_backbone`` freezes the whole backbone subtree
      (base.py:301-303);
    - ``frozen_stages`` freezes the stem/patch-embedding and the first
      stages/blocks (resnet.py:341-351, vision_transformer.py:274-284).
    """
    freeze_all_backbone = config.get("mode") == "freeze_backbone"

    def is_frozen(path, leaf):
        names = key_path_names(path)
        if not names or names[0] != "backbone":
            return False
        if freeze_all_backbone:
            return True
        s = backbone_frozen_stages
        if s < 0 or len(names) < 2:
            return False
        sub = names[1]
        if backbone_type == "resnet":
            if sub.startswith("stem"):
                return True
            if sub.startswith("layer"):
                stage = int(sub[5:].split("_")[0])
                return stage <= s
        else:  # vit
            if sub in ("pos_embedding", "Dense_0", "LayerNorm_0",
                       "LayerNorm_1"):
                return True
            if sub.startswith("block") and sub[5:].isdigit():
                return int(sub[5:]) < s
        return False

    return jax.tree_util.tree_map_with_path(is_frozen, params)


def scale_by_lr_tree(scales) -> optax.GradientTransformation:
    """Multiply each update leaf by its layer-decay scale."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (
            jax.tree.map(lambda u, s: u * s, updates, scales),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer_from_config(
    train_cfg: Dict[str, Any],
    steps_per_epoch: int,
    lr_scales=None,
    wd_mask=None,
    frozen_mask=None,
) -> optax.GradientTransformation:
    opt_name = train_cfg["optimizer"]
    weight_decay = train_cfg["weight_decay"]
    kwargs = train_cfg.get("optimizer_kwargs", {}) or {}
    max_norm = train_cfg.get("max_norm", None)
    schedule = make_lr_schedule(train_cfg, steps_per_epoch)

    chain = []
    if frozen_mask is not None:
        chain.append(zero_frozen_grads(frozen_mask))
    if max_norm is not None:
        chain.append(optax.clip_by_global_norm(max_norm))

    if opt_name == "sgd":
        # torch.optim.SGD couples weight decay INTO the gradient before the
        # momentum buffer (unlike AdamW's decoupled decay): buf = m·buf +
        # (g + wd·p); update = -lr·buf
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay,
                                                   mask=wd_mask))
        momentum = kwargs.get("momentum", 0)
        if momentum:
            chain.append(optax.trace(decay=momentum))
    elif opt_name == "adamw":
        betas = kwargs.get("betas", (0.9, 0.999))
        b1, b2 = tuple(betas)
        eps = kwargs.get("eps", 1e-8)
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        if weight_decay:
            # decoupled decay scaled by the effective lr, matching torch
            # AdamW; reference default (no layer_decay) applies wd to ALL
            # params (single torch param group, base.py:339-341)
            chain.append(optax.add_decayed_weights(weight_decay,
                                                   mask=wd_mask))
    else:
        raise ValueError(f"Unknown optimizer: {opt_name}")
    if lr_scales is not None:
        chain.append(scale_by_lr_tree(lr_scales))
    if frozen_mask is not None:
        # torch optimizers skip grad-less params entirely — frozen leaves
        # must see neither the adam update nor decoupled weight decay
        chain.append(zero_frozen_grads(frozen_mask))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def build_optimizer(
    config: Dict[str, Any],
    params,
    steps_per_epoch: int,
    model=None,
    backbone_depth: Optional[int] = None,
) -> optax.GradientTransformation:
    """Full assembly incl. optional layer decay (base.py:331-341 parity) and
    backbone freezing (``mode: freeze_backbone`` / ``frozen_stages``).

    ``params`` may be None when neither layer decay nor freezing is
    configured (no per-leaf trees are needed then)."""
    train_cfg = config["train"]
    layer_decay = train_cfg.get("layer_decay", None)
    lr_scales = wd_mask = frozen_mask = None
    if layer_decay:
        from .lr_decay import param_lr_scales_and_wd_mask

        no_wd = set()
        if model is not None and hasattr(model, "no_weight_decay"):
            no_wd = model.no_weight_decay()
        depth = backbone_depth
        if depth is None and model is not None:
            depth = getattr(model.backbone, "depth", None)
        assert depth is not None, "layer_decay requires a backbone with depth"
        assert params is not None, "layer_decay requires a params template"
        lr_scales, wd_mask = param_lr_scales_and_wd_mask(
            params, depth, layer_decay, no_wd
        )
    backbone = getattr(model, "backbone", None)
    frozen_stages = getattr(backbone, "frozen_stages", -1)
    if config.get("mode") == "freeze_backbone" or frozen_stages >= 0:
        assert params is not None, "freezing requires a params template"
        backbone_type = (
            "vit" if backbone is not None and hasattr(backbone, "patch_size")
            else "resnet"
        )
        frozen_mask = frozen_param_mask(
            params, config, backbone_frozen_stages=frozen_stages,
            backbone_type=backbone_type,
        )
    return get_optimizer_from_config(
        train_cfg, steps_per_epoch, lr_scales=lr_scales, wd_mask=wd_mask,
        frozen_mask=frozen_mask,
    )


def resolve_lr(config: Dict[str, Any], mesh_data_size: int) -> None:
    """Linear-scaling rule: ``lr = blr * eff_batch / 256`` when ``lr`` is
    unset (base.py:309-316). Mutates the config in place like the
    reference."""
    train_cfg = config["train"]
    eff = config["dataloader"]["batch_size"]
    eff *= train_cfg.get("accum_iter", 1)
    eff *= mesh_data_size
    if train_cfg.get("lr") is None:
        train_cfg["lr"] = train_cfg["blr"] * eff / 256
    config["train"]["eff_batch_size"] = eff
