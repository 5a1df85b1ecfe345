"""BEiT-style layer-wise learning-rate decay over flax parameter trees.

Capability parity with ``param_groups_lrd`` / ``get_layer_id_for_vit``
(reference src/utils/lr_decay.py:3-81): instead of torch param groups, we
produce two pytrees aligned with ``params``:

- an ``lr_scale`` tree: ``layer_decay ** (num_layers - layer_id)`` per leaf,
- a weight-decay mask: 1-D params and ``no_weight_decay`` names are excluded.

Layer-id mapping (lr_decay.py:53-81): embeddings (pos/cls/patchify) → 0,
transformer block ``i`` → ``i + 1``, everything else (decode head, final
norm) → ``num_layers``.
"""

from __future__ import annotations

from .treepath import key_path_names
from typing import Any, Dict, Set, Tuple

import jax


def _path_names(path) -> Tuple[str, ...]:
    return key_path_names(path)


def get_layer_id(path_names: Tuple[str, ...], num_layers: int) -> int:
    """Flax-tree version of ``get_layer_id_for_vit`` (lr_decay.py:53-81)."""
    # inside EncoderDecoder, backbone params live under 'backbone'
    names = path_names[1:] if path_names and path_names[0] == "backbone" else path_names
    if not names:
        return num_layers
    head = names[0]
    if head in ("cls_embedding", "pos_embedding", "sep_embedding",
                "lead_embeddings"):
        return 0
    # patch embedding = the pre-block LayerNorm/Dense stack
    if head.startswith(("to_patch_embedding", "LayerNorm_0", "Dense_0",
                        "LayerNorm_1")):
        return 0
    if head.startswith("block") and head[5:].isdigit():
        return int(head[5:]) + 1
    return num_layers


def param_lr_scales_and_wd_mask(
    params: Dict[str, Any],
    depth: int,
    layer_decay: float,
    no_weight_decay_list: Set[str] = frozenset(),
):
    """Returns ``(lr_scale_tree, wd_mask_tree)`` aligned with ``params``.

    ``depth`` is the backbone depth (ViT blocks); ``num_layers = depth + 1``
    and ``scale(layer) = layer_decay ** (num_layers - layer)``
    (lr_decay.py:12-16)."""
    num_layers = depth + 1

    def scale_fn(path, leaf):
        names = _path_names(path)
        return layer_decay ** (num_layers - get_layer_id(names, num_layers))

    def wd_fn(path, leaf):
        names = _path_names(path)
        if leaf.ndim <= 1:
            return False
        if names and names[-2] in no_weight_decay_list:
            return False
        if any(n in no_weight_decay_list for n in names):
            return False
        return True

    scales = jax.tree_util.tree_map_with_path(scale_fn, params)
    wd_mask = jax.tree_util.tree_map_with_path(wd_fn, params)
    return scales, wd_mask
