"""Torch ``.pth`` ↔ framework parameter-tree conversion.

The reference ecosystem stores checkpoints as torch ``state_dict`` pickles:
full models from ``misc.save_model`` (reference src/utils/misc.py:281-302,
``model`` = EncoderDecoder state_dict) and pretrained backbones consumed by
``model.backbone.load_state_dict`` (src/algorithms/base.py:289-300, ``model``
= backbone-only state_dict). This module maps those key spaces onto this
framework's flax trees — both directions — so users can warm-start from
reference checkpoints and export back into the reference's tooling.

The mapping is purely structural (it walks the flax template tree and
derives each leaf's torch key), so it covers every backbone/head variant the
config grid can build: plain/deep-stem ResNets with BasicBlock/Bottleneck
and avg-down downsampling, the 1-D ViT family (qk-norm, LayerScale, final
norm), FCNHead, and the ReCo latent projection.

Weight layout translation:
- Conv1d: torch ``(out, in, k)`` ↔ flax ``(k, in, out)``
- Linear: torch ``(out, in)``    ↔ flax ``(in, out)``
- LayerNorm/BatchNorm: torch ``weight``/``bias`` ↔ flax ``scale``/``bias``;
  running stats ↔ ``batch_stats`` ``mean``/``var``.

No torch import is needed for the tree math; ``torch`` is only required to
(de)serialize ``.pth`` files (see ``load_torch_checkpoint`` /
``save_torch_checkpoint``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterator, Tuple

import numpy as np

# leaf kinds decide the layout transform
_CONV = "conv"      # (o,i,k) <-> (k,i,o)
_DENSE = "dense"    # (o,i) <-> (i,o)
_DIRECT = "direct"  # identical layout


def _norm_leaf(torch_prefix: str, leaf: str) -> Tuple[str, str]:
    """flax norm-leaf name -> (torch key, kind) under a norm module."""
    name = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}[leaf]
    return f"{torch_prefix}.{name}", _DIRECT


def _convbn_specs(flax_path, torch_conv: str, torch_bn: str):
    """Yield specs for a ConvBN module's params + stats leaves."""
    yield flax_path + ("Conv_0", "kernel"), f"{torch_conv}.weight", _CONV
    for leaf in ("scale", "bias", "mean", "var"):
        key, kind = _norm_leaf(torch_bn, leaf)
        yield flax_path + ("BatchNorm_0", leaf), key, kind


def _resnet_specs(prefix: Tuple[str, ...], tree: Dict[str, Any],
                  tprefix: str) -> Iterator[Tuple[tuple, str, str]]:
    """ResNet1D flax tree -> torch ResNet keys (reference resnet.py:135-363).

    ``tree`` is the merged {params ∪ batch_stats} subtree for the backbone so
    structure (deep stem, block count, downsample presence) is discoverable.
    """
    for name in tree:
        if name.startswith("stem_"):
            i = int(name.split("_")[1])
            # nn.Sequential(stem): conv at 3*i, bn at 3*i+1 (ReLU unnamed)
            yield from _convbn_specs(
                prefix + (name,), f"{tprefix}stem.{3 * i}",
                f"{tprefix}stem.{3 * i + 1}",
            )
        elif name.startswith("layer"):
            m = re.match(r"layer(\d+)_block(\d+)", name)
            s, j = m.group(1), m.group(2)
            block = tree[name]
            base = f"{tprefix}layer{s}.{j}"
            for sub in block:
                if sub.startswith("ConvBN_"):
                    k = int(sub.split("_")[1]) + 1
                    yield from _convbn_specs(
                        prefix + (name, sub), f"{base}.conv{k}",
                        f"{base}.bn{k}",
                    )
                elif sub == "Downsample_0":
                    # torch index shifts by one when avg_down prepends an
                    # AvgPool1d (resnet.py:269-293); resolved at lookup time
                    # via the @AVGDOWN marker
                    yield from _convbn_specs(
                        prefix + (name, sub, "ConvBN_0"),
                        f"{base}.downsample.0@AVGDOWN",
                        f"{base}.downsample.1@AVGDOWN",
                    )


def _vit_specs(prefix: Tuple[str, ...], tree: Dict[str, Any],
               tprefix: str) -> Iterator[Tuple[tuple, str, str]]:
    """VisionTransformer1D flax tree -> torch ViT keys
    (reference vision_transformer.py:197-309)."""
    patch_embed = {"LayerNorm_0": "to_patch_embedding.1",
                   "Dense_0": "to_patch_embedding.2",
                   "LayerNorm_1": "to_patch_embedding.3"}
    for name in tree:
        if name in ("pos_embedding", "cls_embedding"):
            yield prefix + (name,), f"{tprefix}{name}", _DIRECT
        elif name in patch_embed:
            kind = _DENSE if name.startswith("Dense") else _DIRECT
            tmod = patch_embed[name]
            for leaf in tree[name]:
                if kind is _DENSE and leaf == "kernel":
                    yield prefix + (name, leaf), f"{tprefix}{tmod}.weight", \
                        _DENSE
                else:
                    key, k = _norm_leaf(f"{tprefix}{tmod}", leaf) \
                        if leaf in ("scale",) else \
                        (f"{tprefix}{tmod}.{leaf}", _DIRECT)
                    yield prefix + (name, leaf), key, k
        elif name == "norm":
            for leaf in tree[name]:
                key, kind = _norm_leaf(f"{tprefix}norm", leaf)
                yield prefix + (name, leaf), key, kind
        elif name.startswith("block"):
            base = f"{tprefix}{name}"
            block = tree[name]
            for sub in block:
                if sub == "Attention_0":
                    attn = block[sub]
                    for mod in attn:
                        if mod == "LayerNorm_0":
                            for leaf in attn[mod]:
                                key, kind = _norm_leaf(f"{base}.attn.norm",
                                                       leaf)
                                yield prefix + (name, sub, mod, leaf), key, \
                                    kind
                        elif mod == "Dense_0":  # to_qkv
                            for leaf in attn[mod]:
                                yield prefix + (name, sub, mod, leaf), \
                                    f"{base}.attn.fn.to_qkv.{'weight' if leaf == 'kernel' else leaf}", \
                                    _DENSE if leaf == "kernel" else _DIRECT
                        elif mod == "Dense_1":  # to_out projection
                            for leaf in attn[mod]:
                                yield prefix + (name, sub, mod, leaf), \
                                    f"{base}.attn.fn.to_out.0.{'weight' if leaf == 'kernel' else leaf}", \
                                    _DENSE if leaf == "kernel" else _DIRECT
                        elif mod in ("q_norm", "k_norm"):
                            for leaf in attn[mod]:
                                key, kind = _norm_leaf(
                                    f"{base}.attn.fn.{mod}", leaf)
                                yield prefix + (name, sub, mod, leaf), key, \
                                    kind
                elif sub == "FeedForward_0":
                    ff = block[sub]
                    net = {"Dense_0": "net.0", "Dense_1": "net.3"}
                    for mod in ff:
                        if mod == "LayerNorm_0":
                            for leaf in ff[mod]:
                                key, kind = _norm_leaf(f"{base}.ff.norm",
                                                       leaf)
                                yield prefix + (name, sub, mod, leaf), key, \
                                    kind
                        elif mod in net:
                            for leaf in ff[mod]:
                                yield prefix + (name, sub, mod, leaf), \
                                    f"{base}.ff.fn.{net[mod]}.{'weight' if leaf == 'kernel' else leaf}", \
                                    _DENSE if leaf == "kernel" else _DIRECT
                elif sub in ("ls_1", "ls_2"):
                    yield prefix + (name, sub), f"{base}.{sub}", _DIRECT


def _backbone_specs(prefix, tree, tprefix):
    if any(n.startswith("stem_") for n in tree):
        yield from _resnet_specs(prefix, tree, tprefix)
    else:
        yield from _vit_specs(prefix, tree, tprefix)


def _fcn_head_specs(prefix, tree, tprefix):
    """FCNHead flax tree -> torch keys (reference fcn_head.py:9-97)."""
    for name in tree:
        if re.fullmatch(r"conv\d+", name):
            i = int(name[4:])
            yield from _convbn_specs(
                prefix + (name,), f"{tprefix}convs.{i}.0",
                f"{tprefix}convs.{i}.1",
            )
        elif name == "conv_cat":
            yield from _convbn_specs(
                prefix + (name,), f"{tprefix}conv_cat.0",
                f"{tprefix}conv_cat.1",
            )
        elif name == "cls_seg":
            for leaf in tree[name]:
                yield prefix + (name, leaf), \
                    f"{tprefix}cls_seg.{'weight' if leaf == 'kernel' else leaf}", \
                    _CONV if leaf == "kernel" else _DIRECT


def _latent_projection_specs(prefix, tree, tprefix):
    """LatentProjection -> torch Sequential(conv, ReLU, BN, conv)
    (reference encoder_decoder.py:31-48)."""
    for name in tree:
        if name == "Conv_0":
            yield prefix + (name, "kernel"), f"{tprefix}0.weight", _CONV
        elif name == "Conv_1":
            yield prefix + (name, "kernel"), f"{tprefix}3.weight", _CONV
        elif name == "BatchNorm_0":
            for leaf in tree[name]:
                key, kind = _norm_leaf(f"{tprefix}2", leaf)
                yield prefix + (name, leaf), key, kind


def _merge_trees(params, batch_stats):
    """Union of params and batch_stats (disjoint leaf names by design)."""
    if not isinstance(params, dict):
        return params
    out = dict(params)
    for k, v in (batch_stats or {}).items():
        if k in out:
            out[k] = _merge_trees(out[k], v)
        else:
            out[k] = v
    return out


def model_specs(params: Dict[str, Any], batch_stats: Dict[str, Any],
                backbone_only: bool = False):
    """Yield ``(flax_path, torch_key, kind)`` for every leaf of the model.

    ``backbone_only=True`` treats the whole tree as a bare backbone (the
    pretrained-backbone checkpoint contract, base.py:296)."""
    tree = _merge_trees(params, batch_stats)
    if backbone_only or "backbone" not in tree:
        yield from _backbone_specs((), tree, "")
        return
    for top in tree:
        if top == "backbone":
            yield from _backbone_specs((top,), tree[top], "backbone.")
        elif top == "decode_head":
            yield from _fcn_head_specs((top,), tree[top], "decode_head.")
        elif top == "latent_projection":
            yield from _latent_projection_specs(
                (top,), tree[top], "latent_projection.")
        elif top.startswith("auxiliary_head"):
            # reference: auxiliary_heads.{i}.* (nn.ModuleList)
            i = top.split("_")[-1] if top[-1].isdigit() else "0"
            yield from _fcn_head_specs((top,), tree[top],
                                       f"auxiliary_heads.{i}.")


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _tree_set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def _to_flax(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == _CONV:
        return np.ascontiguousarray(arr.transpose(2, 1, 0))
    if kind == _DENSE:
        return np.ascontiguousarray(arr.transpose(1, 0))
    return np.asarray(arr)


def _to_torch(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == _CONV:
        return np.ascontiguousarray(arr.transpose(2, 1, 0))
    if kind == _DENSE:
        return np.ascontiguousarray(arr.transpose(1, 0))
    return np.asarray(arr)


def _lookup(sd: Dict[str, np.ndarray], key: str):
    """Resolve a torch key, handling the avg-down downsample index shift."""
    if "@AVGDOWN" in key:
        base = key.replace("@AVGDOWN", "")
        if base in sd:
            return sd[base]
        head, idx_leaf = base.rsplit("downsample.", 1)
        idx, leaf = idx_leaf.split(".", 1)
        shifted = f"{head}downsample.{int(idx) + 1}.{leaf}"
        if shifted in sd:
            return sd[shifted]
        raise KeyError(f"torch checkpoint missing {base} (or {shifted})")
    if key not in sd:
        raise KeyError(f"torch checkpoint missing {key}")
    return sd[key]


_STAT_LEAVES = ("mean", "var")


def torch_sd_to_trees(state_dict: Dict[str, Any], params_template,
                      batch_stats_template, backbone_only: bool = False,
                      strict: bool = True):
    """Torch state_dict -> (params, batch_stats) matching the templates.

    Non-strict mode keeps template values for keys absent from the torch
    side (the reference tolerates {mask_embedding, head.weight, head.bias}
    leftovers from SSL pretraining, base.py:298-300)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    params = {}
    stats = {}
    for path, key, kind in model_specs(params_template, batch_stats_template,
                                       backbone_only):
        is_stat = path[-1] in _STAT_LEAVES
        template_tree = batch_stats_template if is_stat else params_template
        template = _tree_get(template_tree, path)
        try:
            arr = _to_flax(_lookup(sd, key), kind)
        except KeyError:
            if strict:
                raise
            arr = np.asarray(template)
        assert arr.shape == tuple(template.shape), (
            f"shape mismatch at {'/'.join(path)} (torch {key}): "
            f"{arr.shape} vs {tuple(template.shape)}"
        )
        _tree_set(stats if is_stat else params, path,
                  arr.astype(np.asarray(template).dtype))
    return params, stats


def trees_to_torch_sd(params, batch_stats,
                      backbone_only: bool = False) -> Dict[str, np.ndarray]:
    """(params, batch_stats) -> torch state_dict (NumPy leaves; wrap with
    ``torch.from_numpy`` at save time). Includes ``num_batches_tracked``
    zeros so torch's strict ``load_state_dict`` accepts the result."""
    sd: Dict[str, np.ndarray] = {}
    for path, key, kind in model_specs(params, batch_stats, backbone_only):
        is_stat = path[-1] in _STAT_LEAVES
        tree = batch_stats if is_stat else params
        key = key.replace("@AVGDOWN", "")
        sd[key] = _to_torch(np.asarray(_tree_get(tree, path)), kind)
        if key.endswith("running_var"):
            sd[key.rsplit(".", 1)[0] + ".num_batches_tracked"] = np.asarray(
                0, np.int64)
    return sd


# ---------------------------------------------------------------------------
# .pth file IO (torch required here only)
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` into plain Python/NumPy structures."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    def to_np(obj):
        if isinstance(obj, torch.Tensor):
            return obj.detach().cpu().numpy()
        if isinstance(obj, dict):
            return {k: to_np(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_np(v) for v in obj)
        return obj

    return to_np(payload)


def save_torch_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    import torch

    def to_torch(obj):
        if isinstance(obj, np.ndarray):
            # np.array copies, so torch never sees a read-only jax buffer
            return torch.from_numpy(np.array(obj))
        if isinstance(obj, dict):
            return {k: to_torch(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_torch(v) for v in obj)
        return obj

    torch.save(to_torch(payload), path)
