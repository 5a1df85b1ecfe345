"""One definition of jax key-path -> string names.

The frozen-parameter mask (utils/optimizer.py), BEiT layer-decay mapping
(utils/lr_decay.py) and the TP sharding rules (parallel/sharding_rules.py)
all pattern-match parameter paths; they must agree on how a
``jax.tree_util`` key entry (DictKey / SequenceKey / attribute) renders as
a string, or a jax representation change silently desynchronises them.
"""

from __future__ import annotations

from typing import Tuple


def key_path_names(path) -> Tuple[str, ...]:
    """``tree_map_with_path``-style key path -> tuple of path-segment
    names (DictKey.key, SequenceKey-ish .name, else str)."""
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return tuple(names)
