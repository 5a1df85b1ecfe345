"""Algorithm registry.

Dispatch parity with the reference (src/algorithms/__init__.py:1-6 +
src/train.py:81-85): each algorithm is a module exposing ``train(config)``
and ``test(config)``; :data:`ALGORITHMS` maps config names to modules.
"""

from . import base, cps, fixmatch, mean_teacher, reco, stpp  # noqa: F401

ALGORITHMS = {
    "base": base,
    "mean_teacher": mean_teacher,
    "fixmatch": fixmatch,
    "cps": cps,
    "reco": reco,
    "stpp": stpp,
}


def get_algorithm(name: str):
    if name not in ALGORITHMS:
        raise ValueError(f"Invalid algorithm: {name}")
    return ALGORITHMS[name]
