"""semi_seg_ecg_tpu — a TPU-native framework for semi-supervised ECG delineation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the SemiSegECG
benchmark (reference: bakqui/semi-seg-ecg): 1-D semantic segmentation of
single-lead ECG waveforms (background / P-wave / QRS / T-wave) under six
training algorithms (supervised ``base``, Mean Teacher, FixMatch, CPS, ReCo,
ST++), with 1-D ResNet / ViT backbones, an FCN decode head, a YAML
base+override config system, a config-driven transform library, confusion
matrix metrics compatible with torchmetrics semantics, and train / test /
inference entry points.

Design: everything on-device is a pure function of an explicit train state;
parallelism is a ``jax.sharding.Mesh`` with a ``data`` axis (optionally a
``model`` axis) instead of DDP/NCCL; precision is bf16-compute/f32-params
instead of AMP + GradScaler.
"""

__version__ = "0.1.0"

from .algorithms import ALGORITHMS, get_algorithm  # noqa: E402,F401
from .config import (  # noqa: E402,F401
    load_config,
    normalize_config,
    parse_eval_args,
    parse_train_args,
)
from .models import BACKBONES, DECODE_HEADS, build_model_from_config  # noqa: E402,F401
