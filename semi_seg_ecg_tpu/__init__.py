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
