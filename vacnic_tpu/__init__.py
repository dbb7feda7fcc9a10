"""vacnic_tpu — TPU-native (JAX/XLA/Pallas/pjit) news-image-captioning framework.

A from-scratch rebuild of the capabilities of tingyu215/VACNIC (NAACL 2024,
"Visually-Aware Context Modeling for News Image Captioning"): CLIP ViT image
encoding, ClipCap-style prefix mapping, a multimodal BART encoder-decoder with
per-layer image/face/named-entity fusion, SECLA + CoLaM training losses, and
KV-cached beam-search decoding — designed SPMD-first over a `jax.sharding.Mesh`.

Reference behavior citations in docstrings point into /root/reference (the
upstream PyTorch codebase) as `path:line`.
"""

__version__ = "0.1.0"

from vacnic_tpu.core.config import (  # noqa: F401
    BartConfig,
    ClipVisionConfig,
    FusionConfig,
    TrainConfig,
    DecodeConfig,
    VacnicConfig,
)
