"""stvd — TPU-native spatial-temporal attention video captioning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``tuyunbin/Video-Description-with-Spatial-Temporal-Attention``
(ACM MM 2017).  See SURVEY.md for the reference's structure and
BASELINE.md for targets.
"""

import os as _os

if _os.environ.get("STVD_FORCE_CPU"):
    # The axon TPU plugin overrides the JAX_PLATFORMS env var on this
    # class of machine; the config API is the only reliable override.
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

from .config import Config, DataConfig, DecodeConfig, ModelConfig, TrainConfig, preset, validate

__version__ = "0.1.0"
__all__ = [
    "Config", "ModelConfig", "TrainConfig", "DecodeConfig", "DataConfig",
    "preset", "validate",
]
