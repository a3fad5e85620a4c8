"""sfm_tpu — a TPU-native SfM/SLAM framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the hulop/SfM monocular 3D-scanning pipeline
(see SURVEY.md) for TPU hardware: fixed-shape masked SoA state, jitted step
functions, Pallas kernels for the hot paths, and mesh-sharded distributed
bundle adjustment.
"""

__version__ = "0.1.0"

from .config import SfMConfig, DEFAULT_CONFIG
