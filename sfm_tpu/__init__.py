"""sfm_tpu — a TPU-native SfM/SLAM framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the hulop/SfM monocular 3D-scanning pipeline
(see SURVEY.md) for TPU hardware: fixed-shape masked SoA state, jitted step
functions, Pallas kernels for the hot paths, and mesh-sharded distributed
bundle adjustment.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry, descriptor, and normal-equation matmuls are all
# precision-sensitive: TPU's default bf16 MXU rounding adds descriptor-bit
# noise and degrades H/F/PnP estimates enough to stall bootstrap.  Default
# to full f32 matmuls; perf-critical kernels opt into lower precision
# explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "float32")

from .config import SfMConfig, DEFAULT_CONFIG


def __getattr__(name):
    # lazy top-level conveniences (importing the engine pulls in the full
    # stack; keep `import sfm_tpu` light)
    if name == "SfMEngine":
        from .engine import SfMEngine
        return SfMEngine
    if name == "PointCloud":
        from .io import PointCloud
        return PointCloud
    raise AttributeError(name)
