"""Shim: the synthetic scan renderer lives in the package now."""
from sfm_tpu.synthetic import SpriteScene, strafe_trajectory, umeyama_ate  # noqa
