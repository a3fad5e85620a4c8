"""Tiny numpy rotation log (avoids depending on scipy in test helpers)."""

import numpy as np


def log_rotation(R):
    cos_t = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos_t)
    if theta < 1e-8:
        return np.zeros(3, np.float32)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return (w * theta / (2.0 * np.sin(theta))).astype(np.float32)
