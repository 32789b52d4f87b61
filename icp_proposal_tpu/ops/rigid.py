"""Closed-form rigid landmark alignment (Kabsch / Umeyama, no scaling).

TPU-native equivalent of scalismo's
``LandmarkRegistration.rigid3DLandmarkRegistration`` (call site: reference
``apps/util/AlignmentTransforms.scala:29``, used by ``LoadTestData`` to align
the target to the model frame at load time).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RigidTransform(NamedTuple):
    """x ↦ R @ (x - center) + center + t  (rotation about `center`, then
    translation — the reference's TranslationAfterRotation convention,
    ``ModelFittingParameters.scala:79-86``)."""

    rotation: jnp.ndarray  # [3,3]
    translation: jnp.ndarray  # [3]
    center: jnp.ndarray  # [3]

    def apply(self, points):
        return (points - self.center) @ self.rotation.T + self.center + self.translation

    def inverse_apply(self, points):
        return (points - self.center - self.translation) @ self.rotation + self.center


def rigid_landmark_alignment(source, target, center=None) -> RigidTransform:
    """Least-squares rigid transform mapping source landmarks onto target.

    source, target : [N, 3]. `center` is the rotation center (the reference
    passes Point3D(0,0,0) — ``LoadTestData.scala:45``).

    Computed on host in float64 (this is a load-time data-prep op, not part of
    the jitted sampler; JAX's default x64-disabled mode would cost precision).
    """
    import numpy as np

    source = np.asarray(source, np.float64)
    target = np.asarray(target, np.float64)
    if center is None:
        center = np.zeros(3)
    center = np.asarray(center, np.float64)

    mu_s = source.mean(axis=0)
    mu_t = target.mean(axis=0)
    h = (source - mu_s).T @ (target - mu_t)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    # solve for t given rotation about `center`: target ≈ R(source - c) + c + t
    t = mu_t - (r @ (mu_s - center) + center)
    # numpy outputs: this is load-time data prep — keep it off the device
    return RigidTransform(
        rotation=r.astype(np.float32),
        translation=t.astype(np.float32),
        center=center.astype(np.float32),
    )
