"""The MH chain state and its geometric transforms.

Equivalent of the reference's ``ModelFittingParameters`` (scale, pose =
translation + Euler rotation about a center, shape coefficients;
``api/sampling/ModelFittingParameters.scala:27-121``), as a flat pytree of
arrays so chains batch trivially under ``vmap``.

Transform conventions (matching scalismo):
    pose(p)   = R(p − c) + c + t          (TranslationAfterRotation)
    R         = Rz(φ) · Ry(θ) · Rx(ψ)     (scalismo Rotation3D Euler angles)
    full(p)   = s · pose(p + u(p))        (scale ∘ pose ∘ shape,
                                           ``ModelFittingParameters.scala:104-106``)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_proposal_tpu.mesh import TriangleMesh, centroid
from icp_proposal_tpu.models.gpmm import Gpmm, instance_points


class FitState(NamedTuple):
    scale: jax.Array  # []
    rot: jax.Array  # [3] Euler angles (φ, θ, ψ)
    trans: jax.Array  # [3]
    center: jax.Array  # [3] rotation center (fixed during sampling)
    coeffs: jax.Array  # [r] shape coefficients


def init_state(gpmm: Gpmm, coeffs=None, center=None) -> FitState:
    """Zero pose, rotation center = reference-mesh centroid, zero (or given)
    coefficients — the chain driver's initial state
    (reference ``SamplingRegistration.scala:40-43``).

    Built host-side (numpy) so constructing states triggers no eager device
    dispatches; arrays convert at the jit boundary."""
    import numpy as np

    if center is None:
        center = np.asarray(gpmm.ref_points).mean(axis=0)
    if coeffs is None:
        coeffs = np.zeros((gpmm.rank,), np.float32)
    return FitState(
        scale=np.float32(1.0),
        rot=np.zeros(3, np.float32),
        trans=np.zeros(3, np.float32),
        center=np.asarray(center, np.float32),
        coeffs=np.asarray(coeffs, np.float32),
    )


def euler_matrix(rot: jax.Array) -> jax.Array:
    """R = Rz(φ) @ Ry(θ) @ Rx(ψ)."""
    phi, theta, psi = rot[0], rot[1], rot[2]
    cz, sz = jnp.cos(phi), jnp.sin(phi)
    cy, sy = jnp.cos(theta), jnp.sin(theta)
    cx, sx = jnp.cos(psi), jnp.sin(psi)
    rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    return rz @ ry @ rx


def pose_apply(state: FitState, points: jax.Array) -> jax.Array:
    r = euler_matrix(state.rot)
    return (points - state.center) @ r.T + state.center + state.trans


def pose_inverse_apply(state: FitState, points: jax.Array) -> jax.Array:
    """Inverse of the scale∘pose part of the full transform: maps world-space
    points back to the shape (model) frame.  Includes the 1/s scale so it is
    the exact inverse of ``transformed_points``'s rigid part even when
    scale ≠ 1 (the reference fixes scale at 1.0; this guards the trap)."""
    r = euler_matrix(state.rot)
    return (points / state.scale - state.center - state.trans) @ r + state.center


def transformed_points(gpmm: Gpmm, state: FitState) -> jax.Array:
    """scale ∘ pose ∘ shape applied to the reference mesh — the decode at the
    top of every proposal/evaluation (reference
    ``ModelFittingParameters.transformedMesh``, ``:108-110``)."""
    shaped = instance_points(gpmm, state.coeffs)
    return state.scale * pose_apply(state, shaped)


def transformed_mesh(gpmm: Gpmm, state: FitState) -> TriangleMesh:
    return TriangleMesh(points=transformed_points(gpmm, state), cells=gpmm.cells)


def flat_parameters(state: FitState) -> jax.Array:
    """[1+9+r] flat vector in the reference's ``allParameters`` order
    (scale, translation, rotation, center, shape —
    ``ModelFittingParameters.scala:64``)."""
    return jnp.concatenate(
        [state.scale[None], state.trans, state.rot, state.center, state.coeffs]
    )
