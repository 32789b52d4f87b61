"""Deterministic non-rigid ICP baseline.

Equivalent of reference ``api/other/IcpBasedSurfaceFitting.scala:32-127``
(the paper's comparison method): per iteration, build the instance, find
correspondences in the chosen projection direction, run the analytic GP
regression with isotropic noise σ², take the posterior mean, under-relax by
``step_length``; anneal σ through ``sigma_seq``.

TPU redesign: the whole annealed loop is one ``lax.scan`` per sigma stage —
the posterior-mean + coefficient-projection round trip collapses to the
regression mean α̂ in coefficient space (exact; see ``models/gpmm.py``).  The
per-iteration random direction flip of ModelAndTargetSampling
(reference :63-69 — unseeded ``scala.util.Random``) is a seeded
``jax.random`` draw here.

Numerical note: the reference anneals to σ = 1e-15 (``IcpRegistration.scala``
passes ``Seq(1e-15)``); in float32 the regression is solved in the
σ²-regularized least-squares form with a floor to stay finite — equivalent to
exact interpolation for the reference's values.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from icp_proposal_tpu.models import gpmm as gp
from icp_proposal_tpu.ops.closest_point import closest_points_on_surface, nearest_vertices
from icp_proposal_tpu.sampling.context import TargetContext


def _regression_mean(gpmm, ids, obs_disp, sigma2, mask):
    """Stable isotropic GP-regression mean:
    α̂ = (σ²I + Σ masked QᵢᵀQᵢ)⁻¹ Σ masked Qᵢᵀỹᵢ — avoids 1/σ² overflow for
    the reference's σ→0 annealing."""
    q_o = jnp.asarray(gpmm.sbasis)[ids]  # [m, 3, r]
    resid = (obs_disp - jnp.asarray(gpmm.mean_disp)[ids]) * mask[:, None]
    qm = q_o * mask[:, None, None]
    m3, r = qm.shape[0] * 3, qm.shape[2]
    qf = qm.reshape(m3, r)
    gram = jnp.dot(qf.T, qf, preferred_element_type=jnp.float32)
    sigma2 = jnp.maximum(sigma2, 1e-8)
    m_mat = sigma2 * jnp.eye(r, dtype=qf.dtype) + gram
    rhs = jnp.einsum("mir,mi->r", qm, resid, preferred_element_type=jnp.float32)
    chol = jnp.linalg.cholesky(0.5 * (m_mat + m_mat.T))
    return jax.scipy.linalg.cho_solve((chol, True), rhs)


def icp_surface_fitting(
    gpmm,
    target_ctx: TargetContext,
    model_ids,  # [m] sampled model vertex ids (uniform surface sample)
    target_points,  # [m, 3] sampled target surface points
    num_iterations: int = 100,
    sigma_seq=(1e-15,),
    step_length: float = 1.0,
    projection_direction: str = "model_and_target",
    initial_coeffs=None,
    key=None,
):
    """→ final coefficients [r].  Matches ``runfitting`` semantics
    (reference :46-122; femur entry point ``IcpRegistration.scala:28-75``:
    100 iterations, σ=1e-15, ModelAndTargetSampling)."""
    key = key if key is not None else jax.random.PRNGKey(1024)
    coeffs0 = (
        jnp.zeros((gpmm.rank,), jnp.float32)
        if initial_coeffs is None
        else jnp.asarray(initial_coeffs, jnp.float32)
    )

    def iteration(coeffs, inputs):
        it_key, sigma2 = inputs
        cur_points = gp.instance_points(gpmm, coeffs)

        def model_dir():
            from icp_proposal_tpu.ops.surface_index import closest_auto

            q = cur_points[model_ids]
            cp, _, _ = closest_auto(
                q, target_ctx.tri, getattr(target_ctx, "index", None)
            )
            return model_ids, cp

        def target_dir():
            ids = nearest_vertices(target_points, cur_points)
            return ids, target_points

        if projection_direction == "model":
            ids, obs = model_dir()
        elif projection_direction == "target":
            ids, obs = target_dir()
        else:  # random per-iteration flip (reference :63-69)
            flip = jax.random.bernoulli(it_key)
            ids_m, obs_m = model_dir()
            ids_t, obs_t = target_dir()
            ids = jnp.where(flip, ids_m, ids_t)
            obs = jnp.where(flip, obs_m, obs_t)

        obs_disp = obs - jnp.asarray(gpmm.ref_points)[ids]
        alpha_hat = _regression_mean(
            gpmm, ids, obs_disp, sigma2, jnp.ones(ids.shape[0], jnp.float32)
        )
        new_coeffs = coeffs + (alpha_hat - coeffs) * step_length
        # keep last good coefficients on numerical failure (reference :95-104)
        ok = jnp.all(jnp.isfinite(new_coeffs))
        return jnp.where(ok, new_coeffs, coeffs), None

    coeffs = coeffs0
    for stage, sigma in enumerate(sigma_seq):
        stage_key = jax.random.fold_in(key, stage)
        it_keys = jax.random.split(stage_key, num_iterations)
        sigma2s = jnp.full((num_iterations,), float(sigma) ** 2, jnp.float32)
        coeffs, _ = jax.lax.scan(iteration, coeffs, (it_keys, sigma2s))
    return coeffs
