"""MH engine tests: mixture semantics, prior preservation (detailed balance),
and random-walk vs ICP-proposal posterior agreement.

These are the distributional tests SURVEY §7 calls for (hard part 1): an MH
chain with a *wrong* asymmetric correction still "works" but samples the
wrong distribution — so we verify stationary distributions, not just smoke.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_proposal_tpu.mesh import TriangleMesh, boundary_vertex_mask, make_mesh
from icp_proposal_tpu.models import gpmm as gp
from icp_proposal_tpu.models.synthetic import make_icosphere, make_synthetic_gpmm
from icp_proposal_tpu.sampling import mh
from icp_proposal_tpu.sampling.context import build_target_context
from icp_proposal_tpu.sampling.evaluators import (
    IndependentPointsSpec,
    build_evaluator,
)
from icp_proposal_tpu.sampling.proposals import (
    IcpSpec,
    MixtureProgram,
    RandomShapeSpec,
    RotationSpec,
    TranslationSpec,
    nest,
)
from icp_proposal_tpu.sampling.state import init_state


RANK = 6


@pytest.fixture(scope="module")
def sphere_model():
    points, cells = make_icosphere(subdivisions=2, radius=50.0)
    return make_synthetic_gpmm(points, cells, rank=RANK, sigma=40.0, scale=5.0)


@pytest.fixture(scope="module")
def sphere_target(sphere_model):
    """Target = model instance at known coefficients (ground truth)."""
    alpha = jnp.zeros(RANK).at[0].set(1.5).at[1].set(-1.0)
    pts = gp.instance_points(sphere_model, alpha)
    return TriangleMesh(points=pts, cells=sphere_model.cells), alpha


def _model_boundary(model):
    return jnp.asarray(
        boundary_vertex_mask(np.asarray(model.cells), model.num_points)
    )


def _run(model, mixture, evaluator, n_chains, n_steps, seed=0, coeffs0=None):
    state0 = init_state(model, coeffs=coeffs0)
    carry0 = mh.init_carry(model, evaluator, state0, mixture)
    carries = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), carry0
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), n_chains)
    step = mh.make_mh_step(model, mixture, evaluator, store_params=True)
    final, records = mh.run_chains(step, carries, keys, n_steps)
    return final, records


def test_random_walk_preserves_prior(sphere_model, sphere_target):
    """Random-walk MH with a prior-only evaluator must sample N(0, I)."""
    target, _ = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(sphere_model, ctx, [], include_prior=True)
    mixture = MixtureProgram(
        [(1.0, RandomShapeSpec(sigma=0.4))],
        sphere_model,
        ctx,
        _model_boundary(sphere_model),
    )
    _, records = _run(sphere_model, mixture, evaluator, n_chains=24, n_steps=1500)
    coeffs = _chain_states(records)
    samples = coeffs[:, 500:, :].reshape(-1, RANK)
    assert abs(samples.mean()) < 0.1
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.15)


def _chain_states(records):
    """Per-step chain states: since round 4, ``ChainRecord.coeffs`` stores
    the post-step state directly (candidate on accept, held on reject)."""
    return np.asarray(records.coeffs)


def test_icp_proposal_preserves_prior(sphere_model, sphere_target):
    """THE detailed-balance test: an ICP-proposal mixture with a prior-only
    evaluator must also sample N(0, I) — any error in the asymmetric
    q(θ|θ')/q(θ'|θ) correction shows up as bias toward the target shape."""
    target, alpha_true = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(sphere_model, ctx, [], include_prior=True)
    mixture = MixtureProgram(
        nest(
            (0.5, [(1.0, IcpSpec(direction="model", n_points=40, step_length=0.5,
                                 noise_along_normal=5.0, tangential_noise=10.0))]),
            (0.5, [(1.0, RandomShapeSpec(sigma=0.4))]),
        ),
        sphere_model,
        ctx,
        _model_boundary(sphere_model),
        parity=False,
    )
    _, records = _run(sphere_model, mixture, evaluator, n_chains=24, n_steps=1500)
    coeffs = _chain_states(records)
    samples = coeffs[:, 500:, :].reshape(-1, RANK)
    # mean must NOT be dragged toward alpha_true = (1.5, -1, 0, ...)
    assert abs(samples.mean(axis=0)[0]) < 0.25
    assert abs(samples.mean(axis=0)[1]) < 0.25
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.2)


def test_rw_vs_icp_same_posterior(sphere_model, sphere_target):
    """Random-walk MH and ICP-proposal MH must agree on the posterior mean
    (same likelihood, same prior) — cross-validation of the informed proposal
    against an unquestionably correct sampler."""
    target, alpha_true = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(
        sphere_model,
        ctx,
        [IndependentPointsSpec(sigma=1.0, mode="model_to_target", n_points=60)],
    )
    mix_rw = MixtureProgram(
        [(1.0, RandomShapeSpec(sigma=0.15))],
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    mix_icp = MixtureProgram(
        nest(
            (0.8, [(1.0, IcpSpec(direction="model", n_points=40, step_length=0.2,
                                 noise_along_normal=2.0, tangential_noise=4.0))]),
            (0.2, [(1.0, RandomShapeSpec(sigma=0.15))]),
        ),
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    _, rec_rw = _run(sphere_model, mix_rw, evaluator, n_chains=16, n_steps=2500, seed=1)
    _, rec_icp = _run(sphere_model, mix_icp, evaluator, n_chains=16, n_steps=2500, seed=2)

    mean_rw = _chain_states(rec_rw)[:, 1000:, :].reshape(-1, RANK).mean(axis=0)
    mean_icp = _chain_states(rec_icp)[:, 1000:, :].reshape(-1, RANK).mean(axis=0)
    np.testing.assert_allclose(mean_rw, mean_icp, atol=0.3)
    # both should be pulled strongly toward the generating coefficients
    assert mean_icp[0] > 0.7 and mean_icp[1] < -0.5


def test_icp_chain_fits_target(sphere_model, sphere_target):
    """The flagship behavior: ICP-proposal MH should fit the target fast and
    with a healthy acceptance rate."""
    target, alpha_true = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(
        sphere_model,
        ctx,
        [IndependentPointsSpec(sigma=0.5, mode="model_to_target", n_points=60)],
    )
    mixture = MixtureProgram(
        nest(
            (0.9, [(1.0, IcpSpec(direction="model", n_points=40, step_length=0.1,
                                 noise_along_normal=2.0, tangential_noise=4.0))]),
            (0.1, [(1.0, RandomShapeSpec(sigma=0.1))]),
        ),
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    final, records = _run(sphere_model, mixture, evaluator, n_chains=4, n_steps=400)
    acc_rate = np.asarray(records.accepted).mean()
    assert 0.1 < acc_rate < 0.999
    # MAP-ish check: best accepted sample close to ground truth
    coeffs = _chain_states(records)[:, -1, :]
    err = np.abs(coeffs - np.asarray(alpha_true)).max()
    assert err < 0.6, f"final coeffs off by {err}"


def test_pose_proposal_guards(sphere_model, sphere_target):
    """Mixture transition density: a candidate that moved rot[0] must get
    -inf from every component except RotationSpec(axis=0)."""
    target, _ = sphere_target
    ctx = build_target_context(target)
    mixture = MixtureProgram(
        [
            (0.25, RotationSpec(axis=0, sigma=0.01)),
            (0.25, RotationSpec(axis=1, sigma=0.01)),
            (0.25, TranslationSpec(axis=0, sigma=0.1)),
            (0.25, RandomShapeSpec(sigma=0.1)),
        ],
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    s0 = jax.tree.map(jnp.asarray, init_state(sphere_model))
    s1 = s0._replace(rot=s0.rot.at[0].add(0.02))
    lq = float(mixture.log_q_mixture(s0, s1, {}))
    # only the axis-0 rotation component contributes:
    expected = float(
        jnp.log(0.25)
        + (-0.5 * (0.02 / 0.01) ** 2 - jnp.log(0.01) - 0.5 * jnp.log(2 * jnp.pi))
    )
    np.testing.assert_allclose(lq, expected, rtol=1e-4)

    # identical states: shape + both rotations give finite densities; mixture
    # must still be finite
    lq_same = float(mixture.log_q_mixture(s0, s0, {}))
    assert np.isfinite(lq_same)


def test_pose_and_shape_chain_recovers_translation(sphere_model):
    """BFM-style mixture (pose + ICP + shape) must recover a rigid offset of
    the target: the pose block should absorb most of the translation."""
    t_true = jnp.asarray([2.0, -1.5, 1.0])
    target_pts = gp.instance_points(sphere_model, jnp.zeros(RANK)) + t_true
    target = TriangleMesh(points=target_pts, cells=sphere_model.cells)
    ctx = build_target_context(target)
    mixture = MixtureProgram(
        nest(
            (0.5, [
                (1.0, TranslationSpec(axis=0, sigma=0.3)),
                (1.0, TranslationSpec(axis=1, sigma=0.3)),
                (1.0, TranslationSpec(axis=2, sigma=0.3)),
                (1.0, RotationSpec(axis=0, sigma=0.02)),
                (1.0, RotationSpec(axis=1, sigma=0.02)),
                (1.0, RotationSpec(axis=2, sigma=0.02)),
            ]),
            (0.45, [(1.0, IcpSpec(direction="model", n_points=40, step_length=0.3,
                                  noise_along_normal=2.0, tangential_noise=4.0))]),
            (0.05, [(1.0, RandomShapeSpec(sigma=0.1))]),
        ),
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    evaluator = build_evaluator(
        sphere_model, ctx,
        [IndependentPointsSpec(sigma=0.3, mode="model_to_target", n_points=60)],
    )
    final, records = _run(sphere_model, mixture, evaluator, n_chains=4, n_steps=800)
    # the fitted surface must match the translated target
    from icp_proposal_tpu.ops.metrics import avg_distance
    from icp_proposal_tpu.sampling.state import transformed_mesh

    states = jax.tree.map(lambda x: x[0], final.state)
    fitted = transformed_mesh(sphere_model, states)
    avg = float(avg_distance(fitted, target))
    assert avg < 0.8, f"pose+shape chain failed to fit: avg={avg}"
    # translation must do real work (not all absorbed by shape)
    assert np.linalg.norm(np.asarray(states.trans)) > 0.8


def test_parity_mode_matches_reference_density(sphere_model, sphere_target):
    """parity=True must drop exactly the ½·logdet M and r·log(step) terms."""
    target, _ = sphere_target
    ctx = build_target_context(target)
    spec = IcpSpec(direction="model", n_points=40, step_length=0.25)
    mix_exact = MixtureProgram([(1.0, spec)], sphere_model, ctx,
                               _model_boundary(sphere_model), parity=False)
    mix_parity = MixtureProgram([(1.0, spec)], sphere_model, ctx,
                                _model_boundary(sphere_model), parity=True)

    from icp_proposal_tpu.mesh import vertex_face_adjacency, vertex_normals_gather
    from icp_proposal_tpu.sampling.state import transformed_points

    s0 = init_state(sphere_model)
    s1 = s0._replace(coeffs=s0.coeffs + 0.1)
    pts = transformed_points(sphere_model, s0)
    adj = jnp.asarray(vertex_face_adjacency(
        np.asarray(sphere_model.cells), sphere_model.num_points))
    normals = vertex_normals_gather(pts, sphere_model.cells, adj)

    f_exact = mix_exact.anchor_factors(s0, pts, normals)
    lq_exact = float(mix_exact.log_q_mixture(s0, s1, f_exact))
    lq_parity = float(mix_parity.log_q_mixture(s0, s1, f_exact))
    expected_gap = 0.5 * float(f_exact[0].logdet_m) - RANK * np.log(0.25)
    np.testing.assert_allclose(lq_exact - lq_parity, expected_gap, rtol=1e-4)


def test_adaptive_scales_converge_to_target(sphere_model, sphere_target):
    """Robbins-Monro adaptation: a mistuned random-walk scale should adapt
    until its acceptance rate approaches the 0.234 target."""
    from icp_proposal_tpu.sampling.proposals import AdaptConfig

    target, _ = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(sphere_model, ctx, [], include_prior=True)
    # deliberately huge step: unadapted acceptance would be ~0
    mixture = MixtureProgram(
        [(1.0, RandomShapeSpec(sigma=25.0))],
        sphere_model, ctx, _model_boundary(sphere_model),
        adapt=AdaptConfig(target=0.234, rate=1.0),
    )
    _, records = _run(sphere_model, mixture, evaluator, n_chains=8, n_steps=1200)
    acc_late = np.asarray(records.accepted)[:, 600:].mean()
    assert 0.1 < acc_late < 0.45, f"adapted acceptance {acc_late}"

    # without adaptation the same mixture barely accepts
    mixture0 = MixtureProgram(
        [(1.0, RandomShapeSpec(sigma=25.0))],
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    _, rec0 = _run(sphere_model, mixture0, evaluator, n_chains=8, n_steps=400)
    assert np.asarray(rec0.accepted).mean() < 0.05


def test_parity_mode_chain_runs(sphere_model, sphere_target):
    """Reference-faithful (parity=True) transition density: the chain still
    runs and fits (it samples a slightly different distribution by design)."""
    target, alpha_true = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(
        sphere_model, ctx,
        [IndependentPointsSpec(sigma=0.5, mode="model_to_target", n_points=60)],
    )
    mixture = MixtureProgram(
        nest(
            (0.9, [(1.0, IcpSpec(direction="model", n_points=40, step_length=0.1,
                                 noise_along_normal=2.0, tangential_noise=4.0))]),
            (0.1, [(1.0, RandomShapeSpec(sigma=0.1))]),
        ),
        sphere_model, ctx, _model_boundary(sphere_model), parity=True,
    )
    final, records = _run(sphere_model, mixture, evaluator, n_chains=2, n_steps=300)
    acc = np.asarray(records.accepted).mean()
    assert 0.02 < acc <= 1.0
    coeffs = _chain_states(records)[:, -1, :]
    assert np.abs(coeffs - np.asarray(alpha_true)).max() < 1.0


def test_static_factor_assembly_matches_dynamic(sphere_model, sphere_target):
    """The model-direction ICP component assembles its GP-posterior factors
    from precomputed per-id Gram tables (``posterior_factors_anisotropic_static``);
    it must agree with the general dynamic-id path to fp tolerance."""
    from icp_proposal_tpu.mesh import vertex_face_adjacency, vertex_normals_gather
    from icp_proposal_tpu.ops.closest_point import nearest_vertex_of_faces
    from icp_proposal_tpu.ops.surface_index import closest_auto
    from icp_proposal_tpu.sampling.state import pose_inverse_apply, transformed_points

    target, _ = sphere_target
    ctx = build_target_context(target)
    spec = IcpSpec(direction="model", n_points=40, step_length=0.25)
    mix = MixtureProgram([(1.0, spec)], sphere_model, ctx,
                         _model_boundary(sphere_model))
    comp = mix.icp_components[0]

    rng = np.random.RandomState(3)
    s0 = init_state(sphere_model, coeffs=rng.randn(RANK).astype(np.float32))
    s0 = s0._replace(rot=np.asarray([0.05, -0.02, 0.1], np.float32),
                     trans=np.asarray([1.0, -2.0, 0.5], np.float32))
    pts = transformed_points(sphere_model, s0)
    adj = np.asarray(vertex_face_adjacency(
        np.asarray(sphere_model.cells), sphere_model.num_points))
    normals = vertex_normals_gather(pts, sphere_model.cells, adj)

    fac_static = comp.factors(s0, pts, normals)

    # dynamic-id reference path with identical observations
    ids = jnp.asarray(comp.model_ids)
    cp, _, fidx = closest_auto(pts[ids], ctx.tri, ctx.index)
    near = nearest_vertex_of_faces(ctx.cells, fidx, cp, ctx.points)
    mask = ~jnp.asarray(ctx.boundary)[near]
    obs_disp = pose_inverse_apply(s0, cp) - jnp.asarray(sphere_model.ref_points)[ids]
    fac_dyn = gp.posterior_factors_anisotropic(
        sphere_model, ids, obs_disp, normals[ids],
        spec.noise_along_normal, spec.tangential_noise, mask.astype(jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(fac_static.alpha_hat),
                               np.asarray(fac_dyn.alpha_hat), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fac_static.chol_m),
                               np.asarray(fac_dyn.chol_m), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fac_static.logdet_m),
                               np.asarray(fac_dyn.logdet_m), rtol=2e-3, atol=2e-4)


def test_mala_preserves_prior(sphere_model, sphere_target):
    """MALA detailed balance: with a prior-only evaluator the chain must
    sample N(0, I) — any error in the Langevin asymmetric correction shows
    up as variance bias."""
    from icp_proposal_tpu.sampling.proposals import MalaSpec

    target, _ = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(sphere_model, ctx, [], include_prior=True)
    mixture = MixtureProgram(
        [(1.0, MalaSpec(step_size=0.8))],
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    _, records = _run(sphere_model, mixture, evaluator, n_chains=24, n_steps=1500)
    acc = np.asarray(records.accepted).mean()
    assert acc > 0.3, acc  # Langevin on a standard normal accepts generously
    coeffs = _chain_states(records)
    samples = coeffs[:, 500:, :].reshape(-1, RANK)
    assert abs(samples.mean()) < 0.1
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.15)


def test_mala_vs_rw_same_posterior_better_mixing(sphere_model, sphere_target):
    """MALA must agree with random-walk MH on the posterior (same target) —
    and, being gradient-informed, should mix at least as well."""
    from icp_proposal_tpu.sampling.diagnostics import ess
    from icp_proposal_tpu.sampling.proposals import MalaSpec

    target, alpha_true = sphere_target
    ctx = build_target_context(target)
    evaluator = build_evaluator(
        sphere_model, ctx,
        [IndependentPointsSpec(sigma=1.0, mode="model_to_target", n_points=60)],
    )
    mix_rw = MixtureProgram(
        [(1.0, RandomShapeSpec(sigma=0.15))],
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    mix_mala = MixtureProgram(
        [(1.0, MalaSpec(step_size=0.15))],
        sphere_model, ctx, _model_boundary(sphere_model),
    )
    _, rec_rw = _run(sphere_model, mix_rw, evaluator, n_chains=16, n_steps=2500, seed=1)
    _, rec_mala = _run(sphere_model, mix_mala, evaluator, n_chains=16, n_steps=2500, seed=2)

    st_rw = _chain_states(rec_rw)[:, 1000:, :]
    st_mala = _chain_states(rec_mala)[:, 1000:, :]
    np.testing.assert_allclose(
        st_rw.reshape(-1, RANK).mean(axis=0),
        st_mala.reshape(-1, RANK).mean(axis=0), atol=0.3,
    )
    assert st_mala.reshape(-1, RANK).mean(axis=0)[0] > 0.7
    ess_rw = float(np.mean(np.asarray(ess(jnp.asarray(st_rw), max_lag=200))))
    ess_mala = float(np.mean(np.asarray(ess(jnp.asarray(st_mala), max_lag=200))))
    assert ess_mala > 0.8 * ess_rw, (ess_mala, ess_rw)


def test_fused_step_matches_unfused(request):
    """The fused target-surface query pass (mh._fusion_plan: one
    closest_auto over the evaluator ids serving both the ICP correspondence
    and the Euclidean likelihood) must be numerically IDENTICAL to the
    separate passes — same accept decisions, same states, same densities."""
    import numpy as np

    from icp_proposal_tpu.apps.femur import load_femur_data
    from icp_proposal_tpu.sampling.context import build_target_context
    from icp_proposal_tpu.sampling.evaluators import proximity_and_independent
    from icp_proposal_tpu.sampling.proposals import (
        mixed_proposal_icp,
        mixed_random_shape_proposal,
    )
    from icp_proposal_tpu.sampling.state import init_state

    data = load_femur_data(50)
    model = data.model
    # index ON so fused/unfused hit the same kernel (index_distances is
    # index_closest minus cp) — bitwise comparison is then meaningful
    ctx = build_target_context(
        data.target, data.target_boundary_mask, build_index=True
    )
    evaluator = proximity_and_independent(
        model, ctx, mode="model_to_target", sigma=2.0, n_points=4 * model.rank
    )
    icp_ids = np.asarray(evaluator._model_ids["distance"])[::2]
    mixture = MixtureProgram(
        nest(
            (0.9, mixed_proposal_icp(
                n_points=2 * model.rank,
                projection_direction="model_and_target",
            )),
            (0.1, mixed_random_shape_proposal()),
        ),
        model, ctx, np.asarray(data.model_boundary_mask),
        icp_model_ids=icp_ids,
    )

    from icp_proposal_tpu.sampling.mh import _fusion_plan

    plan = _fusion_plan(mixture, evaluator)
    assert plan is not None and len(plan.icp_maps) == 1  # model dir only

    n_chains, n_steps = 4, 30
    carry0 = mh.init_carry(model, evaluator, init_state(model), mixture)
    carries = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), carry0
    )
    keys = jax.random.split(jax.random.PRNGKey(5), n_chains)

    step_f = mh.make_mh_step(model, mixture, evaluator, store_params=True, fuse=True)
    step_u = mh.make_mh_step(model, mixture, evaluator, store_params=True, fuse=False)
    _, rec_f = mh.run_chains(step_f, carries, keys, n_steps)
    _, rec_u = mh.run_chains(step_u, carries, keys, n_steps)

    np.testing.assert_array_equal(
        np.asarray(rec_f.accepted), np.asarray(rec_u.accepted)
    )
    np.testing.assert_allclose(
        np.asarray(rec_f.log_product), np.asarray(rec_u.log_product),
        rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(rec_f.coeffs), np.asarray(rec_u.coeffs), rtol=0, atol=0
    )
