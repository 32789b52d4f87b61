"""Proposal generators and their mixture.

TPU-native redesign of the reference's proposal layer
(``api/sampling/proposals/*`` + scalismo ``MixtureProposal``; factory
``api/sampling/MixedProposalDistributions.scala``):

  * every component is a pure (propose, log_q) pair over ``FitState``;
  * the mixture is evaluated *densely*: each step computes every component's
    candidate and selects one by a categorical draw — under ``vmap`` all
    branches execute for all chains anyway, so dense evaluation costs nothing
    extra and keeps control flow static;
  * the mixture transition density is logsumexp over components of
    log w_c + log q_c (scalismo ``MixtureProposal.fromProposalsWithTransition``
    semantics), with the reference's −∞ cross-parameter-block guards
    (``PoseProposals.scala:47-60``, ``RandomShapeUpdateProposal.scala:38-45``)
    expressed as exact-equality masks;
  * the informed ICP proposal computes its GP-posterior factors densely for
    the anchor state — the reference's ``Memoize`` LRU
    (``NonRigidIcpProposal.scala:49``) is unnecessary because the step
    computes forward factors (at the current state) and reverse factors (at
    the candidate) exactly once each.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp


from icp_proposal_tpu.models import gpmm as gp
from icp_proposal_tpu.ops.closest_point import (
    closest_points_on_surface,
    nearest_vertex_of_faces,
    nearest_vertices,
)
from icp_proposal_tpu.ops.surface_index import closest_auto
from icp_proposal_tpu.sampling.context import TargetContext
from icp_proposal_tpu.sampling.state import FitState, pose_inverse_apply

_LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# specs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RandomShapeSpec:
    """α' = α + ε, ε ~ N(0, σ²I) (reference ``RandomShapeUpdateProposal``)."""

    sigma: float = 0.1

    @property
    def name(self):
        return f"RandomShape-{self.sigma}"


@dataclass(frozen=True)
class RotationSpec:
    """Single-axis Euler-angle random walk (reference
    ``GaussianAxisRotationProposal``). axis: 0=Roll(φ), 1=Pitch(θ), 2=Yaw(ψ)."""

    axis: int
    sigma: float = 0.01

    @property
    def name(self):
        label = ("RotationRoll", "RotationPitch", "RotationYaw")[self.axis]
        return f"{label}-{self.sigma}"


@dataclass(frozen=True)
class TranslationSpec:
    """Single-axis translation random walk (reference
    ``GaussianAxisTranslationProposal``). axis: 0=X, 1=Y, 2=Z."""

    axis: int
    sigma: float = 0.1

    @property
    def name(self):
        return f"Translation{'XYZ'[self.axis]}-{self.sigma}"


@dataclass(frozen=True)
class IcpSpec:
    """The informed closest-point proposal (reference
    ``NonRigidIcpProposal.scala:30-154``; the paper's contribution).

    direction: "model" (sample model vertices, project onto target surface) or
    "target" (sample target vertices, find nearest model vertex).
    """

    direction: str = "model"  # model | target
    step_length: float = 0.1
    noise_along_normal: float = 5.0
    tangential_noise: float = 10.0
    n_points: int = 100
    boundary_aware: bool = True

    @property
    def name(self):
        label = "ModelSampling" if self.direction == "model" else "TargetSampling"
        return f"IcpProposal-{label}-{self.step_length}Step"


@dataclass(frozen=True)
class MalaSpec:
    """Gradient-informed shape proposal (MALA; beyond-reference).

    α' = α + (h²/2)·∇log π(α) + h·ξ, ξ ~ N(0, I), with the exact asymmetric
    Langevin correction.  Not expressible in the reference (Scala has no
    autodiff over the likelihood); in JAX the gradient of the full product
    posterior — prior + closest-point likelihood through the surface query —
    is one reverse pass.  The target log-density is bound at step-build time
    (``MixtureProgram.bind_target``), so the proposal always matches the
    evaluator the chain actually samples.
    """

    step_size: float = 0.1

    @property
    def sigma(self):  # adaptive-scale hook (MixtureProgram._sigma)
        return self.step_size

    @property
    def name(self):
        return f"MALA-{self.step_size}"


ProposalSpec = Union[RandomShapeSpec, RotationSpec, TranslationSpec, IcpSpec,
                     MalaSpec]


def mixed_proposal_icp(
    n_points: int,
    projection_direction: str = "model_and_target",
    tangential_noise: float = 10.0,
    noise_along_normal: float = 5.0,
    step_length: float = 0.1,
    boundary_aware: bool = True,
) -> List[Tuple[float, ProposalSpec]]:
    """Reference ``MixedProposalDistributions.mixedProposalICP`` (:48-68)."""
    def icp(direction):
        return IcpSpec(
            direction=direction,
            step_length=step_length,
            noise_along_normal=noise_along_normal,
            tangential_noise=tangential_noise,
            n_points=n_points,
            boundary_aware=boundary_aware,
        )

    if projection_direction == "target":
        return [(1.0, icp("target"))]
    if projection_direction == "model":
        return [(1.0, icp("model"))]
    return [(0.5, icp("target")), (0.5, icp("model"))]


def mixed_random_pose_proposal(
    rot_yaw=0.01, rot_pitch=0.01, rot_roll=0.01, trans_x=0.1, trans_y=0.1, trans_z=0.1
) -> List[Tuple[float, ProposalSpec]]:
    """Reference ``mixedRandomPoseProposal`` (:29-39): equal-weight 6-way."""
    w = 1.0 / 6.0
    return [
        (w, RotationSpec(axis=2, sigma=rot_yaw)),
        (w, RotationSpec(axis=1, sigma=rot_pitch)),
        (w, RotationSpec(axis=0, sigma=rot_roll)),
        (w, TranslationSpec(axis=0, sigma=trans_x)),
        (w, TranslationSpec(axis=1, sigma=trans_y)),
        (w, TranslationSpec(axis=2, sigma=trans_z)),
    ]


def mixed_random_shape_proposal(steps=(0.1,)) -> List[Tuple[float, ProposalSpec]]:
    """Reference ``mixedRandomShapeProposal`` (:41-46)."""
    w = 1.0 / len(steps)
    return [(w, RandomShapeSpec(sigma=s)) for s in steps]


def gradient_shape_proposal(step_sizes=(0.2,)) -> List[Tuple[float, ProposalSpec]]:
    """MALA mixture over coefficient space (beyond-reference; see MalaSpec)."""
    w = 1.0 / len(step_sizes)
    return [(w, MalaSpec(step_size=h)) for h in step_sizes]


def nest(*weighted_groups) -> List[Tuple[float, ProposalSpec]]:
    """Combine weighted sub-mixtures into one flat normalized mixture
    (scalismo nests MixtureProposals; weights multiply through,
    e.g. ``IcpProposalRegistration.scala:72``)."""
    flat: List[Tuple[float, ProposalSpec]] = []
    total = sum(w for w, _ in weighted_groups)
    for w, group in weighted_groups:
        gtotal = sum(gw for gw, _ in group)
        for gw, spec in group:
            flat.append((w / total * gw / gtotal, spec))
    return flat


# ---------------------------------------------------------------------------
# equality guards (the reference's −∞ cross-block checks)
# ---------------------------------------------------------------------------

def _eq(a, b):
    return jnp.all(a == b)


def _pose_scale_equal(a: FitState, b: FitState):
    return (
        _eq(a.scale, b.scale)
        & _eq(a.rot, b.rot)
        & _eq(a.trans, b.trans)
        & _eq(a.center, b.center)
    )


def _all_but_rot_axis_equal(a: FitState, b: FitState, axis: int):
    mask = jnp.arange(3) != axis
    return (
        _eq(a.scale, b.scale)
        & jnp.all(jnp.where(mask, a.rot == b.rot, True))
        & _eq(a.trans, b.trans)
        & _eq(a.center, b.center)
        & _eq(a.coeffs, b.coeffs)
    )


def _all_but_trans_axis_equal(a: FitState, b: FitState, axis: int):
    mask = jnp.arange(3) != axis
    return (
        _eq(a.scale, b.scale)
        & _eq(a.rot, b.rot)
        & jnp.all(jnp.where(mask, a.trans == b.trans, True))
        & _eq(a.center, b.center)
        & _eq(a.coeffs, b.coeffs)
    )


def _guard(cond, logp):
    return jnp.where(cond, logp, -jnp.inf)


# ---------------------------------------------------------------------------
# ICP correspondence + factor computation
# ---------------------------------------------------------------------------

class IcpComponent:
    """Concrete ICP proposal: spec + precomputed sample ids.

    ``factors(state, cur_points, cur_normals)`` computes the coefficient-space
    GP-posterior factors anchored at ``state`` — the entire
    ``icpPosterior`` pipeline of the reference
    (``NonRigidIcpProposal.scala:88-153``) reduced to closed form (see
    ``models/gpmm.py`` docstring).
    """

    def __init__(self, spec: IcpSpec, gpmm, ctx: TargetContext, model_boundary,
                 model_ids, target_ids):
        import numpy as np

        self.spec = spec
        self.gpmm = gpmm
        self.ctx = ctx
        self.model_boundary = model_boundary
        self.model_ids = model_ids  # [m] sampled model vertex ids
        self.target_ids = target_ids  # [m] sampled target vertex ids
        if spec.direction == "model":
            # static tables for the analytic factor assembly (the model
            # direction observes a FIXED vertex subset — reference
            # ``NonRigidIcpProposal.scala:45,94``); host numpy → jit constants
            q = np.asarray(gpmm.sbasis)[model_ids]  # [m, 3, r]
            self._q_static = q.astype(np.float32)
            self._gram_static = np.einsum(
                "mir,mis->mrs", q.astype(np.float64), q.astype(np.float64)
            ).astype(np.float32)
            self._mean_static = np.asarray(gpmm.mean_disp)[model_ids]
            self._ref_static = np.asarray(gpmm.ref_points)[model_ids]

    def factors(self, state: FitState, cur_points, cur_normals,
                shared_cp_fidx=None) -> gp.PosteriorFactors:
        """``shared_cp_fidx``: optional (cp [m,3], fidx [m]) closest-point
        results for ``model_ids``, pre-sliced from a FUSED query pass over a
        superset of ids (``mh._fusion_plan``) — identical values to what the
        in-house ``closest_auto`` call computes, one HBM pass instead of
        two."""
        spec = self.spec
        if spec.direction == "model":
            # model→target: closest point on target surface for each sampled
            # model vertex; boundary check on the nearest *target* vertex
            # (reference :94-109)
            if shared_cp_fidx is not None:
                cp, fidx = shared_cp_fidx
            else:
                q = cur_points[self.model_ids]
                cp, _, fidx = closest_auto(q, self.ctx.tri, self.ctx.index)
            near = nearest_vertex_of_faces(self.ctx.cells, fidx, cp, self.ctx.points)
            on_boundary = jnp.asarray(self.ctx.boundary)[near]
            mask = (
                (~on_boundary) if spec.boundary_aware else jnp.ones_like(on_boundary)
            )
            # STATIC observation ids → analytic assembly against precomputed
            # per-id Gram tables: no [B,m,3,r] per-chain intermediate is ever
            # materialized under the chain vmap
            # (``gpmm.posterior_factors_anisotropic_static``).
            obs_disp = pose_inverse_apply(state, cp) - jnp.asarray(self._ref_static)
            return gp.posterior_factors_anisotropic_static(
                self.gpmm,
                self._q_static,
                self._gram_static,
                self._mean_static,
                obs_disp,
                cur_normals[self.model_ids],
                spec.noise_along_normal,
                spec.tangential_noise,
                mask.astype(jnp.float32),
            )
        else:
            # target→model: nearest *current-mesh* vertex for each sampled
            # target point; boundary check on the model side (reference :112-131)
            tq = self.ctx.points[self.target_ids]
            ids = nearest_vertices(tq, cur_points)
            on_boundary = jnp.asarray(self.model_boundary)[ids]
            obs_world = tq
            normals = cur_normals[ids]

        mask = (~on_boundary) if spec.boundary_aware else jnp.ones_like(on_boundary)
        # displacement observation in model (reference) frame:
        # inverse-pose the world-space correspondent (reference :106-108,126-129)
        obs_disp = pose_inverse_apply(state, obs_world) - jnp.asarray(self.gpmm.ref_points)[ids]
        return gp.posterior_factors_anisotropic(
            self.gpmm,
            ids,
            obs_disp,
            normals,
            spec.noise_along_normal,
            spec.tangential_noise,
            mask.astype(jnp.float32),
        )

    def propose(self, key, state: FitState, factors: gp.PosteriorFactors) -> FitState:
        """α' = α + (α* − α)·stepLength, α* ~ N(α̂, M⁻¹) (reference :53-68)."""
        alpha_star = gp.sample_posterior_coeffs(key, factors)
        new_coeffs = state.coeffs + (alpha_star - state.coeffs) * self.spec.step_length
        return state._replace(coeffs=new_coeffs)

    def log_q(self, from_state: FitState, to_state: FitState,
              factors_from: gp.PosteriorFactors, parity: bool):
        """q(to|from): undo the relaxation, evaluate the posterior coefficient
        density (reference ``logTransitionProbability``, :71-85).

        In exact mode (parity=False) two terms the reference omits are added:
          * ½·log det M — the true normalizer of N(α̂, M⁻¹) (scalismo evaluates
            a standard normal in normalized coordinates);
          * −r·log(stepLength) — the Jacobian of the under-relaxation
            α' = α + s(α* − α): without it the ICP density is expressed in the
            compensated variable α*, a *different measure* than the other
            mixture components' densities, which biases the mixture MH ratio
            (caught by the prior-preservation test).
        """
        compensated = from_state.coeffs + (
            to_state.coeffs - from_state.coeffs
        ) / self.spec.step_length
        logp = gp.transition_logpdf(factors_from, compensated, include_logdet=not parity)
        if not parity:
            r = from_state.coeffs.shape[-1]
            logp = logp - r * math.log(self.spec.step_length)
        return _guard(_pose_scale_equal(from_state, to_state), logp)


class MalaComponent:
    """Langevin shape proposal over the bound target density (MalaSpec).

    Follows the same anchored-component protocol as ``IcpComponent``: the
    per-state anchor data (here ∇log π at the state) is computed once per
    step at the candidate and carried for the current state, so the
    asymmetric correction q(θ|θ')/q(θ'|θ) needs no recomputation."""

    def __init__(self, spec: MalaSpec, gpmm):
        self.spec = spec
        self.gpmm = gpmm
        self._grad = None  # set by bind()

    def bind(self, evaluator):
        """Bind ∇log π to the product evaluator the chain samples.  Idempotent
        per evaluator (re-binding with the same object is a no-op)."""
        if getattr(self, "_bound_to", None) is evaluator:
            return
        from icp_proposal_tpu.sampling.state import transformed_points

        gpmm = self.gpmm

        def logpi(coeffs, state):
            st = state._replace(coeffs=coeffs)
            pts = transformed_points(gpmm, st)
            return evaluator(st, pts)[0]

        self._grad = jax.grad(logpi)
        self._bound_to = evaluator

    def factors(self, state: FitState, cur_points, cur_normals):
        if self._grad is None:
            raise RuntimeError(
                "MalaComponent is unbound — MixtureProgram.bind_target(evaluator) "
                "runs inside mh.make_mh_step/init_carry; construct the step via "
                "those entry points."
            )
        g = self._grad(state.coeffs, state)
        # a NaN gradient (e.g. degenerate closest-point configuration) would
        # poison the drift; zero it — the proposal degrades to a random walk
        # for that step and its density stays well-defined
        return jnp.where(jnp.isfinite(g), g, 0.0)

    def propose(self, key, state: FitState, g, h) -> FitState:
        mean = state.coeffs + 0.5 * h * h * g
        new_coeffs = mean + h * jax.random.normal(key, state.coeffs.shape)
        return state._replace(coeffs=new_coeffs)

    def log_q(self, from_state: FitState, to_state: FitState, g_from, h):
        r = from_state.coeffs.shape[-1]
        mean = from_state.coeffs + 0.5 * h * h * g_from
        resid = to_state.coeffs - mean
        logp = (
            -0.5 * jnp.sum((resid / h) ** 2)
            - r * jnp.log(h)
            - 0.5 * r * _LOG_2PI
        )
        return _guard(_pose_scale_equal(from_state, to_state), logp)


# ---------------------------------------------------------------------------
# mixture program
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AdaptConfig:
    """Diminishing Robbins–Monro scale adaptation for random-walk components
    (not in the reference; BASELINE.json north-star feature).

    The per-component log-scale s_c is updated only on steps where component
    c was selected:
        s_c += rate / (1 + t)^decay · (min(1, e^{logα}) − target)
    and frozen after ``adapt_steps``.  Diminishing adaptation preserves
    ergodicity (Roberts & Rosenthal 2007); the forward and reverse densities
    within a step always use the same scales (they live in the scan carry).
    """

    target: float = 0.234
    rate: float = 1.0
    decay: float = 0.6
    adapt_steps: int = 10 ** 9  # adapt "forever" by default


class MixtureProgram:
    """A flattened, normalized proposal mixture over FitState.

    Built once per configuration (static); used inside the jitted MH step.
    """

    def __init__(self, weighted_specs, gpmm, ctx: TargetContext, model_boundary,
                 parity: bool = False, seed: int = 1024,
                 adapt: "AdaptConfig | None" = None,
                 icp_model_ids=None):
        import numpy as np

        from icp_proposal_tpu.ops.morton import morton_sort_ids
        from icp_proposal_tpu.ops.surface_sampling import seeded_vertex_subset

        total = sum(w for w, _ in weighted_specs)
        self.weights = [w / total for w, _ in weighted_specs]
        self.specs = [s for _, s in weighted_specs]
        self.names = [s.name for s in self.specs]
        self.log_weights = np.log(np.asarray(self.weights, np.float32))
        self.gpmm = gpmm
        self.ctx = ctx
        # parity=True reproduces the reference's transition density exactly
        # (no ½·log det M, no relaxation Jacobian); parity=False is the
        # mathematically exact MH correction.  See IcpComponent.log_q.
        self.parity = parity
        self.adapt = adapt
        # which components have an adaptable scalar scale (random walks only;
        # the ICP proposal's step noise is the GP posterior itself)
        self.adaptable = np.asarray(
            [not isinstance(s, IcpSpec) for s in self.specs], np.float32
        )
        # per-component acceptance targets: 0.574 is optimal for Langevin
        # proposals (Roberts & Rosenthal 1998), cfg.target (0.234) for RWs
        self.adapt_targets = np.asarray(
            [0.574 if isinstance(s, MalaSpec)
             else (adapt.target if adapt is not None else 0.234)
             for s in self.specs],
            np.float32,
        )
        # "anchored" components carry per-state data through the scan carry:
        # ICP → GP-posterior factors, MALA → ∇log π.  Kept under the historic
        # name `icp_components` (it is what mh.py threads through the carry).
        self.icp_components = {}
        vt = int(ctx.points.shape[0])
        for i, s in enumerate(self.specs):
            if isinstance(s, IcpSpec):
                # icp_model_ids: explicit override of the model-vertex subset
                # (any seeded subset is an equally valid configuration —
                # SURVEY §7 quirk (a)).  Used by the fused-query setups to
                # make the ICP correspondence ids a subset of the
                # evaluator's, so one closest-point pass serves both
                # (mh._fusion_plan).
                if icp_model_ids is not None and len(icp_model_ids) < s.n_points:
                    # ADVICE r4: a short override must not silently shrink the
                    # correspondence set below what the spec declares (e.g.
                    # small models where the evaluator subset clamps to
                    # num_points, so its stride-2 slice is < 2·rank)
                    raise ValueError(
                        f"icp_model_ids override has {len(icp_model_ids)} ids "
                        f"but {s.name} declares n_points={s.n_points}; pass a "
                        f"subset of at least n_points ids or lower n_points"
                    )
                self.icp_components[i] = IcpComponent(
                    s,
                    gpmm,
                    ctx,
                    model_boundary,
                    np.asarray(
                        icp_model_ids[: s.n_points]
                        if icp_model_ids is not None
                        else morton_sort_ids(
                            np.asarray(gpmm.ref_points),
                            seeded_vertex_subset(
                                gpmm.num_points, s.n_points, seed
                            ),
                        )
                    ),
                    np.asarray(morton_sort_ids(
                        np.asarray(ctx.points),
                        seeded_vertex_subset(vt, s.n_points, seed + 1),
                    )),
                )
            elif isinstance(s, MalaSpec):
                self.icp_components[i] = MalaComponent(s, gpmm)

    @property
    def num_components(self):
        return len(self.specs)

    def needs_normals(self):
        return any(isinstance(c, IcpComponent) for c in self.icp_components.values())

    def bind_target(self, evaluator):
        """Bind gradient-informed components to the chain's target density.
        Called by ``mh.make_mh_step``/``mh.init_carry``; idempotent."""
        for comp in self.icp_components.values():
            if isinstance(comp, MalaComponent):
                comp.bind(evaluator)

    # -- per-step dense computation -----------------------------------------

    def anchor_factors(self, state, cur_points, cur_normals, shared=None):
        """ICP posterior factors anchored at ``state`` for every ICP
        component → dict idx → PosteriorFactors.

        ``shared``: optional dict idx → (cp, fidx) from a fused query pass
        (see ``IcpComponent.factors``)."""
        shared = shared or {}
        return {
            i: (
                comp.factors(state, cur_points, cur_normals, shared.get(i))
                if isinstance(comp, IcpComponent)
                else comp.factors(state, cur_points, cur_normals)
            )
            for i, comp in self.icp_components.items()
        }

    def _sigma(self, i, spec, scales):
        """Effective scale for component i: static sigma × adaptive factor."""
        if scales is None:
            return spec.sigma
        return spec.sigma * scales[i]

    def propose_all(self, key, state: FitState, factors_cur,
                    scales=None) -> List[FitState]:
        """One candidate per component.  `scales` [C] are the adaptive scale
        multipliers from the carry (None → 1)."""
        keys = jax.random.split(key, self.num_components)
        candidates = []
        for i, spec in enumerate(self.specs):
            k = keys[i]
            if isinstance(spec, IcpSpec):
                cand = self.icp_components[i].propose(k, state, factors_cur[i])
            elif isinstance(spec, MalaSpec):
                cand = self.icp_components[i].propose(
                    k, state, factors_cur[i], self._sigma(i, spec, scales)
                )
            elif isinstance(spec, RandomShapeSpec):
                eps = self._sigma(i, spec, scales) * jax.random.normal(
                    k, state.coeffs.shape
                )
                cand = state._replace(coeffs=state.coeffs + eps)
            elif isinstance(spec, RotationSpec):
                eps = self._sigma(i, spec, scales) * jax.random.normal(k, ())
                cand = state._replace(
                    rot=state.rot.at[spec.axis].add(eps.astype(state.rot.dtype))
                )
            elif isinstance(spec, TranslationSpec):
                eps = self._sigma(i, spec, scales) * jax.random.normal(k, ())
                cand = state._replace(
                    trans=state.trans.at[spec.axis].add(eps.astype(state.trans.dtype))
                )
            else:
                raise TypeError(f"unknown proposal spec {spec}")
            candidates.append(cand)
        return candidates

    def log_q_mixture(self, from_state: FitState, to_state: FitState, factors_from,
                      scales=None):
        """log q_mix(to|from) = logsumexp_c [ log w_c + log q_c(to|from) ]."""
        comps = []
        for i, spec in enumerate(self.specs):
            if isinstance(spec, IcpSpec):
                lq = self.icp_components[i].log_q(
                    from_state, to_state, factors_from[i], self.parity
                )
            elif isinstance(spec, MalaSpec):
                lq = self.icp_components[i].log_q(
                    from_state, to_state, factors_from[i],
                    self._sigma(i, spec, scales),
                )
            elif isinstance(spec, RandomShapeSpec):
                sigma = self._sigma(i, spec, scales)
                delta = to_state.coeffs - from_state.coeffs
                r = delta.shape[-1]
                logp = (
                    -0.5 * jnp.sum((delta / sigma) ** 2)
                    - r * jnp.log(sigma)
                    - 0.5 * r * _LOG_2PI
                )
                lq = _guard(_pose_scale_equal(from_state, to_state), logp)
            elif isinstance(spec, RotationSpec):
                sigma = self._sigma(i, spec, scales)
                delta = to_state.rot[spec.axis] - from_state.rot[spec.axis]
                logp = (
                    -0.5 * (delta / sigma) ** 2
                    - jnp.log(sigma)
                    - 0.5 * _LOG_2PI
                )
                lq = _guard(
                    _all_but_rot_axis_equal(from_state, to_state, spec.axis), logp
                )
            elif isinstance(spec, TranslationSpec):
                sigma = self._sigma(i, spec, scales)
                delta = to_state.trans[spec.axis] - from_state.trans[spec.axis]
                logp = (
                    -0.5 * (delta / sigma) ** 2
                    - jnp.log(sigma)
                    - 0.5 * _LOG_2PI
                )
                lq = _guard(
                    _all_but_trans_axis_equal(from_state, to_state, spec.axis), logp
                )
            comps.append(self.log_weights[i] + lq)
        return jax.scipy.special.logsumexp(jnp.stack(comps))

    def update_scales(self, log_scales, step_idx, selected, log_alpha):
        """Robbins–Monro log-scale update (no-op unless adapt configured):
        log_scales [C], step_idx scalar, selected component index, logα."""
        if self.adapt is None:
            return log_scales
        cfg = self.adapt
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_alpha, 0.0)))
        gamma = cfg.rate / (1.0 + step_idx) ** cfg.decay
        active = (step_idx < cfg.adapt_steps).astype(jnp.float32)
        onehot = (
            jax.nn.one_hot(selected, self.num_components)
            * jnp.asarray(self.adaptable)
        )
        return log_scales + active * gamma * onehot * (
            accept_prob - jnp.asarray(self.adapt_targets)
        )
