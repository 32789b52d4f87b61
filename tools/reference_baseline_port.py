"""Measured single-core CPU baseline for the reference hot loop.

The Scala reference cannot be built here (sbt needs network; zero egress),
so BASELINE.md's 25 samples/s denominator was an *estimate*.  This tool
replaces it with a measurement: a faithful single-threaded NumPy port of the
reference's per-step algorithm (SURVEY §3.1 hot loop; reference
``apps/femur/IcpProposalRegistration.scala:50-104``,
``api/sampling/proposals/NonRigidIcpProposal.scala:53-153``), timed on one
CPU core.

Faithfulness notes (everything is tilted IN THE REFERENCE'S FAVOR, so the
measured number is an upper bound on what the Scala/JVM code does):

* Per-step work mirrors the reference exactly: one full-mesh eigenbasis
  decode of the candidate, closest-point correspondence searches for BOTH
  ICP directions at the candidate anchor (2·rank queries each), two r×r
  GP-posterior assemblies + Cholesky factorizations (the mixture transition
  density needs every ICP component at the reverse anchor every step —
  scalismo ``MixtureProposal.fromProposalsWithTransition`` sums component
  densities; the LRU (``NonRigidIcpProposal.scala:49``) only saves the
  *current*-state anchor, which we replicate by caching it across steps),
  two relaxation-compensated projections per transition evaluation
  (decode + posterior-basis least squares, ``NonRigidIcpProposal.scala:77-83``),
  and the 4·rank-point Euclidean evaluator at the candidate
  (``IndependentPointDistanceEvaluator.scala:40-46``; the accept/reject
  logger's re-evaluation is absorbed by the reference's LRU and is NOT
  counted here).
* Closest-point queries use a scipy cKDTree over triangle centroids plus
  exact point→triangle refinement on the K=16 nearest — at 3,240 triangles
  this does *less* work than scalismo's per-query BVH descent over boxed
  JVM ``Point`` objects.
* All linear algebra is C-backed BLAS via NumPy, pinned to ONE thread
  (JVM breeze/netlib is the same class of backend).
* The transition density is evaluated in the reference's parity form (no
  ½·log det M / Jacobian corrections — they cost nothing anyway, the
  Cholesky is already computed).

Usage:
    OMP_NUM_THREADS=1 python tools/reference_baseline_port.py \
        [--components 100] [--steps 300] [--out artifacts/cpu_baseline.json]

Prints one JSON line with measured samples/s and updates BASELINE.md's
anchor discussion (manually).
"""
from __future__ import annotations

import os

# pin BLAS to one core BEFORE numpy import
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702

import argparse
import json
import time

import numpy as np
from scipy.spatial import cKDTree

# ---------------------------------------------------------------------------
# exact point -> triangle (numpy, single query batch)
# ---------------------------------------------------------------------------


def _point_tri_d2(p: np.ndarray, tri: np.ndarray):
    """p [n,3] queries, tri [n,k,3,3] candidate triangles per query →
    (d2 [n,k], closest [n,k,3]).  Ericson's region decomposition."""
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    p = p[:, None, :]
    ab, ac, ap = b - a, c - a, p - a
    d1 = np.sum(ab * ap, -1)
    d2_ = np.sum(ac * ap, -1)
    bp = p - b
    d3 = np.sum(ab * bp, -1)
    d4 = np.sum(ac * bp, -1)
    cp = p - c
    d5 = np.sum(ab * cp, -1)
    d6 = np.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_
    denom = va + vb + vc
    v = np.where(np.abs(denom) > 1e-30, vb / np.where(denom == 0, 1, denom), 0.0)
    w = np.where(np.abs(denom) > 1e-30, vc / np.where(denom == 0, 1, denom), 0.0)
    inside = a + v[..., None] * ab + w[..., None] * ac

    t_ab = np.clip(d1 / np.where(d1 - d3 == 0, 1, d1 - d3), 0, 1)
    on_ab = a + t_ab[..., None] * ab
    t_ac = np.clip(d2_ / np.where(d2_ - d6 == 0, 1, d2_ - d6), 0, 1)
    on_ac = a + t_ac[..., None] * ac
    t_bc = np.clip((d4 - d3) / np.where((d4 - d3) + (d5 - d6) == 0, 1,
                                        (d4 - d3) + (d5 - d6)), 0, 1)
    on_bc = b + t_bc[..., None] * (c - b)

    cand = np.stack([inside, on_ab, on_ac, on_bc, a, b, c], axis=-2)
    # invalidate the interior candidate when barycentric coords are outside
    valid_inside = (va >= 0) & (vb >= 0) & (vc >= 0)
    d2s = np.sum((cand - p[..., None, :]) ** 2, -1)
    d2s[..., 0] = np.where(valid_inside, d2s[..., 0], np.inf)
    best = np.argmin(d2s, -1)
    ii = np.indices(best.shape)
    closest = cand[ii[0], ii[1], best]
    return d2s[ii[0], ii[1], best], closest


class SurfaceQuery:
    """KD-tree (triangle centroids) + exact refine — generous stand-in for
    scalismo's BVH ``closestPointOnSurface``."""

    def __init__(self, points, cells, k=16):
        self.tri = points[cells]  # [F,3,3]
        self.k = min(k, len(cells))
        self.tree = cKDTree(self.tri.mean(axis=1))

    def closest(self, q):
        _, idx = self.tree.query(q, k=self.k)
        d2, cp = _point_tri_d2(q, self.tri[idx])
        j = np.argmin(d2, axis=1)
        ii = np.arange(len(q))
        return np.sqrt(d2[ii, j]), cp[ii, j]


def vertex_normals(points, cells):
    fn = np.cross(points[cells[:, 1]] - points[cells[:, 0]],
                  points[cells[:, 2]] - points[cells[:, 0]])
    vn = np.zeros_like(points)
    for i in range(3):
        np.add.at(vn, cells[:, i], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.where(n == 0, 1, n)


# ---------------------------------------------------------------------------
# the ported hot loop
# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--components", type=int, default=100)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="artifacts/cpu_baseline.json")
    args = ap.parse_args()

    from icp_proposal_tpu.apps.femur import load_femur_data

    data = load_femur_data(model_components=args.components)
    model = data.model
    rank = model.rank
    ref = np.asarray(model.ref_points, np.float64)
    mu = np.asarray(model.mean_disp, np.float64)
    Q = np.asarray(model.sbasis, np.float64)  # [V,3,r]
    cells = np.asarray(model.cells)
    V = ref.shape[0]
    Qf = Q.reshape(3 * V, rank)

    tpts = np.asarray(data.target.points, np.float64)
    tcells = np.asarray(data.target.cells)
    target_q = SurfaceQuery(tpts, tcells)
    target_vtree = cKDTree(tpts)
    target_normals = vertex_normals(tpts, tcells)
    t_boundary = np.asarray(data.target_boundary_mask, bool)
    m_boundary = np.asarray(data.model_boundary_mask, bool)

    rng = np.random.default_rng(1024)
    n_icp = 2 * rank  # reference: numOfSamplePoints = 2·rank
    n_eval = 4 * rank  # evaluator points = 4·rank
    icp_ids = rng.choice(V, size=n_icp, replace=False)
    eval_ids = rng.choice(V, size=n_eval, replace=False)
    tgt_ids = rng.choice(len(tpts), size=n_icp, replace=False)
    sigma_n, sigma_t, step_len, sigma_eval = 5.0, 10.0, 0.1, 2.0
    a_prec, b_prec = 1.0 / sigma_n**2, 1.0 / sigma_t**2

    def decode(alpha):
        return ref + mu + (Qf @ alpha).reshape(V, 3)

    def factors(alpha, pts=None, normals=None):
        """Both ICP components' posterior factors anchored at alpha.
        Returns dict dir -> (alpha_hat, chol(M))."""
        if pts is None:
            pts = decode(alpha)
        if normals is None:
            normals = vertex_normals(pts, cells)
        out = {}
        # model direction: sampled model vertices -> target surface
        qp = pts[icp_ids]
        _, cp = target_q.closest(qp)
        _, nv = target_vtree.query(cp)
        mask = ~t_boundary[nv]
        nrm = target_normals[nv]
        obs = cp - ref[icp_ids]  # displacement observation (pose = identity)
        out["model"] = _assemble(icp_ids[mask], obs[mask], nrm[mask])
        # target direction: sampled target points -> nearest model vertex
        mtree = cKDTree(pts)
        _, mv = mtree.query(tpts[tgt_ids])
        mask2 = ~m_boundary[mv]
        obs2 = tpts[tgt_ids] - ref[mv]
        nrm2 = normals[mv]
        out["target"] = _assemble(mv[mask2], obs2[mask2], nrm2[mask2])
        return out

    def _assemble(ids, obs, nrm):
        qo = Q[ids]  # [m,3,r]
        resid = obs - mu[ids]
        ntq = np.einsum("mi,mir->mr", nrm, qo)
        pq = b_prec * qo + (a_prec - b_prec) * nrm[:, :, None] * ntq[:, None, :]
        M = np.eye(rank) + np.einsum("mir,mis->rs", qo, pq)
        rhs = np.einsum("mir,mi->r", pq, resid)
        L = np.linalg.cholesky(M)
        alpha_hat = np.linalg.solve(M, rhs)
        return alpha_hat, L

    def q_log_density(fac, alpha_from, alpha_to):
        """Reference parity density (NonRigidIcpProposal.scala:71-85):
        project compensated coeffs into the posterior, standard-normal
        logpdf.  Includes the two full-mesh ops the reference pays:
        instance decode of the compensated state + coefficients projection."""
        alpha_hat, L = fac
        comp = alpha_from + (alpha_to - alpha_from) / step_len
        mesh = decode(comp)  # reference: model.instance(compensatedTo)
        # posterior.coefficients(toMesh): r-dim least squares through the
        # model basis (the posterior basis spans the same space)
        resid3v = (mesh - ref - mu).reshape(-1)
        proj = np.linalg.solve(Qf.T @ Qf + 1e-5 * np.eye(rank), Qf.T @ resid3v)
        d = proj - alpha_hat
        y = np.linalg.solve(L, d)
        return -0.5 * float(y @ y) - 0.5 * rank * np.log(2 * np.pi)

    def evaluator(pts):
        d, _ = target_q.closest(pts[eval_ids])
        return float(np.sum(-0.5 * (d / sigma_eval) ** 2
                            - np.log(sigma_eval) - 0.5 * np.log(2 * np.pi)))

    def prior(alpha):
        return float(-0.5 * alpha @ alpha - 0.5 * rank * np.log(2 * np.pi))

    # mixture: 0.45 ICP-model + 0.45 ICP-target + 0.1 RW  (flagship)
    comp_w = np.array([0.45, 0.45, 0.1])
    log_w = np.log(comp_w)
    rw_sigma = 0.1

    alpha = np.zeros(rank)
    cur_factors = factors(alpha)
    cur_post = prior(alpha) + evaluator(decode(alpha))
    n_acc = 0

    t0 = time.perf_counter()
    for it in range(args.steps):
        # candidate generation
        c = rng.choice(3, p=comp_w)
        if c == 2:  # random walk
            cand = alpha + rw_sigma * rng.standard_normal(rank)
        else:
            ahat, L = cur_factors["model" if c == 0 else "target"]
            astar = ahat + np.linalg.solve(L.T, rng.standard_normal(rank))
            cand = alpha + (astar - alpha) * step_len
        # candidate decode + reverse-anchor factors (both components: the
        # mixture transition density needs them regardless of c)
        cand_pts = decode(cand)
        cand_normals = vertex_normals(cand_pts, cells)
        cand_factors = factors(cand, cand_pts, cand_normals)
        # mixture transition densities (parity form), forward + reverse
        diff = cand - alpha

        def mix_q(fac, a_from, a_to):
            comps = [
                q_log_density(fac["model"], a_from, a_to),
                q_log_density(fac["target"], a_from, a_to),
                -0.5 * float(diff @ diff) / rw_sigma**2
                - rank * np.log(rw_sigma) - 0.5 * rank * np.log(2 * np.pi),
            ]
            m = np.max(np.asarray(comps) + log_w)
            return m + np.log(np.sum(np.exp(np.asarray(comps) + log_w - m)))

        lq_fwd = mix_q(cur_factors, alpha, cand)
        lq_rev = mix_q(cand_factors, cand, alpha)
        cand_post = prior(cand) + evaluator(cand_pts)
        log_alpha_mh = (cand_post - cur_post) + (lq_rev - lq_fwd)
        if np.log(rng.uniform()) < log_alpha_mh:
            alpha, cur_post, cur_factors = cand, cand_post, cand_factors
            n_acc += 1
    dt = time.perf_counter() - t0

    out = {
        "metric": "cpu_single_core_samples_per_sec_femur_gpmm"
                  f"{args.components}_icp_proposal",
        "value": round(args.steps / dt, 2),
        "unit": "samples/s (1 CPU core, numpy port of reference hot loop)",
        "steps": args.steps,
        "wall_s": round(dt, 2),
        "acceptance": round(n_acc / args.steps, 4),
        "threads": {k: os.environ.get(k) for k in
                    ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS")},
        "notes": "upper bound on the Scala/JVM reference (see module docstring)",
    }
    print(json.dumps(out))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
