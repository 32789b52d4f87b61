"""Random surface sampling and seeded vertex subsets.

Equivalents of scalismo's ``UniformMeshSampler3D`` (area-weighted surface
sampling; reference call sites ``IcpBasedSurfaceFitting.scala:51-53``,
``femur/CreateGPModel.scala:39,92``) and of the reference's decimation-derived
point subsets.

Note on parity: the reference uses vertex *ids of a decimated mesh* to index
the *full-resolution* mesh (``NonRigidIcpProposal.scala:94-96``,
``IndependentPointDistanceEvaluator.scala:38-41``) — effectively "the first m
vertex ids" of the full mesh.  We use an explicit, seeded id subset instead
(documented deviation; MC behavior does not depend on which subset is used).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icp_proposal_tpu.mesh import TriangleMesh, face_areas


def sample_points_on_surface(key, mesh: TriangleMesh, n: int):
    """n area-weighted uniform random points on the surface: categorical draw
    over triangles by area + uniform barycentric jitter."""
    areas = face_areas(mesh.points, mesh.cells)
    logits = jnp.log(jnp.maximum(areas, 1e-20))
    k_face, k_bary = jax.random.split(key)
    face_idx = jax.random.categorical(k_face, logits, shape=(n,))
    tri = mesh.triangles()[face_idx]  # [n,3,3]
    r = jax.random.uniform(k_bary, (n, 2))
    sqrt_r1 = jnp.sqrt(r[:, 0])
    u = 1.0 - sqrt_r1
    v = r[:, 1] * sqrt_r1
    w = 1.0 - u - v
    return u[:, None] * tri[:, 0] + v[:, None] * tri[:, 1] + w[:, None] * tri[:, 2]


def seeded_vertex_subset(num_points: int, n: int, seed: int = 1024) -> np.ndarray:
    """Deterministic subset of n vertex ids (host-side, numpy).

    Stand-in for the reference's "ids of the decimated mesh indexed into the
    full mesh" quirk; seeded for reproducibility (reference pins Random(1024)
    everywhere, e.g. ``SamplingRegistration.scala:38``).
    """
    n = min(n, num_points)
    rng = np.random.RandomState(seed)
    return np.sort(rng.choice(num_points, size=n, replace=False)).astype(np.int32)


def area_weighted_vertex_subset(
    mesh_points: np.ndarray, cells: np.ndarray, n: int, seed: int = 1024
) -> np.ndarray:
    """Vertex subset weighted by one-ring area — approximates uniform surface
    coverage better than a plain uniform id draw on irregular meshes."""
    pts = np.asarray(mesh_points, dtype=np.float64)
    c = np.asarray(cells)
    tri = pts[c]
    fa = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    w = np.zeros(len(pts))
    for k in range(3):
        np.add.at(w, c[:, k], fa / 3.0)
    w = w / w.sum()
    n = min(n, len(pts))
    rng = np.random.RandomState(seed)
    ids = rng.choice(len(pts), size=n, replace=False, p=w)
    return np.sort(ids).astype(np.int32)
