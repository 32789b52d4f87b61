"""Array-based triangle meshes and static topology precomputation.

TPU-native replacement for the mesh facilities the reference pulls from
scalismo (``TriangleMesh`` + operations; see reference
``api/sampling/proposals/NonRigidIcpProposal.scala:97-122`` and
``api/sampling/evaluators/IndependentPointDistanceEvaluator.scala:40-54``
for the call sites).  Geometry is a pair of arrays (points [V,3] f32,
cells [F,3] i32); everything shape-dependent but topology-static —
boundary-vertex masks, triangle areas — is precomputed on host with numpy so
the jit-compiled samplers only see fixed-shape arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TriangleMesh(NamedTuple):
    """A triangle mesh as a JAX pytree.

    points : [V, 3] float32 vertex positions
    cells  : [F, 3] int32 vertex indices per triangle
    """

    points: jax.Array
    cells: jax.Array

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    def with_points(self, points: jax.Array) -> "TriangleMesh":
        return TriangleMesh(points=points, cells=self.cells)

    def triangles(self) -> jax.Array:
        """[F, 3, 3] triangle corner positions."""
        return self.points[self.cells]


def make_mesh(points, cells) -> TriangleMesh:
    """Host-side numpy arrays: loaded meshes act as baked constants inside
    jitted programs (no eager device transfers at load time)."""
    points = np.asarray(points, dtype=np.float32)
    cells = np.asarray(cells, dtype=np.int32)
    return TriangleMesh(points=points, cells=cells)


# ---------------------------------------------------------------------------
# host-side topology precomputation (numpy; runs once, outside jit)
# ---------------------------------------------------------------------------

def boundary_vertex_mask(cells: np.ndarray, num_points: int) -> np.ndarray:
    """Boolean [V] mask of vertices on a boundary edge.

    An edge is a boundary edge iff it belongs to exactly one triangle.
    Replaces scalismo's ``operations.pointIsOnBoundary`` (used at reference
    ``NonRigidIcpProposal.scala:99,119``) with a static lookup table so the
    jit-compiled proposal can mask boundary correspondences instead of
    filtering variable-length lists.
    """
    cells = np.asarray(cells)
    edges = np.concatenate(
        [cells[:, [0, 1]], cells[:, [1, 2]], cells[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, inverse, counts = np.unique(
        edges, axis=0, return_inverse=True, return_counts=True
    )
    boundary_edges = edges[counts[inverse] == 1]
    mask = np.zeros(num_points, dtype=bool)
    mask[boundary_edges.ravel()] = True
    return mask


def vertex_adjacency_counts(cells: np.ndarray, num_points: int) -> np.ndarray:
    counts = np.zeros(num_points, dtype=np.int32)
    np.add.at(counts, np.asarray(cells).ravel(), 1)
    return counts


# ---------------------------------------------------------------------------
# device-side geometry (jit-safe)
# ---------------------------------------------------------------------------

def face_normals(points: jax.Array, cells: jax.Array, normalize: bool = True):
    """[F,3] face normals (unit if normalize=True)."""
    tri = points[cells]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return n


def face_areas(points: jax.Array, cells: jax.Array) -> jax.Array:
    tri = points[cells]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return 0.5 * jnp.linalg.norm(n, axis=-1)


def vertex_normals(points: jax.Array, cells: jax.Array) -> jax.Array:
    """[V,3] unit vertex normals: normalized mean of adjacent unit face normals.

    Matches scalismo's ``vertexNormals`` semantics (average of incident cell
    normals; call site reference ``NonRigidIcpProposal.scala:100,121``).
    Scatter-add formulation — prefer ``vertex_normals_gather`` with a
    precomputed adjacency table in hot loops (scatters serialize on TPU).
    """
    fn = face_normals(points, cells, normalize=True)
    v = points.shape[0]
    acc = jnp.zeros((v, 3), dtype=points.dtype)
    for k in range(3):
        acc = acc.at[cells[:, k]].add(fn)
    return acc / jnp.maximum(jnp.linalg.norm(acc, axis=-1, keepdims=True), 1e-20)


def vertex_face_adjacency(cells, num_points: int):
    """Host-side: padded vertex→face adjacency [V, D] int32 (D = max vertex
    degree), padding index = F (a virtual zero-normal face).  Static topology
    → computed once; turns per-step vertex-normal accumulation from a
    scatter-add into gathers (TPU-friendly)."""
    import numpy as np

    cells_np = np.asarray(cells)
    f = len(cells_np)
    lists = [[] for _ in range(num_points)]
    for fi, tri in enumerate(cells_np):
        for vid in tri:
            lists[vid].append(fi)
    d = max((len(l) for l in lists), default=1)
    adj = np.full((num_points, d), f, dtype=np.int32)
    for vid, l in enumerate(lists):
        adj[vid, : len(l)] = l
    return adj


def vertex_normals_gather(points: jax.Array, cells: jax.Array, adjacency) -> jax.Array:
    """Gather-based vertex normals using a precomputed [V, D] adjacency
    (see ``vertex_face_adjacency``).  Identical result to ``vertex_normals``."""
    fn = face_normals(points, cells, normalize=True)  # [F, 3]
    fn_pad = jnp.concatenate([fn, jnp.zeros((1, 3), fn.dtype)], axis=0)
    acc = jnp.sum(fn_pad[adjacency], axis=1)  # [V, D, 3] → [V, 3]
    return acc / jnp.maximum(jnp.linalg.norm(acc, axis=-1, keepdims=True), 1e-20)


def centroid(points: jax.Array) -> jax.Array:
    """Mean vertex position — the rotation center used by the chain driver
    (reference ``SamplingRegistration.scala:40-41``)."""
    return jnp.mean(points, axis=0)
