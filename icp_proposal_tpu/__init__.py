"""icp_proposal_tpu — TPU-native probabilistic surface registration with GPMMs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``unibas-gravis/icp-proposal`` (ECCV 2020, "A Closest Point Proposal for
MCMC-based Probabilistic Surface Registration"): Metropolis–Hastings surface
registration of Gaussian-Process Morphable Models with the informed
closest-point (ICP) proposal, random-walk shape/pose proposals,
Euclidean/Hausdorff likelihood evaluators, chain logging/replay, and
posterior-variability analysis.

Design stance (not a port):
  * one jit-compiled MH step as a pure function ``(state, key) -> (state, record)``
  * ``lax.scan`` for the chain, ``vmap`` for many chains per chip,
    ``shard_map`` over a device mesh for pod scale
  * static shapes everywhere: decimation/boundary masks precomputed on host,
    boundary-aware filtering expressed as zero-precision masking
  * the reference's ``Memoize`` caches disappear: per-step GP-posterior
    factors are computed densely and threaded explicitly.
"""

__version__ = "0.1.0"

from icp_proposal_tpu.mesh import TriangleMesh  # noqa: F401
from icp_proposal_tpu.models.gpmm import Gpmm  # noqa: F401
