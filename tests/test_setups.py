"""Named setup registry, public evaluator accessor, and override guards
(round 5: VERDICT r4 items 4/6 + ADVICE r4 items 1/4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from icp_proposal_tpu.mesh import TriangleMesh, boundary_vertex_mask
from icp_proposal_tpu.models import gpmm as gp
from icp_proposal_tpu.models.synthetic import make_icosphere, make_synthetic_gpmm

RANK = 4


@pytest.fixture(scope="module")
def sphere_pair():
    points, cells = make_icosphere(subdivisions=2, radius=50.0)
    model = make_synthetic_gpmm(points, cells, rank=RANK, sigma=40.0, scale=5.0)
    alpha = jnp.zeros(RANK).at[0].set(1.5)
    target = TriangleMesh(points=gp.instance_points(model, alpha), cells=model.cells)
    return model, target


def test_setup_registry_builds_every_entry(femur_data):
    """Every SETUPS key constructs a (ctx, mixture, evaluator) triple, and
    the recommended default is a registry key."""
    from icp_proposal_tpu.apps import femur

    assert femur.recommended_setup() in femur.SETUPS
    for name, fn in femur.SETUPS.items():
        ctx, mixture, evaluator = fn(femur_data)
        assert len(mixture.specs) >= 1, name
        assert "product" in evaluator.named_keys, name


def test_setup_registry_adaptive_flags(femur_data):
    """rw-adapt and mala carry adaptation config; plain rw does not."""
    from icp_proposal_tpu.apps import femur

    _, rw, _ = femur.SETUPS["rw"](femur_data)
    _, rwa, _ = femur.SETUPS["rw-adapt"](femur_data)
    _, mala, _ = femur.SETUPS["mala"](femur_data)
    assert rw.adapt is None
    assert rwa.adapt is not None
    assert mala.adapt is not None
    # MALA's per-component target is the Langevin-optimal 0.574
    assert np.allclose(mala.adapt_targets, 0.574)
    assert np.allclose(rwa.adapt_targets, 0.234)


def test_evaluator_model_ids_accessor(femur_data):
    from icp_proposal_tpu.apps import femur

    _, _, evaluator = femur.SETUPS["flagship"](femur_data)
    ids = evaluator.model_ids("distance")
    assert np.array_equal(ids, evaluator._model_ids["distance"])
    with pytest.raises(KeyError, match="no likelihood spec named"):
        evaluator.model_ids("nonexistent")


def test_short_icp_model_ids_override_raises(sphere_pair):
    """ADVICE r4 item 1: an override shorter than the spec's n_points must
    raise instead of silently shrinking the correspondence set."""
    from icp_proposal_tpu.sampling.context import build_target_context
    from icp_proposal_tpu.sampling.proposals import (
        MixtureProgram,
        mixed_proposal_icp,
    )

    model, target = sphere_pair
    ctx = build_target_context(target)
    boundary = np.asarray(
        boundary_vertex_mask(np.asarray(model.cells), model.num_points)
    )
    with pytest.raises(ValueError, match="n_points"):
        MixtureProgram(
            mixed_proposal_icp(n_points=16, projection_direction="model"),
            model, ctx, boundary,
            icp_model_ids=np.arange(8),
        )
