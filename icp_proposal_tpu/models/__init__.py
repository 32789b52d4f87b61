from icp_proposal_tpu.models.gpmm import (  # noqa: F401
    Gpmm,
    PosteriorFactors,
    make_gpmm,
)
