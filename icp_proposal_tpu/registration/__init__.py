from icp_proposal_tpu.registration.sampling_registration import (  # noqa: F401
    SamplingRegistration,
)
from icp_proposal_tpu.registration.icp_fitting import icp_surface_fitting  # noqa: F401
