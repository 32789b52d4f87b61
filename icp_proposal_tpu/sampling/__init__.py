from icp_proposal_tpu.sampling.state import FitState, init_state  # noqa: F401
