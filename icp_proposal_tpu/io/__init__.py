from icp_proposal_tpu.io.landmarks import read_landmarks, write_landmarks  # noqa: F401
from icp_proposal_tpu.io.statismo import read_statismo_gpmm, write_statismo_gpmm  # noqa: F401
from icp_proposal_tpu.io.stl import read_stl, write_stl  # noqa: F401
