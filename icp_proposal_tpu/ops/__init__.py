from icp_proposal_tpu.ops.closest_point import (  # noqa: F401
    closest_point_on_triangle,
    closest_points_on_surface,
    nearest_vertices,
    surface_distances,
)
from icp_proposal_tpu.ops.metrics import (  # noqa: F401
    avg_distance,
    hausdorff_distance,
)
from icp_proposal_tpu.ops.rigid import rigid_landmark_alignment  # noqa: F401
