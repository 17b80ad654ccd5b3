"""TPU-native warp/geometry op library (replaces reference spatial_transformer*.py)."""

from stabnet_tpu.ops.homography import (
    apply_homography,
    mesh_cell_corners,
    mesh_to_homographies,
    solve_dlt,
)
from stabnet_tpu.ops.mesh import base_mesh, cell_pts, theta_to_mesh
from stabnet_tpu.ops.warp import (
    WarpResult,
    bilinear_sample,
    black_mask,
    dense_maps,
    transformer,
)
from stabnet_tpu.ops.crop import max_clear_rect, max_clear_rect_bruteforce
from stabnet_tpu.ops.flow import flow_to_sampling, tvl1_flow

__all__ = [
    "WarpResult",
    "apply_homography",
    "base_mesh",
    "bilinear_sample",
    "black_mask",
    "cell_pts",
    "dense_maps",
    "flow_to_sampling",
    "max_clear_rect",
    "max_clear_rect_bruteforce",
    "mesh_cell_corners",
    "mesh_to_homographies",
    "solve_dlt",
    "theta_to_mesh",
    "transformer",
    "tvl1_flow",
]
