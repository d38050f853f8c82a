"""TPU-native point-cloud ops.

Each op here is the XLA/Pallas equivalent of one of the reference's CUDA
kernels (reference modules/third_party/pointnet2/_ext_src/src/*.cu), with
bit-matching selection semantics (FPS start point / near-origin skip, ball
query first-k-in-index-order with pad-with-first) so converted checkpoints
produce identical features.
"""

from sceneverse_tpu.ops.pointops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
from sceneverse_tpu.ops.geometry import calc_pairwise_locs, calc_pairwise_locs_mv

__all__ = [
    "furthest_point_sample",
    "gather_points",
    "group_points",
    "ball_query",
    "three_nn",
    "three_interpolate",
    "calc_pairwise_locs",
    "calc_pairwise_locs_mv",
]
