"""Point-cloud primitives: TPU-native equivalents of the reference's native ops.

Replaces (a) the CUDA `pointnet2_ops` extension
(reference: Model/pointnet2_ops_lib/pointnet2_ops/_ext-src/) and (b) the
pytorch3d `knn_points`/`knn_gather` dependency used by every loss. On TPU the
hot paths run as Pallas kernels (ops/pallas/): fused exact kNN, batch-parallel
FPS, one-hot-matmul scatter for the gather backwards, and a fused dual 1-NN
(both chamfer directions in one distance pass).

All ops use channel-last layout ([b, n, 3] points, [b, n, c] features) which
is the natural TPU layout (channels ride the 128-wide lane dimension).
"""

from geoa3_tpu.ops.knn import (
    pairwise_sqdist,
    knn_points,
    knn_points_planes,
    knn_gather,
    knn_kappa,
    knn_kappa_from_mask,
    curv_term_from_mask,
    kappa_select_mask,
    kappa_mask_path_available,
    gather_rows3,
    nn1_dual,
    nn1_dual_payload,
    o2a_coord_planes,
)
from geoa3_tpu.ops.sampling import (
    furthest_point_sampling,
    farthest_points_sample,
    farthest_points_sample_with_normal,
    gather_points,
)
from geoa3_tpu.ops.ball_query import ball_query
from geoa3_tpu.ops.grouping import (
    group_points,
    three_nn,
    three_interpolate,
)

__all__ = [
    "pairwise_sqdist",
    "knn_points",
    "knn_points_planes",
    "knn_gather",
    "knn_kappa",
    "knn_kappa_from_mask",
    "curv_term_from_mask",
    "kappa_select_mask",
    "kappa_mask_path_available",
    "gather_rows3",
    "nn1_dual",
    "nn1_dual_payload",
    "o2a_coord_planes",
    "furthest_point_sampling",
    "farthest_points_sample",
    "farthest_points_sample_with_normal",
    "gather_points",
    "ball_query",
    "group_points",
    "three_nn",
    "three_interpolate",
]
