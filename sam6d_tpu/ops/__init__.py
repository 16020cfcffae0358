from .geometry import (
    pairwise_sq_distance,
    pairwise_distance,
    svd3x3,
    symeig3x3,
    weighted_procrustes,
    transform_points,
    inverse_transform_points,
    rotation_from_euler_zyx,
)
from .sampling import (
    farthest_point_sample,
    gather_points,
    sample_pts_feats,
    multinomial_from_weights,
)
from .ball_query import ball_query, group_points, query_and_group, three_nn_interpolate
from .embedding import sinusoidal_embedding, geometric_embedding_indices
from .pointcloud import (
    depth_to_pointcloud,
    masked_depth_mean_translation,
    radius_outlier_mask,
    normalize_cloud_by_radius,
    cloud_radius,
)
