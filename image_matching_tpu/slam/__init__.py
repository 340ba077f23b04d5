from image_matching_tpu.slam.pose_graph import (
    PoseGraph,
    similarity_params_to_matrix,
    matrix_to_similarity_params,
    compose_similarity,
    optimize_pose_graph,
    make_sharded_pose_graph_solver,
    absolute_trajectory_error,
)

__all__ = [
    "PoseGraph",
    "similarity_params_to_matrix",
    "matrix_to_similarity_params",
    "compose_similarity",
    "optimize_pose_graph",
    "make_sharded_pose_graph_solver",
    "absolute_trajectory_error",
]
