from image_matching_tpu.slam.pose_graph import (
    PoseGraph,
    similarity_params_to_matrix,
    matrix_to_similarity_params,
    compose_similarity,
    optimize_pose_graph,
    make_sharded_pose_graph_solver,
    absolute_trajectory_error,
)
from image_matching_tpu.slam.bundle_adjustment import (
    BAProblem,
    apply_similarity,
    invert_similarity,
    bundle_adjust,
    bundle_adjust_robust,
    make_sharded_bundle_adjuster,
    solve_landmarks,
    ba_residuals,
    tracks_to_ba_problem,
)

__all__ = [
    "PoseGraph",
    "similarity_params_to_matrix",
    "matrix_to_similarity_params",
    "compose_similarity",
    "optimize_pose_graph",
    "make_sharded_pose_graph_solver",
    "absolute_trajectory_error",
    "BAProblem",
    "apply_similarity",
    "invert_similarity",
    "bundle_adjust",
    "bundle_adjust_robust",
    "make_sharded_bundle_adjuster",
    "solve_landmarks",
    "ba_residuals",
    "tracks_to_ba_problem",
]
