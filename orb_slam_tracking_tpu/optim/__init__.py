from .pose_graph import optimize_pose_graph, relative_sim3  # noqa: F401
from .pose_opt import optimize_pose  # noqa: F401
