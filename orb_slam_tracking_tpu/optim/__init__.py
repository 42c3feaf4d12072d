from .pose_opt import optimize_pose  # noqa: F401
