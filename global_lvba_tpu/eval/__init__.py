from .metrics import ate_rmse, mean_reprojection_error
from .baseline_cpu import numpy_plane_cost_grad_hess

__all__ = ["ate_rmse", "mean_reprojection_error", "numpy_plane_cost_grad_hess"]
