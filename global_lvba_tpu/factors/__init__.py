from .plane_eigen import (
    PlaneFactorArrays,
    bucket_to_device,
    plane_cost,
    plane_cost_grad_hess,
)

__all__ = [
    "PlaneFactorArrays",
    "bucket_to_device",
    "plane_cost",
    "plane_cost_grad_hess",
]
