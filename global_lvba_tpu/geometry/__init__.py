from .so3 import exp_so3, log_so3, hat, jr, jr_inv
from .se3 import (
    compose,
    inverse,
    relative,
    apply,
    boxplus_pose,
)
from .camera import CameraModel

__all__ = [
    "exp_so3",
    "log_so3",
    "hat",
    "jr",
    "jr_inv",
    "compose",
    "inverse",
    "relative",
    "apply",
    "boxplus_pose",
    "CameraModel",
]
