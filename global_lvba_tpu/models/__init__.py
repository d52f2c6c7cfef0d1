from .synthetic import PlaneScene, make_plane_scene, perturb_poses

__all__ = ["PlaneScene", "make_plane_scene", "perturb_poses"]
