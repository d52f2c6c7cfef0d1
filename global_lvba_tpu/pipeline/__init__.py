from .lidar_ba import run_window_ba, run_lidar_ba, LidarBAResult

__all__ = ["run_window_ba", "run_lidar_ba", "LidarBAResult"]
