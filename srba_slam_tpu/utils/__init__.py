from srba_slam_tpu.utils import se3, camera, thresholds

__all__ = ["se3", "camera", "thresholds"]
