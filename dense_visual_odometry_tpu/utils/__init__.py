from dense_visual_odometry_tpu.utils import lie  # noqa: F401
