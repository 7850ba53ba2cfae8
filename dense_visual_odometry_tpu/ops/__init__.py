from dense_visual_odometry_tpu.ops import gradients, interp, pyramid  # noqa: F401
