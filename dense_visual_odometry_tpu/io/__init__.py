from dense_visual_odometry_tpu.io.datasets import (  # noqa: F401
    RGBDSequence,
    load_bundled_sequence,
    load_tum_sequence,
    pyr_down_sequence,
)
from dense_visual_odometry_tpu.io import checkpoint, synthetic, trajectory  # noqa: F401
