from dense_visual_odometry_tpu.parallel.batched import (  # noqa: F401
    batched_track_pair,
    make_batched_tracker,
    make_mesh,
    shard_batch,
    stack_frame_data,
)
