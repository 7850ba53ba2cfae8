from dense_visual_odometry_tpu.models import robust, session, weighting  # noqa: F401
from dense_visual_odometry_tpu.models.robust import (  # noqa: F401
    FrameData,
    TrackResult,
    make_tracker,
    preprocess_frame,
    track_pair,
)
from dense_visual_odometry_tpu.models.session import (  # noqa: F401
    OdometrySession,
    SessionState,
    session_step,
)
from dense_visual_odometry_tpu.models.batched_session import (  # noqa: F401
    BatchedOdometrySession,
    batched_session_step,
)
from dense_visual_odometry_tpu.models.slam import (  # noqa: F401
    KeyframePolicy,
    SlamSession,
)
from dense_visual_odometry_tpu.models.batched_slam import (  # noqa: F401
    BatchedSlamSession,
)
from dense_visual_odometry_tpu.models.dense_ba import (  # noqa: F401
    DenseBAConfig,
    DenseBAData,
    DenseBAResult,
    build_dense_ba_data,
    optimize_dense_ba,
    optimize_dense_ba_sharded,
)
from dense_visual_odometry_tpu.models.tsdf import (  # noqa: F401
    TSDFConfig,
    TSDFVolume,
    extract_mesh,
    integrate,
    integrate_frames,
    make_volume,
    raycast_view,
    save_mesh_obj,
    save_mesh_ply,
)
