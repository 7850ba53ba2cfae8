"""TUM-format dataset writer round-trip through the real tum-fr1 loader.

The reference's TUM ingestion (``src/test_dvo.py:110-173``: rgb/depth/
groundtruth tables, nearest-timestamp association, 16-bit depth decode,
xyzw quaternion parsing) is reproduced by ``io/datasets.load_tum_sequence``;
this test drives it with a rendered sequence written by
``apps/make_dataset.write_tum_dataset`` so the full on-disk path — not
just the bundled-set JSON path — is exercised.
"""

import numpy as np
import pytest

from dense_visual_odometry_tpu.apps.make_dataset import write_tum_dataset
from dense_visual_odometry_tpu.io.datasets import load_tum_sequence
from dense_visual_odometry_tpu.io.synthetic import orbit_trajectory


N_FRAMES = 5


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("tum_synth")
    return write_tum_dataset(out, n_frames=N_FRAMES, motion="medium")


def test_loader_round_trip(dataset):
    seq = load_tum_sequence(dataset)
    assert len(seq) == N_FRAMES
    # Association is 1:1 despite the 5 ms rgb/depth offset, and frame
    # timestamps are the rgb/depth average (reference test_dvo.py:166-173).
    assert np.all(np.diff(seq.timestamps) > 0)
    np.testing.assert_allclose(
        seq.timestamps[1] - seq.timestamps[0], 1.0 / 30.0, atol=1e-6
    )

    # Ground-truth poses survive the matrix -> TUM-quaternion -> matrix
    # round trip (the writer's wxyz quats are read back as TUM xyzw).
    expected = orbit_trajectory(N_FRAMES, radius=0.01, angle=0.01, advance=0.004)
    np.testing.assert_allclose(seq.gt_poses, expected, atol=1e-5)


def test_depth_decode(dataset):
    seq = load_tum_sequence(dataset)
    rgb, depth = seq.frame(2)
    assert rgb.dtype == np.uint8 and rgb.shape[-1] == 3
    assert depth.dtype == np.uint16
    # TUM 5000 DN/m: depths of the bundled scene (~1-3 m) land mid-range.
    valid = depth[depth > 0]
    assert valid.size > 0.5 * depth.size
    assert 2000 < np.median(valid) < 30000


def test_handheld_fr1_dataset(tmp_path):
    """fr1-difficulty mode: handheld trajectory + Kinect sensor model +
    ingestion irregularities (timestamp jitter, dropped depth frames)."""
    out = write_tum_dataset(
        tmp_path / "hh", n_frames=12, motion="handheld-fr1", seed=3
    )
    # ~1% depth frame drops: table may be shorter than rgb's.
    depth_rows = [
        line for line in (out / "depth.txt").read_text().splitlines()
        if line and not line.startswith("#")
    ]
    assert len(depth_rows) <= 12
    seq = load_tum_sequence(out)
    assert len(seq) == 12  # association pairs every rgb with some depth
    rgb, depth = seq.frame(5)
    valid = depth[depth > 0]
    assert valid.size > 0.3 * depth.size
    # Kinect disparity quantization: depths snap to fb/(k*step) levels,
    # so the number of distinct values collapses vs the continuous render.
    assert np.unique(valid).size < 2000
    # Ground truth still round-trips.
    from dense_visual_odometry_tpu.io.synthetic import handheld_trajectory

    np.testing.assert_allclose(
        seq.gt_poses, handheld_trajectory(12, seed=3), atol=1e-5
    )


def test_tracks_with_low_drift(dataset):
    """The real tum-fr1 ingestion feeds the tracker end-to-end."""
    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.metrics import ate_rmse
    from dense_visual_odometry_tpu.models.session import OdometrySession

    seq = load_tum_sequence(dataset)
    cfg = RobustDVOConfig(
        levels=4, max_iterations=30, use_weighter=True,
        relative_tolerance=1e-2, constant_velocity_init=True,
    )
    sess = OdometrySession(seq.camera, cfg)
    est = [np.asarray(sess.step(rgb, depth).matrix) for rgb, depth in seq]
    ate, _ = ate_rmse(np.stack(est), seq.gt_poses)
    # ~8 mm/frame real motion; rendered frames have splat/hole noise, so
    # the bound is loose — this guards ingestion, not solver accuracy.
    assert float(ate) < 0.01
