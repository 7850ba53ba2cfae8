"""Native C++ loader: build, correctness vs OpenCV, prefetch iterator."""

import numpy as np
import pytest

from dense_visual_odometry_tpu.io import load_bundled_sequence

native = pytest.importorskip(
    "dense_visual_odometry_tpu.io.native_loader", reason="native loader module"
)


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_library()
    except native.NativeLoaderUnavailable as exc:
        pytest.skip(f"native loader unavailable: {exc}")


@pytest.fixture(scope="module")
def seq(test_data_dir_module):
    return load_bundled_sequence(test_data_dir_module)


@pytest.fixture(scope="module")
def test_data_dir_module():
    from pathlib import Path
    import os

    d = Path(os.environ.get("DVO_TEST_DATA", "/root/reference/tests/test_data"))
    if not (d / "ground_truth.json").exists():
        pytest.skip("bundled RGB-D test frames not available")
    return d


class TestNativeDecode:
    def test_rgb_matches_opencv(self, lib, seq):
        rgb_native = native.decode_rgb(seq.rgb_paths[0])
        rgb_cv, _ = seq.frame(0)
        np.testing.assert_array_equal(rgb_native, rgb_cv)

    def test_depth_matches_opencv(self, lib, seq):
        depth_native = native.decode_depth(seq.depth_paths[0])
        _, depth_cv = seq.frame(0)
        assert depth_native.dtype == np.uint16
        np.testing.assert_array_equal(depth_native, depth_cv)

    def test_missing_file(self, lib):
        with pytest.raises(FileNotFoundError):
            native.decode_rgb("/nonexistent.png")


class TestSequenceLoader:
    def test_iterates_all_frames(self, lib, seq):
        with native.NativeSequenceLoader(
            seq.rgb_paths, seq.depth_paths, prefetch=4, workers=2
        ) as loader:
            frames = list(loader)
        assert len(frames) == len(seq)
        rgb_cv, depth_cv = seq.frame(3)
        np.testing.assert_array_equal(frames[3][0], rgb_cv)
        np.testing.assert_array_equal(frames[3][1], depth_cv)

    def test_random_access(self, lib, seq):
        with native.NativeSequenceLoader(seq.rgb_paths, seq.depth_paths) as loader:
            rgb, depth = loader.get(5)
        rgb_cv, depth_cv = seq.frame(5)
        np.testing.assert_array_equal(rgb, rgb_cv)
        np.testing.assert_array_equal(depth, depth_cv)

    def test_mismatched_paths_rejected(self, lib, seq):
        with pytest.raises(ValueError):
            native.NativeSequenceLoader(seq.rgb_paths, seq.depth_paths[:-1])

    def test_sequence_prefetched_fallback(self, seq):
        """RGBDSequence.prefetched always yields correct frames, with or
        without the native library."""
        frames = list(seq.prefetched())
        assert len(frames) == len(seq)
        rgb_cv, depth_cv = seq.frame(0)
        np.testing.assert_array_equal(frames[0][0], rgb_cv)
