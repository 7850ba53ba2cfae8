"""The reference's own code (numpy-1.x era) emits thousands of
deprecation warnings under numpy 2.0; they are the reference's business,
not signal about this repo."""

import warnings

import pytest


@pytest.fixture(autouse=True)
def _silence_reference_warnings():
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", category=DeprecationWarning, module=r"dense_visual_odometry.*"
        )
        warnings.filterwarnings(
            "ignore",
            message=r"Conversion of an array with ndim > 0 to a scalar.*",
            category=DeprecationWarning,
        )
        yield
