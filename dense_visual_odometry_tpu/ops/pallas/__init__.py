"""Pallas TPU kernels for the hot ops.

These give kernel-level control over the performance-critical reductions
(SURVEY §7.3 / north star).  Every kernel has a pure-XLA twin in
:mod:`dense_visual_odometry_tpu.ops`; correctness tests run the kernels in
interpreter mode so CPU CI covers them, and the solver selects them via
``RobustDVOConfig`` only on TPU backends.
"""

from dense_visual_odometry_tpu.ops.pallas.reduction import (  # noqa: F401
    normal_equations_pallas,
)
