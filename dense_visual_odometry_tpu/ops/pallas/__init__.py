"""Pallas TPU kernels for the hot ops.

These give kernel-level control over the performance-critical inner loop
(SURVEY §7.3 / north star).  Every kernel has a pure-XLA twin in
:mod:`dense_visual_odometry_tpu.ops`; correctness tests run the kernels in
interpreter mode so CPU CI covers them, and the solver selects them via
``RobustDVOConfig`` only on TPU backends.

- ``stackwarp``: tent-weighted shift-stack accumulation (gather-free
  bilinear warp) with the window parity planes resident in VMEM.
- ``fused_iter``: the full GN iteration — accumulation + residual +
  t-IRLS scale/weights + H/b/err/count reduction — in one HBM pass
  (absorbs the earlier standalone normal-equation reduction kernel).
- ``level_solver``: an ENTIRE pyramid level's LM solve per kernel
  launch — warp geometry, taps, IRLS, reduction, damped 6x6 Cholesky,
  SE(3) update and stopping run on-chip in a per-element while_loop;
  the window streams from HBM once per level, not once per iteration.
"""

from dense_visual_odometry_tpu.ops.pallas.fused_iter import (  # noqa: F401
    fused_iteration_pallas,
    fused_shift_iteration,
)
from dense_visual_odometry_tpu.ops.pallas.level_solver import (  # noqa: F401
    lm_level_pallas,
    solve_level_fused,
)
from dense_visual_odometry_tpu.ops.pallas.stackwarp import (  # noqa: F401
    shift_stack_sample_pallas,
    stack_accumulate_pallas,
)
