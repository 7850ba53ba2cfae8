"""Attribute the B=1 serving latency: upload vs compute vs readback.

The sequential session's end-to-end per-frame latency on the tunnel
(bench.py ``latency_ms_b1``) bundles host->device frame upload, the
tracked solve (preprocess + 4-level cascade) and the 4x4 pose readback.
This probe times each piece separately at the shipped config so
RESULTS.md can state where the latency floor lives (transport vs
compute).

Run on the real TPU:  python benchmarks/exp_latency.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def median_ms(fn, n=15, warmup=3):
    import numpy as np

    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import jax.numpy as jnp
    import numpy as np

    from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.robust import preprocess_frame
    from dense_visual_odometry_tpu.models.session import OdometrySession

    cfg = RobustDVOConfig(
        levels=4, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=3, shift_stack_levels=(0, 1, 2),
        approximate_image2_gradient=True,
        relative_tolerance=1e-2,
        lm_lambda0=1e-4,
        use_pallas_stack=True,
        use_fused_iteration=True,
        freeze_shift_window=True,
        use_level_kernel=True,
        shift_stack_fallback=True,
        robust_init_selection=True,
    )
    seq = load_bundled_sequence()
    rgb0, depth0 = seq.frame(0)
    rgb1, depth1 = seq.frame(1)

    out = {"device": str(jax.devices()[0])}

    # 1. Pure upload: host numpy -> device arrays, forced complete.
    def upload():
        a = jax.device_put(rgb1)
        b = jax.device_put(depth1)
        np.asarray(a[0, 0])
        np.asarray(b[0, 0])

    out["upload_ms"] = median_ms(upload)

    # 2. Preprocess alone (gray conversion + pyramids), device-resident in.
    rgb_dev = jax.device_put(jnp.asarray(rgb1))
    depth_dev = jax.device_put(jnp.asarray(depth1))
    pre = jax.jit(
        lambda img, dep: preprocess_frame(
            img, dep, seq.camera, levels=cfg.levels,
            max_distance=cfg.max_distance,
        )
    )

    def preprocess():
        fd = pre(rgb_dev, depth_dev)
        np.asarray(fd.gray[0][0, 0])

    out["preprocess_ms"] = median_ms(preprocess)

    # 3. Track alone: device-resident FrameData pair, pose readback only.
    from dense_visual_odometry_tpu.models.robust import make_tracker

    fd0 = jax.tree.map(lambda x: jax.device_put(x), pre(jax.device_put(jnp.asarray(rgb0)), jax.device_put(jnp.asarray(depth0))))
    fd1 = jax.tree.map(lambda x: jax.device_put(x), pre(rgb_dev, depth_dev))
    k = jnp.asarray(seq.camera.intrinsics)
    run = make_tracker(cfg)

    def track():
        r = run(fd0, fd1, k)
        np.asarray(r.transform)

    out["track_ms"] = median_ms(track)

    # 4. Full session step (the bench latency_ms_b1 path).
    session = OdometrySession(seq.camera, cfg)
    session.step(rgb0, depth0)
    frames = [seq.frame(1), seq.frame(2), seq.frame(3)]

    def full_step():
        rgb, depth = frames[full_step.i % len(frames)]
        full_step.i += 1
        np.asarray(session.step(rgb, depth).matrix)

    full_step.i = 0
    out["session_step_ms"] = median_ms(full_step)

    # 5. Null dispatch: one trivial jitted op, forced complete (the
    # transport floor per sequential step).
    one = jax.device_put(jnp.float32(1.0))
    tiny = jax.jit(lambda x: x + 1.0)

    def null():
        np.asarray(tiny(one))

    out["null_dispatch_ms"] = median_ms(null)

    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
