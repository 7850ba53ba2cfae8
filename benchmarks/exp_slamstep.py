"""Attribute the fused SLAM step's per-frame cost on the tunnel.

The fused front end (models/slam.py _fused_step) measures ~161 ms/frame
median on the relay transport vs ~71 ms for the donated odometry
session step (same 48-iter config) — both are ONE dispatch + one scalar
readback, so the gap must come from the call SHAPE: non-donated
arguments, the number of distinct device-array args (keyframe pytree),
or the number of output buffers (fd pyramid + TrackResult + pack).

Run on the real TPU: python benchmarks/exp_slamstep.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def timeit(fn, n=15, warmup=3):
    import numpy as np
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(jax.default_backend())
    import jax.numpy as jnp
    import numpy as np
    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models import slam as slam_mod
    from dense_visual_odometry_tpu.models.robust import preprocess_frame
    from dense_visual_odometry_tpu.models.session import OdometrySession

    cfg = RobustDVOConfig.from_json(str(REPO / "configs" / "tpu_accurate.json"))
    seq = load_bundled_sequence()
    rgb0, dep0 = seq.frame(0)
    rgb1, dep1 = seq.frame(1)
    k = jnp.asarray(seq.camera.intrinsics, jnp.float32)
    ds = np.float32(seq.camera.depth_scale)
    out = {"device": str(jax.devices()[0])}

    # (a) donated odometry session step, host frames in / pose out.
    # ALTERNATE the two frames so every timed step is a real solve of the
    # same pair baseline (feeding the same frame twice converges in ~1
    # iteration and reads as a fake 3x speedup).
    sess = OdometrySession(seq.camera, cfg)
    sess.step(rgb0, dep0)
    frames_ab = [(rgb1, dep1), (rgb0, dep0)]
    i = [0]

    def sess_step():
        rgb, dep = frames_ab[i[0] & 1]
        i[0] += 1
        np.asarray(sess.step(rgb, dep).matrix)

    out["session_step_ms"] = round(timeit(sess_step), 1)

    # (b) the fused SLAM step, full return (fd + result + pack).
    import dense_visual_odometry_tpu.models.robust as robust_mod
    kf = jax.jit(
        lambda im, de: preprocess_frame(
            im, de, seq.camera, levels=cfg.levels,
            max_distance=cfg.max_distance,
        )
    )(jnp.asarray(rgb0), jnp.asarray(dep0))
    kf = jax.tree.map(jnp.asarray, kf)
    init = np.eye(4, dtype=np.float32)

    def fused():
        fd, result, pack = slam_mod._fused_step(
            kf, rgb1, dep1, k, ds, init, cfg)
        np.asarray(pack)

    out["fused_step_ms"] = round(timeit(fused), 1)

    # (c) fused step but dropping outputs immediately (GC pressure test).
    def fused_drop():
        _, _, pack = slam_mod._fused_step(kf, rgb1, dep1, k, ds, init, cfg)
        np.asarray(pack)

    out["fused_drop_ms"] = round(timeit(fused_drop), 1)

    # (d) pack-only variant: same program, but only the pack leaves.
    import functools
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def pack_only(kf, im, de, k, ds, init, cfg):
        return slam_mod._fused_step(kf, im, de, k, ds, init, cfg)[2]

    def fused_pack_only():
        np.asarray(pack_only(kf, rgb1, dep1, k, ds, init, cfg))

    out["fused_packonly_ms"] = round(timeit(fused_pack_only), 1)

    # (e) the shipped FAST config through the same fused step: isolates
    # config cost (iterations / tolerance) from call-shape cost.
    fast = RobustDVOConfig.from_json(str(REPO / "configs" / "tpu_fast.json"))

    def fused_fast():
        _, _, pack = slam_mod._fused_step(kf, rgb1, dep1, k, ds, init, fast)
        np.asarray(pack)

    out["fused_fastcfg_ms"] = round(timeit(fused_fast), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
