"""Small real-TPU smoke test for the Mosaic kernel paths.

The Pallas kernels are CPU-tested in interpreter mode every suite run;
Mosaic-specific lowering regressions (scoped-VMEM grants, scalar
transcendentals, the level-fused solver incl. its in-kernel se3.log)
would otherwise only surface inside the 1500 s watchdogged headline
bench.  This script compiles and runs the level-kernel tracker on the
real TPU at SMALL shapes (seconds, not minutes) for:

1. the shipped no-prior config,
2. the motion-prior config (exercises ``_se3_log_scalars`` on-chip),
3. the exposure-bias config (in-kernel centering + Schur reductions),

and checks the recovered motion against the known synthetic shift and
against the XLA-loop twin.

Run:  python benchmarks/smoke_tpu.py   (no flags; TPU via default backend)
Exit code 0 = pass; prints one JSON line.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"smoke": "skip", "backend": jax.default_backend()}))
        return 0

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import jax.numpy as jnp
    import numpy as np

    from dense_visual_odometry_tpu.camera import CameraModel
    from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
    from dense_visual_odometry_tpu.models.robust import FrameData, track_pair
    from dense_visual_odometry_tpu.ops import pyramid as pyr_ops

    h, w = 64, 128
    k = np.array(
        [[80.0, 0, (w - 1) / 2], [0, 80.0, (h - 1) / 2], [0, 0, 1]],
        np.float32,
    )
    v, u = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )

    def tex(uu):
        return (
            120
            + 50 * np.sin(2 * np.pi * uu / 23.0)
            + 40 * np.cos(2 * np.pi * v / 17.0)
        )

    tx = 0.01
    shift = 80.0 * tx / 2.0
    g1 = tex(u).astype(np.float32)
    g2 = tex(u - shift).astype(np.float32)
    d = np.full((h, w), 2.0, np.float32)

    def fd(g):
        return FrameData(
            gray=pyr_ops.build_pyramid(jnp.asarray(g), 2),
            depth_m=pyr_ops.build_pyramid(jnp.asarray(d), 2),
        )

    base = dict(
        levels=2, max_iterations=15, shift_stack_radius=3,
        shift_stack_levels=(0, 1), packed_sampling=True,
        approximate_image2_gradient=True, use_weighter=True,
        weighter=TWeighterConfig(scale_subsample=1, unroll_iterations=3),
        lm_lambda0=1e-4, relative_tolerance=1e-2,
        use_pallas_stack=True, use_fused_iteration=True,
        freeze_shift_window=True,
    )
    cam = CameraModel.create(k, 1.0)
    prev, curr = fd(g1), fd(g2)
    anchor = np.eye(4, dtype=np.float32)
    anchor[0, 3] = 0.8 * tx

    checks = {}
    t0 = time.time()
    for name, extra in (
        ("no_prior", {}),
        ("prior", {"sigma": 2e-7}),
        ("prior_ref_energy", {"sigma": 1e-4, "reference_prior_energy": True}),
        # In-kernel exposure-bias elimination (centering + the (s, rho,
        # g) reductions + rank-1 Schur) must lower in Mosaic too.
        ("illum_bias", {"illumination": "bias"}),
    ):
        cfg_k = RobustDVOConfig(**base, use_level_kernel=True, **extra)
        cfg_x = RobustDVOConfig(**base, use_level_kernel=False, **extra)
        last = jnp.asarray(anchor) if extra else None
        rk = track_pair(prev, curr, cam, cfg_k, last_transform=last)
        rx = track_pair(prev, curr, cam, cfg_x, last_transform=last)
        tk = np.asarray(rk.transform)
        txla = np.asarray(rx.transform)
        ok = (
            bool(rk.success)
            and np.all(np.isfinite(tk))
            and abs(tk[0, 3] - tx) < 3e-3
            and np.abs(tk - txla).max() < 1e-4
        )
        checks[name] = {
            "ok": bool(ok),
            "tx_est": float(tk[0, 3]),
            "max_dev_vs_xla": float(np.abs(tk - txla).max()),
        }
    elapsed = time.time() - t0
    all_ok = all(c["ok"] for c in checks.values())
    print(
        json.dumps(
            {
                "smoke": "pass" if all_ok else "FAIL",
                "seconds": round(elapsed, 1),
                "device": str(jax.devices()[0]),
                **checks,
            }
        )
    )
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
