"""Train the LoFTR-lite coarse matcher on rendered pairs.

The reference downloads pretrained LoFTR indoor weights
(``/root/reference/src/dense_visual_odometry/core/loftr.py:31-54``);
this environment has no network, so the learned matcher is trained
IN-REPO: the bundled RGB-D frames are re-rendered from random SE(3)
viewpoints with exact depth (``io/synthetic.py``), which yields exact
coarse-cell correspondence labels (with occlusion checks) for the
dual-softmax cross-entropy loss.

Usage::

    python -m dense_visual_odometry_tpu.apps.train_matcher \
        -o dense_visual_odometry_tpu/weights/loftr_lite.npz \
        --steps 800 --pairs 48 --scale 0.5 --platform cpu

Training is one ``jit``-ted Adam step over device-resident data (the
whole rendered dataset is uploaded once); with ``--platform`` unset it
runs on the environment's default device (TPU).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="Train LoFTR-lite matcher")
    ap.add_argument("-o", "--output", type=str,
                    default=str(Path(__file__).resolve().parents[1] / "weights" / "loftr_lite.npz"))
    ap.add_argument("--data-dir", type=str, default=None, help="bundled set dir")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--pairs", type=int, default=48, help="rendered training pairs")
    ap.add_argument("--holdout", type=int, default=8, help="extra eval pairs")
    ap.add_argument("--scale", type=float, default=0.5, help="training resolution scale")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--max-rot", type=float, default=0.08, help="rad/axis")
    ap.add_argument("--max-trans", type=float, default=0.08, help="m/axis")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument(
        "--no-augment", action="store_true",
        help="disable photometric + multi-scale-crop augmentation",
    )
    ap.add_argument(
        "--fine-weight", type=float, default=0.25,
        help="fine-stage loss weight (0 disables fine-head training)",
    )
    return ap.parse_args(argv)


def _random_se3(rng, max_rot, max_trans):
    """Pure-numpy random rigid motion (Rodrigues): data generation must
    not issue eager device ops — on the remote-TPU transport every eager
    primitive is an RPC."""
    import numpy as np

    w = rng.uniform(-max_rot, max_rot, 3)
    t = rng.uniform(-max_trans, max_trans, 3)
    # Half the pairs get gentle motion so the matcher also learns
    # near-identity alignment (the odometry regime).
    if rng.random() < 0.5:
        w *= 0.25
        t *= 0.25
    th = float(np.linalg.norm(w))
    kx = np.array([
        [0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]
    ])
    r = np.eye(3)
    if th > 1e-12:
        r = r + np.sin(th) / th * kx + (1 - np.cos(th)) / th**2 * (kx @ kx)
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m


def build_dataset(args):
    """-> dict of stacked numpy arrays: gray1/gray2 (P,H,W), gt (P,N)."""
    import cv2
    import numpy as np

    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.io.synthetic import render_view
    from dense_visual_odometry_tpu.models.matcher import (
        STRIDE,
        coarse_gt_with_targets,
    )

    seq = load_bundled_sequence(args.data_dir)
    rng = np.random.default_rng(args.seed)
    n_total = args.pairs + args.holdout
    augment = not getattr(args, "no_augment", False)
    g1s, g2s, gts, uvts = [], [], [], []
    k = np.asarray(seq.camera.intrinsics, np.float64).copy()
    for p in range(n_total):
        rgb, depth = seq.frame(p % len(seq))
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
        depth_m = depth.astype(np.float32) * seq.camera.depth_scale
        ks = k.copy()
        if augment and rng.random() < 0.6:
            # Multi-scale crop (zoom augmentation): a random sub-window
            # resized back to full frame, intrinsics adjusted, so the
            # matcher sees the scene's textures across feature scales
            # instead of one fixed cell size.
            c = float(rng.uniform(0.6, 0.9))
            ch = int(gray.shape[0] * c)
            cw = int(gray.shape[1] * c)
            oy = int(rng.integers(0, gray.shape[0] - ch + 1))
            ox = int(rng.integers(0, gray.shape[1] - cw + 1))
            gray = gray[oy : oy + ch, ox : ox + cw]
            depth_m = depth_m[oy : oy + ch, ox : ox + cw]
            ks[0, 2] -= ox
            ks[1, 2] -= oy
            zx = rgb.shape[1] / cw
            zy = rgb.shape[0] / ch
            gray = cv2.resize(
                gray, (rgb.shape[1], rgb.shape[0]),
                interpolation=cv2.INTER_LINEAR,
            )
            depth_m = cv2.resize(
                depth_m, (rgb.shape[1], rgb.shape[0]),
                interpolation=cv2.INTER_NEAREST,
            )
            ks[0] *= zx
            ks[1] *= zy
        if args.scale != 1.0:
            h = int(gray.shape[0] * args.scale) // STRIDE * STRIDE
            w = int(gray.shape[1] * args.scale) // STRIDE * STRIDE
            sh, sw = gray.shape
            gray = cv2.resize(gray, (w, h), interpolation=cv2.INTER_AREA)
            depth_m = cv2.resize(depth_m, (w, h), interpolation=cv2.INTER_NEAREST)
            ks[0] *= w / sw
            ks[1] *= h / sh
        t = _random_se3(rng, args.max_rot, args.max_trans)
        g2, d2 = render_view(gray, depth_m, ks, t)
        gt, uvt = coarse_gt_with_targets(depth_m, d2, ks, t)
        if augment:
            # Photometric augmentation (never seen by the clean render
            # path): independent exposure gain/bias per image plus
            # Gaussian sensor noise — real cameras violate brightness
            # constancy across views; the dual-softmax must not rely on
            # absolute intensity.
            for g in (gray, g2):
                gain = float(rng.uniform(0.9, 1.1))
                bias = float(rng.uniform(-8.0, 8.0))
                noise = rng.standard_normal(g.shape) * 2.0
                np.copyto(g, np.clip(g * gain + bias + noise, 0.0, 255.0))
        g1s.append(gray)
        g2s.append(g2)
        gts.append(gt)
        uvts.append(uvt)
    return {
        "gray1": np.stack(g1s), "gray2": np.stack(g2s), "gt": np.stack(gts),
        "uv_target": np.stack(uvts),
    }


def real_pair_dataset(pairs, data_dir=None, scale=0.5):
    """REAL-frame evaluation pairs: both images are actual bundled
    sensor frames (no rendering anywhere), labels from measured depth +
    ground-truth relative pose — an out-of-training-distribution check
    (the training distribution is (real frame, rendered view); real
    pairs add true sensor noise, exposure differences and depth-map
    disagreement between the views).

    pairs : iterable of (i, j) frame indices; (0, 9) is the widest real
        baseline the bundled set offers (~0.1 m + rotation).
    -> dict like :func:`build_dataset`.
    """
    import cv2
    import numpy as np

    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.matcher import (
        STRIDE,
        coarse_gt_with_targets,
    )

    seq = load_bundled_sequence(data_dir)
    k0 = np.asarray(seq.camera.intrinsics, np.float64)

    def load(i):
        rgb, depth = seq.frame(i)
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
        depth_m = depth.astype(np.float32) * seq.camera.depth_scale
        h = int(gray.shape[0] * scale) // STRIDE * STRIDE
        w = int(gray.shape[1] * scale) // STRIDE * STRIDE
        ks = k0.copy()
        ks[0] *= w / gray.shape[1]
        ks[1] *= h / gray.shape[0]
        gray = cv2.resize(gray, (w, h), interpolation=cv2.INTER_AREA)
        depth_m = cv2.resize(depth_m, (w, h), interpolation=cv2.INTER_NEAREST)
        return gray, depth_m, ks

    g1s, g2s, gts, uvts = [], [], [], []
    for i, j in pairs:
        g1, d1, ks = load(i)
        g2, d2, _ = load(j)
        # transform_1_to_2: camera_i points into camera_j.
        t = np.linalg.inv(seq.gt_poses[j]) @ seq.gt_poses[i]
        gt, uvt = coarse_gt_with_targets(d1, d2, ks, t)
        gts.append(gt)
        uvts.append(uvt)
        g1s.append(g1)
        g2s.append(g2)
    return {
        "gray1": np.stack(g1s), "gray2": np.stack(g2s), "gt": np.stack(gts),
        "uv_target": np.stack(uvts),
    }


def evaluate(params, data, idx):
    """Cell-level precision/recall of mutual matches on the given pairs."""
    import numpy as np

    from dense_visual_odometry_tpu.models import matcher

    precisions, recalls = [], []
    for i in idx:
        m = matcher.match_coarse(
            params, data["gray1"][i], data["gray2"][i], top_k=512,
        )
        gt = np.asarray(data["gt"][i])
        wc = data["gray1"].shape[2] // matcher.STRIDE
        valid = np.asarray(m.valid)
        if valid.sum() == 0:
            precisions.append(0.0)
            recalls.append(0.0)
            continue
        src = np.asarray(m.uv_prev)[valid]
        dst = np.asarray(m.uv_curr)[valid]
        ci = (src[:, 1] // matcher.STRIDE).astype(int) * wc + (src[:, 0] // matcher.STRIDE).astype(int)
        cj = (dst[:, 1] // matcher.STRIDE).astype(int) * wc + (dst[:, 0] // matcher.STRIDE).astype(int)
        has_gt = gt[ci] >= 0
        # Correct when the predicted target cell is the GT cell or a
        # direct neighbour (the fine ZNCC stage absorbs 1-cell error).
        gj = gt[ci]
        dy = np.abs(cj // wc - gj // wc)
        dx = np.abs(cj % wc - gj % wc)
        good = has_gt & (dy <= 1) & (dx <= 1)
        precisions.append(float(good.sum()) / max(int(has_gt.sum()), 1))
        recalls.append(float(good.sum()) / max(int((gt >= 0).sum()), 1))
    return float(np.mean(precisions)), float(np.mean(recalls))


def evaluate_fine(params, data, idx):
    """Teacher-forced fine-stage subpixel error (px) on the given pairs,
    against the coarse-cell-center quantization baseline."""
    import numpy as np

    from dense_visual_odometry_tpu.models import matcher

    fine_errs, base_errs = [], []
    for i in idx:
        g1 = data["gray1"][i]
        gt = np.asarray(data["gt"][i])
        uvt = np.asarray(data["uv_target"][i])
        hc = g1.shape[0] // matcher.STRIDE
        wc = g1.shape[1] // matcher.STRIDE
        import jax.numpy as jnp

        f1 = matcher._fine_features(params, jnp.asarray(g1))
        f2 = matcher._fine_features(params, jnp.asarray(data["gray2"][i]))
        centers = np.asarray(matcher._cell_centers(hc, wc))
        valid = gt >= 0
        gtc = np.clip(gt, 0, hc * wc - 1)
        uv_pred, _, ok = matcher._fine_correlate(
            params, f1, f2, jnp.asarray(centers), jnp.asarray(centers[gtc])
        )
        keep = valid & np.asarray(ok)
        if keep.sum() == 0:
            continue
        fine_errs.append(
            float(np.mean(np.linalg.norm(np.asarray(uv_pred)[keep] - uvt[keep], axis=-1)))
        )
        base_errs.append(
            float(np.mean(np.linalg.norm(centers[gtc][keep] - uvt[keep], axis=-1)))
        )
    return float(np.mean(fine_errs)), float(np.mean(base_errs))


def main(argv=None):
    args = parse_args(argv)
    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parents[2] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from dense_visual_odometry_tpu.models import matcher

    t0 = time.time()
    data = build_dataset(args)
    print(f"dataset: {data['gray1'].shape} rendered in {time.time() - t0:.1f}s",
          flush=True)

    params = matcher.init_params(
        jax.random.key(args.seed), dim=args.dim, layers=args.layers,
    )
    tx = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = tx.init(params)

    dev = {k: jnp.asarray(v) for k, v in data.items()}

    fine_w = args.fine_weight

    def joint_loss(params, g1, g2, gt, uvt):
        coarse = matcher.matching_loss(params, g1, g2, gt)
        fine = matcher.fine_loss(params, g1, g2, gt, uvt)
        return coarse + fine_w * fine

    @jax.jit
    def train_step(params, opt_state, i):
        g1 = dev["gray1"][i]
        g2 = dev["gray2"][i]
        gt = dev["gt"][i]
        uvt = dev["uv_target"][i]
        loss, grads = jax.value_and_grad(joint_loss)(params, g1, g2, gt, uvt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed + 1)
    train_idx = np.arange(args.pairs)
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        i = int(rng.choice(train_idx))
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(i))
        losses.append(float(loss))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {np.mean(losses[-100:]):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    hold = np.arange(args.pairs, args.pairs + args.holdout)
    prec, rec = evaluate(params, data, hold)
    fine_px, coarse_px = evaluate_fine(params, data, hold)
    print(f"holdout: precision@1cell {prec:.3f} recall {rec:.3f}", flush=True)
    print(f"holdout fine: {fine_px:.2f} px (coarse-center baseline "
          f"{coarse_px:.2f} px)", flush=True)

    matcher.save_params(args.output, params)
    print(f"weights -> {args.output}")
    print(json.dumps({
        "final_loss": float(np.mean(losses[-50:])),
        "holdout_precision": prec, "holdout_recall": rec,
        "holdout_fine_px": fine_px, "holdout_coarse_px": coarse_px,
        "steps": args.steps, "pairs": args.pairs, "scale": args.scale,
    }))


if __name__ == "__main__":
    sys.exit(main())
