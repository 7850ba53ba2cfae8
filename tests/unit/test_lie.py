"""Golden-value + property tests for the SO(3)/SE(3) modules.

Mirrors the reference's Lie-algebra test strategy
(/root/reference/tests/dense_visual_odometry/utils/lie_algebra/*): hand
computed matrices for exp/log plus round-trip invariants, extended with
batch/vmap coverage and the hard theta~pi / theta~0 neighbourhoods.

All functions under test are wrapped in jit once at module scope — in this
environment eager dispatch compiles every primitive separately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.utils.lie import Pose, se3, so3

ATOL = 1e-5

so3_exp = jax.jit(so3.exp)
so3_log = jax.jit(so3.log)
so3_hat = jax.jit(so3.hat)
so3_vee = jax.jit(so3.vee)
so3_to_quat = jax.jit(so3.to_quat)
so3_from_quat = jax.jit(so3.from_quat)
so3_explog = jax.jit(lambda p: so3.log(so3.exp(p)))
so3_is_rot = jax.jit(lambda r: so3.is_rotation_matrix(r, atol=1e-4))
se3_exp = jax.jit(se3.exp)
se3_log = jax.jit(se3.log)
se3_explog = jax.jit(lambda x: se3.log(se3.exp(x)))
se3_inv = jax.jit(se3.inverse)
se3_v = jax.jit(se3.left_jacobian)
se3_vinv = jax.jit(se3.left_jacobian_inverse)
se3_hat = jax.jit(se3.hat)
se3_tp = jax.jit(se3.transform_points)


class TestSo3:
    def test_hat_vee_roundtrip(self):
        phi = jnp.asarray([0.1, -0.2, 0.3])
        m = np.asarray(so3_hat(phi))
        assert np.allclose(m, -m.T, atol=0)
        assert np.allclose(so3_vee(jnp.asarray(m)), phi)

    def test_hat_cross_product(self, rng):
        a = rng.normal(size=3).astype(np.float32)
        b = rng.normal(size=3).astype(np.float32)
        assert np.allclose(np.asarray(so3_hat(jnp.asarray(a))) @ b, np.cross(a, b), atol=1e-6)

    def test_exp_identity(self):
        assert np.allclose(so3_exp(jnp.zeros(3)), np.eye(3), atol=ATOL)

    def test_exp_golden_z_quarter_turn(self):
        rot = so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        assert np.allclose(rot, expected, atol=ATOL)

    def test_exp_golden_x_half_turn(self):
        rot = so3_exp(jnp.asarray([np.pi, 0.0, 0.0]))
        assert np.allclose(rot, np.diag([1.0, -1.0, -1.0]), atol=ATOL)

    @pytest.mark.parametrize("scale", [1e-8, 1e-5, 1e-3, 0.5, 2.0, 3.1, 3.14159])
    def test_exp_log_roundtrip(self, rng, scale):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        phi = jnp.asarray(axis * scale, jnp.float32)
        assert np.allclose(so3_explog(phi), phi, atol=1e-4 * max(1.0, scale))

    def test_log_near_pi(self):
        rot = jnp.asarray(np.diag([1.0, -1.0, -1.0]), jnp.float32)
        phi = so3_log(rot)
        assert np.isclose(np.linalg.norm(phi), np.pi, atol=1e-4)
        assert np.allclose(so3_exp(phi), rot, atol=1e-4)

    def test_orthogonality_everywhere(self, rng):
        phis = jnp.asarray(rng.normal(size=(64, 3)) * 2.0, jnp.float32)
        assert bool(np.all(so3_is_rot(so3_exp(phis))))

    def test_quat_roundtrip(self, rng):
        phis = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        rots = so3_exp(phis)
        assert np.allclose(so3_from_quat(so3_to_quat(rots)), rots, atol=1e-5)

    def test_vmap_jit(self, rng):
        # Keep ||phi|| < pi: beyond that log(exp(phi)) wraps to the
        # equivalent shorter rotation and equality cannot hold.
        phis = jnp.asarray(rng.uniform(-0.9, 0.9, size=(16, 3)), jnp.float32)
        f = jax.jit(jax.vmap(lambda p: so3.log(so3.exp(p))))
        assert np.allclose(f(phis), phis, atol=1e-4)


class TestSe3:
    def test_exp_identity(self):
        assert np.allclose(se3_exp(jnp.zeros(6)), np.eye(4), atol=ATOL)

    def test_exp_pure_translation(self):
        transform = se3_exp(jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0]))
        expected = np.eye(4)
        expected[:3, 3] = [1.0, 2.0, 3.0]
        assert np.allclose(transform, expected, atol=ATOL)

    def test_exp_applies_left_jacobian(self):
        # Translation must be V(phi) @ upsilon, not upsilon (reference:
        # Se3.from_se3, special_euclidean_group.py:105-123).
        theta = np.pi / 2
        transform = np.asarray(se3_exp(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, theta])))
        k = np.array([[0, -theta, 0], [theta, 0, 0], [0, 0, 0]])
        v = np.eye(3) + (1 - np.cos(theta)) / theta**2 * k + (theta - np.sin(theta)) / theta**3 * (k @ k)
        assert np.allclose(transform[:3, 3], v @ np.array([1.0, 0.0, 0.0]), atol=ATOL)

    @pytest.mark.parametrize("scale", [1e-7, 1e-4, 0.1, 1.0, 3.0])
    def test_exp_log_roundtrip(self, rng, scale):
        xi = np.asarray(rng.normal(size=6) * scale, np.float32)
        # Keep the rotation part below pi (log wraps beyond); translation
        # part can be any magnitude.
        phi_norm = np.linalg.norm(xi[3:])
        if phi_norm >= 0.95 * np.pi:
            xi[3:] *= 0.9 * np.pi / phi_norm
        xi = jnp.asarray(xi)
        assert np.allclose(se3_explog(xi), xi, atol=1e-4 * max(1.0, scale))

    def test_inverse(self, rng):
        t = se3_exp(jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32))
        assert np.allclose(np.asarray(t) @ np.asarray(se3_inv(t)), np.eye(4), atol=1e-5)

    def test_compose_associative(self, rng):
        a, b, c = (np.asarray(se3_exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32))) for _ in range(3))
        assert np.allclose((a @ b) @ c, a @ (b @ c), atol=1e-5)

    def test_v_vinv_inverse_pair(self, rng):
        phi = jnp.asarray(rng.normal(size=3), jnp.float32)
        assert np.allclose(np.asarray(se3_v(phi)) @ np.asarray(se3_vinv(phi)), np.eye(3), atol=1e-5)

    def test_transform_points(self):
        transform = se3_exp(jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0]))
        assert np.allclose(se3_tp(transform, jnp.asarray([[1.0, 2.0, 3.0]])), [[1.0, 2.0, 4.0]], atol=ATOL)

    def test_hat(self):
        xi = jnp.asarray([1.0, 2.0, 3.0, 0.1, 0.2, 0.3])
        h = np.asarray(se3_hat(xi))
        assert np.allclose(h[:3, :3], so3_hat(xi[3:]))
        assert np.allclose(h[:3, 3], xi[:3])
        assert np.allclose(h[3], 0.0)


class TestPose:
    def test_identity_and_product(self):
        p = Pose.identity()
        q = Pose.from_xi([0.1, 0.2, 0.3, 0.01, 0.02, 0.03])
        assert (p * q).allclose(q)
        assert (q * q.inverse()).allclose(Pose.identity())

    def test_tum_quaternion_roundtrip(self):
        p = Pose.from_xi([0.4, -0.2, 0.1, 0.3, -0.1, 0.2])
        assert Pose.from_tum(*p.to_tum()).allclose(p, atol=1e-4)

    def test_pytree(self):
        p = Pose.from_xi([0.1, 0, 0, 0, 0, 0.1])
        leaves = jax.tree_util.tree_leaves(p)
        assert len(leaves) == 1 and leaves[0].shape == (4, 4)
