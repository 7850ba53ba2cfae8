"""Pallas kernels vs their XLA twins (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.ops.pallas.reduction import normal_equations_pallas
from dense_visual_odometry_tpu.ops.residuals import normal_equations


def _case(rng, b, h, w, all_valid=False):
    res = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))
    jac = jnp.asarray(rng.normal(size=(b, h, w, 6)).astype(np.float32))
    wts = jnp.asarray(rng.uniform(0, 1, size=(b, h, w)).astype(np.float32))
    valid = (
        jnp.ones((b, h, w), bool)
        if all_valid
        else jnp.asarray(rng.uniform(size=(b, h, w)) > 0.3)
    )
    return res, jac, wts, valid


def _check(a, b):
    for name in ("hessian", "rhs", "error", "count"):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        denom = max(np.abs(y).max(), 1e-6)
        np.testing.assert_allclose(x / denom, y / denom, atol=5e-6)


class TestReductionKernel:
    @pytest.mark.parametrize("shape", [(2, 32, 128), (1, 64, 256), (3, 24, 128)])
    def test_matches_xla(self, rng, shape):
        case = _case(rng, *shape)
        _check(
            normal_equations_pallas(*case, interpret=True),
            normal_equations(*case),
        )

    def test_unbatched_input(self, rng):
        res, jac, wts, valid = _case(rng, 1, 32, 128)
        a = normal_equations_pallas(res[0], jac[0], wts[0], valid[0], interpret=True)
        b = normal_equations(res[0], jac[0], wts[0], valid[0])
        _check(a, b)
        assert a.hessian.shape == (6, 6)

    def test_hessian_symmetric(self, rng):
        case = _case(rng, 2, 32, 128, all_valid=True)
        out = normal_equations_pallas(*case, interpret=True)
        h = np.asarray(out.hessian)
        np.testing.assert_allclose(h, np.swapaxes(h, -1, -2), rtol=1e-6)
