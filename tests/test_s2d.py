"""Space-to-depth conv reformulation: exactness vs the direct convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.ops.s2d_conv import (
    depth_to_space,
    s2d_conv,
    space_to_depth,
)


class TestS2DLayout:
    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 3), dtype=np.float32))
        np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)

    def test_phase_layout(self, rng):
        # channel blocks are (phase_y, phase_x) major
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 2), dtype=np.float32))
        y = space_to_depth(x)
        np.testing.assert_array_equal(y[0, 0, 0, 0:2], x[0, 0, 0])   # (0,0)
        np.testing.assert_array_equal(y[0, 0, 0, 2:4], x[0, 0, 1])   # (0,1)
        np.testing.assert_array_equal(y[0, 0, 0, 4:6], x[0, 1, 0])   # (1,0)
        np.testing.assert_array_equal(y[0, 0, 0, 6:8], x[0, 1, 1])   # (1,1)


def _direct(x, w, b):
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b[None, None, None, :]


class TestS2DConv:
    @pytest.mark.parametrize("k", [3, 5, 7])
    def test_matches_direct(self, rng, k):
        ci, co = 5, 7
        x = jnp.asarray(rng.standard_normal((2, 16, 20, ci), dtype=np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, k, ci, co), dtype=np.float32) * 0.1
        )
        b = jnp.asarray(rng.standard_normal(co, dtype=np.float32))
        ref = _direct(x, w, b)
        out = s2d_conv(x, w, b)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_boundary_rows(self, rng):
        # impulse at the corner exercises the zero-padded coarse halo
        w = jnp.zeros((7, 7, 1, 1)).at[0, 0, 0, 0].set(1.0)
        x = jnp.zeros((1, 8, 8, 1)).at[0, 0, 0, 0].set(2.0)
        b = jnp.zeros((1,))
        np.testing.assert_allclose(
            s2d_conv(x, w, b), _direct(x, w, b), atol=1e-6
        )


class TestBasicBlockRoutes:
    def test_s2d_route_matches_direct(self, rng):
        from tpuvc.models.spynet import BasicBlock

        x = jnp.asarray(rng.standard_normal((1, 32, 48, 8), dtype=np.float32))
        direct = BasicBlock(s2d_min_pixels=10**9)
        routed = BasicBlock(s2d_min_pixels=0)
        variables = direct.init(jax.random.key(0), x)
        a = direct.apply(variables, x)
        c = routed.apply(variables, x)  # same params, s2d route
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-4)

    def test_spynet_flow_unchanged_by_route(self, rng):
        """SPyNet output is route-independent (levels pick routes by size)."""
        from tpuvc.models.spynet import SPyNet

        a = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        b = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        net = SPyNet()
        variables = net.init(jax.random.key(0), a, b)
        flow = net.apply(variables, a, b)
        assert flow.shape == (1, 64, 64, 2)
        assert bool(jnp.all(jnp.isfinite(flow)))
