import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.ops.deform import DeformConv, deform_conv2d


class TestDeformConv:
    def test_zero_offset_equals_grouped_conv(self, rng):
        """With zero offsets and unit masks, deform conv == grouped conv."""
        B, H, W, C, G, Co = 1, 8, 8, 8, 2, 8
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, C // G, Co)) * 0.1, jnp.float32
        )
        offsets = jnp.zeros((B, H, W, G * 9 * 2), jnp.float32)
        masks = jnp.ones((B, H, W, G * 9), jnp.float32)
        out = deform_conv2d(x, offsets, masks, w, None, groups=G)

        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=G,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_integer_offset_shifts_taps(self, rng):
        """A uniform (dy=0,dx=1) offset equals convolving a shifted input."""
        B, H, W, C = 1, 8, 8, 4
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        offsets = jnp.zeros((B, H, W, 9 * 2)).at[..., 1::2].set(1.0)  # dx=+1
        out = deform_conv2d(x, offsets, None, w, None, groups=1)
        x_shift = jnp.concatenate(
            [x[:, :, 1:], jnp.zeros((B, H, 1, C))], axis=2
        )
        ref = jax.lax.conv_general_dilated(
            x_shift, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # Interior columns agree (borders differ: zero-pad vs shift).
        np.testing.assert_allclose(
            np.asarray(out[:, 1:-1, 1:-2]), np.asarray(ref[:, 1:-1, 1:-2]),
            atol=1e-5,
        )

    def test_mask_scales_contribution(self, rng):
        B, H, W, C = 1, 6, 6, 2
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        offsets = jnp.zeros((B, H, W, 18))
        half = deform_conv2d(
            x, offsets, jnp.full((B, H, W, 9), 0.5), w, None, groups=1
        )
        full = deform_conv2d(
            x, offsets, jnp.ones((B, H, W, 9)), w, None, groups=1
        )
        np.testing.assert_allclose(
            np.asarray(half), 0.5 * np.asarray(full), atol=1e-6
        )

    def test_module_and_grads(self, rng):
        m = DeformConv(features=8, groups=2)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
        off = jnp.asarray(
            0.5 * rng.standard_normal((1, 8, 8, 2 * 9 * 2)), jnp.float32
        )
        msk = jnp.asarray(rng.random((1, 8, 8, 2 * 9)), jnp.float32)
        v = m.init(jax.random.key(0), x, off, msk)

        def loss(params, off):
            return jnp.sum(m.apply({"params": params}, x, off, msk) ** 2)

        g_p, g_off = jax.grad(loss, argnums=(0, 1))(v["params"], off)
        assert float(jnp.abs(g_off).sum()) > 0
        assert all(
            np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g_p)
        )
