import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.ops import (
    avg_pool2d,
    bilinear_resize,
    pad_to_multiple,
    pixel_shuffle,
    pixel_unshuffle,
    unpad,
    warp,
)
from tpuvc.ops.resample import upsample2x_flow, upsample_flow


class TestPad:
    def test_pad_to_multiple(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 100, 130, 3)), jnp.float32)
        y, size = pad_to_multiple(x, 64)
        assert y.shape == (2, 128, 192, 3)
        assert size == (100, 130)
        assert jnp.allclose(unpad(y, size), x)

    def test_pad_noop(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        y, size = pad_to_multiple(x, 64)
        assert y is x and size == (64, 64)

    def test_reflect_values(self):
        x = jnp.arange(4.0).reshape(1, 1, 4, 1)
        y, _ = pad_to_multiple(x, 8, mode="reflect")
        # reflect of [0,1,2,3] by 4 on the right -> [2,1,0,1]
        np.testing.assert_allclose(
            np.asarray(y[0, 0, :, 0]), [0, 1, 2, 3, 2, 1, 0, 1]
        )


class TestWarp:
    def test_zero_flow_identity(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 16, 24, 3)), jnp.float32)
        flow = jnp.zeros((1, 16, 24, 2), jnp.float32)
        np.testing.assert_allclose(np.asarray(warp(img, flow)), np.asarray(img))

    def test_integer_shift(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
        flow = jnp.full((1, 8, 8, 2), 0.0).at[..., 0].set(1.0)  # dx=+1
        out = warp(img, flow)
        # out[y, x] = img[y, x+1] except at the right border (clamped)
        np.testing.assert_allclose(
            np.asarray(out[0, :, :-1, 0]), np.asarray(img[0, :, 1:, 0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out[0, :, -1, 0]), np.asarray(img[0, :, -1, 0]), atol=1e-6
        )

    def test_fractional_shift(self):
        img = jnp.arange(8.0).reshape(1, 1, 8, 1).repeat(4, axis=1)
        flow = jnp.zeros((1, 4, 8, 2)).at[..., 0].set(0.5)
        out = warp(img, flow)
        # Linear ramp: shifting by 0.5 gives value x + 0.5 in the interior.
        np.testing.assert_allclose(np.asarray(out[0, 0, :-1, 0]),
                                   np.arange(7) + 0.5, atol=1e-6)

    def test_lhbdc_compat_scaling(self):
        # In lhbdc mode a flow of f displaces by f * W/(W-1).
        img = jnp.arange(16.0).reshape(1, 1, 16, 1).repeat(2, axis=1)
        flow = jnp.zeros((1, 2, 16, 2)).at[..., 0].set(1.0)
        out = warp(img, flow, compat="lhbdc")
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 4, 0]), 4.0 + 16.0 / 15.0, atol=1e-5
        )

    def test_differentiable_wrt_flow(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
        flow = jnp.asarray(0.3 * rng.standard_normal((1, 8, 8, 2)), jnp.float32)
        g = jax.grad(lambda f: jnp.sum(warp(img, f) ** 2))(flow)
        assert jnp.all(jnp.isfinite(g)) and float(jnp.abs(g).max()) > 0

    def test_jit_compiles(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        flow = jnp.asarray(rng.standard_normal((2, 32, 32, 2)), jnp.float32)
        out = jax.jit(warp)(img, flow)
        assert out.shape == img.shape


class TestResample:
    def test_avg_pool(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
        y = avg_pool2d(x, 4)
        assert y.shape == (2, 2, 2, 3)
        np.testing.assert_allclose(
            float(y[0, 0, 0, 0]), float(x[0, :4, :4, 0].mean()), rtol=1e-6
        )

    @pytest.mark.parametrize("align", [True, False])
    def test_resize_matches_jax_image(self, rng, align):
        x = jnp.asarray(rng.standard_normal((1, 12, 16, 3)), jnp.float32)
        y = bilinear_resize(x, 24, 32, align_corners=align)
        if not align:
            ref = jax.image.resize(x, (1, 24, 32, 3), "bilinear")
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
        else:
            # align_corners=True: endpoints map exactly.
            np.testing.assert_allclose(
                np.asarray(y[0, 0, 0]), np.asarray(x[0, 0, 0]), atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(y[0, -1, -1]), np.asarray(x[0, -1, -1]), atol=1e-6
            )

    def test_resize_downsample_identity_size(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
        assert bilinear_resize(x, 8, 8) is x

    def test_upsample2x_flow_doubles_magnitude(self):
        flow = jnp.ones((1, 4, 4, 2), jnp.float32)
        up = upsample2x_flow(flow)
        assert up.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(up), 2.0, atol=1e-6)

    def test_upsample_flow_keeps_magnitude(self):
        flow = jnp.ones((1, 4, 4, 2), jnp.float32)
        up = upsample_flow(flow, 4)
        assert up.shape == (1, 16, 16, 2)
        np.testing.assert_allclose(np.asarray(up), 1.0, atol=1e-6)

    def test_pixel_shuffle_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 6, 12)), jnp.float32)
        y = pixel_shuffle(x, 2)
        assert y.shape == (2, 8, 12, 3)
        np.testing.assert_allclose(
            np.asarray(pixel_unshuffle(y, 2)), np.asarray(x), atol=1e-7
        )

    def test_pixel_shuffle_layout(self):
        # One spatial position, C=1, r=2: channels (ry, rx) land in a 2x2 block.
        x = jnp.arange(4.0).reshape(1, 1, 1, 4)
        y = pixel_shuffle(x, 2)
        np.testing.assert_allclose(
            np.asarray(y[0, :, :, 0]), [[0, 1], [2, 3]]
        )


class TestTransferPrimitives:
    """Invariants of the slim host<->device transfer paths."""

    def test_symbols16_matches_symbols_in_range(self):
        from tpuvc.entropy.quant import quantize

        x = jnp.asarray(np.linspace(-300.0, 300.0, 1001, dtype=np.float32))
        means = jnp.asarray(np.linspace(-2, 2, 1001, dtype=np.float32))
        s32 = np.asarray(quantize(x, "symbols", means=means))
        s16 = np.asarray(quantize(x, "symbols16", means=means))
        assert s16.dtype == np.int16
        np.testing.assert_array_equal(s32, s16.astype(np.int32))

    def test_symbols16_clamps(self):
        from tpuvc.entropy.quant import quantize

        x = jnp.asarray(np.array([1e6, -1e6, 0.4], np.float32))
        s16 = np.asarray(quantize(x, "symbols16"))
        np.testing.assert_array_equal(s16, [32000, -32000, 0])

    def test_device_frame_matches_to_float(self):
        from tpuvc.data.frames import to_float
        from tpuvc.data.uvg import device_frame

        u8 = np.arange(256, dtype=np.uint8).reshape(1, 8, 8, 4)[..., :3]
        np.testing.assert_array_equal(
            np.asarray(device_frame(u8)), to_float(u8)
        )

    def test_psnr_uint8_np_matches_device(self):
        from tpuvc.eval.metrics import psnr_uint8, psnr_uint8_np

        rng = np.random.default_rng(3)
        a = rng.random((1, 16, 16, 3)).astype(np.float32)
        b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1).astype(
            np.float32
        )
        dev = float(psnr_uint8(jnp.asarray(a), jnp.asarray(b)))
        host = psnr_uint8_np(a, b)
        assert abs(dev - host) < 1e-3
        # uint8 input form agrees with the float form — for BOTH twins
        # (the device version used to binarize uint8 inputs through its
        # [0,1] clip; decode_b's printed PSNR was the casualty).
        a8 = np.round(a * 255).astype(np.uint8)
        assert abs(psnr_uint8_np(a8, b) - psnr_uint8_np(a, b)) < 1e-9
        b8 = np.round(b * 255).astype(np.uint8)
        assert abs(
            float(psnr_uint8(jnp.asarray(a8), jnp.asarray(b8))) - host
        ) < 1e-3
