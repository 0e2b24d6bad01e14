"""Pallas warp kernel (tpuvc.ops.warp_pallas) vs the XLA gather reference.

Runs the kernel in interpreter mode (CPU CI). Covers: identity, uniform
large pan (dynamic window centering), smooth spatially-varying flow,
border clamping, non-aligned shapes (pad path), multi-channel counts,
and the custom VJP (backward = XLA path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.ops.warp_pallas import _warp_xla, warp_pallas

ATOL = 5e-5  # one-hot MXU matmuls round at ~1e-5 relative


def _frames(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((b, h, w, c), np.float32))


def _check(img, flow, sx=1.0, sy=1.0):
    out_k = warp_pallas(img, flow, sx, sy, True)
    out_x = _warp_xla(img, flow, sx, sy)
    np.testing.assert_allclose(out_k, out_x, atol=ATOL)


def test_identity():
    img = _frames(1, 64, 128, 3)
    out = warp_pallas(img, jnp.zeros((1, 64, 128, 2)), 1.0, 1.0, True)
    np.testing.assert_array_equal(out, img)


def test_uniform_large_pan():
    img = _frames(2, 64, 256, 3)
    flow = jnp.broadcast_to(
        jnp.asarray([73.0, -41.0], jnp.float32), (2, 64, 256, 2)
    )
    _check(img, flow)


def test_uniform_fractional_interior_tiles():
    """Row-uniform fast path (r5): constant FRACTIONAL flow on a 3-tile
    width — interior tiles take quad_uniform (dynamic lane roll), edge
    tiles quad_general, and the slab walk is skipped everywhere."""
    img = _frames(1, 64, 384, 3)
    flow = jnp.broadcast_to(
        jnp.asarray([5.6, -3.3], jnp.float32), (1, 64, 384, 2)
    )
    _check(img, flow)


def test_mixed_uniform_and_jittered():
    """Uniform left half + jittered right half in one call: uniform
    patches ride the direct-read path, jittered ones the walk, and both
    must match the XLA reference (cf. deform's mixed-field test)."""
    rng = np.random.default_rng(3)
    img = _frames(1, 64, 384, 3, seed=4)
    f = np.broadcast_to(
        np.asarray([2.0, -1.0], np.float32), (1, 64, 384, 2)
    ).copy()
    f[:, :, 192:, :] += (
        rng.random((1, 64, 192, 2), np.float32) - 0.5
    ) * 6.0
    _check(img, jnp.asarray(f))


def test_smooth_varying_flow():
    h, w = 96, 256
    img = _frames(1, h, w, 3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fl = np.stack(
        [
            10.0 + 5.0 * np.sin(2 * np.pi * yy / h),
            -6.0 + 4.0 * np.cos(2 * np.pi * xx / w),
        ],
        axis=-1,
    )[None]
    _check(img, jnp.asarray(fl))


def test_border_clamp_and_compat_scale():
    img = _frames(1, 64, 128, 3)
    flow = jnp.broadcast_to(
        jnp.asarray([-500.0, 500.0], jnp.float32), (1, 64, 128, 2)
    )
    _check(img, flow, sx=128.0 / 127.0, sy=64.0 / 63.0)


def test_unaligned_shape_pad_path():
    img = _frames(1, 50, 150, 3)
    flow = jnp.full((1, 50, 150, 2), 5.25, jnp.float32)
    _check(img, flow)


@pytest.mark.parametrize("c", [1, 2, 4])
def test_channel_counts(c):
    img = _frames(1, 64, 128, c, seed=c)
    flow = jnp.full((1, 64, 128, 2), -2.75, jnp.float32)
    _check(img, flow)


def test_blockwise_flow_within_domain():
    """Piecewise-constant flow (the adversarial local-spread case) within
    the kernel's documented per-group spread budget."""
    h, w = 64, 256
    img = _frames(1, h, w, 3)
    rng = np.random.default_rng(3)
    fl = np.repeat(
        np.repeat(
            rng.standard_normal((1, h // 8, w // 8, 2)).astype(np.float32)
            * 4.0,
            8,
            axis=1,
        ),
        8,
        axis=2,
    )
    _check(img, jnp.asarray(fl))


def test_custom_vjp_matches_xla():
    img = _frames(1, 64, 128, 3)
    rng = np.random.default_rng(4)
    fl = jnp.asarray(
        np.repeat(
            np.repeat(
                rng.standard_normal((1, 8, 16, 2)).astype(np.float32) * 2,
                8,
                axis=1,
            ),
            8,
            axis=2,
        )
    )

    gk = jax.grad(
        lambda i, f: jnp.sum(warp_pallas(i, f, 1.0, 1.0, True) ** 2),
        argnums=(0, 1),
    )(img, fl)
    gx = jax.grad(
        lambda i, f: jnp.sum(_warp_xla(i, f, 1.0, 1.0) ** 2), argnums=(0, 1)
    )(img, fl)
    np.testing.assert_allclose(gk[0], gx[0], atol=1e-3)
    np.testing.assert_allclose(gk[1], gx[1], atol=1e-3)


def test_routing_flag(monkeypatch):
    """TPUVC_WARP=xla forces the gather path regardless of backend."""
    import importlib

    warp_mod = importlib.import_module("tpuvc.ops.warp")

    img = _frames(1, 128, 256, 3)
    monkeypatch.setenv("TPUVC_WARP", "xla")
    assert not warp_mod._use_pallas(img)
    monkeypatch.setenv("TPUVC_WARP", "pallas")
    assert warp_mod._use_pallas(img)
    # small frames never route to the kernel
    assert not warp_mod._use_pallas(_frames(1, 32, 32, 3))


def test_zero_pad_sampling_matches_xla():
    """The deformable conv's Pallas tap-sampling (1-px zero ring trick)
    must match the XLA zero-padding sampler exactly."""
    from tpuvc.ops.deform import _warp_zero_pad, _warp_zero_pallas

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((2, 48, 128, 4), np.float32))
    fl = jnp.asarray(
        (rng.random((2, 48, 128, 2), np.float32) - 0.5) * 8.0
        + np.asarray([30.0, -9.0], np.float32)  # partly out of frame
    )
    out_k = _warp_zero_pallas(img, fl, interpret=True)
    out_x = _warp_zero_pad(img, fl)
    np.testing.assert_allclose(out_k, out_x, atol=ATOL)


@pytest.mark.slow
def test_zero_pad_sampling_channel_chunking():
    from tpuvc.ops.deform import _warp_zero_pad, _warp_zero_pallas

    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.random((1, 48, 128, 12), np.float32))  # > cap 8
    fl = jnp.full((1, 48, 128, 2), -3.3, jnp.float32)
    out_k = _warp_zero_pallas(img, fl, interpret=True)
    out_x = _warp_zero_pad(img, fl)
    np.testing.assert_allclose(out_k, out_x, atol=ATOL)


@pytest.mark.slow
def test_wide_channel_chunking():
    """warp_pallas_chunked splits C > MAX_CHANNELS into kernel-width slices
    sharing the flow; must match the XLA gather path (incl. a ragged tail)."""
    from tpuvc.ops.warp_pallas import warp_pallas_chunked

    rng = np.random.default_rng(9)
    img = _frames(1, 128, 256, 19, seed=9)  # 2 full chunks + 3-wide tail
    fl = jnp.asarray(
        (2.5 * rng.standard_normal((1, 128, 256, 2))).astype(np.float32)
    )
    out_k = warp_pallas_chunked(img, fl, 1.0, 1.0, True)
    out_x = _warp_xla(img, fl, 1.0, 1.0)
    np.testing.assert_allclose(out_k, out_x, atol=ATOL)


def test_routing_wide_channels(monkeypatch):
    """Wide-channel warps route to the kernel only at full-res pixel counts
    (>= 1M px); sub-res pyramid warps stay on XLA where gathers win."""
    import importlib

    warp_mod = importlib.import_module("tpuvc.ops.warp")

    monkeypatch.setenv("TPUVC_WARP", "pallas")
    # 1088x1920 = 2.1M px: wide channels eligible
    assert warp_mod._use_pallas(jnp.zeros((1, 1088, 1920, 48), jnp.float32))
    # 544x960 = 0.52M px: wide channels stay on XLA...
    assert not warp_mod._use_pallas(jnp.zeros((1, 544, 960, 64), jnp.float32))
    # ...but narrow channels still route
    assert warp_mod._use_pallas(jnp.zeros((1, 544, 960, 3), jnp.float32))
