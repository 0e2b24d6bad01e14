"""Fused multi-tap deformable sampling kernel vs the tap-unrolled reference.

Runs the Pallas kernel in interpreter mode (CPU) against the XLA
formulation used by tpuvc.ops.deform's fallback path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.ops.deform import _warp_zero_pad, deform_conv2d
from tpuvc.ops.deform_pallas import deform_sample_accum


def _reference(img, flows, masks, weights):
    """Direct tap-unrolled computation of deform_sample_accum's contract."""
    B, T, H, W, _ = flows.shape
    G = weights.shape[0] if weights.ndim == 4 else 1
    w4 = weights if weights.ndim == 4 else weights[None]
    outs = []
    for b in range(B):
        g = b % G
        acc = 0.0
        for t in range(T):
            s = _warp_zero_pad(img[b : b + 1], flows[b : b + 1, t])
            s = s * masks[b : b + 1, t][..., None]
            acc = acc + jnp.einsum("bhwc,co->bhwo", s, w4[g, t])
        outs.append(acc)
    return jnp.concatenate(outs, axis=0)


class TestDeformSampleAccum:
    @pytest.mark.parametrize("spread", [1.5, 12.0])
    def test_matches_reference(self, rng, spread):
        B, H, W, C, T, Og = 2, 24, 40, 3, 4, 2
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        flows = jnp.asarray(
            (rng.random((B, T, H, W, 2), dtype=np.float32) - 0.5) * 2 * spread
        )
        masks = jnp.asarray(rng.random((B, T, H, W), dtype=np.float32))
        weights = jnp.asarray(
            rng.standard_normal((T, C, Og), dtype=np.float32)
        )
        ref = _reference(img, flows, masks, weights)
        out = deform_sample_accum(img, flows, masks, weights, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_grouped_weights(self, rng):
        # batch items cycle through weight groups (b % G)
        B, H, W, C, T, Og, G = 4, 16, 32, 2, 3, 2, 2
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        flows = jnp.asarray(
            (rng.random((B, T, H, W, 2), dtype=np.float32) - 0.5) * 4
        )
        masks = jnp.asarray(rng.random((B, T, H, W), dtype=np.float32))
        weights = jnp.asarray(
            rng.standard_normal((G, T, C, Og), dtype=np.float32)
        )
        ref = _reference(img, flows, masks, weights)
        out = deform_sample_accum(img, flows, masks, weights, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_multi_tile_ramp(self, rng):
        """Per-(group, lane-tile) walk ranges: a smooth offset field with a
        large GLOBAL vertical ramp across the width (3 lane tiles) must stay
        exact — the ramp spans more rows than LOCAL_H allows per tile, but
        each 8x128 patch's local union is small, which is precisely the
        regime the per-tile ranges were built for."""
        B, H, W, C, T, Og = 1, 32, 384, 2, 3, 2
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        # smooth local jitter (+-1.5) + a +-12 px dy ramp across the width
        coarse = rng.standard_normal((B, T, 4, 6, 2)).astype(np.float32)
        smooth = np.asarray(
            jax.image.resize(jnp.asarray(coarse), (B, T, H, W, 2), "bilinear")
        ) * 1.5
        ramp = np.linspace(-12.0, 12.0, W, dtype=np.float32)
        smooth[..., 1] += ramp[None, None, None, :]
        flows = jnp.asarray(smooth)
        masks = jnp.asarray(rng.random((B, T, H, W), dtype=np.float32))
        weights = jnp.asarray(
            rng.standard_normal((T, C, Og), dtype=np.float32)
        )
        ref = _reference(img, flows, masks, weights)
        out = deform_sample_accum(img, flows, masks, weights, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_row_uniform_integer_grid(self, rng):
        """Row-uniform fast path (uni_tap): a constant integer 3x3 tap
        grid — the zero-diversity floor — makes every (8x128) patch
        row-uniform, so ALL taps ride the direct-block-read path and the
        slab walk is skipped entirely. The per-pixel-random existing
        tests essentially never produce a row-uniform patch, so this is
        the only interpret-mode coverage of the kernel's primary serving
        regime (ADVICE r4)."""
        B, H, W, C, Og = 1, 32, 384, 2, 2
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        grid = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        T = len(grid)
        flows = jnp.asarray(
            np.broadcast_to(
                np.array(grid, np.float32).reshape(1, T, 1, 1, 2)[..., ::-1],
                (B, T, H, W, 2),
            ).copy()
        )  # (dx, dy) layout per deform_sample_accum's contract
        masks = jnp.asarray(rng.random((B, T, H, W), dtype=np.float32))
        weights = jnp.asarray(
            rng.standard_normal((T, C, Og), dtype=np.float32)
        )
        ref = _reference(img, flows, masks, weights)
        out = deform_sample_accum(img, flows, masks, weights, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_row_uniform_fractional(self, rng):
        """Constant FRACTIONAL per-tap offsets: still row-uniform (the
        integer sample row is constant per patch) but with nonzero fy/fx,
        exercising uni_tap's bilinear blend and the quad_uniform
        lane-roll column path on interior tiles."""
        B, H, W, C, Og = 1, 32, 384, 2, 2
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        consts = [(-1.3, 0.6), (0.4, -0.7), (1.6, 1.2)]
        T = len(consts)
        flows = jnp.asarray(
            np.broadcast_to(
                np.array(consts, np.float32).reshape(1, T, 1, 1, 2),
                (B, T, H, W, 2),
            ).copy()
        )
        masks = jnp.asarray(rng.random((B, T, H, W), dtype=np.float32))
        weights = jnp.asarray(
            rng.standard_normal((T, C, Og), dtype=np.float32)
        )
        ref = _reference(img, flows, masks, weights)
        out = deform_sample_accum(img, flows, masks, weights, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_row_uniform_mixed_field(self, rng):
        """Uniform left half + per-pixel-jittered right half in the SAME
        call: uniform patches take uni_tap (excluded from the walk
        union), jittered patches walk — the union/exclusion bookkeeping
        must keep both exact (ADVICE r4)."""
        B, H, W, C, Og, T = 1, 32, 384, 2, 2, 3
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        f = np.broadcast_to(
            np.array([(0.0, 1.0), (1.0, 0.0), (-1.0, -1.0)], np.float32
                     ).reshape(1, T, 1, 1, 2),
            (B, T, H, W, 2),
        ).copy()
        f[:, :, :, W // 2 :, :] += (
            rng.random((B, T, H, W // 2, 2), dtype=np.float32) - 0.5
        ) * 5.0
        flows = jnp.asarray(f)
        masks = jnp.asarray(rng.random((B, T, H, W), dtype=np.float32))
        weights = jnp.asarray(
            rng.standard_normal((T, C, Og), dtype=np.float32)
        )
        ref = _reference(img, flows, masks, weights)
        out = deform_sample_accum(img, flows, masks, weights, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_zero_pad_semantics(self, rng):
        # large uniform shift: everything sampled from outside is zero
        B, H, W, C, T, Og = 1, 16, 32, 1, 1, 1
        img = jnp.ones((B, H, W, C), jnp.float32)
        flows = jnp.full((B, T, H, W, 2), 100.0)
        masks = jnp.ones((B, T, H, W), jnp.float32)
        weights = jnp.ones((T, C, Og), jnp.float32)
        out = deform_sample_accum(img, flows, masks, weights, interpret=True)
        np.testing.assert_allclose(out, jnp.zeros_like(out), atol=1e-6)


class TestFusedDeformConvRoute:
    def test_fused_branch_matches_xla(self, rng, monkeypatch):
        """deform_conv2d's fused branch == its tap-unrolled XLA branch."""
        import tpuvc.ops.deform_pallas as dp

        from tpuvc.ops.deform import _deform_taps

        orig = dp.deform_sample_accum
        monkeypatch.setattr(
            dp, "deform_sample_accum",
            lambda *a, **k: orig(*a, **k, interpret=True),
        )

        B, H, W, C, G, K, C_out = 1, 24, 40, 8, 2, 3, 4
        x = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        offsets = jnp.asarray(
            (rng.random((B, H, W, G * K * K * 2), dtype=np.float32) - 0.5) * 6
        )
        masks = jnp.asarray(
            rng.random((B, H, W, G * K * K), dtype=np.float32)
        )
        weight = jnp.asarray(
            rng.standard_normal((K, K, C // G, C_out), dtype=np.float32) * 0.2
        )
        bias = jnp.asarray(rng.standard_normal(C_out, dtype=np.float32))

        ref = _deform_taps(
            x, offsets, masks, weight, bias, G, K,
            fused=False, force_xla=True,
        )
        out = _deform_taps(
            x, offsets, masks, weight, bias, G, K, fused=True
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_fused_chunked_channels_matches_xla(self, rng, monkeypatch):
        """Cg beyond the kernel cap folds the group channels chunk-minor
        into the kernel's batch/weight-group axis (ONE pallas_call,
        zero-padded tail chunk); the summed partial contractions match the
        tap-unrolled XLA result. Since r4's planar-channel kernel the cap
        is 16, so the v4 L2/L3 shapes (Cg=12/16) ride UNCHUNKED — both
        regimes are asserted here."""
        import tpuvc.ops.deform_pallas as dp

        from tpuvc.ops.deform import _deform_taps

        orig = dp.deform_sample_accum
        calls = []

        def spy(*a, **k):
            calls.append(a[0].shape)
            return orig(*a, **k, interpret=True)

        monkeypatch.setattr(dp, "deform_sample_accum", spy)

        B, H, W, C, G, K, C_out = 1, 24, 40, 24, 2, 3, 8  # Cg=12, Og=4
        x = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        offsets = jnp.asarray(
            (rng.random((B, H, W, G * K * K * 2), dtype=np.float32) - 0.5) * 6
        )
        masks = jnp.asarray(
            rng.random((B, H, W, G * K * K), dtype=np.float32)
        )
        weight = jnp.asarray(
            rng.standard_normal((K, K, C // G, C_out), dtype=np.float32) * 0.2
        )

        ref = _deform_taps(
            x, offsets, masks, weight, None, G, K,
            fused=False, force_xla=True,
        )
        out = _deform_taps(
            x, offsets, masks, weight, None, G, K, fused=True
        )
        # Cg=12 <= cap 16: one call, no chunk fold
        assert calls == [(1 * G, 24, 40, 12)]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

        # Cg=40 > cap: chunks ride the batch axis (B*G*nc), zero-padded
        calls.clear()
        C2, G2 = 40, 1
        x2 = jnp.asarray(rng.random((B, H, W, C2), dtype=np.float32))
        off2 = jnp.asarray(
            (rng.random((B, H, W, G2 * K * K * 2), dtype=np.float32) - 0.5)
            * 6
        )
        m2 = jnp.asarray(rng.random((B, H, W, G2 * K * K), dtype=np.float32))
        w2 = jnp.asarray(
            rng.standard_normal((K, K, C2 // G2, 4), dtype=np.float32) * 0.2
        )
        ref2 = _deform_taps(
            x2, off2, m2, w2, None, G2, K, fused=False, force_xla=True
        )
        out2 = _deform_taps(x2, off2, m2, w2, None, G2, K, fused=True)
        assert calls == [(1 * G2 * 3, 24, 40, 16)]
        np.testing.assert_allclose(out2, ref2, rtol=1e-4, atol=1e-4)
