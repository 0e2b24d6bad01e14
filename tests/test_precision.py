"""Mixed-precision policy (tpuvc.ops.precision): bf16 layer compute.

The policy must (a) leave float32 activations/params untouched outside the
conv kernels, (b) produce reconstructions close to the float32 path, and
(c) preserve the determinism that real-bitstream coding relies on: two
traces under the same policy produce identical latents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuvc.models.layers import Conv, GDN
from tpuvc.models.lhbdc import LHBDC
from tpuvc.ops import precision


def test_policy_default_off():
    assert precision.compute_dtype() is None
    with precision.mixed_precision():
        assert precision.compute_dtype() == jnp.bfloat16
    assert precision.compute_dtype() is None


def test_conv_output_dtype_stays_f32():
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    conv = Conv(8, kernel=3)
    v = conv.init(jax.random.key(0), x)
    with precision.mixed_precision():
        y = conv.apply(v, x)
    assert y.dtype == jnp.float32
    y32 = conv.apply(v, x)
    np.testing.assert_allclose(y, y32, atol=0.05)


def test_gdn_close_to_f32():
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 16), jnp.float32)
    gdn = GDN()
    v = gdn.init(jax.random.key(0), x)
    y32 = gdn.apply(v, x)
    with precision.mixed_precision():
        y16 = gdn.apply(v, x)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(y16, y32, atol=0.05, rtol=0.05)


@pytest.fixture(scope="module")
def lhbdc_small():
    model = LHBDC(N=32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, x, x, "dequantize")
    return model, variables


def test_lhbdc_forward_under_policy(lhbdc_small):
    model, variables = lhbdc_small
    # Smooth frames: tiny bf16 flow perturbations then move pixel values only
    # slightly (white-noise frames would make the warp comparison chaotic).
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    frames = [
        jnp.asarray(
            np.stack(
                [np.sin(3 * xx + 0.1 * i), np.cos(2 * yy - 0.1 * i), xx * yy],
                axis=-1,
            )[None]
            * 0.5
            + 0.5
        )
        for i in range(3)
    ]

    out32 = model.apply(variables, *frames, "dequantize")
    with precision.mixed_precision():
        out16 = model.apply(variables, *frames, "dequantize")
        out16b = model.apply(variables, *frames, "dequantize")

    assert out16["x_hat"].dtype == jnp.float32
    assert np.isfinite(float(out16["rate"]))
    # bf16 conv compute perturbs the reconstruction only slightly
    assert float(jnp.abs(out16["x_hat"] - out32["x_hat"]).mean()) < 0.05
    # deterministic: same trace twice -> bit-identical output
    np.testing.assert_array_equal(out16["x_hat"], out16b["x_hat"])


def test_policy_is_trace_time(lhbdc_small):
    """A jitted function traced under the policy keeps it; tracing outside
    does not pick it up retroactively."""
    model, variables = lhbdc_small
    x = jnp.full((1, 64, 64, 3), 0.5, jnp.float32)

    calls = []

    def fwd(v, a, b, c):
        calls.append(precision.compute_dtype())
        return model.apply(v, a, c, b, "dequantize")["x_hat"]

    jfwd = jax.jit(fwd)
    with precision.mixed_precision():
        jfwd(variables, x, x, x)
    assert calls == [jnp.bfloat16]


def test_policy_propagates_to_async_workers(lhbdc_small):
    """Enc/dec bit-identity under bf16 when the DECODER's shared graphs
    first-trace on an async worker thread.

    decode_v's pipelined entropy decode runs ``decompress_batch`` on the
    async pool; in a fresh decoder process that is the FIRST call of the
    shared ``_params_idx`` graph. The policy is a contextvar read at trace
    time, so the pool must run tasks under the submitter's context — a
    bare worker would trace f32 against the encoder's bf16 program and
    desync the rANS decode (tpuvc.coder.parallel._CtxPool)."""
    from tpuvc.models.lhbdc import LHBDCCoder

    model, variables = lhbdc_small
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    frames = [
        jnp.asarray(
            np.stack(
                [np.sin(3 * xx + 0.1 * i), np.cos(2 * yy - 0.1 * i), xx * yy],
                axis=-1,
            )[None]
            * 0.5
            + 0.5
        )
        for i in range(3)
    ]
    ref1 = jnp.concatenate([frames[0], frames[0]], axis=0)
    ref2 = jnp.concatenate([frames[2], frames[2]], axis=0)
    cur = jnp.concatenate([frames[1], frames[1]], axis=0)

    with precision.mixed_precision():
        from tpuvc.coder.parallel import async_pool, host_pool

        # The direct contract: pool tasks run under the submitter's
        # context (a bare ThreadPoolExecutor returns None here).
        assert (
            async_pool().submit(precision.compute_dtype).result()
            == jnp.bfloat16
        )
        assert (
            host_pool().submit(precision.compute_dtype).result()
            == jnp.bfloat16
        )
        enc = LHBDCCoder(model, variables)
        bitstreams, x_hat_enc = enc.encode_level_batch(ref1, cur, ref2)
        # Fresh coder = fresh jit wrappers, like the decode_v process: the
        # worker-side decompress is the first trace of its shared graphs.
        dec = LHBDCCoder(model, variables)
        fut = dec.decode_level_batch_async(bitstreams)
        x_hat_dec = fut(ref1, ref2)
    np.testing.assert_array_equal(
        np.asarray(x_hat_enc), np.asarray(x_hat_dec)
    )
