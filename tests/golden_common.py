"""Shared fixtures for the golden-value numerics regression suite.

One place defines the tiny fixed-seed models, the fixed inputs, and the
record computation; both the generator (scripts/gen_golden.py) and the
test (tests/test_golden.py) import it, so the two can never drift apart.

These are the only tests asserting ABSOLUTE numeric constants (exact
stream bytes via sha256, bits, PSNR): they lock enc/dec numerics across
refactors without needing trained weights or datasets (SURVEY.md 4(b);
VERDICT round 1, Missing #1). Streams must be byte-identical run to run
on a fixed backend; fixtures are generated on the CPU backend
(scripts/gen_golden.py forces it) so the suite's conftest environment
reproduces them anywhere.
"""

from __future__ import annotations

import hashlib


def _rng(seed=7):
    import numpy as np

    return np.random.default_rng(seed)


def _frames(shape=(1, 64, 64, 3), drift_scale=0.04, seed=7):
    import jax.numpy as jnp
    import numpy as np

    rng = _rng(seed)
    base = rng.random(shape, dtype=np.float32)
    drift = drift_scale * rng.standard_normal(shape).astype(np.float32)
    x1 = jnp.asarray(base)
    xc = jnp.clip(jnp.asarray(base + 0.5 * drift), 0, 1)
    x2 = jnp.clip(jnp.asarray(base + drift), 0, 1)
    return x1, xc, x2


def _psnr(a, b):
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def _record(blob: bytes, x_hat, x_ref) -> dict:
    return {
        "stream_sha256": hashlib.sha256(blob).hexdigest(),
        "stream_len": len(blob),
        "psnr": round(_psnr(x_hat, x_ref), 4),
    }


def golden_lhbdc() -> dict:
    import jax
    import jax.numpy as jnp

    from tpuvc.models.lhbdc import LHBDC, LHBDCCoder

    model = LHBDC(N=32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(11), x, x, x, "dequantize")
    coder = LHBDCCoder(model, variables)
    x1, xc, x2 = _frames()
    bits, x_hat = coder.encode_recon(x1, xc, x2, rate_id=845)
    blob = bits.serialize()
    dec = coder.decode(x1, x2, type(bits).deserialize(blob))
    assert jnp.array_equal(dec, x_hat), "decode != encoder recon"
    return _record(blob, x_hat, xc)


def golden_flexrate() -> dict:
    import jax
    import jax.numpy as jnp

    from tpuvc.models.flexrate import BidirFlowRef, FlexRateCoder

    model = BidirFlowRef(N=32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(12), x, x, x, 0, 1.0, "dequantize")
    coder = FlexRateCoder(model, variables)
    x1, xc, x2 = _frames(seed=8)
    bits, x_hat = coder.encode_recon(x1, xc, x2, n=1, l=0.5)
    blob = bits.serialize()
    dec = coder.decode(x1, x2, type(bits).deserialize(blob))
    assert jnp.array_equal(dec, x_hat), "decode != encoder recon"
    return _record(blob, x_hat, xc)


def golden_deform_b() -> dict:
    import jax
    import jax.numpy as jnp

    from tpuvc.models.deform_b import DeformB, DeformBCoder

    model = DeformB(
        feature_channels=(8, 16, 24), N=32, M=32, levels=3,
        groups=(4, 4, 8, 16),
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(13), x, x, x, 1, "dequantize")
    coder = DeformBCoder(model, variables)
    x1, xc, x2 = _frames(seed=9)
    bits, x_hat = coder.encode_recon(x1, x2, xc, s=1.0)
    blob = bits.serialize()
    dec = coder.decode(x1, x2, type(bits).deserialize(blob))
    assert jnp.array_equal(dec, x_hat), "decode != encoder recon"
    return _record(blob, x_hat, xc)


def golden_flowguided_b() -> dict:
    import jax
    import jax.numpy as jnp

    from tpuvc.models.flowguided_b import FlowGuidedB, FlowGuidedBCoder

    model = FlowGuidedB(
        feature_channels=(16, 32, 48), N=32, M=32, levels=3,
        groups=(4, 4, 8, 16),
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.key(14), x, x, x, 1, 0.5, -0.5, 1, "dequantize"
    )
    coder = FlowGuidedBCoder(model, variables)
    x1, xc, x2 = _frames(seed=10)
    bits, x_hat = coder.encode_recon(
        x1, x2, xc, s=1.0, scale1=0.5, scale2=-0.5
    )
    blob = bits.serialize()
    dec = coder.decode(x1, x2, type(bits).deserialize(blob))
    assert jnp.array_equal(dec, x_hat), "decode != encoder recon"
    return _record(blob, x_hat, xc)


def golden_dmc() -> dict:
    import jax
    import jax.numpy as jnp

    from tpuvc.models.dmc import PFrameDMC, PFrameDMCCoder

    model = PFrameDMC(feat=16, N=32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    dpb = {"ref_frame": x, "ref_feature": None, "ref_down_ratio": 1.0}
    variables = model.init(jax.random.key(15), x, dpb, 1.0, "dequantize")
    coder = PFrameDMCCoder(model, variables)
    ref, xc, _ = _frames((1, 128, 128, 3), seed=11)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_down_ratio": 1.0}
    bits, enc_dpb = coder.encode(xc, dpb, ratio=1.0, q=0.5)
    blob = bits.serialize()
    x_hat, dec_dpb = coder.decode(dpb, type(bits).deserialize(blob))
    assert jnp.array_equal(
        dec_dpb["ref_frame"], enc_dpb["ref_frame"]
    ), "decode != encoder recon"
    return _record(blob, dec_dpb["ref_frame"], xc)


def golden_elic() -> dict:
    import hashlib

    import jax
    import jax.numpy as jnp

    from tpuvc.models.elic import ELIC, ELICCoder

    model = ELIC(N=32, M=48, groups=(4, 4, 8, 32))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(16), x, "dequantize")
    coder = ELICCoder(model, variables)
    xc = _frames(seed=12)[1]
    out = coder.compress(xc)
    y_strings, z_string = out["strings"]
    h = hashlib.sha256()
    for s in list(y_strings) + [z_string]:
        h.update(len(s).to_bytes(4, "little"))
        h.update(s)
    x_dec = coder.decompress(out["strings"], out["shape"])
    assert jnp.array_equal(
        x_dec, coder.synthesize(out["y_hat"])
    ), "decompress != encoder-side synthesis"
    x_hat = jnp.clip(x_dec, 0.0, 1.0)
    total = sum(len(s) for s in list(y_strings) + [z_string])
    return {
        "stream_sha256": h.hexdigest(),
        "stream_len": total,
        "psnr": round(_psnr(x_hat, xc), 4),
    }


def golden_lhbdc_mid() -> dict:
    """LHBDC at 256x384: past the Pallas routing thresholds
    (ops.deform._use_pallas_sampling / ops.warp gating), so the TPU-backend
    fixture locks the band-kernel warp numerics that the 64x64 cases never
    reach. On CPU this runs the XLA gather path (fixtures differ per
    backend file, tests compare like for like)."""
    import jax
    import jax.numpy as jnp

    from tpuvc.models.lhbdc import LHBDC, LHBDCCoder

    model = LHBDC(N=32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(11), x, x, x, "dequantize")
    coder = LHBDCCoder(model, variables)
    x1, xc, x2 = _frames((1, 256, 384, 3), seed=13)
    bits, x_hat = coder.encode_recon(x1, xc, x2, rate_id=845)
    blob = bits.serialize()
    dec = coder.decode(x1, x2, type(bits).deserialize(blob))
    assert jnp.array_equal(dec, x_hat), "decode != encoder recon"
    return _record(blob, x_hat, xc)


def golden_cond_elic() -> dict:
    """CondELICCoder (checkerboard + gains + prior fusion) directly, at a
    size small enough to compile in the fast tier: the v3/v4 full-model
    golden cases are slow-tier, and r3's encode-path rewrite (async host
    phases) showed this coder needs a byte-exact guard that runs on every
    fast `pytest` invocation (ADVICE r3)."""
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuvc.models.cond_elic import CondELIC, CondELICCoder

    model = CondELIC(
        head_channels=(8, 8, 8), N=16, M=16, levels=3, groups=(4, 4, 8)
    )
    rng = _rng(14)

    def feat(h, w, c, scale=1.0):
        return jnp.asarray(
            (scale * rng.standard_normal((1, h, w, c))).astype(np.float32)
        )

    inputs = (feat(32, 32, 8), feat(16, 16, 8), feat(8, 8, 8))
    conds = (feat(32, 32, 8), feat(16, 16, 8), feat(8, 8, 8))
    tc = feat(4, 4, 16, scale=0.3)
    variables = model.init(
        jax.random.key(17), inputs, conds, tc, 1, "dequantize"
    )
    coder = CondELICCoder(model, variables)
    out = coder.compress(inputs, conds, tc, s=1.0)
    streams = [out["streams"][0]] + [
        s for pair in out["streams"][1:] for s in ([pair] if isinstance(pair, bytes) else pair)
    ]
    h = hashlib.sha256()
    for s in streams:
        h.update(len(s).to_bytes(4, "little"))
        h.update(s)
    dec = coder.decompress(
        out["streams"], out["z_shape"], conds, tc, s=1.0
    )
    for a, b in zip(dec, out["outs"]):
        assert jnp.array_equal(a, b), "decompress != encoder-side outs"
    total = sum(len(s) for s in streams)
    # PSNR slot: out1 vs zeros is meaningless; record out1's rms as the
    # drift scalar instead (same 1e-3 tolerance applies).
    rms = float(np.sqrt(np.mean(np.asarray(dec[0], np.float64) ** 2)))
    return {
        "stream_sha256": h.hexdigest(),
        "stream_len": total,
        "psnr": round(rms, 4),
    }


def golden_kernel_uniform() -> dict:
    """Direct kernel coverage of the row-uniform fast paths (ADVICE r4):
    deform_sample_accum on the integer 3x3 tap grid plus a mixed
    uniform/jittered field, and warp_pallas on a constant fractional
    flow — the regimes the full-model cases (random-init fractional
    offsets) essentially never hit. On the TPU backend this locks the
    HARDWARE lowering of the uniform paths (dynamic sublane rolls,
    2-tile lane rolls); on CPU it runs the interpreter. The record hashes
    the raw output bytes; the psnr slot carries max-abs-diff vs the XLA
    reference formulation (must stay ~1e-5)."""
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuvc.ops.deform import _warp_zero_pad
    from tpuvc.ops.deform_pallas import deform_sample_accum
    from tpuvc.ops.warp_pallas import _warp_xla, warp_pallas

    interp = jax.default_backend() not in ("tpu", "axon")
    rng = _rng(21)
    B, H, W, C, Og = 1, 32, 384, 2, 2
    img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    grid = [(float(dx), float(dy)) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    T = len(grid)
    f = np.broadcast_to(
        np.array(grid, np.float32).reshape(1, T, 1, 1, 2), (B, T, H, W, 2)
    ).copy()
    # right half jittered: uniform and walk paths in one call
    f[:, :, :, W // 2:, :] += (
        rng.random((B, T, H, W // 2, 2), dtype=np.float32) - 0.5
    ) * 5.0
    flows = jnp.asarray(f)
    masks = jnp.asarray(rng.random((B, T, H, W), dtype=np.float32))
    weights = jnp.asarray(
        rng.standard_normal((T, C, Og), dtype=np.float32)
    )
    out_d = deform_sample_accum(img, flows, masks, weights, interpret=interp)
    ref_d = 0.0
    for t in range(T):
        s = _warp_zero_pad(img, flows[:, t]) * masks[:, t][..., None]
        ref_d = ref_d + jnp.einsum("bhwc,co->bhwo", s, weights[t])

    img3 = jnp.asarray(rng.random((1, 32, 384, 3), dtype=np.float32))
    wflow = jnp.broadcast_to(
        jnp.asarray([5.6, -3.3], jnp.float32), (1, 32, 384, 2)
    )
    out_w = warp_pallas(img3, wflow, 1.0, 1.0, interp)
    ref_w = _warp_xla(img3, wflow, 1.0, 1.0)

    blob = np.asarray(out_d).tobytes() + np.asarray(out_w).tobytes()
    max_abs = max(
        float(jnp.max(jnp.abs(out_d - ref_d))),
        float(jnp.max(jnp.abs(out_w - ref_w))),
    )
    return {
        "stream_sha256": hashlib.sha256(blob).hexdigest(),
        "stream_len": len(blob),
        "psnr": round(max_abs, 6),  # max-abs vs XLA reference, not a PSNR
    }


CASES = {
    "lhbdc": golden_lhbdc,
    "cond_elic": golden_cond_elic,
    "kernel_uniform": golden_kernel_uniform,
    "lhbdc_mid": golden_lhbdc_mid,
    "flexrate": golden_flexrate,
    "deform_b": golden_deform_b,
    "flowguided_b": golden_flowguided_b,
    "dmc": golden_dmc,
    "elic": golden_elic,
}
