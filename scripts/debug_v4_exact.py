"""Bisect the v4 1080p enc/dec bit-exactness failure (bench_families).

Mirrors FlowGuidedBCoder.encode_level_batch / decode_level_batch stage by
stage at the failing shape and reports the FIRST diverging intermediate:
z symbols, per-group quantized latents, y_hat, synthesis heads, fused
maps, residual path, recon.

    python scripts/debug_v4_exact.py [--hw 1088x1920] [--batch 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def cmp(name, a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        print(f"{name}: SHAPE {a.shape} vs {b.shape}")
        return False
    eq = np.array_equal(a, b)
    if eq:
        print(f"{name}: exact")
        return True
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    idx = np.unravel_index(np.argmax(d), d.shape)
    print(
        f"{name}: MISMATCH n={int((d > 0).sum())}/{d.size} "
        f"max={d.max():.6g} at {idx} (a={a[idx]}, b={b[idx]})"
    )
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", default="1088x1920")
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()
    h, w = (int(s) for s in args.hw.split("x"))

    from tpuvc.models.flowguided_b import FlowGuidedB, FlowGuidedBCoder

    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    model = FlowGuidedB()
    variables = model.init(
        jax.random.key(0), small, small, small, 0, 0.5, -0.5, 1, "dequantize"
    )
    coder = FlowGuidedBCoder(model, variables)

    rng = np.random.default_rng(0)
    base = rng.random((h, w, 3), dtype=np.float32)
    drift = (0.01 * rng.standard_normal((h, w, 3))).astype(np.float32)
    fr = [
        jnp.asarray(np.clip(base + i * drift, 0, 1))[None] for i in range(3)
    ]
    B = args.batch
    xref1 = jnp.concatenate([fr[0]] * B, axis=0)
    xref2 = jnp.concatenate([fr[2]] * B, axis=0)
    xcur = jnp.concatenate([fr[1]] * B, axis=0)
    s, s1, s2, dr = 1.0, 0.5, 0.5, 1

    # ---------- encode side ----------
    cond, offset_temp, flows, fref1, fref2 = coder._context(
        coder.variables, xref1, xref2, s1, s2, dr
    )
    fcur = coder._features(coder.variables, xcur)
    inputs = tuple(
        jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
    )
    oc = coder.offset_coder
    off = oc.compress_batch(inputs, cond, offset_temp, s)
    streams = off["streams"]

    # ---------- decode-side CondELIC replay with comparisons ----------
    from tpuvc.coder import decode_with_indexes
    from tpuvc.entropy.quant import quantize

    # z
    y_enc, z_enc = oc._analysis(oc.variables, *inputs, s, None)
    med = jnp.asarray(oc.z_tables.medians)
    z_sym_enc = np.asarray(quantize(z_enc, "symbols16", means=med))
    zh, zw = off["z_shape"]
    zc = oc.module.N
    z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32), (zh, zw, zc))
    z_sym_dec = np.stack([
        decode_with_indexes(
            f[0], z_idx, oc.z_tables.cdfs, oc.z_tables.cdf_lengths,
            oc.z_tables.offsets,
        ).reshape(zh, zw, zc)
        for f in streams
    ])
    cmp("z symbols", z_sym_enc, z_sym_dec)

    z_hat_enc = jnp.asarray(z_sym_enc, jnp.float32) + med
    z_hat_dec = jnp.asarray(z_sym_dec, jnp.float32) + med
    hyper_enc = oc._hyper(oc.variables, z_hat_enc, offset_temp, s)
    hyper_dec = oc._hyper(oc.variables, z_hat_dec, offset_temp, s)
    cmp("hyper", hyper_enc, hyper_dec)

    # groups: replay decode with streams, compare per-group y_hat against
    # a re-run of the encode-side group coding
    groups_enc = []
    groups_dec = []
    start = 0
    for i, g in enumerate(oc.module.groups):
        curr_y = y_enc[..., start : start + g]
        start += g
        prev_e = (
            jnp.concatenate(groups_enc, axis=-1)
            if i else jnp.zeros(hyper_enc.shape[:3] + (0,), jnp.float32)
        )
        prev_d = (
            jnp.concatenate(groups_dec, axis=-1)
            if i else jnp.zeros(hyper_dec.shape[:3] + (0,), jnp.float32)
        )
        g_enc, _ = oc._code_group(
            i, curr_y, hyper_enc, prev_e, per_sample=True
        )
        a_strs = [f[1 + 2 * i] for f in streams]
        n_strs = [f[2 + 2 * i] for f in streams]
        g_dec, _ = oc._code_group(
            i, None, hyper_dec, prev_d, streams=[a_strs, n_strs],
            per_sample=True,
        )
        cmp(f"group {i} y_hat", g_enc, g_dec)
        groups_enc.append(g_enc)
        groups_dec.append(g_dec)

    y_hat_enc = jnp.concatenate(groups_enc, axis=-1)
    y_hat_dec = jnp.concatenate(groups_dec, axis=-1)
    heads_enc = oc._synthesis(oc.variables, y_hat_enc, *cond, s)
    heads_dec = oc._synthesis(oc.variables, y_hat_dec, *cond, s)
    for k in range(3):
        cmp(f"heads[{k}]", heads_enc[k], heads_dec[k])
        cmp(f"off.outs[{k}] vs heads_dec[{k}]", off["outs"][k], heads_dec[k])

    x_comp_e = coder._fuse(coder.variables, off["outs"], fref1, fref2, flows)
    x_comp_d = coder._fuse(coder.variables, heads_dec, fref1, fref2, flows)
    for k in range(3):
        cmp(f"x_comp[{k}]", x_comp_e[k], x_comp_d[k])


if __name__ == "__main__":
    main()
