"""Reproduce the v4 1080p enc/dec mismatch on ONE level chunk, using the
REAL coder methods (encode_level_batch_async -> decode_level_batch), then
localize: decoded offset heads vs encoder outs, residues vs res outs,
x_comp, recon.

    python scripts/debug_v4_chunk.py [--hw 1088x1920] [--batch 2]
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
    if np.array_equal(a, b):
        print(f"{name}: exact", flush=True)
        return True
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    idx = np.unravel_index(np.argmax(d), d.shape)
    print(
        f"{name}: MISMATCH n={int((d > 0).sum())}/{d.size} "
        f"max={d.max():.6g} at {idx}", flush=True,
    )
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", default="1088x1920")
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()
    h, w = (int(s) for s in args.hw.split("x"))

    from tpuvc.coder.container import VFrameBitstream
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

    resolve, x_hat_enc = coder.encode_level_batch_async(
        xref1, xref2, xcur, s=1.0, scale1=0.5, scale2=0.5, down_ratio=1
    )
    bits = resolve()
    parsed = [VFrameBitstream.deserialize(b.serialize()) for b in bits]
    x_hat_dec = coder.decode_level_batch(xref1, xref2, parsed)
    if cmp("x_hat", x_hat_enc, x_hat_dec):
        print("no repro at this shape")
        return
    del x_hat_enc, x_hat_dec

    # localize: replay both sides' stages
    b0 = parsed[0]
    s = b0.s_milli / 1000.0
    s1, s2 = b0.scale1_centi / 100.0, b0.scale2_centi / 100.0
    n = 1 + 2 * len(coder.model.groups)
    cond, offset_temp, flows, fref1, fref2 = coder._context(
        coder.variables, xref1, xref2, s1, s2, int(b0.down_ratio)
    )
    off_streams = [list(b.streams[:n]) for b in parsed]
    heads = coder.offset_coder.decompress_batch(
        off_streams, b0.z_shape, cond, offset_temp, s
    )
    # re-run the encode side (deterministic) for comparison
    fcur = coder._features(coder.variables, xcur)
    inputs = tuple(
        jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
    )
    off = coder.offset_coder.compress_batch(inputs, cond, offset_temp, s)
    for k in range(3):
        cmp(f"heads[{k}]", off["outs"][k], heads[k])
    # stream identity between the async-resolved container and a fresh
    # sync compress
    for j in range(B):
        for k, (sa, sb) in enumerate(zip(off["streams"][j], off_streams[j])):
            if sa != sb:
                print(f"stream[{j}][{k}]: DIFFERENT "
                      f"({len(sa)} vs {len(sb)} bytes)", flush=True)

    x_comp_e = coder._fuse(coder.variables, off["outs"], fref1, fref2, flows)
    x_comp_d = coder._fuse(coder.variables, heads, fref1, fref2, flows)
    for k in range(3):
        cmp(f"x_comp[{k}]", x_comp_e[k], x_comp_d[k])
    del off, heads

    # --- residual side ---
    res_temp = coder._res_cond(coder.variables, x_comp_d)
    res_inputs = tuple(
        jnp.concatenate([f, xc], axis=-1) for f, xc in zip(fcur, x_comp_d)
    )
    res = coder.res_coder.compress_batch(res_inputs, x_comp_d, res_temp, s)
    res_streams = [list(b.streams[n:]) for b in parsed]
    for j in range(B):
        for k, (sa, sb) in enumerate(zip(res["streams"][j], res_streams[j])):
            if sa != sb:
                print(f"res stream[{j}][{k}]: DIFFERENT "
                      f"({len(sa)} vs {len(sb)} bytes)", flush=True)
    residues = coder.res_coder.decompress_batch(
        res_streams, b0.z_shape, x_comp_d, res_temp, s
    )
    for k in range(3):
        cmp(f"residues[{k}]", res["outs"][k], residues[k])
    x_full_e = tuple(xc + r for xc, r in zip(x_comp_d, res["outs"]))
    x_full_d = tuple(xc + r for xc, r in zip(x_comp_d, residues))
    r_e = coder._recon(coder.variables, *x_full_e)
    r_d = coder._recon(coder.variables, *x_full_d)
    cmp("recon(enc res) vs recon(dec res)", r_e, r_d)


if __name__ == "__main__":
    main()
