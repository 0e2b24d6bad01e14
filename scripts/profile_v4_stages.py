"""Per-stage 1080p timing of the FlowGuidedB (v4) forward.

Each stage is jitted separately with representative inputs produced by the
preceding stages, so kernel/routing changes can be judged per stage (the
full-forward number hides which of flow / features / offset codec /
offset-diversity deform / residual codec / reconstructor moved).

Run alone: concurrent processes time-share the one relay chip and corrupt
every timing in flight.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    ),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from tpuvc.models.flowguided_b import FlowGuidedB
from tpuvc.ops.precision import mixed_precision

H, W = 1088, 1920
ITERS = 4
S1, S2 = 0.5, -0.5


def timed(name, fn, *args):
    out = fn(*args)
    # block_until_ready does not block through the axon relay: force the
    # warmup (incl. compile) to completion by fetching a scalar.
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(ITERS):
        a1 = jax.tree_util.tree_map(lambda t: t + carry * 0.0, args[1])
        out = fn(args[0], a1, *args[2:])
        carry = jax.tree_util.tree_leaves(out)[0].ravel()[0]
    float(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1000:8.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    r1 = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    r2 = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    small = jnp.zeros((1, 192, 192, 3), jnp.float32)
    model = FlowGuidedB()
    v = model.init(
        jax.random.key(0), small, small, small, 0, S1, S2, 1, "dequantize"
    )

    def part(fn):
        @jax.jit
        def wrapped(v, *a):
            with mixed_precision():
                return model.apply(v, *a, method=fn)
        return wrapped

    flow_l1 = timed(
        "estimate_flow (down_ratio=1)",
        part(lambda m, r1, r2: m.estimate_flow(r1, r2, 1)), v, r1, r2,
    )

    feats = timed(
        "3x MSFeature",
        part(
            lambda m, r1, r2, x: (
                m.feature_extractor(r1),
                m.feature_extractor(r2),
                m.feature_extractor(x),
            )
        ),
        v, r1, r2, x,
    )
    fref1, fref2, fcur = feats

    def warps_fn(m, fref1, fref2, flow_l1):
        out1 = m.warped_refs_at_layer(fref1[0], fref2[0], flow_l1, S1, S2)
        out2 = m.warped_refs_at_layer(fref1[1], fref2[1], out1[4], S1, S2)
        out3 = m.warped_refs_at_layer(fref1[2], fref2[2], out2[4], S1, S2)
        return out1, out2, out3

    w1, w2, w3 = timed(
        "3-scale warp pyramid", part(warps_fn), v, fref1, fref2, flow_l1
    )

    def cond_of(wl, f1, f2):
        return jnp.concatenate([wl[2], wl[3], f1, f2], axis=-1)

    cond = (
        cond_of(w1, fref1[0], fref2[0]),
        cond_of(w2, fref1[1], fref2[1]),
        cond_of(w3, fref1[2], fref2[2]),
    )
    inputs = tuple(
        jnp.concatenate([c, f], axis=-1) for c, f in zip(cond, fcur)
    )

    def off_codec_fn(m, inputs, cond):
        temp = m.offset_temporal_conditioner(*cond)
        return m.offset_compressor(
            inputs, cond, temp, 0, mode="dequantize", rng=None
        )

    offr = timed("offset codec (temp+fwd)", part(off_codec_fn), v, inputs, cond)
    outs = (offr["out1"], offr["out2"], offr["out3"])

    def fuse_fn(m, outs, fref1, fref2, w1, w2, w3):
        def fuse(div, head, f1, f2, fl1, fl2):
            o1, o2 = jnp.split(head, 2, axis=-1)
            return div(f1, o1, fl1, f2, o2, fl2)

        return (
            fuse(m.offset_diversity_l1, outs[0], fref1[0], fref2[0], w1[0], w1[1]),
            fuse(m.offset_diversity_l2, outs[1], fref1[1], fref2[1], w2[0], w2[1]),
            fuse(m.offset_diversity_l3, outs[2], fref1[2], fref2[2], w3[0], w3[1]),
        )

    comp = timed(
        "offset-diversity deform x3", part(fuse_fn), v, outs, fref1, fref2,
        w1, w2, w3,
    )

    def res_fn(m, comp, fcur):
        temp = m.residue_temporal_conditioner(*comp)
        res_inputs = tuple(
            jnp.concatenate([f, xc], axis=-1) for f, xc in zip(fcur, comp)
        )
        res = m.residual_compressor(
            res_inputs, comp, temp, 0, mode="dequantize", rng=None
        )
        return m.reconstructor(
            comp[0] + res["out1"], comp[1] + res["out2"], comp[2] + res["out3"]
        )

    timed("residual codec + reconstructor", part(res_fn), v, comp, fcur)

    @jax.jit
    def full(v, r1, r2, x):
        with mixed_precision():
            out = model.apply(v, r1, r2, x, 0, S1, S2, 1, "dequantize")
        return out["x_hat"], out["size"]

    timed("FULL forward", full, v, r1, r2, x)


if __name__ == "__main__":
    main()
