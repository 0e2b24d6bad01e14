"""Per-scale timing of the v4 OffsetDiversity deform convs at 1080p.

Reproduces the three deform_conv2d call shapes of FlowGuidedB
(ICIP2024/src/model/m.py fusion stage; tpuvc/models/flowguided_b.py) and
sweeps the OFFSET FIELD STATISTICS that drive the fused kernel's slab-walk
cost, so kernel changes can be judged against the regimes that matter:

  field=white   per-pixel tanh(N(0,1))*amp — maximally non-smooth; the
                round-1/2 "spread" proxy. No conv-predicted offset field
                looks like this; it is the kernel's adversarial worst case.
  field=smooth  bilinear-upsampled coarse noise (correlation length ~64 px)
                * amp — the statistics of trained offset heads
                (tanh(pred)*magnitude with pred a conv output).
  field=ramp    smooth + a global flow ramp (+-ramp px vertical variation
                across the frame width) — models real flow fields where
                motion varies tens of px across 1080p. Exercises the
                per-(group, lane-tile) walk ranges: global variation must
                NOT inflate local walk cost.

amp is given as a fraction of each scale's OffsetDiversity magnitude
(helpers.py:35-69 bounds true offsets to tanh(.)*magnitude, so amp=1 is
the architecture's hard per-scale bound).

Usage: python scripts/profile_offdiv.py [--field white|smooth|ramp]
         [--amp 0.25] [--ramp 30] [--sweep]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from tpuvc.ops.deform import deform_conv2d
from tpuvc.ops.precision import mixed_precision

ITERS = 6
G = 16
K = 3

# (name, H, W, C_in(two refs), C_out, offset magnitude) — 1080p pyramid /2 /4 /8
SCALES = [
    ("L1", 544, 960, 128, 64, 40.0),
    ("L2", 272, 480, 192, 96, 20.0),
    ("L3", 136, 240, 256, 128, 10.0),
]


def timed(name, fn, *args, quiet=False):
    # force warm completion through the relay: block_until_ready does NOT
    # block on the axon backend (PERF.md measurement discipline) — fetch a
    # scalar instead.
    float(fn(*args).ravel()[0])
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(ITERS):
        out = fn(args[0] + carry * 0.0, *args[1:])
        carry = out.ravel()[0]
    float(carry)
    dt = (time.perf_counter() - t0) / ITERS
    if not quiet:
        print(f"{name:44s} {dt * 1000:8.1f} ms", flush=True)
    return dt


def offset_field(rng, H, W, nchan, amp_px, field, ramp_px):
    """(1, H, W, nchan) offset tensor with the requested statistics."""
    if field == "white":
        base = np.tanh(rng.standard_normal((1, H, W, nchan), np.float32))
    else:
        # coarse grid ~64 px correlation, bilinear-upsampled: conv-output-
        # like smoothness (offset heads are stacks of stride-1/2 convs)
        ch, cw = max(H // 64, 2), max(W // 64, 2)
        coarse = rng.standard_normal((1, ch, cw, nchan), np.float32)
        base = np.tanh(
            np.asarray(
                jax.image.resize(
                    jnp.asarray(coarse), (1, H, W, nchan), "bilinear"
                )
            )
        )
    off = base * amp_px
    if field == "ramp":
        # global vertical-offset ramp across the width on every dy channel
        # (torchvision layout: even channels are dy)
        ramp = np.linspace(-ramp_px, ramp_px, W, dtype=np.float32)
        off[..., 0::2] += ramp[None, None, :, None]
    return jnp.asarray(off)


@jax.jit
def _fwd(x, off, masks, wt):
    # ONE jit wrapper for every sweep point (shapes are identical across
    # fields/amps, so the compiled graph is reused; a per-point wrapper
    # would pay a slow remote graph load inside every timed loop)
    with mixed_precision():
        return deform_conv2d(x, off, masks, wt, None, G, K)


def run_point(rng, field, amp_frac, ramp_px, quiet=False):
    total = 0.0
    per_scale = []
    for name, H, W, C, Cout, mag in SCALES:
        x = jnp.asarray(rng.random((1, H, W, C), dtype=np.float32))
        # A real flow pyramid halves magnitude with resolution, so a
        # global-motion ramp keeps a CONSTANT slope (px offset per px
        # position) across scales — scale the ramp extent by W.
        off = offset_field(
            rng, H, W, G * K * K * 2, mag * amp_frac, field,
            ramp_px * W / SCALES[0][2],
        )
        masks = jnp.asarray(
            rng.random((1, H, W, G * K * K), dtype=np.float32)
        )
        wt = jnp.asarray(
            rng.standard_normal((K, K, C // G, Cout), np.float32) * 0.05
        )

        dt = timed(
            f"{name} {H}x{W} C{C}->{Cout} {field} amp={mag * amp_frac:g}px",
            _fwd, x, off, masks, wt, quiet=quiet,
        )
        per_scale.append(dt)
        total += dt
    if not quiet:
        print(f"{'total':44s} {total * 1000:8.1f} ms")
    return total, per_scale


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--field", choices=["white", "smooth", "ramp"],
                   default="white")
    p.add_argument("--amp", type=float, default=1.0,
                   help="offset amplitude as a fraction of the scale's "
                        "OffsetDiversity magnitude")
    p.add_argument("--ramp", type=float, default=30.0,
                   help="global dy ramp in px across the width (field=ramp)")
    p.add_argument("--sweep", action="store_true",
                   help="full table: field x amp in {0, .25, .5, 1}")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    if not args.sweep:
        run_point(rng, args.field, args.amp, args.ramp)
        return

    amps = [0.0, 0.25, 0.5, 1.0]
    print(f"{'field':8s}" + "".join(f"  amp={a:<5g}" for a in amps)
          + "   (total of 3 deform convs, ms)")
    for field in ["smooth", "ramp", "white"]:
        row = []
        for a in amps:
            total, _ = run_point(
                np.random.default_rng(0), field, a, args.ramp, quiet=True
            )
            row.append(total * 1000)
        print(f"{field:8s}" + "".join(f"  {v:9.1f}" for v in row), flush=True)


if __name__ == "__main__":
    main()
