"""Microbench: wide-channel warp, XLA gather vs chunked Pallas."""

from __future__ import annotations

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

import importlib

warp_mod = importlib.import_module("tpuvc.ops.warp")

ITERS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1000:8.1f} ms")


def main():
    rng = np.random.default_rng(0)
    for (B, H, W, C) in [(1, 1088, 1920, 48), (1, 544, 960, 64), (2, 544, 960, 128)]:
        img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        flow = jnp.asarray(
            (4.0 * rng.standard_normal((B, H, W, 2))).astype(np.float32)
        )

        @jax.jit
        def f_auto(img, flow):
            return warp_mod.warp(img, flow)

        os.environ["TPUVC_WARP"] = "xla"

        @jax.jit
        def f_xla(img, flow):
            return warp_mod.warp(img, flow)

        r_xla = f_xla(img, flow)
        os.environ["TPUVC_WARP"] = "auto"
        r_auto = f_auto(img, flow)
        err = float(jnp.max(jnp.abs(r_xla - r_auto)))
        print(f"shape {(B, H, W, C)} max|xla-pallas| = {err:.2e}")
        timed(f"{(B,H,W,C)} pallas chunked", f_auto, img, flow)
        os.environ["TPUVC_WARP"] = "xla"
        timed(f"{(B,H,W,C)} xla gather", f_xla, img, flow)
        os.environ["TPUVC_WARP"] = "auto"


if __name__ == "__main__":
    main()
