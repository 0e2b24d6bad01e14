"""Still-image (Kodak) RD evaluation of the ELIC intra codec.

Usage:
    python -m tpuvc.cli.test_image 'dataset.name=kodak' \
        'dataset.root=/data/kodak' 'levels=(0,1,2,3,4)' 'output_dir=out'

Parity: the reference's I-frame models are evaluated on Kodak through
KodakTestDataset + compressai_image_compress
(/root/reference/LHBDC/test/utils.py:206-247); ICIP2023/2024 load one ELIC
intra checkpoint per rate level (ICIP2023/src/test.py:149-155). Per-level
weights are read from ``{intra_weights}/level_{k}/latest.msgpack`` when
present, else ``{intra_weights}/latest.msgpack``, else random init
(structural runs). ``dataset.name=synthetic`` needs no data on disk.
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from tpuvc.config import TestConfig, apply_overrides, load_yaml

    cfg = load_yaml(args.config) if args.config else TestConfig()
    apply_overrides(cfg, args.overrides)

    from tpuvc.utils.jaxcache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    from tpuvc.data.kodak import ImageFolder, SyntheticImages
    from tpuvc.eval.image_runner import eval_images
    from tpuvc.eval.infographic import TestInfographic
    from tpuvc.models.elic import ELIC
    from tpuvc.ops.precision import policy_from_name
    from tpuvc.utils.checkpoint import load_checkpoint

    os.makedirs(cfg.output_dir, exist_ok=True)
    if cfg.dataset.name == "synthetic":
        dataset = SyntheticImages(
            n=3, h=cfg.dataset.height, w=cfg.dataset.width, seed=cfg.seed
        )
    else:
        dataset = ImageFolder(cfg.dataset.root)

    intra = ELIC()
    init_x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init_vars = intra.init(jax.random.key(cfg.seed), init_x, "dequantize")

    @jax.jit
    def fwd(v, x):
        out = intra.apply(v, x, "dequantize")
        bits = sum(
            -jnp.sum(jnp.log2(jnp.maximum(l, 1e-9)))
            for l in out["likelihoods"].values()
        )
        return out["x_hat"], bits

    info = TestInfographic(
        extra_columns=("msssim",) if cfg.eval_msssim else ()
    )
    t0 = time.perf_counter()
    with policy_from_name(cfg.compute_dtype):
        for level in cfg.levels:
            variables = init_vars
            for ck in (
                os.path.join(
                    cfg.intra_weights, f"level_{level}", "latest.msgpack"
                ),
                os.path.join(cfg.intra_weights, "latest.msgpack"),
            ):
                if os.path.exists(ck):
                    variables = {"params": load_checkpoint(ck)["params"]}
                    print(f"level {level}: loaded {ck}")
                    break

            psnrs, bpps = eval_images(
                dataset,
                lambda x: fwd(variables, x),
                name=cfg.dataset.name,
                level=level,
                info=info,
                compute_msssim=cfg.eval_msssim,
            )
            mean_p = sum(psnrs) / len(psnrs)
            mean_b = sum(bpps) / len(bpps)
            print(f"level {level}: psnr {mean_p:.2f} bpp {mean_b:.4f}")

    out = info.results_csv(os.path.join(cfg.output_dir, cfg.results_csv))
    print(out.to_string(index=False))
    print(f"elapsed {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
