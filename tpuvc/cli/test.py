"""Full-sequence RD evaluation entry point (the reference's ``main.py`` /
``testing.py``).

    python -m tpuvc.cli.test --config cfg.yaml model.family=flowguided_b \
        dataset.root=/data/UVG results_csv=results.csv

Walks levels x sequences with the GOP-16 coding order, codes I-frames with
the ELIC intra codec and B-frames with the selected codec family, and writes
the ICIP-format results CSV (level, sequence, psnr, bpp).

Parity: /root/reference/ICIP2023/main.py + src/test.py:98-178, and the
family-specific harnesses (LHBDC/test/testing.py, Flex-Rate testing.py).
"""

from __future__ import annotations

import argparse
import math
import os
import time


def build_models(cfg, rng_seed: int = 0):
    import jax
    import jax.numpy as jnp

    from tpuvc.models.elic import ELIC

    mc = cfg.model
    fam = mc.family
    init_x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    key = jax.random.key(rng_seed)

    intra = ELIC()
    intra_vars = intra.init(key, init_x, "dequantize")

    if fam == "lhbdc":
        from tpuvc.models.lhbdc import LHBDC

        model = LHBDC(N=mc.N)
        variables = model.init(key, init_x, init_x, init_x, "dequantize")
    elif fam == "flexrate":
        from tpuvc.models.flexrate import BidirFlowRef

        model = BidirFlowRef(N=mc.N)
        variables = model.init(
            key, init_x, init_x, init_x, 0, 1.0, "dequantize"
        )
    elif fam == "deform_b":
        from tpuvc.models.deform_b import DeformB

        model = DeformB(N=mc.N, M=mc.M, levels=mc.levels)
        variables = model.init(key, init_x, init_x, init_x, 0, "dequantize")
    elif fam == "flowguided_b":
        from tpuvc.models.flowguided_b import FlowGuidedB

        model = FlowGuidedB(
            N=mc.N, M=mc.M, levels=mc.levels,
            feature_channels=tuple(mc.feature_channels),
        )
        variables = model.init(
            key, init_x, init_x, init_x, 0, 0.5, -0.5, 1, "dequantize"
        )
    elif fam == "dmc":
        from tpuvc.models.dmc import PFrameDMC

        # Canonical DMC size (as in the train CLI): N=64 latents, 48
        # feature channels — independent of the B families' model.N.
        model = PFrameDMC()
        dpb0 = {"ref_frame": init_x, "ref_feature": None,
                "ref_down_ratio": 1.0}
        variables = model.init(key, init_x, dpb0, 1.0, "dequantize")
    else:
        raise ValueError(f"unknown model family: {fam}")
    return (intra, intra_vars), (model, variables)


def make_frame_fns(cfg, intra_pack, inter_pack, level: int):
    """Build (intra_fn, inter_fn) closures for eval_sequence."""
    import jax
    import jax.numpy as jnp

    from tpuvc.gop.adaptive import best_down_ratio_prediction
    from tpuvc.models.flowguided_b import FlowGuidedB, get_scales

    intra, intra_vars = intra_pack
    model, variables = inter_pack
    fam = cfg.model.family

    @jax.jit
    def intra_fn_j(v, x):
        out = intra.apply(v, x, "dequantize")
        bits = sum(
            -jnp.sum(jnp.log2(jnp.maximum(l, 1e-9)))
            for l in out["likelihoods"].values()
        )
        return out["x_hat"], bits

    def intra_fn(x):
        dec, bits = intra_fn_j(intra_vars, x)
        return dec, bits

    if fam == "lhbdc":

        @jax.jit
        def inter_j(v, r1, r2, xc):
            out = model.apply(v, r1, xc, r2, "dequantize")
            return out["x_hat"], out["bits"]

        def inter_fn(r1, r2, xc, order, o1, o2):
            return inter_j(variables, r1, r2, xc)

    elif fam == "flexrate":
        from tpuvc.gop.rate_control import flexrate_rate_for_frame

        @jax.jit
        def inter_j(v, r1, r2, xc, n, l):
            out = model.apply(v, r1, xc, r2, n, l, "dequantize")
            return out["x_hat"], jnp.sum(out["size"])

        def inter_fn(r1, r2, xc, order, o1, o2):
            d = max(abs(o2 - o1), 1)
            hier = max(1, int(round(math.log2(16 / d))) + 1)
            n, l = flexrate_rate_for_frame(level, hier)
            return inter_j(variables, r1, r2, xc, n, l)

    elif fam == "deform_b":

        @jax.jit
        def inter_j(v, r1, r2, xc, s):
            out = model.apply(v, r1, r2, xc, s, "dequantize")
            return out["x_hat"], out["size"]

        def inter_fn(r1, r2, xc, order, o1, o2):
            return inter_j(variables, r1, r2, xc, float(level))

    elif fam == "flowguided_b":
        pred_cache = {}

        def predict(r1, r2, s1, s2):
            def p(ratio):
                if ratio not in pred_cache:
                    pred_cache[ratio] = jax.jit(
                        lambda v, a, b, x1, x2, ratio=ratio: model.apply(
                            v, a, b, x1, x2, ratio,
                            method=FlowGuidedB.prediction_flowonly,
                        )
                    )
                return pred_cache[ratio](variables, r1, r2, s1, s2)

            return p

        inter_cache = {}

        def inter_fn(r1, r2, xc, order, o1, o2):
            s1, s2 = get_scales(order, o1, o2)
            if cfg.adaptive_down_ratio:
                ratio, _ = best_down_ratio_prediction(
                    predict(r1, r2, s1, s2), xc
                )
            else:
                ratio = 1
            if ratio not in inter_cache:
                inter_cache[ratio] = jax.jit(
                    lambda v, a, b, x, s, sc1, sc2, ratio=ratio: (
                        lambda out: (out["x_hat"], out["size"])
                    )(
                        model.apply(
                            v, a, b, x, s, sc1, sc2, ratio, "dequantize"
                        )
                    )
                )
            return inter_cache[ratio](
                variables, r1, r2, xc, float(level), s1, s2
            )

    else:
        raise ValueError(fam)
    return intra_fn, inter_fn


def make_dmc_fns(cfg, intra_pack, inter_pack, level: int):
    """(intra_fn, pframe_fn, ratio_for_frame) for the low-delay DMC eval
    (the OJSP harness role: forward_one_frame + the fractional ratio
    search, /root/reference/OJSP2025/video_model.py:505-666)."""
    import jax
    import jax.numpy as jnp

    from tpuvc.gop.adaptive import fractional_ratio_search
    from tpuvc.models.dmc import PFrameDMC

    intra, intra_vars = intra_pack
    model, variables = inter_pack

    @jax.jit
    def intra_fn_j(v, x):
        out = intra.apply(v, x, "dequantize")
        bits = sum(
            -jnp.sum(jnp.log2(jnp.maximum(l, 1e-9)))
            for l in out["likelihoods"].values()
        )
        return out["x_hat"], bits

    def intra_fn(x):
        return intra_fn_j(intra_vars, x)

    from tpuvc.gop.adaptive import psnr_of

    q = float(level)
    want_diag = bool(cfg.dmc_diag_csv)
    fwd_cache = {}

    def pframe_fn(x, dpb, ratio):
        if ratio not in fwd_cache:
            fwd_cache[ratio] = jax.jit(
                lambda v, x, dpb, ratio=ratio: (
                    lambda out: (
                        out["x_hat"], out["bits"], out["dpb"],
                        out["warped"], out["bits_mv"], out["bits_y"],
                    )
                )(model.apply(v, x, dpb, ratio, "dequantize", q=q))
            )
        x_hat, bits, new_dpb, warped, bmv, by = fwd_cache[ratio](
            variables, x, dpb
        )
        # Keep the chosen ratio a host float so the next frame's hysteresis
        # comparison costs no device sync.
        new_dpb = dict(new_dpb)
        new_dpb["ref_down_ratio"] = ratio
        # Device scalars; the runner converts once at the end of the
        # sequence, keeping the loop sync-free.
        extras = (
            {"warp_psnr": psnr_of(warped, x), "bits_mv": bmv, "bits_y": by}
            if want_diag
            else {}
        )
        return x_hat, bits, new_dpb, extras

    pred_cache = {}

    def ratio_for_frame(x, dpb):
        if not cfg.adaptive_down_ratio:
            return 1.0

        def predict(ratio):
            if ratio not in pred_cache:
                pred_cache[ratio] = jax.jit(
                    lambda v, x, ref, ratio=ratio: model.apply(
                        v, x, ref, ratio, method=PFrameDMC.warp_prediction
                    )
                )
            return pred_cache[ratio](variables, x, dpb["ref_frame"])

        ratio, _, _ = fractional_ratio_search(
            predict, x, prev_ratio=dpb.get("ref_down_ratio"),
            ratios=tuple(cfg.dmc_ratios),
        )
        return ratio

    return intra_fn, pframe_fn, ratio_for_frame


def make_batched_inter_fn(cfg, inter_pack, level: int, gop: int):
    """Level-batched inter forward for eval_sequence_batched.

    Frames within one hierarchy level share rate-control state: equal
    reference distances give the same Flex-Rate (n, l) and the same v4
    temporal scales, so one batched call serves the whole level. The v4
    per-frame adaptive down-ratio search is disabled on this path
    (down_ratio=1); use the sequential runner for full adaptive parity.
    """
    import jax
    import jax.numpy as jnp

    from tpuvc.models.flowguided_b import get_scales

    model, variables = inter_pack
    fam = cfg.model.family

    if fam == "lhbdc":

        @jax.jit
        def fwd(v, r1, r2, xc):
            out = model.apply(v, r1, xc, r2, "dequantize")
            return out["x_hat"], out["sizes"]

        def inter_fn(r1, r2, xc, idxs, refs):
            return fwd(variables, r1, r2, xc)

    elif fam == "flexrate":
        from tpuvc.gop.rate_control import flexrate_rate_for_frame

        @jax.jit
        def fwd(v, r1, r2, xc, n, l):
            out = model.apply(v, r1, xc, r2, n, l, "dequantize")
            return out["x_hat"], out["size"]

        def inter_fn(r1, r2, xc, idxs, refs):
            d = max(abs(refs[0][1] - refs[0][0]), 1)
            hier = max(1, int(round(math.log2(gop / d))) + 1)
            n, l = flexrate_rate_for_frame(level, hier)
            return fwd(variables, r1, r2, xc, n, l)

    elif fam == "deform_b":

        @jax.jit
        def fwd(v, r1, r2, xc, s):
            out = model.apply(v, r1, r2, xc, s, "dequantize")
            return out["x_hat"], out["sizes"]

        def inter_fn(r1, r2, xc, idxs, refs):
            return fwd(variables, r1, r2, xc, float(level))

    elif fam == "flowguided_b":

        @jax.jit
        def fwd(v, r1, r2, xc, s, s1, s2):
            out = model.apply(
                v, r1, r2, xc, s, s1, s2, 1, "dequantize"
            )
            return out["x_hat"], out["sizes"]

        def inter_fn(r1, r2, xc, idxs, refs):
            s1, s2 = get_scales(idxs[0], refs[0][0], refs[0][1])
            return fwd(variables, r1, r2, xc, float(level), s1, s2)

    else:
        raise ValueError(f"level_batched unsupported for family: {fam}")

    return inter_fn


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

    from tpuvc.eval.infographic import TestInfographic

    if cfg.timestamped_output:
        # hydra run-dir parity: outputs/%Y-%m-%d/%H-%M-%S
        # (ICIP2023/configs/test.yaml:7-9).
        cfg.output_dir = os.path.join(
            cfg.output_dir, time.strftime("%Y-%m-%d"), time.strftime("%H-%M-%S")
        )
        print(f"run dir: {cfg.output_dir}")
    os.makedirs(cfg.output_dir, exist_ok=True)
    intra_pack, inter_pack = build_models(cfg, cfg.seed)

    # Load trained weights when present (filename conventions match the
    # trainers'); random init otherwise (structural runs).
    from tpuvc.utils.checkpoint import load_checkpoint

    intra_ck = os.path.join(cfg.intra_weights, "latest.msgpack")
    if os.path.exists(intra_ck):
        intra_pack = (intra_pack[0], {"params": load_checkpoint(intra_ck)["params"]})
        print(f"loaded intra weights from {intra_ck}")
    inter_ck = os.path.join(cfg.inter_weights, "latest.msgpack")
    if os.path.exists(inter_ck):
        inter_pack = (inter_pack[0], {"params": load_checkpoint(inter_ck)["params"]})
        print(f"loaded inter weights from {inter_ck}")

    info = TestInfographic(
        extra_columns=("msssim",) if cfg.eval_msssim else ()
    )

    from tpuvc.ops.precision import policy_from_name

    t0 = time.perf_counter()
    with policy_from_name(cfg.compute_dtype):
        _run_levels(cfg, intra_pack, inter_pack, info)
    out = info.results_csv(os.path.join(cfg.output_dir, cfg.results_csv))
    print(out.to_string(index=False))
    if cfg.write_plots:
        _write_plots(cfg, info)
    print(f"elapsed {time.perf_counter() - t0:.1f}s")


def _write_plots(cfg, info):
    """RD curve (levels aggregated over sequences, vs BD anchors) and one
    per-frame PSNR/bpp twin-axis figure per (sequence, level)."""
    from tpuvc.eval.plots import per_frame_figure, rd_curve

    lv = info.per_level()
    path = rd_curve(
        {cfg.model.family: (list(lv["bpp"]), list(lv["psnr"]))},
        os.path.join(cfg.output_dir, "rd_curve.png"),
        title=f"{cfg.model.family} RD",
    )
    print(f"wrote {path}")
    df = info.dataframe()
    for (seq, level), rows in df.groupby(["video", "level"]):
        rows = rows.sort_values("frame_num")
        pixels = int(rows["pixels"].iloc[0])
        path = per_frame_figure(
            list(rows["psnr"]), list(rows["size"]), pixels,
            os.path.join(cfg.output_dir, f"{seq}_l{level}_frames.png"),
            title=f"{seq} level {level}",
        )
        print(f"wrote {path}")


def _run_levels(cfg, intra_pack, inter_pack, info):
    import jax.numpy as jnp

    from tpuvc.data.uvg import SequenceFrames
    from tpuvc.eval.runner import eval_sequence
    from tpuvc.gop.order import get_order_typ_list, sequence_order_from_table

    for level in cfg.levels:
        if cfg.model.family == "dmc":
            _run_dmc_level(cfg, intra_pack, inter_pack, level, info)
            continue
        intra_fn, inter_fn = make_frame_fns(cfg, intra_pack, inter_pack, level)
        for seq, n_frames in cfg.dataset.sequences.items():
            if cfg.dataset.name == "synthetic":
                from tpuvc.data.uvg import SyntheticSequence

                frames = SyntheticSequence(
                    n_frames=n_frames, h=cfg.dataset.height,
                    w=cfg.dataset.width,
                )
            else:
                frames = SequenceFrames(
                    os.path.join(cfg.dataset.root, seq), n_frames
                )
            if cfg.dataset.gop == 16:
                order, typ = get_order_typ_list(16, len(frames))
            else:
                # LHBDC-era protocol: static dyadic tables tiled per GOP.
                order, typ = sequence_order_from_table(
                    cfg.dataset.gop, len(frames)
                )

            from tpuvc.data.uvg import device_frame

            class _Device:
                """Lazy host->device frame access: 600 x 1080p frames must
                not sit in HBM at once (the DPB holds the decoded ones);
                uploads ride the uint8 view (4x less relay traffic)."""

                def __getitem__(self, i):
                    return device_frame(frames.u8(i))

            if cfg.level_batched:
                from tpuvc.eval.runner import eval_sequence_batched

                gop = cfg.dataset.gop
                n_use = ((len(frames) - 1) // gop) * gop + 1
                if n_use != len(frames):
                    print(
                        f"level_batched: covering {n_use}/{len(frames)} "
                        f"frames of {seq} (largest k*{gop}+1 prefix)"
                    )
                inter_b = make_batched_inter_fn(cfg, inter_pack, level, gop)
                psnrs, sizes = eval_sequence_batched(
                    _Device(), len(frames), gop, intra_fn, inter_b,
                    crop_hw=frames.size, video=seq, level=level, info=info,
                    max_batch=cfg.max_batch,
                    compute_msssim=cfg.eval_msssim,
                    window_gops=cfg.window_gops,
                )
            else:
                psnrs, sizes = eval_sequence(
                    _Device(), order, typ, intra_fn, inter_fn,
                    crop_hw=frames.size, video=seq, level=level, info=info,
                    compute_msssim=cfg.eval_msssim,
                )
            print(
                f"level {level} {seq}: psnr "
                f"{sum(psnrs)/len(psnrs):.2f} bpp "
                f"{sum(sizes)/len(sizes)/(frames.size[0]*frames.size[1]):.4f}"
            )


def _run_dmc_level(cfg, intra_pack, inter_pack, level, info):
    """Low-delay DMC RD eval for one rate level (OJSP protocol: I every
    dmc_intra_period, chained P frames, optional fractional ratio search +
    per-frame diagnostics CSV)."""
    import jax.numpy as jnp

    from tpuvc.data.uvg import SequenceFrames
    from tpuvc.eval.results_io import PerFrameDiagnostics
    from tpuvc.eval.runner import eval_sequence_lowdelay

    intra_fn, pframe_fn, ratio_for_frame = make_dmc_fns(
        cfg, intra_pack, inter_pack, level
    )
    for seq, n_frames in cfg.dataset.sequences.items():
        if cfg.dataset.name == "synthetic":
            from tpuvc.data.uvg import SyntheticSequence

            frames = SyntheticSequence(
                n_frames=n_frames, h=cfg.dataset.height, w=cfg.dataset.width
            )
        else:
            frames = SequenceFrames(
                os.path.join(cfg.dataset.root, seq), n_frames
            )

        from tpuvc.data.uvg import device_frame

        class _Device:
            def __getitem__(self, i):
                return device_frame(frames.u8(i))

        diag = PerFrameDiagnostics() if cfg.dmc_diag_csv else None
        psnrs, sizes = eval_sequence_lowdelay(
            _Device(), len(frames), cfg.dmc_intra_period, intra_fn,
            pframe_fn, crop_hw=frames.size, ratio_for_frame=ratio_for_frame,
            video=seq, level=level, info=info,
            diagnostics=diag, compute_msssim=cfg.eval_msssim,
        )
        if diag is not None:
            path = os.path.join(
                cfg.output_dir, f"{seq}_l{level}_{cfg.dmc_diag_csv}"
            )
            print(f"wrote per-frame diagnostics to {diag.write(path)}")
        print(
            f"level {level} {seq}: psnr "
            f"{sum(psnrs)/len(psnrs):.2f} bpp "
            f"{sum(sizes)/len(sizes)/(frames.size[0]*frames.size[1]):.4f}"
        )


if __name__ == "__main__":
    main()
