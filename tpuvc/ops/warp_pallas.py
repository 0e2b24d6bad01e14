"""Pallas TPU kernel for bilinear backward warp (motion compensation).

Why a kernel: XLA's gather on TPU is index-rate-limited (~70M indices/s
measured on v5e regardless of payload width), which makes `grid_sample`-style
warps the single hottest op of the codec pipeline (~0.45 s of an 0.84 s
1080p B-frame forward). XLA layout changes with a tiny minor dim (NHWC C=3
<-> NCHW) are equally pathological (~35 ms per 100 MB transpose), so the
kernel is NHWC-native. It is built from the memory operations TPUs are
actually fast at:

  1. one contiguous *dynamic-start row-window DMA* per output band from the
     (B, H, W*C) view of the frame into VMEM (vertical reach: the whole
     frame, via the data-dependent window start);
  2. static-pattern *lane dynamic-gathers* (``take_along_axis`` along a
     128-lane tile with 8-sublane operands — the Mosaic-supported shuffle)
     that de-interleave the window into per-channel planes and re-interleave
     the results;
  3. per-channel warps: dynamic lane-gathers inside a 384-px local window,
     the vertical dimension resolved by a compare-accumulate loop over each
     8-row group's actual row spread.

All data-dependent scalars (window starts, loop bounds) are precomputed
vectorized once per band into SMEM/VMEM scratch, so the inner loops are free
of vector->scalar reductions (those serialize the VPU pipeline).

Exactness domain (windows are centered dynamically, so *uniform* motion of
any magnitude is exact; only local spread matters):
  - vertical: sampled rows of one 64-row band fit in the ROWS_WINDOW-row
    DMA window (<=118 px row spread per band) and <=LOCAL_H-2 px row spread
    per (8-row x 128-lane) patch — walk ranges are per patch, so global
    horizontal flow variation costs nothing;
  - horizontal: <=126 px dx spread per band (the 384-px local window holds
    the 128-px output tile plus 128 px of quantized-offset slack).
Beyond the domain, sampling clamps to the window edge; out-of-frame
sampling clamps to the frame border (grid_sample ``padding_mode='border'``
semantics), matching the XLA path.

The public entry is :func:`warp_pallas`, a ``custom_vjp`` function whose
backward pass reuses the XLA gather formulation (training runs on small
crops where gathers are cheap; evaluation — the hot path — uses the kernel).
Channel counts up to MAX_CHANNELS (VMEM-bound) are supported; wider feature
warps stay on the XLA path (tpuvc.ops.warp routes automatically).

Parity: replaces the gather formulation of tpuvc.ops.warp for large frames;
reference semantics at /root/reference/LHBDC/model/flow.py:13-25 and
ICIP2024/src/model/m.py:262-282 (SURVEY.md M2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 8  # lane dynamic-gather operand height (hard Mosaic constraint)
TILE_L = 128  # lane tile width
LOCAL_H = 40  # diagonal reach cap (max per-group flow vertical variation)
LOCAL_W = 384  # local window cols: 128 output + 128 offset slack + spread
BAND_ROWS = 64  # output rows per band (grid step)
ROWS_WINDOW = 128  # DMA window rows per band
MAX_CHANNELS = 8  # NHWC kernel channel cap (VMEM window size)


def _deinterleave_matrix(ch: int, c: int):
    """One-hot (ch*TILE_L, TILE_L) P with P[l, x] = 1 iff l == ch*x + c:
    win_c_tile = win_i_slab @ P. Built in-kernel from iota compares (a few
    vector ops) so no VMEM is spent on constants."""
    li = jax.lax.broadcasted_iota(jnp.int32, (ch * TILE_L, TILE_L), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (ch * TILE_L, TILE_L), 1)
    return (li == ch * xi + c).astype(jnp.float32)


def _interleave_matrix(ch: int, c: int, T: int, slab_start: int, sw: int):
    """One-hot (sw, TILE_L) Q with Q[x - slab_start, l] = 1 iff output
    lane l of tile T belongs to channel c and reads source column x:
    out_tile += res_slab @ Q. Built in-kernel from iota compares."""
    xl = jax.lax.broadcasted_iota(jnp.int32, (sw, TILE_L), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (sw, TILE_L), 1)
    gl = T * TILE_L + li
    return ((gl % ch == c) & (gl // ch - slab_start == xl)).astype(
        jnp.float32
    )


def _lane_gather(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """rows (TILE_S, LW), idx (TILE_S, TILE_L) in [0, LW):
    out[s, l] = rows[s, idx[s, l]] via per-128-lane-tile dynamic gathers."""
    n_tiles = rows.shape[1] // TILE_L
    out = jnp.zeros((TILE_S, TILE_L), rows.dtype)
    for t in range(n_tiles):
        sub = jnp.clip(idx - t * TILE_L, 0, TILE_L - 1)
        g = jnp.take_along_axis(
            rows[:, t * TILE_L : (t + 1) * TILE_L], sub, axis=1
        )
        hit = (idx >= t * TILE_L) & (idx < (t + 1) * TILE_L)
        out = jnp.where(hit, g, out)
    return out


def _warp_band_kernel(
    h: int,
    w: int,
    ch: int,
    rw: int,
    dx_ref,
    dy_ref,
    img_hbm,
    out_ref,
    win_i,
    win_c,
    res_s,
    rloc_s,
    xloc_s,
    fx_s,
    fy_s,
    rys_s,
    jhi_s,
    runi_s,  # SMEM (n_s*n_l,): row-uniform diag coord rr, or -1
    kuni_s,  # SMEM (n_s*n_l,): uniform-dx shift k, or -1
    rlo_s,
    sem,
):
    b = pl.program_id(0)
    band = pl.program_id(1)
    n_s = BAND_ROWS // TILE_S
    n_l = w // TILE_L
    lw = min(LOCAL_W, w)
    lh = min(LOCAL_H, rw)

    # --- per-band index precompute (vectorized; scalars land in SMEM) ---
    rows = jax.lax.broadcasted_iota(jnp.int32, (BAND_ROWS, w), 0).astype(
        jnp.float32
    )
    icols = jax.lax.broadcasted_iota(jnp.int32, (BAND_ROWS, w), 1)
    y = rows + band * BAND_ROWS + dy_ref[0]
    x = icols.astype(jnp.float32) + dx_ref[0]
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    # Keep y0+1/x0+1 in frame by pulling the floor back one at the far
    # border and pushing the fractional weight to 1 — identical values,
    # window-safe indices.
    y0 = jnp.minimum(jnp.floor(y), h - 2.0)
    x0 = jnp.minimum(jnp.floor(x), w - 2.0)
    fy_s[:] = y - y0
    fx_s[:] = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    # Window start: 8-aligned (sublane DMA constraint) and 8 rows BELOW the
    # minimum sampled row, so diagonal coordinates rr - s stay positive
    # (rr >= 8 > s). At the frame top the clip to 0 is safe because the
    # wrapper edge-pads 8 replica rows above the first real row.
    r_lo = jnp.clip((jnp.min(y0i) // 8) * 8 - 8, 0, max(h - rw, 0))
    rlo_s[0] = r_lo
    # Cap keeps every diagonal slab load (start + TILE_S rows, plus the
    # carried slab's one-row prefetch) inside the window:
    # max load row = max(rr - s) + TILE_S + 1 <= rw - 1.
    rr = jnp.clip(y0i - r_lo, 0, rw - TILE_S - 2)

    # Per-band quantized horizontal offset (lane-dim windows must be
    # 128-aligned); the 384-px local window leaves >=126 px of dx spread.
    xrel = x0i - icols
    qdx = jnp.clip((jnp.min(xrel) // TILE_L) * TILE_L, -w, w)
    qx = (icols // TILE_L) * TILE_L
    start = jnp.clip(qx + qdx, 0, w - lw)
    xloc_s[:] = jnp.clip(x0i - start, 0, lw - 2)
    rlo_s[1] = qdx

    # Per-(row-group, lane-tile) vertical window start + loop bound, in
    # DIAGONAL coordinates: output row s of a group reads sublane s of an
    # 8-row window slab, so each walk covers only the flow's own vertical
    # variation (~2-4 rows). Ranges are per 8 x 128 output PATCH, not per
    # full band row: real flow fields vary by tens of px across a 1080p
    # row, and a row-wide union would charge every tile for that global
    # variation (the deform kernel learned the same lesson — see
    # tpuvc.ops.deform_pallas).
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, w), 0)
    for g in range(n_s):
        rr_g = rr[g * TILE_S : (g + 1) * TILE_S, :] - s_iota
        rloc_s[g * TILE_S : (g + 1) * TILE_S, :] = rr_g
        for tl in range(n_l):
            lsl = slice(tl * TILE_L, (tl + 1) * TILE_L)
            blk = rr_g[:, lsl]
            tmn = jnp.min(blk)
            tmx = jnp.max(blk)
            gl = g * n_l + tl
            ry_gt = jnp.clip(tmn, 0, rw - TILE_S - 2)
            rys_s[gl] = ry_gt
            # Row-uniform fast path (same pattern as the deform kernel's
            # uni_tap, r4/r5): a constant integer sample row across the
            # 8 x 128 patch — true for zero/uniform motion and for most
            # patches of a smooth flow — is served by one aligned 16-row
            # block read + sublane roll, and the slab walk (init + shifts
            # + per-j gathers) is skipped entirely (jhi = 0).
            runi = tmn == tmx
            runi_s[gl] = jnp.where(runi, tmn, -1)
            jhi_s[gl] = jnp.where(
                runi, 0, jnp.minimum(tmx - ry_gt + 2, lh)
            )
            # Uniform-dx detection (interior tiles only — edge tiles clamp
            # window cols): window cols equal lane + k for one constant k
            # => both bilinear column reads are dynamic lane rolls on a
            # 2-tile block instead of lane gathers on the full window.
            if 1 <= tl <= n_l - 2:
                d = xloc_s[g * TILE_S : (g + 1) * TILE_S, lsl] - (
                    icols[:TILE_S, lsl] % TILE_L
                )
                dmn = jnp.min(d)
                uni = (dmn == jnp.max(d)) & (dmn >= 0) & (
                    dmn <= lw - TILE_L - 1
                )
                kuni_s[gl] = jnp.where(uni, dmn, -1)
            else:
                kuni_s[gl] = -1

    # --- window DMA: one contiguous (rw, W*C) block ---
    copy = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(pl.multiple_of(rlo_s[0], 8), rw), :], win_i, sem
    )
    copy.start()
    copy.wait()

    qdx = rlo_s[1]

    def tile_rx(tl):
        return pl.multiple_of(
            jnp.clip(tl * TILE_L + qdx, 0, w - lw), TILE_L
        )

    def chan_body(c, _):
        # --- de-interleave channel c: win_c[r, x] = win_i[r, x*ch + c] ---
        # One MXU one-hot matmul per lane tile (iota-compare permutation,
        # valid for traced c).
        P = _deinterleave_matrix(ch, c)
        for tl in range(n_l):
            slab = win_i[:, ch * tl * TILE_L : ch * (tl + 1) * TILE_L]
            win_c[:, tl * TILE_L : (tl + 1) * TILE_L] = jnp.dot(
                slab, P, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        # --- warp channel c per (row-group, lane-tile) ---
        # out = sum_j [(rloc==j)(1-fy) + (rloc==j-1)fy] * C_j, with C_j the
        # horizontal interpolation of window row j. Each tile's j loop runs
        # only to the patch's actual vertical spread.
        for g in range(n_s):
            rsl = pl.ds(g * TILE_S, TILE_S)
            for tl in range(n_l):
                lsl = slice(tl * TILE_L, (tl + 1) * TILE_L)
                gl = g * n_l + tl
                ry = rys_s[gl]
                # rebase the window-relative diagonal coords onto this
                # tile's walk; rows beyond the LOCAL_H cap truncate to the
                # walk edge (per-patch exactness domain).
                rloc_t = jnp.clip(rloc_s[rsl, lsl] - ry, 0, lh - 2)
                xloc_t = xloc_s[rsl, lsl]
                fx_t = fx_s[rsl, lsl]
                fy_t = fy_s[rsl, lsl]
                rx = tile_rx(tl)
                interior = 1 <= tl <= n_l - 2

                def uniform_path(gl=gl, rx=rx, xloc_t=xloc_t, fx_t=fx_t,
                                 fy_t=fy_t, interior=interior):
                    # One aligned 16-row block read + sublane roll serves
                    # the whole patch (rows rr..rr+8 in the tap's own
                    # diagonal frame); bit-identical to the walk (each
                    # walk accumulator receives exactly one hit, added to
                    # zero). rr <= rw - 10 (clip above) keeps rem <= 6.
                    rr0 = runi_s[gl]
                    qs = pl.multiple_of(
                        jnp.minimum((rr0 // 8) * 8, rw - 16), 8
                    )
                    shift = (16 - (rr0 - qs)) % 16

                    def quad_general(qs=qs, shift=shift, rx=rx,
                                     xloc_t=xloc_t):
                        blk = pltpu.roll(
                            win_c[pl.ds(qs, 16), pl.ds(rx, lw)],
                            shift, axis=0,
                        )
                        b0 = blk[:TILE_S]
                        b1 = blk[1 : TILE_S + 1]
                        return (
                            _lane_gather(b0, xloc_t),
                            _lane_gather(b0, xloc_t + 1),
                            _lane_gather(b1, xloc_t),
                            _lane_gather(b1, xloc_t + 1),
                        )

                    def quad_uniform(qs=qs, shift=shift, rx=rx, gl=gl):
                        # Uniform dx: fold the 128-aligned part of k into
                        # the read start, work on a 2-tile block (see
                        # deform_pallas.quad_uniform).
                        lw2 = 2 * TILE_L
                        k = kuni_s[gl]
                        kq = (k // TILE_L) * TILE_L
                        kr = k - kq
                        rx2 = pl.multiple_of(rx + kq, TILE_L)
                        blk = pltpu.roll(
                            win_c[pl.ds(qs, 16), pl.ds(rx2, lw2)],
                            shift, axis=0,
                        )
                        b0 = blk[:TILE_S]
                        b1 = blk[1 : TILE_S + 1]
                        s0 = (lw2 - kr) % lw2
                        r00 = pltpu.roll(b0, s0, axis=1)
                        r01 = pltpu.roll(r00, lw2 - 1, axis=1)
                        r10 = pltpu.roll(b1, s0, axis=1)
                        r11 = pltpu.roll(r10, lw2 - 1, axis=1)
                        return (
                            r00[:, :TILE_L], r01[:, :TILE_L],
                            r10[:, :TILE_L], r11[:, :TILE_L],
                        )

                    if interior:
                        g00, g01, g10, g11 = jax.lax.cond(
                            kuni_s[gl] >= 0, quad_uniform, quad_general
                        )
                    else:
                        g00, g01, g10, g11 = quad_general()
                    c0 = (1.0 - fx_t) * g00 + fx_t * g01
                    c1 = (1.0 - fx_t) * g10 + fx_t * g11
                    return (1.0 - fy_t) * c0 + fy_t * c1

                def walk_path(ry=ry, rx=rx, rloc_t=rloc_t, xloc_t=xloc_t,
                              fx_t=fx_t, fy_t=fy_t, gl=gl):
                    # Diagonal slab: output row s reads window row ry+j+s
                    # (its own sublane). Multi-row loads need 8-aligned
                    # dynamic sublane starts, so the slab is built from
                    # single-row loads ONCE and carried through the j loop
                    # with a one-row shift — one new row load per
                    # iteration.
                    init_slab = jnp.concatenate(
                        [
                            win_c[pl.ds(ry + s, 1), pl.ds(rx, lw)]
                            for s in range(TILE_S)
                        ],
                        axis=0,
                    )

                    def j_body(j, carry, ry=ry, rx=rx, rloc_t=rloc_t,
                               xloc_t=xloc_t, fx_t=fx_t):
                        a0, a1, slab = carry
                        g0 = _lane_gather(slab, xloc_t)
                        g1 = _lane_gather(slab, xloc_t + 1)
                        c_row = (1.0 - fx_t) * g0 + fx_t * g1
                        m0 = (rloc_t == j).astype(jnp.float32)
                        m1 = (rloc_t == j - 1).astype(jnp.float32)
                        row_new = win_c[
                            pl.ds(ry + j + TILE_S, 1), pl.ds(rx, lw)
                        ]
                        slab = jnp.concatenate([slab[1:], row_new], axis=0)
                        return (a0 + m0 * c_row, a1 + m1 * c_row, slab)

                    zero = jnp.zeros((TILE_S, TILE_L), jnp.float32)
                    a0, a1, _ = jax.lax.fori_loop(
                        0, jhi_s[gl], j_body, (zero, zero, init_slab)
                    )
                    return (1.0 - fy_t) * a0 + fy_t * a1

                res_s[
                    pl.ds(c * BAND_ROWS + g * TILE_S, TILE_S), lsl
                ] = jax.lax.cond(
                    runi_s[gl] >= 0, uniform_path, walk_path
                )
        return 0

    jax.lax.fori_loop(0, ch, chan_body, 0)

    # --- re-interleave: out[y, x*ch + c] = res_s[c*BAND + y, x] ---
    # Output tile T's lanes map to channel c = L % ch, column x = L // ch;
    # x spans at most 2 source tiles -> one MXU one-hot matmul per channel.
    sw = min(2 * TILE_L, w)
    for T in range(w * ch // TILE_L):
        t_lo = min((T * TILE_L) // ch // TILE_L, max(n_l - 2, 0))
        acc = jnp.zeros((BAND_ROWS, TILE_L), jnp.float32)
        for c in range(ch):
            Q = _interleave_matrix(ch, c, T, t_lo * TILE_L, sw)
            slab = res_s[
                c * BAND_ROWS : (c + 1) * BAND_ROWS,
                t_lo * TILE_L : t_lo * TILE_L + sw,
            ]
            acc = acc + jnp.dot(
                slab, Q, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[0, :, T * TILE_L : (T + 1) * TILE_L] = acc


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _warp_pallas_nhwc(img3, dx, dy, ch: int, interpret: bool = False):
    """img3 (B, H, W*ch) — the flat view of an NHWC frame; dx/dy (B, H, W)
    pixel displacements. Returns (B, H, W*ch). H multiple of BAND_ROWS,
    W multiple of TILE_L required."""
    B, H, WC = img3.shape
    W = WC // ch
    rw = min(ROWS_WINDOW, H)
    n_bands = H // BAND_ROWS
    kernel = functools.partial(_warp_band_kernel, H, W, ch, rw)
    return pl.pallas_call(
        kernel,
        grid=(B, n_bands),
        in_specs=[
            pl.BlockSpec(
                (1, BAND_ROWS, W), lambda b, n: (b, n, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BAND_ROWS, W), lambda b, n: (b, n, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, BAND_ROWS, WC), lambda b, n: (b, n, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, WC), jnp.float32),
        # The default 16MB scoped-vmem ceiling counts double-buffered blocks
        # plus scratch; at C=8 x 1080p the window + per-channel result
        # scratch legitimately needs ~22MB of the chip's 128MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        scratch_shapes=[
            pltpu.VMEM((rw, WC), jnp.float32),  # win_i (interleaved)
            pltpu.VMEM((rw, W), jnp.float32),  # win_c (one channel)
            pltpu.VMEM((ch * BAND_ROWS, W), jnp.float32),  # res
            pltpu.VMEM((BAND_ROWS, W), jnp.int32),  # rloc
            pltpu.VMEM((BAND_ROWS, W), jnp.int32),  # xloc
            pltpu.VMEM((BAND_ROWS, W), jnp.float32),  # fx
            pltpu.VMEM((BAND_ROWS, W), jnp.float32),  # fy
            pltpu.SMEM(
                (BAND_ROWS // TILE_S * (W // TILE_L),), jnp.int32
            ),  # rys (per group x lane tile)
            pltpu.SMEM(
                (BAND_ROWS // TILE_S * (W // TILE_L),), jnp.int32
            ),  # jhi (per group x lane tile)
            pltpu.SMEM(
                (BAND_ROWS // TILE_S * (W // TILE_L),), jnp.int32
            ),  # runi (per group x lane tile row-uniform rr)
            pltpu.SMEM(
                (BAND_ROWS // TILE_S * (W // TILE_L),), jnp.int32
            ),  # kuni (per group x lane tile uniform-dx k)
            pltpu.SMEM((2,), jnp.int32),  # r_lo, qdx
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dx, dy, img3)


def _warp_xla(img, flow, sx: float, sy: float):
    """Reference XLA gather formulation (border clamp); used for the VJP."""
    B, H, W, C = img.shape
    xs = jnp.arange(W, dtype=flow.dtype)
    ys = jnp.arange(H, dtype=flow.dtype)
    x = jnp.clip(xs[None, None, :] + flow[..., 0] * sx, 0.0, W - 1.0)
    y = jnp.clip(ys[None, :, None] + flow[..., 1] * sy, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, H * W, 1)
        return jnp.take_along_axis(
            flat, idx, axis=1, mode="promise_in_bounds"
        ).reshape(B, H, W, C)

    w00 = ((1.0 - fy) * (1.0 - fx))[..., None]
    w01 = ((1.0 - fy) * fx)[..., None]
    w10 = (fy * (1.0 - fx))[..., None]
    w11 = (fy * fx)[..., None]
    return (
        w00 * gather(y0i, x0i)
        + w01 * gather(y0i, x1i)
        + w10 * gather(y1i, x0i)
        + w11 * gather(y1i, x1i)
    )


def _warp_pallas_impl(img, flow, sx, sy, interpret):
    B, H, W, C = img.shape
    assert C <= MAX_CHANNELS, (
        f"warp_pallas supports up to {MAX_CHANNELS} channels; route wider "
        f"feature warps through the XLA path (got C={C})"
    )
    TOP = TILE_S  # replica rows above the frame (diagonal-reach margin)
    # >= TILE_S+2 replica rows below the frame so the window-safety clip
    # (rr <= rw - TILE_S - 2) only ever lands on replicated border rows.
    Hp = _round_up(H + TOP + TILE_S + 2, BAND_ROWS)
    Wp = _round_up(max(W, TILE_L), TILE_L)
    dx = flow[..., 0] * sx
    dy = flow[..., 1] * sy
    # The kernel clips sampling coordinates against the PADDED frame; padding
    # replicates the border rows/cols, so clamping against Hp/Wp samples the
    # same border values as clamping against H/W (border semantics preserved).
    img = jnp.pad(
        img, ((0, 0), (TOP, Hp - H - TOP), (0, Wp - W), (0, 0)), mode="edge"
    )
    dx = jnp.pad(dx, ((0, 0), (TOP, Hp - H - TOP), (0, Wp - W)), mode="edge")
    dy = jnp.pad(dy, ((0, 0), (TOP, Hp - H - TOP), (0, Wp - W)), mode="edge")
    img3 = img.reshape(B, Hp, Wp * C).astype(jnp.float32)
    out = _warp_pallas_nhwc(
        img3, dx.astype(jnp.float32), dy.astype(jnp.float32), C,
        interpret=interpret,
    )
    out = out.reshape(B, Hp, Wp, C)
    return out[:, TOP : TOP + H, :W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def warp_pallas(img, flow, sx=1.0, sy=1.0, interpret=False):
    """Bilinear backward warp via the Pallas band kernel (forward only;
    the VJP falls back to the XLA gather formulation).

    Args:
      img:  (B, H, W, C) float32, C <= MAX_CHANNELS.
      flow: (B, H, W, 2): channel 0 = dx, channel 1 = dy, in pixels.
      sx/sy: static displacement scale (the 'lhbdc' size/(size-1) compat
        factor of tpuvc.ops.warp, or 1.0 for exact semantics).
      interpret: run the kernel in interpreter mode (CPU testing).
    """
    return _warp_pallas_impl(img, flow, sx, sy, interpret)


def warp_pallas_chunked(img, flow, sx=1.0, sy=1.0, interpret=False):
    """warp_pallas for arbitrary channel counts: C > MAX_CHANNELS inputs are
    split into MAX_CHANNELS-wide slices sharing the same flow (the band
    index precompute is repeated per slice, but the gather work — the actual
    bottleneck — is unchanged). 3x over the XLA gather at 1080p C=48.

    Chunks are SEQUENCED with optimization barriers: independent Pallas
    calls in one XLA program intermittently corrupt a predecessor's tail
    grid steps when scheduled back-to-back (trailing output DMA vs the
    next kernel's scratch reuse; v5e, jax 0.9 — see
    scripts/debug_fuse_flake.py and FlowGuidedB.fuse_offsets). The
    explicit data dependency makes the runtime await each call; on a
    single TensorCore the lost overlap is nil."""
    C = img.shape[-1]
    if C <= MAX_CHANNELS:
        return warp_pallas(img, flow, sx, sy, interpret)
    outs = []
    for c0 in range(0, C, MAX_CHANNELS):
        chunk = img[..., c0 : c0 + MAX_CHANNELS]
        if outs:
            chunk, prev = jax.lax.optimization_barrier((chunk, outs[-1]))
            outs[-1] = prev
        outs.append(warp_pallas(chunk, flow, sx, sy, interpret))
    return jnp.concatenate(outs, axis=-1)


def _warp_fwd(img, flow, sx, sy, interpret):
    return _warp_pallas_impl(img, flow, sx, sy, interpret), (img, flow)


def _warp_bwd(sx, sy, interpret, res, g):
    img, flow = res
    _, vjp = jax.vjp(lambda i, f: _warp_xla(i, f, sx, sy), img, flow)
    return vjp(g)


warp_pallas.defvjp(_warp_fwd, _warp_bwd)
