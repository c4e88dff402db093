"""Fused Pallas kernel for the calibration forward model + chi-square loss.

This is the north-star hot path (SURVEY.md §3.2, BASELINE.json): per chunk,

    v      = comps @ coeffs            (basis matvec, MXU)
    model  = (g_i conj g_j) * v        (complex product in real arithmetic)
    loss  += sum(w * |data - model|^2) (weighted reduction)

XLA executes this as a matmul + several elementwise/reduce kernels with the
intermediates round-tripping HBM. The Pallas version streams one tile of
``comps`` (by far the largest operand) through VMEM exactly ONCE per pass:
the forward kernel produces the per-tile loss partials and the foreground
visibilities v in the same read, and the backward kernel produces both
coefficient cotangents and the gain-product cotangents in one more read.
Per descent step the dominant HBM traffic is therefore 2x the comps bytes —
the information-theoretic minimum for a first-order method.

The gain gather g[a0], g[a1] -> (pr, pi) is pre-computed outside the kernel
(gains are (Nants, Nfreqs), tiny and replicated; XLA handles the gather and
its scatter-add transpose well). The kernel covers the B=1 per-baseline
layout (the default calibration path); other shapes fall back to the XLA
implementation in ops.loss.

Layout notes (see /opt/skills/guides/pallas_guide.md): last dims F and V
should be multiples of 128 for clean tiling; `fused_loss_applicable` gates
usage accordingly, and non-conforming problems use the XLA path.

Status: HARDWARE-VERIFIED on TPU v5e at moderate shapes (G=16, F=256,
V=128): forward loss and every gradient match the XLA path to float32
precision (rel. error ~3e-8 with HIGHEST-precision dots). Also verified in
interpret mode on CPU (tests/test_fused.py). The kernel stays opt-in
(``use_pallas=True``): at full bench shapes (F=1536) this development
machine's remote-compile helper is OOM-killed — an environment limit of
the relay, not a kernel defect; the XLA path measures 5.4 ms/step vs a
~4 ms HBM roofline, so the fused path's remaining headroom is ~25%. On
directly-attached TPUs enable it after a one-off compile check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_LIMIT = 100 * 2**20  # raise Mosaic's 16MB scoped default (v5e: 128MB)


def _pick_tile(ngrps, nfreqs, nvecs, dtype_bytes=4, vmem_budget=_VMEM_LIMIT // 3):
    """Largest group-tile in {32,16,8} dividing ngrps that fits VMEM.

    Tiles are multiples of 8: Mosaic requires the second-to-last block dim
    to be sublane-aligned (8) for every buffer whose block includes the
    group axis. The budget is conservative (1/3 of the requested scoped
    limit) because Pallas double-buffers input blocks."""
    for tg in (32, 16, 8):
        if ngrps % tg:
            continue
        # comps tile + v tile + 5 (TG,F) input buffers + headroom
        need = (
            tg * nfreqs * nvecs * dtype_bytes
            + 9 * tg * nfreqs * dtype_bytes
        )
        if need <= vmem_budget:
            return tg
    return None


def fused_loss_applicable(comps):
    """Whether the fused kernel supports this chunk's shape/platform."""
    if jax.default_backend() not in ("tpu", "cpu"):  # cpu -> interpret mode
        return False
    ngrps, nbls, nfreqs, nvecs = comps.shape
    return (
        nbls == 1
        and comps.dtype == jnp.float32
        and nfreqs % 128 == 0
        and nvecs % 128 == 0
        and _pick_tile(ngrps, nfreqs, nvecs) is not None
    )


def _fwd_kernel(comps_ref, coeffs_ref, pr_ref, pi_ref, dr_ref, di_ref, w_ref,
                loss_ref, v_ref):
    """One group-tile: loss partial + foreground visibilities.

    comps_ref: (TG, F, V); coeffs_ref: (2, TG, V); pr/pi/dr/di/w: (TG, F)
    loss_ref: (8, 128) shared accumulator; v_ref: (2, TG, F)

    The whole tile is TWO batched matvecs (batch dim TG) + vectorized
    elementwise work — no per-group unroll, so the Mosaic program stays
    O(1) ops regardless of tile size (the unrolled variant's program blew
    up compile memory at F=1536). The TPU grid executes sequentially, so
    every program accumulates its partial chi-square into the same
    lane-aligned accumulator block.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[...] = jnp.zeros_like(loss_ref)

    comps = comps_ref[...]  # (TG, F, V)
    dims = (((2,), (1,)), ((0,), (0,)))  # contract V, batch TG
    vr = jax.lax.dot_general(
        comps, coeffs_ref[0],
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TG, F)
    vi = jax.lax.dot_general(
        comps, coeffs_ref[1],
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    v_ref[0] = vr
    v_ref[1] = vi
    pr = pr_ref[...]
    pi = pi_ref[...]
    mr = pr * vr + pi * vi
    mi = -pi * vr + pr * vi
    er = dr_ref[...] - mr
    ei = di_ref[...] - mi
    acc = jnp.sum(w_ref[...] * (er * er + ei * ei))
    # place the scalar at [0, 0] without a scatter (unsupported in Mosaic)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    pad = jnp.where((row == 0) & (col == 0), acc, jnp.float32(0))
    loss_ref[...] = loss_ref[...] + pad


def _bwd_kernel(comps_ref, v_ref, pr_ref, pi_ref, dr_ref, di_ref, w_ref, gbar_ref,
                dcoeffs_ref, dpr_ref, dpi_ref):
    """Backward tile: coefficient + gain-product cotangents in one comps read.

    Batched matvecs over the tile, same structure as the forward."""
    gbar = gbar_ref[0, 0]
    vr = v_ref[0]  # (TG, F)
    vi = v_ref[1]
    pr = pr_ref[...]
    pi = pi_ref[...]
    w = w_ref[...]
    mr = pr * vr + pi * vi
    mi = -pi * vr + pr * vi
    dmr = (-2.0 * gbar) * w * (dr_ref[...] - mr)
    dmi = (-2.0 * gbar) * w * (di_ref[...] - mi)
    dvr = pr * dmr - pi * dmi
    dvi = pi * dmr + pr * dmi
    comps = comps_ref[...]  # (TG, F, V)
    dims = (((1,), (1,)), ((0,), (0,)))  # contract F, batch TG
    dcoeffs_ref[0] = jax.lax.dot_general(
        dvr, comps,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TG, V)
    dcoeffs_ref[1] = jax.lax.dot_general(
        dvi, comps,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dpr_ref[...] = vr * dmr + vi * dmi
    dpi_ref[...] = vi * dmr - vr * dmi


def _interpret():
    return jax.default_backend() == "cpu"


def _fwd_call(coeffs2, pr, pi, comps3, dr, di, w):
    ngrps, nfreqs, nvecs = comps3.shape
    tg = _pick_tile(ngrps, nfreqs, nvecs)
    grid = (ngrps // tg,)
    loss_parts, v = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tg, nfreqs, nvecs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tg, nvecs), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # single shared accumulator block (sequential TPU grid)
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tg, nfreqs), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, ngrps, nfreqs), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(comps3, coeffs2, pr, pi, dr, di, w)
    return jnp.sum(loss_parts), v


def _bwd_call(v, pr, pi, comps3, dr, di, w, gbar):
    ngrps, nfreqs, nvecs = comps3.shape
    tg = _pick_tile(ngrps, nfreqs, nvecs)
    grid = (ngrps // tg,)
    gbar_arr = jnp.asarray(gbar, jnp.float32).reshape(1, 1)
    dcoeffs, dpr, dpi = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tg, nfreqs, nvecs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tg, nfreqs), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, tg, nvecs), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, ngrps, nvecs), jnp.float32),
            jax.ShapeDtypeStruct((ngrps, nfreqs), jnp.float32),
            jax.ShapeDtypeStruct((ngrps, nfreqs), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(comps3, v, pr, pi, dr, di, w, gbar_arr)
    return dcoeffs, dpr, dpi


@jax.custom_vjp
def fused_chunk_loss(coeffs2, pr, pi, comps3, dr, di, w):
    """Fused weighted chi-square of one B=1 chunk.

    coeffs2: (2, ngrps, nvecs) stacked (real, imag) coefficients
    pr, pi:  (ngrps, nfreqs) Re / -Im of g_i conj(g_j) per baseline
    comps3:  (ngrps, nfreqs, nvecs)
    dr, di, w: (ngrps, nfreqs)
    """
    loss, _ = _fwd_call(coeffs2, pr, pi, comps3, dr, di, w)
    return loss


def _fused_fwd(coeffs2, pr, pi, comps3, dr, di, w):
    loss, v = _fwd_call(coeffs2, pr, pi, comps3, dr, di, w)
    return loss, (v, pr, pi, comps3, dr, di, w)


def _fused_bwd(res, gbar):
    v, pr, pi, comps3, dr, di, w = res
    dcoeffs, dpr, dpi = _bwd_call(v, pr, pi, comps3, dr, di, w, gbar)
    # comps/data/weights are never differentiated parameters; the zero
    # cotangents are DCE'd by XLA
    return (
        dcoeffs,
        dpr,
        dpi,
        jnp.zeros_like(comps3),
        jnp.zeros_like(dr),
        jnp.zeros_like(di),
        jnp.zeros_like(w),
    )


fused_chunk_loss.defvjp(_fused_fwd, _fused_bwd)
