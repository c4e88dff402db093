"""Fused Pallas kernel for the calibration forward model + chi-square loss.

This is the north-star hot path (SURVEY.md §3.2, BASELINE.json): per chunk,

    v      = comps @ coeffs            (basis matvec)
    model  = (g_i conj g_j) * v        (complex product in real arithmetic)
    loss  += sum(w * |data - model|^2) (weighted reduction)

The step is bound by reading ``comps`` (by far the largest operand) from
HBM — the floor is 2x the comps bytes per fwd+bwd step (one read per pass;
a first-order method cannot do better). HYBRID DESIGN, chosen from
hardware measurements at bench shapes (G=2048, F=1536, V=128, v5e):

- FORWARD: a Pallas kernel streams each comps tile through VMEM once and
  produces the per-tile loss partials and the foreground visibilities v in
  the same read. The basis matvec has only TWO right-hand columns
  (real+imag coefficients), so the 128x128 MXU would run at 2/128
  utilization; the kernel contracts on the VPU instead — broadcast-multiply
  the (TG, F, V) comps tile by the (TG, 1, V) coefficients and lane-reduce
  over V. (This also sidesteps Mosaic's missing batched-dot lowering in
  current JAX.) Measured: 2.99 ms vs XLA's 3.10 (f32), 2.32 vs 2.42 (bf16).
- BACKWARD: plain XLA (see _bwd_xla) — XLA's transpose contraction runs at
  the comps-read floor, while a Pallas backward kernel measured ~1.8x
  slower (lane-major dv factors force Mosaic relayouts against the
  sublane-major comps tile).

Context for the design: XLA alone compiles this loss+grad to within ~7% of
the MEASURED achievable HBM bandwidth (666 GB/s f32 read, 592 GB/s bf16 —
81%/72% of v5e's 819 nominal): 5.16 ms/step f32 vs a 4.8 ms floor, 3.12
ms/step bf16 vs ~2.9. The hybrid's forward win does NOT survive
composition into the full descent step (measured 5.25 ms f32 / 3.48 bf16
vs XLA's 5.16 / 3.12 — the custom_vjp boundary blocks XLA's cross-pass
scheduling), so the production default stays pure XLA and the kernel is
opt-in (``use_pallas=True``). The bigger lever is bfloat16 comps storage,
which halves the dominant traffic (docs/BF16_COMPS.md): ``comps`` may be
float32 or bfloat16 (upcast in-kernel; all accumulation f32).

The gain gather g[a0], g[a1] -> (pr, pi) is pre-computed outside the kernel
(gains are (Nants, Nfreqs), tiny and replicated; XLA handles the gather and
its scatter-add transpose well). The kernel covers the B=1 per-baseline
layout (the default calibration path); other shapes fall back to the XLA
implementation in ops.loss.

Layout notes (see /opt/skills/guides/pallas_guide.md): last dims F and V
should be multiples of 128 for clean tiling; `fused_loss_applicable` gates
usage accordingly, and non-conforming problems use the XLA path.

Status: HARDWARE-VERIFIED on TPU v5e at full bench shapes (G=2048, F=1536,
V=128): forward loss and every gradient match the XLA path to float32
precision; see docs/DESIGN.md for measured step times.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_LIMIT = 100 * 2**20  # raise Mosaic's 16MB scoped default (v5e: 128MB)

_COMPS_DTYPES = (jnp.float32, jnp.bfloat16)


def _pick_tile(ngrps, nfreqs, nvecs, dtype_bytes=4, vmem_budget=_VMEM_LIMIT // 3):
    """Largest group-tile in {32,16,8} dividing ngrps that fits VMEM.

    Tiles are multiples of 8: Mosaic requires the second-to-last block dim
    to be sublane-aligned (8) for every buffer whose block includes the
    group axis. The budget is conservative (1/3 of the requested scoped
    limit) because Pallas double-buffers input blocks and the VPU
    contraction materializes one f32 product tile."""
    for tg in (32, 16, 8):
        if ngrps % tg:
            continue
        # comps tile + f32 product temp + v tile + 7 (TG,F) buffers
        need = (
            tg * nfreqs * nvecs * (dtype_bytes + 4)
            + 9 * tg * nfreqs * 4
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
        and comps.dtype in _COMPS_DTYPES
        and nfreqs % 128 == 0
        and nvecs % 128 == 0
        and _pick_tile(ngrps, nfreqs, nvecs, comps.dtype.itemsize) is not None
    )


def _fwd_kernel(comps_ref, coeffs_ref, pr_ref, pi_ref, dr_ref, di_ref, w_ref,
                loss_ref, v_ref):
    """One group-tile: loss partial + foreground visibilities.

    comps_ref: (TG, F, V) f32 or bf16; coeffs_ref: (2, TG, V); pr/pi/dr/di/w:
    (TG, F); loss_ref: (1, 8, 128) per-tile partial block; v_ref: (2, TG, F)

    The basis matvec is a broadcast multiply + lane reduction on the VPU
    (see module docstring); the whole tile is vectorized — no per-group
    unroll, so the Mosaic program stays O(1) ops regardless of tile size.
    Each program writes its chi-square partial into its OWN output block
    (summed by the caller) rather than accumulating across programs — an
    accumulator guarded by program_id would silently break under vmap,
    which prepends a batch grid dimension (the batched time-parallel path
    vmaps this call).
    """
    comps = comps_ref[...].astype(jnp.float32)  # (TG, F, V)
    cr = coeffs_ref[0]  # (TG, V)
    ci = coeffs_ref[1]
    vr = jnp.sum(comps * cr[:, None, :], axis=-1)  # (TG, F) lane reduce
    vi = jnp.sum(comps * ci[:, None, :], axis=-1)
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
    loss_ref[0] = jnp.where((row == 0) & (col == 0), acc, jnp.float32(0))


def _interpret():
    return jax.default_backend() == "cpu"


def _fwd_call(coeffs2, pr, pi, comps3, dr, di, w):
    ngrps, nfreqs, nvecs = comps3.shape
    tg = _pick_tile(ngrps, nfreqs, nvecs, comps3.dtype.itemsize)
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
            # one partial-loss block per program (vmap-safe; see kernel doc)
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tg, nfreqs), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ngrps // tg, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, ngrps, nfreqs), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(comps3, coeffs2, pr, pi, dr, di, w)
    return jnp.sum(loss_parts), v


def _bwd_xla(v, pr, pi, comps3, dr, di, w, gbar):
    """Backward pass as plain XLA ops.

    Measured on v5e at bench shapes (G=2048, F=1536, V=128): a Pallas
    backward kernel (broadcast-multiply + sublane-reduce for the
    coefficient cotangent) ran at ~3.7 ms vs ~2.1 ms for XLA's own
    transpose — the (TG, F)-shaped dv factors live lane-major and Mosaic
    must relayout them sublane-major before the broadcast against the
    (TG, F, V) comps tile. XLA schedules the same contraction as a matmul
    transpose at near the comps-read bandwidth floor, so the hybrid
    (Pallas forward + XLA backward) is the fastest verified combination."""
    vr, vi = v[0], v[1]
    mr = pr * vr + pi * vi
    mi = -pi * vr + pr * vi
    dmr = (-2.0 * gbar) * w * (dr - mr)
    dmi = (-2.0 * gbar) * w * (di - mi)
    dvr = pr * dmr - pi * dmi
    dvi = pi * dmr + pr * dmi
    cf = comps3 if comps3.dtype == jnp.float32 else comps3.astype(jnp.float32)
    dv = jnp.stack([dvr, dvi], axis=0)  # (2, G, F)
    dcoeffs = jnp.einsum(
        "gfv,kgf->kgv", cf, dv,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dpr = vr * dmr + vi * dmi
    dpi = vi * dmr - vr * dmi
    return dcoeffs, dpr, dpi


@jax.custom_vjp
def fused_chunk_loss(coeffs2, pr, pi, comps3, dr, di, w):
    """Fused weighted chi-square of one B=1 chunk.

    coeffs2: (2, ngrps, nvecs) stacked (real, imag) coefficients
    pr, pi:  (ngrps, nfreqs) Re / -Im of g_i conj(g_j) per baseline
    comps3:  (ngrps, nfreqs, nvecs) float32 or bfloat16
    dr, di, w: (ngrps, nfreqs)
    """
    loss, _ = _fwd_call(coeffs2, pr, pi, comps3, dr, di, w)
    return loss


def _fused_fwd(coeffs2, pr, pi, comps3, dr, di, w):
    loss, v = _fwd_call(coeffs2, pr, pi, comps3, dr, di, w)
    return loss, (v, pr, pi, comps3, dr, di, w)


def _fused_bwd(res, gbar):
    v, pr, pi, comps3, dr, di, w = res
    dcoeffs, dpr, dpi = _bwd_xla(v, pr, pi, comps3, dr, di, w, gbar)
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


# --------------------------------------------------------------------- #
# single-pass step kernel (bf16 comps): loss AND gradients in ONE comps
# read per descent step
# --------------------------------------------------------------------- #
#
# The chi-square is a sum of per-group terms and the whole computation is
# local to a group: v[g] -> model[g] -> error[g] -> (dcoeffs[g], dp[g]).
# The cotangent of the scalar loss is just a number, so the gradient can be
# produced in the SAME kernel pass as the forward — the comps tile already
# resident in VMEM feeds both the basis matvec and its transpose. HBM
# traffic per step drops from 2x comps bytes (fwd + autodiff bwd, the best
# any two-pass scheme can do) to 1x.
#
# The contractions ride the MXU as PLAIN 2D matmuls via a block-diagonal
# layout (Mosaic cannot lower batched dots, and an N=2 matvec would waste
# the 128-wide systolic array):
#
#   forward:  (TG*F, V) comps2d @ (V, 2*TG) per-tile coeff columns
#             -> (TG*F, 2*TG); group g's visibilities live in columns
#             (g, TG+g) of its own row block — extracted with one-hot
#             lane masks.
#   transpose: comps2d^T @ block-diagonal dv (TG*F, 2*TG) -> (V, 2*TG)
#             coefficient cotangents.
#
# Both matmuls are bf16 x bf16 with f32 accumulation — exact single-pass
# MXU work. Casting the coefficients / dv factors to bf16 adds relative
# error ~4e-3, the same scale as the bf16 comps quantization this mode has
# already accepted (docs/BF16_COMPS.md); the float32 production path is
# untouched (it routes through XLA, which is within 7% of its HBM floor).


def onepass_applicable(comps):
    """Whether the single-pass step kernel supports this chunk."""
    if jax.default_backend() not in ("tpu", "cpu"):  # cpu -> interpret mode
        return False
    ngrps, nbls, nfreqs, nvecs = comps.shape
    return (
        nbls == 1
        and comps.dtype == jnp.bfloat16
        and nfreqs % 128 == 0
        and nvecs % 128 == 0
        and ngrps % _ONEPASS_TG == 0
    )


_ONEPASS_TG = 8  # group tile; 2*TG = 16 output columns per matmul


def _step_kernel(comps_ref, coeffsT_ref, pr_ref, pi_ref, dr_ref, di_ref, w_ref,
                 loss_ref, dcT_ref, dpr_ref, dpi_ref):
    """One group-tile: loss partial + every gradient, one comps read.

    comps_ref: (TG, F, V) bf16; coeffsT_ref: (V, 2*TG) bf16 — tile-major
    columns [r_0..r_{TG-1}, i_0..i_{TG-1}]; pr/pi/dr/di/w: (TG, F) f32.
    Outputs: loss_ref (1, 8, 128) partial; dcT_ref (1, V, 2*TG) coefficient
    cotangents (same column layout, scaled by the caller's loss cotangent
    outside); dpr/dpi (TG, F) gain-product cotangents.
    """
    tg, nfreqs, nvecs = comps_ref.shape
    comps2d = comps_ref[...].reshape(tg * nfreqs, nvecs)  # bf16
    out = jax.lax.dot_general(
        comps2d, coeffsT_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TG*F, 2*TG) f32
    out3 = out.reshape(tg, nfreqs, 2 * tg)
    t_ix = jax.lax.broadcasted_iota(jnp.int32, (tg, 1, 2 * tg), 0)
    j_ix = jax.lax.broadcasted_iota(jnp.int32, (tg, 1, 2 * tg), 2)
    zero = jnp.zeros((), jnp.float32)
    vr = jnp.sum(jnp.where(j_ix == t_ix, out3, zero), axis=-1)  # (TG, F)
    vi = jnp.sum(jnp.where(j_ix == t_ix + tg, out3, zero), axis=-1)
    pr = pr_ref[...]
    pi = pi_ref[...]
    w = w_ref[...]
    mr = pr * vr + pi * vi
    mi = -pi * vr + pr * vi
    er = dr_ref[...] - mr
    ei = di_ref[...] - mi
    acc = jnp.sum(w * (er * er + ei * ei))
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    loss_ref[0] = jnp.where((row == 0) & (col == 0), acc, jnp.float32(0))
    # gradients of the UNIT-cotangent loss (caller scales by gbar)
    dmr = -2.0 * w * er
    dmi = -2.0 * w * ei
    dvr = pr * dmr - pi * dmi
    dvi = pi * dmr + pr * dmi
    dpr_ref[...] = vr * dmr + vi * dmi
    dpi_ref[...] = vi * dmr - vr * dmi
    # block-diagonal dv, same column layout as coeffsT
    bd = jnp.where(j_ix == t_ix, dvr[:, :, None], zero) + jnp.where(
        j_ix == t_ix + tg, dvi[:, :, None], zero
    )  # (TG, F, 2*TG)
    bd2 = bd.reshape(tg * nfreqs, 2 * tg).astype(comps2d.dtype)
    dcT_ref[0] = jax.lax.dot_general(
        comps2d, bd2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (V, 2*TG)


def _step_call(coeffs2, pr, pi, comps3, dr, di, w):
    """Run the single-pass kernel over a (ngrps, nfreqs, nvecs) bf16 chunk.

    Returns (loss, dcoeffs (2, ngrps, nvecs), dpr, dpi)."""
    ngrps, nfreqs, nvecs = comps3.shape
    tg = _ONEPASS_TG
    ntiles = ngrps // tg
    # tile-major coefficient columns: (V, ntiles * 2TG) with tile i's block
    # [r_{i*TG}..r_{i*TG+TG-1}, i_{i*TG}..]
    coeffsT = (
        coeffs2.reshape(2, ntiles, tg, nvecs)
        .transpose(3, 1, 0, 2)
        .reshape(nvecs, ntiles * 2 * tg)
        .astype(comps3.dtype)
    )
    loss_parts, dcT, dpr, dpi = pl.pallas_call(
        _step_kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tg, nfreqs, nvecs), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nvecs, 2 * tg), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nvecs, 2 * tg), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, nfreqs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, nvecs, 2 * tg), jnp.float32),
            jax.ShapeDtypeStruct((ngrps, nfreqs), jnp.float32),
            jax.ShapeDtypeStruct((ngrps, nfreqs), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(comps3, coeffsT, pr, pi, dr, di, w)
    # (ntiles, V, 2TG) -> (2, ngrps, V)
    dcoeffs = dcT.reshape(ntiles, nvecs, 2, tg).transpose(2, 0, 3, 1).reshape(
        2, ngrps, nvecs
    )
    return jnp.sum(loss_parts), dcoeffs, dpr, dpi


@jax.custom_vjp
def onepass_chunk_loss(coeffs2, pr, pi, comps3, dr, di, w):
    """Single-pass fused chi-square of one bf16 B=1 chunk (see above)."""
    loss, _, _, _ = _step_call(coeffs2, pr, pi, comps3, dr, di, w)
    return loss


def _onepass_fwd(coeffs2, pr, pi, comps3, dr, di, w):
    loss, dcoeffs, dpr, dpi = _step_call(coeffs2, pr, pi, comps3, dr, di, w)
    # the gradients themselves are the residuals; the backward pass is a
    # scalar scale — gradient is linear in the loss cotangent
    return loss, (dcoeffs, dpr, dpi, comps3, dr, di, w)


def _onepass_bwd(res, gbar):
    dcoeffs, dpr, dpi, comps3, dr, di, w = res
    return (
        gbar * dcoeffs,
        gbar * dpr,
        gbar * dpi,
        jnp.zeros_like(comps3),
        jnp.zeros_like(dr),
        jnp.zeros_like(di),
        jnp.zeros_like(w),
    )


onepass_chunk_loss.defvjp(_onepass_fwd, _onepass_bwd)
