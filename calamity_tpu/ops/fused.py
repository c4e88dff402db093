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
V=128) for BOTH comps dtypes: loss bit-identical to the XLA path,
coefficient-gradient max relative error 2.3e-7 (f32) / 2.7e-7 (bf16
comps); see docs/DESIGN.md and docs/BF16_COMPS.md for measured step times.
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
    """Whether the fused kernel supports this chunk's shape/platform.

    One predicate, shared with the fallback warning: the gate IS
    ``explain_fused_loss_inapplicable`` returning no reason (callers
    check the dense-layout condition — comps' leading axis matching the
    chunk's flat group count — separately, so it is vacuous here)."""
    return explain_fused_loss_inapplicable(comps, comps.shape[0]) is None


def explain_fused_loss_inapplicable(comps, ngrps):
    """Why the fused kernel cannot take a chunk, or None if it can.

    ``ngrps`` is the flat group count from the chunk's antenna-index table
    (a0.shape[0]); when it differs from comps' leading axis the chunk uses
    a shared/shared-batched operator layout the kernel does not cover."""
    backend = jax.default_backend()
    if backend not in ("tpu", "cpu"):
        return f"backend {backend!r} (kernel runs on tpu; cpu interprets)"
    u, nbls, nfreqs, nvecs = comps.shape
    if u != ngrps:
        return (
            "shared-basis operator layout (one basis matrix serves "
            f"{ngrps} groups; kernel covers the dense per-group layout)"
        )
    if nbls != 1:
        return f"nbls={nbls} (kernel covers the per-baseline B=1 layout)"
    if comps.dtype not in _COMPS_DTYPES:
        return f"comps dtype {comps.dtype} (float32/bfloat16 only)"
    if nfreqs % 128 or nvecs % 128:
        return (
            f"nfreqs={nfreqs}, nvecs={nvecs} not multiples of 128 "
            "(TPU lane tiling)"
        )
    if _pick_tile(ngrps, nfreqs, nvecs, comps.dtype.itemsize) is None:
        return (
            f"no VMEM-fitting group tile for ngrps={ngrps} "
            "(needs a tile in {32,16,8} dividing ngrps)"
        )
    return None


def warn_pallas_fallbacks(chunks):
    """Warn (once per fit) for every chunk use_pallas cannot cover.

    The kernel gate is silent inside the compiled loss, so without this a
    default shared_basis=True config would accept --use_pallas and run
    pure XLA without a word (VERDICT r2 weak #3)."""
    import warnings

    reasons = []
    for cnum, (comps, a0, _) in enumerate(chunks):
        reason = explain_fused_loss_inapplicable(comps, a0.shape[0])
        if reason is not None:
            reasons.append(f"chunk {cnum}: {reason}")
    if reasons:
        warnings.warn(
            "use_pallas requested but these chunks fall back to the XLA "
            "loss: " + "; ".join(reasons),
            stacklevel=3,
        )
    return reasons


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


# A single-pass step kernel (loss AND gradients in one comps read, halving
# the HBM floor to ~1.35 ms at bench shapes for bf16) was built and
# hardware-tested in two tilings and REMOVED after both lost to XLA:
#
# - The math works: the chi-square is local per group and its cotangent is
#   a scalar, so per tile the kernel can compute v -> error -> dcoeffs/dp
#   with the comps tile already in VMEM, and custom_vjp can return the
#   precomputed gradients scaled by the loss cotangent.
# - TG=8 groups/program with block-diagonal MXU matmuls: the one-hot
#   extraction arrays have 2*TG=16 lanes, and the 16/128 vreg padding made
#   the elementwise extraction ~8x oversized — 11.2 ms/step vs XLA's 3.12.
# - TG=1 group/program with clean (2,V)x(V,F) matmuls and no masks:
#   Mosaic's per-program grid overhead measured ~4 us, and 2048 programs
#   cost 9.3 ms/step.
# - Wider tiles (TG=64, 2*TG=128 full lanes) shrink the padding but the
#   extraction work grows as G*F*2*TG — back to ~XLA parity before overhead.
#
# Conclusion recorded in docs/BF16_COMPS.md: on this Mosaic/jax stack the
# achievable kernel floor is bounded by VPU contraction cost or grid
# overhead, not HBM, and XLA's two-pass 3.12 ms (1.15x of ITS floor)
# stands as the production bf16 path.
