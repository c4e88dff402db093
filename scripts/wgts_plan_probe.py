#!/usr/bin/env python
"""Compile-time HBM probe: full-scale batched segment plan with a
frequency-dependent weights cube, float32 vs bfloat16 storage.

Frequency-dependent weights (RFI flags, autocorr or SNR weights) defeat
the freq-invariant compression (calibration._compress_freq_invariant_wgts)
that the unflagged endurance run relied on, putting a full
(nbatch, ngrps, nbls, nfreqs) weights cube back into the arguments.
This probe AOT-compiles the REAL segment program
(parallel.batched.make_segment_plan, from ShapeDtypeStructs — no descent,
minutes instead of hours) at the endurance configuration and reports the
compiler's memory plan for both weight dtypes. See docs/DESIGN.md
"Multi-time HBM budget".

    python scripts/wgts_plan_probe.py [--prep_cache /tmp/prep_cache_nt8]
                                      [--nbatch 8] [--loss_block 2048]
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prep_cache", default="/tmp/prep_cache_nt8",
                    help="cache dir holding comps.npy (hera_full_demo "
                         "--prep_only); chunk shapes come from the real "
                         "component dict")
    ap.add_argument("--rings", type=int, default=10)
    ap.add_argument("--pitch", type=float, default=14.6)
    ap.add_argument("--nfreqs", type=int, default=1536)
    ap.add_argument("--nbatch", type=int, default=8)
    ap.add_argument("--loss_block", type=int, default=2048)
    ap.add_argument("--maxsteps", type=int, default=2000)
    ap.add_argument("--checkpoint_every", type=int, default=500)
    ap.add_argument("--patience", type=int, default=0,
                    help="probe the program WITH patience freezing (the "
                         "scale entry points default to 500; patience>0 "
                         "implies use_min argmin tracking = one extra "
                         "params-sized carry in the program)")
    ap.add_argument("--wgts", default="both",
                    choices=["both", "float32", "bfloat16"])
    args = ap.parse_args()

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.hera_full_demo import hex_lattice

    import jax
    import jax.numpy as jnp

    from calamity_tpu.cal_utils import blank_uvcal_from_uvdata
    from calamity_tpu.io.visdata import VisData
    from calamity_tpu.simulate import HERA_ALT, HERA_LAT, HERA_LON, _enu_to_ecef_rel
    from calamity_tpu.solver.fit import FitConfig
    from calamity_tpu.solver.tensorize import FitSpec
    from calamity_tpu.parallel.batched import make_segment_plan

    antpos = hex_lattice(args.rings, args.pitch)
    nants = len(antpos)
    iu, ju = np.triu_indices(nants, k=1)
    nbls = len(iu)
    freqs = 100e6 + 100e3 * np.arange(args.nfreqs)
    print(f"# {nants} ants, {nbls} baselines, {args.nfreqs} channels, "
          f"nbatch {args.nbatch}", flush=True)

    uvd = VisData(
        telescope_name="PROBE", instrument="PROBE",
        latitude=HERA_LAT, longitude=HERA_LON, altitude=HERA_ALT,
        channel_width=100e3,
        ant_1_array=iu.astype(np.int64), ant_2_array=ju.astype(np.int64),
        antenna_numbers=np.arange(nants, dtype=np.int64),
        antenna_names=[f"ANT{i}" for i in range(nants)],
        antenna_positions=_enu_to_ecef_rel(antpos, HERA_LAT, HERA_LON),
        freq_array=freqs[None, :],
        integration_time=np.full(nbls, 10.7),
        lst_array=np.zeros(nbls),
        polarization_array=np.asarray([-5], dtype=np.int64),
        time_array=np.full(nbls, 2459122.25),
        uvw_array=antpos[ju] - antpos[iu],
        data_array=np.zeros((nbls, 1, args.nfreqs, 1), dtype=np.complex64),
        flag_array=np.zeros((nbls, 1, args.nfreqs, 1), dtype=bool),
        nsample_array=np.ones((nbls, 1, args.nfreqs, 1), dtype=np.float32),
    )
    comps = np.load(os.path.join(args.prep_cache, "comps.npy"),
                    allow_pickle=True).item()
    gains = blank_uvcal_from_uvdata(uvd)
    ants_map = {int(a): i for i, a in enumerate(gains.ant_array)}
    t0 = time.time()
    spec = FitSpec(uvd, comps, ants_map, nvec_bucketing=True, shared_basis=True)
    print(f"# FitSpec: {len(spec.chunks)} chunks in {time.time() - t0:.0f}s",
          flush=True)

    nb = args.nbatch
    f32 = jnp.float32

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(tuple(shape), dt)

    chunk_sds, data_sds, coeff_sds = [], [], []
    for c in spec.chunks:
        U, B, F, V = c.comps.shape
        G = c.a0.shape[0]
        chunk_sds.append((sds((U, B, F, V), f32),
                          sds((G, B), jnp.int32), sds((G, B), jnp.int32)))
        data_sds.append(sds((nb, G, B, F), f32))
        coeff_sds.append(sds((nb, G, V), f32))
    g_sds = sds((nb, spec.nants, args.nfreqs), f32)
    prior_sds = sds((nb,), f32)

    cfg = FitConfig(
        optimizer="Adamax", opt_kwargs=(("learning_rate", 0.01),),
        maxsteps=args.maxsteps, tol=1e-11, use_min=args.patience > 0,
        freeze_model=False,
        regularization=None, use_pallas=False, remat=True,
        patience=args.patience,
        loss_block=args.loss_block, loss_block_unit=1,
    )

    gib = 2.0 ** -30
    dtypes = {"float32": (f32,), "bfloat16": (jnp.bfloat16,),
              "both": (f32, jnp.bfloat16)}[args.wgts]
    for wdt in dtypes:
        name = jnp.dtype(wdt).name
        wgts_sds = [sds(tuple(d.shape), wdt) for d in data_sds]
        t0 = time.time()
        try:
            plan = make_segment_plan(
                cfg, args.checkpoint_every, tuple(chunk_sds),
                tuple(data_sds), tuple(data_sds), tuple(wgts_sds),
                g_sds, tuple(coeff_sds), prior_sds,
            )
        except Exception as exc:  # RESOURCE_EXHAUSTED carries the memory plan
            msg = str(exc)
            head = msg.splitlines()[0] if msg else type(exc).__name__
            print(f"wgts={name}: COMPILE FAILED after {time.time() - t0:.0f}s — "
                  f"{head[:300]}", flush=True)
            continue
        mem = plan._compiled.memory_analysis()
        print(
            f"wgts={name}: args {mem.argument_size_in_bytes * gib:.2f} GiB, "
            f"temps {mem.temp_size_in_bytes * gib:.2f} GiB, "
            f"output {mem.output_size_in_bytes * gib:.2f} GiB, "
            f"TOTAL {(mem.argument_size_in_bytes + mem.temp_size_in_bytes + mem.output_size_in_bytes) * gib:.2f} GiB "
            f"(compile {time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
