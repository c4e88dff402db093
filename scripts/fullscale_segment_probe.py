"""Synthetic full-HERA-footprint probe for the TPU-worker crash.

Reproduces the memory footprint and execution pattern of the endurance
run's first bf16 segment (8 poltimes x ~55k baselines x 1536 ch,
shared-batched packing) WITHOUT the ~65 min of host prep, then runs a
segment-length ladder (5, 20, 100, 500 recorded steps) through the same
BatchedSegmentPlan.run path the driver uses.

Discriminates:
- crash on ANY segment (even 5 steps)  -> HBM/operand-staging exhaustion
- crash only on the LONG segment       -> relay execution watchdog
- no crash at all                      -> specific to the real 18-chunk
  program (footprint delta, chunk count, or driver-side state)
"""
import argparse
import time
import numpy as np
import jax
import jax.numpy as jnp

from calamity_tpu.solver.fit import FitConfig
from calamity_tpu.parallel.batched import make_segment_plan, get_optimizer


def stage(s):
    print(f"[{time.strftime('%H:%M:%S')}] {s}", flush=True)


def mem():
    try:
        st = jax.devices()[0].memory_stats()
        if st and "bytes_in_use" in st:
            lim = st.get("bytes_limit", 0) / 2**30
            return (f"{st['bytes_in_use'] / 2**30:.2f} GiB in use"
                    + (f" of {lim:.2f}" if lim else ""))
    except Exception as e:
        return f"memory_stats unavailable: {e!r}"
    return "no stats"


# one shared-batched chunk approximating full-HERA bucketing:
# nu unique operators x gmax baselines each, nbls=1 per group.
# ngrps 75,776 ~ the real run's padded 75,748 groups; loss_block=2048 is
# the endurance configuration (docs/DESIGN.md HBM table: 13.3 GiB peak).
# --nbatch/--loss_block/--ladder bisect the footprint when the full
# configuration kills the worker (HBM headroom vs execution length).
_ap = argparse.ArgumentParser()
_ap.add_argument("--nbatch", type=int, default=8,
                 help="poltime slices (args scale linearly with this)")
_ap.add_argument("--loss_block", type=int, default=2048,
                 help="group-block size for the batched loss")
_ap.add_argument("--ladder", default="5,20,100,500",
                 help="comma-separated recorded-step segment lengths")
_args = _ap.parse_args()
ladder = [int(s) for s in _args.ladder.split(",") if s]
nbatch, nu, gmax, nf, nv, nants = _args.nbatch, 592, 128, 1536, 128, 331
ngrps = nu * gmax
maxsteps = 1000
cfg = FitConfig(optimizer="Adamax", opt_kwargs=(("learning_rate", 0.01),),
                maxsteps=maxsteps, tol=0.0, use_min=False, freeze_model=False,
                regularization=None, use_pallas=False, remat=True,
                loss_block=_args.loss_block)
rng = np.random.default_rng(int(time.time()) % 100000)

stage(f"devices: {jax.devices()}")
stage("building + uploading arrays "
      f"(data {2 * nbatch * ngrps * nf * 4 / 2**30:.2f} GiB, "
      f"comps {nu * nf * nv * 2 / 2**30:.2f} GiB bf16)")
comps = jnp.asarray(
    rng.random((nu, 1, nf, nv), dtype=np.float32).astype(jnp.bfloat16))
a0 = jnp.asarray(rng.integers(0, nants, (ngrps, 1)).astype(np.int32))
a1 = jnp.asarray(rng.integers(0, nants, (ngrps, 1)).astype(np.int32))
chunks = ((comps, a0, a1),)
dr = jnp.asarray(rng.random((nbatch, ngrps, 1, nf), dtype=np.float32))
di = jnp.asarray(rng.random((nbatch, ngrps, 1, nf), dtype=np.float32))
w = jnp.asarray(np.full((nbatch, ngrps, 1, 1),
                        1.0 / (nbatch * ngrps * nf), np.float32))
gr = jnp.asarray(np.ones((nbatch, nants, nf), np.float32))
gi = jnp.asarray(np.zeros((nbatch, nants, nf), np.float32))
fr = (jnp.asarray(rng.random((nbatch, ngrps, nv), dtype=np.float32) * 1e-2),)
fi = (jnp.asarray(rng.random((nbatch, ngrps, nv), dtype=np.float32) * 1e-2),)
pr = jnp.zeros((nbatch,), jnp.float32)
jax.block_until_ready(dr)
stage(f"uploaded; {mem()}")

t0 = time.time()
plan = make_segment_plan(cfg, max(ladder), chunks, (dr,), (di,), (w,), gr, fr, pr)
stage(f"plan compiled in {time.time() - t0:.1f}s; {mem()}")

# rebind the big constants into the plan's entry layouts ONCE (driver
# parity: calibration.run_batched) so plan.run's device_put is a no-op
chunks = plan.put_entries(0, chunks)
dr, = plan.put_entries(1, (dr,))
di, = plan.put_entries(2, (di,))
w, = plan.put_entries(3, (w,))
jax.block_until_ready(dr)
stage(f"entries relayouted; {mem()}")

opt = get_optimizer("Adamax", learning_rate=0.01)
params = (gr, gi, fr, fi)
opt_state = opt.init(params)
big = jnp.asarray(3e38, jnp.float32)
prev = jnp.full((nbatch,), big)
frozen = jnp.zeros((nbatch,), bool)
nsl = jnp.full((nbatch,), maxsteps, jnp.int32)
step0 = 0
warmup = True
for seg_len in ladder:
    stage(f"running segment seg_len={seg_len} (warmup={warmup})")
    args = (chunks, (dr,), (di,), (w,), (), (), pr, pr, params, opt_state,
            prev, frozen, nsl, (), (), (), jnp.asarray(step0, jnp.int32))
    t0 = time.time()
    out = plan.run(seg_len, warmup, args)
    n = int(out[9])  # device->host sync: the execution really finished
    dt = time.time() - t0
    hist = np.asarray(out[8], dtype=np.float32)
    stage(f"seg_len={seg_len}: {n} recorded steps in {dt:.1f}s "
          f"({dt * 1e3 / max(n, 1):.1f} ms/step), "
          f"last loss {hist[n - 1, 0]:.4e}; {mem()}")
    params, opt_state, prev, frozen, nsl = out[0], out[1], out[2], out[3], out[4]
    step0 += n
    warmup = False
stage("probe done")
