"""r5: sublane-packing lever sized on an ISOLATED microkernel (no
production-kernel surgery). ROADMAP round-6 candidate 1 proposes packing
4 stages' nu-blocks (6 rows each) into one sublane tile to close the
kernel's 71-75% vreg fill (DESIGN.md §7 r4c attribution). Decisive
questions, answerable without touching ops/pallas_ipm.py:

  Q1 (padding waste): does a dependent FMA chain on a (6,128) / (17,128)
     tile cost the same per step as the full-vreg (8,128) / (24,128)
     ones?  If yes, the underfill IS pure waste and packing has headroom.
  Q2 (the decisive A/B): do 4 INDEPENDENT 6-row chains, co-resident the
     way per-stage loop bodies are, already run at the packed 24-row
     chain's speed?  Mosaic overlapping independent chains is exactly
     what killed the r4 tree-sum lever (-45%); if the 4 chains overlap
     to the packed tile's cost, the layout surgery has nothing to win.

Methodology note (v1 of this probe, superseded in-file): chaining
pallas_calls from host puts ~6 us of device work per call against the
~28 ms tunnel RTT correction — the printed "per-step" numbers were RTT
jitter, non-monotonic in rows. v2 runs the dependence chain INSIDE the
kernel (`lax.fori_loop`, 1e6 steps of `acc = acc * x + x`, true loop-
carried dependence, x in [0.4,0.6] so acc stays ~x/(1-x)), giving
O(5 ms) of device work per call; launch overhead and RTT amortize away.
Emits one JSON line per row; conclusion keys `pack4_speedup_vs_4chains`
(Q2) and `pad_waste_*` (Q1).
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from jax.experimental import pallas as pl                      # noqa: E402

from mpc_blaster_tpu.utils.timing import device_time, measure_rtt  # noqa: E402

LANES = 128
STEPS = 1_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


results = {}


def emit(k, v):
    results[k] = v
    log(json.dumps({k: v}))


def _chain_kernel(x_ref, y_ref, o_ref, *, steps, nchains):
    """nchains independent in-kernel dependent-FMA chains on row groups.

    Each chain's step is `acc = acc * x + x` on its own (per,128) tile —
    a loop-carried dependence no compiler can reassociate. x constant
    per chain (distinct across chains); per-step cost is therefore pure
    FMA issue/latency at the given tile shape.
    """
    rows = o_ref.shape[0]
    per = rows // nchains
    xs = [x_ref[i * per:(i + 1) * per, :] for i in range(nchains)]
    accs = tuple(y_ref[i * per:(i + 1) * per, :] for i in range(nchains))

    def body(_, accs):
        return tuple(a * x + x for a, x in zip(accs, xs))

    accs = jax.lax.fori_loop(0, steps, body, accs)
    for i in range(nchains):
        o_ref[i * per:(i + 1) * per, :] = accs[i]


def make_chain(rows, steps, nchains, interpret=False):
    kern = functools.partial(_chain_kernel, steps=steps, nchains=nchains)
    return jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    ))


def _sep_ref_kernel(*refs, steps, nchains):
    """nchains chains, each on its OWN (rows,128) ref — the production
    per-stage layout (every stage tile vreg-aligned, padded to 8)."""
    x_refs, y_refs = refs[:nchains], refs[nchains:2 * nchains]
    o_refs = refs[2 * nchains:]
    xs = [r[...] for r in x_refs]
    accs = tuple(r[...] for r in y_refs)

    def body(_, accs):
        return tuple(a * x + x for a, x in zip(accs, xs))

    accs = jax.lax.fori_loop(0, steps, body, accs)
    for o, a in zip(o_refs, accs):
        o[...] = a


def make_sep(rows, steps, nchains, interpret=False):
    kern = functools.partial(_sep_ref_kernel, steps=steps, nchains=nchains)
    call = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
                   for _ in range(nchains)],
        interpret=interpret,
    )
    return jax.jit(lambda xs, ys: call(*xs, *ys))


def main():
    interpret = jax.devices()[0].platform != "tpu"
    steps = 200 if interpret else STEPS
    log(f"device: {jax.devices()[0]}, RTT {measure_rtt()*1e3:.2f} ms, "
        f"interpret={interpret}, steps={steps}")
    rng = np.random.default_rng(0)

    def run(rows, nchains, label):
        x = jnp.asarray(rng.uniform(0.4, 0.6, (rows, LANES)), jnp.float32)
        y = jnp.asarray(rng.uniform(0.4, 0.6, (rows, LANES)), jnp.float32)
        fn = make_chain(rows, steps, nchains, interpret)
        out = fn(x, y)
        assert bool(jnp.isfinite(out).all())
        t = device_time(lambda: fn(x, y), reps=10)
        ns_per_step = t / steps * 1e9
        emit(label, round(ns_per_step, 3))
        return ns_per_step

    # Q1: padding waste — per-step cost vs row count, single chain
    costs = {}
    for rows in (6, 8, 16, 17, 24, 32):
        costs[rows] = run(rows, 1, f"chain_ns_rows{rows}")

    # Q2: 4 independent 6-row chains co-resident vs one packed 24-row tile
    c4 = run(24, 4, "chain_ns_rows24_4chains")
    c32_4 = run(32, 4, "chain_ns_rows32_4chains")  # 4x full-vreg chains

    # Q2b (production-exact): 4 chains on SEPARATE vreg-aligned (6,128)
    # refs — each stage tile padded to its own vreg, as the kernel's
    # per-stage arrays are
    xs4 = [jnp.asarray(rng.uniform(0.4, 0.6, (6, LANES)), jnp.float32)
           for _ in range(4)]
    ys4 = [jnp.asarray(rng.uniform(0.4, 0.6, (6, LANES)), jnp.float32)
           for _ in range(4)]
    fsep = make_sep(6, steps, 4, interpret)
    outs = fsep(xs4, ys4)
    assert all(bool(jnp.isfinite(o).all()) for o in outs)
    tsep = device_time(lambda: fsep(xs4, ys4), reps=10)
    csep = tsep / steps * 1e9
    emit("chain_ns_sep4x6", round(csep, 3))

    emit("pad_waste_6_vs_8", round(costs[8] / costs[6], 3))
    emit("pad_waste_17_vs_24", round(costs[24] / costs[17], 3))
    # packed tile vs what the production kernel effectively does today
    # (independent per-stage chains Mosaic may overlap):
    emit("pack4_speedup_vs_4chains", round(c4 / costs[24], 3))
    # upper bound if chains did NOT overlap at all:
    emit("pack4_speedup_vs_serial", round(4 * costs[6] / costs[24], 3))
    emit("overlap_factor_4chains", round(4 * costs[6] / c4, 3))
    emit("fullvreg_pack4_vs_4chains", round(c32_4 / costs[32], 3))
    # the production-layout verdict: packed 24-row tile vs 4 separate
    # aligned stage tiles (>1 would mean packing wins; <=1 kills it)
    emit("pack4_speedup_vs_sep_refs", round(csep / costs[24], 3))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
