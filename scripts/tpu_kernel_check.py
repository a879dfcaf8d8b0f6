"""Hardware validation of the generalized Pallas IPM kernel (round 2).

Checks, on the real chip:
  1. N=20 kernel v2 (masks + warm aliasing) compiles, fits VMEM, matches
     the XLA IPM on objective; cold + warm latency at B=1.
  2. The deployed warm latency loop (qp_backend="pallas") tick time at
     ipm_iters in {4, 6} — the >=1000 Hz candidate configuration.
  3. N=60 stream_p path compiles and solves (VERDICT r1: asserted but
     never benched).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_kernel_check.py
"""
# TIMING CAVEAT (round 3): this script predates the discovery that
# jax.block_until_ready does NOT reliably wait on the axon tunnel platform.
# Its absolute wall-clock numbers are unreliable; use
# mpc_blaster_tpu.utils.timing.device_time (fetch-based) for new work.
import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def build_qps(N, B):
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state

    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=np.asarray(preset.loop.yref),
                      dtype=jnp.float32)
    params = BlasterParams.from_config(ocp.model, jnp.float32)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    rng = np.random.default_rng(0)
    qps = []
    for i in range(B):
        x0 = np.zeros(cfg.NX, np.float32)
        x0[0:3] = rng.uniform(-0.4, 0.4, 3)
        x0[2] = rng.uniform(1.5, 3.4)
        st = init_rti_state(ocp, jnp.asarray(x0), jnp.float32)
        qps.append(build_qp(spec, st, jnp.asarray(x0), F, params))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qps), ocp, spec


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve
    from mpc_blaster_tpu.qp.data import qp_objective
    from mpc_blaster_tpu.qp.ipm import box_qp_solve, warm_start_from

    results = {}

    # ---- 1. N=20 kernel v2 correctness + latency ----
    log("check: building N=20 QPs")
    data, ocp20, spec20 = build_qps(20, 4)
    log("check: compiling pallas N=20 (v2)")
    sol = pallas_box_qp_solve(data, iters=12)
    jax.block_until_ready(sol.du)
    ref = jax.jit(jax.vmap(lambda d: box_qp_solve(d, iters=12)))(data)
    objs_p = [float(qp_objective(jax.tree.map(lambda x: x[i], data),
                                 sol.dx[i], sol.du[i])) for i in range(4)]
    objs_x = [float(qp_objective(jax.tree.map(lambda x: x[i], data),
                                 ref.dx[i], ref.du[i])) for i in range(4)]
    rel = max(abs(a - b) / max(abs(b), 1.0) for a, b in zip(objs_p, objs_x))
    results["n20_obj_rel_diff"] = rel
    results["n20_finite_warm_out"] = bool(
        np.isfinite(np.asarray(sol.s_lx)).all()
        and np.isfinite(np.asarray(sol.lam_lu)).all())
    log(f"check: N=20 obj rel diff vs XLA = {rel:.2e}, "
        f"warm-out finite = {results['n20_finite_warm_out']}")

    # warm round-trip at B=1 + latency
    d1 = jax.tree.map(lambda a: a[:1], data)
    K = 32

    @jax.jit
    def chain_warm(qp, iters=6):
        from mpc_blaster_tpu.qp.ipm import IpmWarmStart
        w0 = IpmWarmStart.zeros(20, 17, 6)
        w0 = jax.tree.map(lambda a: a[None] + 0.0 * qp.dx0[0, 0], w0)

        def body(w, _):
            s = pallas_box_qp_solve(qp, iters=6, warm=w)
            return jax.vmap(warm_start_from)(s), s.du[0, 0, 0]
        w, us = jax.lax.scan(body, w0, None, length=K)
        return us

    log("check: compiling warm chain (B=1, N=20)")
    ms = timeit(lambda: chain_warm(d1)) / K * 1e3
    results["n20_b1_warmqp6_ms"] = ms
    log(f"check: pallas warm-chained QP (6 iters) = {ms:.3f} ms")

    # ---- 2. deployed warm latency loop ----
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.sim.closedloop import make_closed_loop
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(2.0)
    for iters in (6, 4):
        log(f"check: compiling deployed warm loop pallas iters={iters}")
        ocp_w = dataclasses.replace(
            ocp20, solver=dataclasses.replace(
                ocp20.solver, ipm_iters=iters, qp_backend="pallas"))
        runner = make_closed_loop(ocp_w, K, dtype=jnp.float32,
                                  warm_start=True)
        res = runner(spec20, x0)
        jax.block_until_ready(res.xs)
        assert bool(jnp.isfinite(res.xs).all()), "warm loop NaN"
        ms = timeit(lambda: runner(spec20, x0)) / K * 1e3
        results[f"tick_warm{iters}_pallas_ms"] = ms
        results[f"tick_warm{iters}_pallas_hz"] = 1e3 / ms
        # closed-loop quality: altitude approach
        results[f"tick_warm{iters}_z_final"] = float(res.xs[-1, 2])
        log(f"check: warm{iters} pallas tick = {ms:.3f} ms "
            f"({1e3/ms:.0f} Hz), z_final={float(res.xs[-1,2]):.3f}")

    # ---- 3. N=60 stream_p ----
    log("check: building N=60 QPs")
    data60, _, _ = build_qps(60, 2)
    log("check: compiling pallas N=60 (stream_p)")
    try:
        s60 = pallas_box_qp_solve(data60, iters=12)
        jax.block_until_ready(s60.du)
        r60 = jax.jit(jax.vmap(lambda d: box_qp_solve(d, iters=12)))(data60)
        objs_p = [float(qp_objective(jax.tree.map(lambda x: x[i], data60),
                                     s60.dx[i], s60.du[i])) for i in range(2)]
        objs_x = [float(qp_objective(jax.tree.map(lambda x: x[i], data60),
                                     r60.dx[i], r60.du[i])) for i in range(2)]
        rel = max(abs(a - b) / max(abs(b), 1.0)
                  for a, b in zip(objs_p, objs_x))
        results["n60_obj_rel_diff"] = rel
        t = timeit(lambda: pallas_box_qp_solve(data60, iters=12), reps=3)
        results["n60_b2_solve_ms"] = t * 1e3
        log(f"check: N=60 ok, obj rel diff {rel:.2e}, {t*1e3:.2f} ms")
    except Exception as e:
        results["n60_error"] = str(e)[:400]
        log(f"check: N=60 FAILED: {e}")

    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
