"""Speed-of-light accounting for the fused Pallas IPM kernel.

BASELINE's north star says "kernels at speed-of-light per chip"; this
module says what that light-speed IS and how close the kernel sits
(VERDICT r2 weakness #3). The model counts, from the kernel's actual
algorithm structure (ops/pallas_ipm.py), three resources per solve:

  - VREG-ops: VPU issue slots. The kernel's batch-on-lanes layout makes
    every product a rank-1 outer FMA over (rows, cols, 128-lane) tiles;
    one (a, b, 128) f32 elementwise FMA costs a*ceil(b/8) vector-register
    operations. This is the binding resource for the VMEM-resident
    configs: the work is a long *sequential* chain of small vector ops
    (Riccati recursions), so the ceiling is the VPU issue rate, not
    FLOP/s.
  - HBM bytes: streamed configs (N>30) re-read the packed A/B record and
    the P/Z factor rows each iteration; the ceiling is HBM bandwidth.
  - FLOPs: for the batched-throughput path (all 128 lanes carry distinct
    problems) the same VREG count converts to useful FLOP/s.

Hardware constants are the public TPU v5e (1 TensorCore) figures; the
VPU issue rate is (8 sublanes x 128 lanes) x 4 ALUs per cycle — the
"(8, 128)-per-ALU-per-cycle" model of the scaling book.

The model is deliberately a FLOOR-COUNT of the mandatory algebra (it
skips masks, clips and address math), so `achieved / ceiling` fractions
are conservative: the true utilization is higher than reported.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

LANES = 128
SUBLANES = 8

# TPU v5e public per-chip figures
V5E_CLOCK_HZ = 0.94e9
V5E_VPU_ALUS = 4
V5E_HBM_BYTES_S = 819e9
# VPU issue ceiling: ALUs x one (8,128) vreg op per cycle
V5E_VREG_OPS_S = V5E_VPU_ALUS * V5E_CLOCK_HZ
# each vreg FMA = 8*128 lanes * 2 flops
V5E_VPU_FLOPS = V5E_VREG_OPS_S * SUBLANES * LANES * 2


def _vr(m: int) -> int:
    """VREGs of one (m, 128) f32 slab."""
    return math.ceil(m / SUBLANES)


def _contractT(p: int, m: int, n: int) -> int:
    """X^T Y as p rank-1 outer FMAs on (m, n, B) tiles."""
    return p * m * _vr(n)


def _contractT_vec(p: int, m: int) -> int:
    return p * _vr(m)


def _chol_inverse(n: int) -> int:
    """Unrolled equilibrated Cholesky + inverse on (B,) lanes: every
    entry op is one single-VREG op. chol n^3/6 + trsm n^3/6 + recompose
    n^3/2 + equilibration 2n^2, rounded up."""
    return n ** 3 + 2 * n * n


@dataclass
class KernelCost:
    """Per-SOLVE cost of one 128-lane batch tile."""

    vreg_ops: float       # VPU issue slots
    hbm_bytes: float      # streamed bytes (0 for resident configs)
    io_bytes: float       # once-per-solve input read + output write
    flops_per_lane: float  # useful FLOPs for ONE problem (lane)

    def latency_floor_s(self) -> float:
        """Sequential speed-of-light: max of issue time and HBM time.

        io_bytes matters for the BATCHED path (every tile carries 128
        distinct problems whose data must cross HBM exactly once); for
        B=1 deployed ticks it is noise against the issue floor."""
        return max(self.vreg_ops / V5E_VREG_OPS_S,
                   (self.hbm_bytes + self.io_bytes) / V5E_HBM_BYTES_S)


def ipm_kernel_cost(N: int, nx: int, nu: int, iters: int,
                    stream_p: bool | None = None,
                    stream_big: bool | None = None) -> KernelCost:
    """Cost model of ops/pallas_ipm.py for one lane tile (<=128 problems).

    Mirrors the kernel's per-iteration structure: factorize + 2x
    (rhs_grads + bwd + fwd) + alphas/mu_aff + update + kkt (which also
    produces req), plus the one-time init/seed passes.
    """
    if stream_p is None or stream_big is None:
        # mirror ops/pallas_ipm.py: resident while the instance fits the
        # hardware-probed VMEM budget (per-stage ~0.43 MB at 17/6 dims)
        per_stage = (nx * (nx + nu) + nx * nx + nu * nx
                     + 13 * nx + 11 * nu) * LANES * 4
        resident = per_stage * N <= 88 * 1024 * 1024
        if stream_p is None:
            stream_p = not resident
        if stream_big is None:
            stream_big = not resident
    if stream_big:
        stream_p = True

    # ---- per-stage VREG-op counts (see module docstring) ----
    factor = (_contractT(nx, nx, nx)          # PA
              + _contractT(nx, nx, nu)        # PB
              + _contractT(nx, nu, nu)        # Huu = B'PB
              + _contractT(nx, nu, nx)        # Hux = B'PA
              + _chol_inverse(nu)
              + _contractT(nu, nu, nx)        # Z = Hinv Hux
              + _contractT(nx, nx, nx)        # A'PA
              + _contractT(nu, nx, nx)        # Hux'Z
              + 4 * nx * _vr(nx))             # sigmas + symmetrize
    bwd = (_contractT_vec(nx, nx)             # P req
           + _contractT_vec(nx, nu)           # B'Pcp
           + _contractT_vec(nu, nu)           # Hinv Gu
           + _contractT_vec(nx, nx)           # A'Pcp
           + _contractT_vec(nu, nx))          # Z'Gu
    fwd = (_contractT_vec(nx, nu)             # Z dx (matvec)
           + _contractT_vec(nx, nx)           # A dx
           + _contractT_vec(nu, nx)           # B du
           + 2 * _vr(nx))
    kkt = (_contractT_vec(nu, nu) + _contractT_vec(nx, nu)
           + _contractT_vec(nx, nx)           # A dx (pred)
           + _contractT_vec(nu, nx)           # B du (pred)
           + _contractT_vec(nx, nx)           # Qs dx
           + _contractT_vec(nx, nx)           # A'lam
           + 6 * _vr(nx))
    rhs = (2 * _contractT_vec(nx, nx)         # stage+terminal gradient
           + _contractT_vec(nu, nu)
           + 10 * (_vr(nx) + _vr(nu)))        # bound forcing terms
    # fraction-to-boundary + Mehrotra targets: ~8 bound families, each a
    # handful of elementwise ops + a min-reduce; two alpha passes + the
    # mu_aff pass + the update pass + two comp_sums
    elementwise = (2 * 8 * 6 * (_vr(nx) + _vr(nu))     # alphas (pred+corr)
                   + 8 * 6 * (_vr(nx) + _vr(nu))       # mu_aff targets
                   + 8 * 3 * (_vr(nx) + _vr(nu))       # update
                   + 2 * 4 * (_vr(nx) + _vr(nu)))      # comp sums

    per_iter_stage = factor + 2 * (bwd + fwd + rhs) + kkt + elementwise
    init = N * (2 * _contractT_vec(nx, nx) + 20 * (_vr(nx) + _vr(nu)))
    vreg_ops = iters * N * per_iter_stage + init + N * kkt  # seed kkt

    # ---- HBM traffic of the streamed configs (bytes, per lane tile) ----
    row_ab = nx * (nx + nu) * LANES * 4
    row_p = nx * nx * LANES * 4
    row_z = nu * nx * LANES * 4
    hbm = 0.0
    if stream_big:
        # AB read passes per iteration: kkt, factorize, 2x bwd, 2x fwd
        hbm += iters * 6 * N * row_ab + N * row_ab  # + init pass
        hbm += iters * (1 + 4) * N * row_z          # Z: 1 write, 4 reads
    if stream_p:
        hbm += iters * (1 + 2) * N * row_p          # P: 1 write, 2 reads
    # once-per-solve I/O: every input tensor read + every output written
    # exactly once per tile (ops/pallas_ipm.py in/out shapes, resident)
    lane_b = LANES * 4
    io_in = (N * nx * (nx + nu) + N * nx          # AB, c
             + 2 * nx * nx + nu * nu              # Qs, Qt, R
             + (N + 1) * nx + N * nu              # q, r
             + 2 * N * nx + 2 * N * nu + nx)      # bounds, dx0
    io_out = ((N + 1) * nx + N * nu + 3           # dx, du, diag
              + 4 * N * nx + 4 * N * nu)          # slack/dual outputs
    io = float((io_in + io_out) * lane_b)

    # one (8,128) vreg FMA contributes 8 sublane rows x 2 flops to EVERY
    # lane — per-lane flops carry no /LANES factor (r4 fix: the old
    # "/LANES" under-reported useful_flops_per_solve 128x; fractions
    # were never affected)
    flops_per_lane = vreg_ops * SUBLANES * 2
    return KernelCost(vreg_ops=float(vreg_ops), hbm_bytes=float(hbm),
                      io_bytes=io,
                      flops_per_lane=float(flops_per_lane))


def speed_of_light(N: int, nx: int, nu: int, iters: int,
                   measured_s: float, batch_lanes: int = 1,
                   stream_p: bool | None = None,
                   stream_big: bool | None = None) -> dict:
    """Compare a measured per-solve (lane-tile) time to the model floor.

    Returns the floor, the achieved fraction (floor/measured — what share
    of light-speed the kernel runs at), which resource binds, and the
    implied utilizations of both resources.
    """
    cost = ipm_kernel_cost(N, nx, nu, iters, stream_p, stream_big)
    t_issue = cost.vreg_ops / V5E_VREG_OPS_S
    t_hbm = (cost.hbm_bytes + cost.io_bytes) / V5E_HBM_BYTES_S
    floor = max(t_issue, t_hbm)
    return {
        "floor_ms": floor * 1e3,
        "model_frac": floor / measured_s,
        "bound_by": "hbm" if t_hbm > t_issue else "vpu_issue",
        "vpu_issue_frac": t_issue / measured_s,
        "hbm_frac": t_hbm / measured_s,
        "vreg_ops": cost.vreg_ops,
        "hbm_gb": (cost.hbm_bytes + cost.io_bytes) / 1e9,
        "useful_flops_per_solve": cost.flops_per_lane,
        "lane_occupancy": batch_lanes / LANES,
    }


def batched_speed_of_light(N: int, nx: int, nu: int, iters: int,
                           solves_per_s: float) -> dict:
    """Roofline for the BATCHED THROUGHPUT path (BASELINE config 4): all
    128 lanes carry distinct problems, tiles run sequentially via the
    outer lax.map, so light-speed throughput is

        LANES / tile_floor  solves/s/chip,

    with tile_floor = max(issue time, (streamed + once-per-solve I/O)
    bytes / HBM BW). Reports which resource binds at full lane
    occupancy and the achieved fraction of the model ceiling.
    """
    cost = ipm_kernel_cost(N, nx, nu, iters, False, False)
    t_issue = cost.vreg_ops / V5E_VREG_OPS_S
    t_hbm = (cost.hbm_bytes + cost.io_bytes) / V5E_HBM_BYTES_S
    tile_floor = max(t_issue, t_hbm)
    ceiling = LANES / tile_floor
    return {
        "ceiling_solves_per_s": ceiling,
        "model_frac": solves_per_s / ceiling,
        "bound_by": "hbm" if t_hbm > t_issue else "vpu_issue",
        "tile_floor_ms": tile_floor * 1e3,
        "io_bytes_per_tile": cost.io_bytes,
        "flops_per_solve": cost.flops_per_lane,
        "useful_flops_s": cost.flops_per_lane * solves_per_s,
    }
