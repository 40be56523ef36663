#!/usr/bin/env python
"""Round-5 cost model for the fused-BVH kernel, measured RTT-immune
(tools/mbench.py two-point slope; round-4's absolute per-call numbers
were tunnel-latency-dominated).

Groups:
  sweep:  vpu_dyn mxu_df mxu_hi mxu_fold   (128 rays x 128 slots / round)
  floor:  nop reduce1 narrow20             (loop + reduce + (128,1) ops)
  skel:   pick2 fill128 fill256 transpose6 colg8
          (the per-round pick chain; the entry-matrix fill; the per-bounce
           (8,128)<->(128,8) relayouts; the per-group column gathers)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuspectral_tpu.utils.jaxcache import enable
from tools.mbench import measure

enable()

R = 128
LANE = 128
C_PAD = 256
_HI = jax.lax.Precision.HIGHEST
_BIG = 1e30
_BIGI = 1 << 30


def _woop_math(rows, ox, oy, oz, dx, dy, dz, bt):
    ax0, ax1, ax2, ay0, ay1, ay2, az0, az1, az2, bx, by, bz = rows
    opz = ox * az0 + oy * az1 + oz * az2 + bz
    dpz = dx * az0 + dy * az1 + dz * az2
    live = jnp.abs(dpz) > 1e-12
    t = -opz / jnp.where(live, dpz, 1.0)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    u = px * ax0 + py * ax1 + pz * ax2 + bx
    v = px * ay0 + py * ay1 + pz * ay2 + by
    ok = live & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    hit = ok & (t > 0.0) & (t < bt)
    tm = jnp.where(hit, t, _BIG)
    return jnp.minimum(bt, jnp.min(tm, axis=1, keepdims=True))


def make(mode, n):
    prec = _HI if mode == "mxu_hi" else jax.lax.Precision.DEFAULT
    fold = mode == "mxu_fold"

    def kernel(woop_ref, w6_ref, rays_ref, rays8_ref, tn_ref, out_ref):
        ox = rays_ref[0:1, :].T
        oy = rays_ref[1:2, :].T
        oz = rays_ref[2:3, :].T
        dx = rays_ref[3:4, :].T
        dy = rays_ref[4:5, :].T
        dz = rays_ref[5:6, :].T
        r8 = rays8_ref[:, 0:8]
        slot_i = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C_PAD), 1)

        def body(i, carry):
            bt, nar, vis, acc = carry
            if mode == "vpu_dyn":
                off = (i % 4) * LANE
                sl = pl.ds(pl.multiple_of(off, LANE), LANE)
                rows = [woop_ref[k, sl][None, :] for k in range(12)]
                bt = _woop_math(rows, ox, oy, oz, dx, dy, dz, bt)
            elif mode.startswith("mxu"):
                off = (i % 4) * (6 * LANE)
                w6 = w6_ref[0:8,
                            pl.ds(pl.multiple_of(off, 6 * LANE), 6 * LANE)]
                fmat = jax.lax.dot_general(
                    r8, w6, dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                ou = fmat[:, 0 * LANE:1 * LANE]
                ov = fmat[:, 1 * LANE:2 * LANE]
                opz = fmat[:, 2 * LANE:3 * LANE]
                du = fmat[:, 3 * LANE:4 * LANE]
                dv = fmat[:, 4 * LANE:5 * LANE]
                dpz = fmat[:, 5 * LANE:6 * LANE]
                live = jnp.abs(dpz) > 1e-12
                t = -opz / jnp.where(live, dpz, 1.0)
                u = ou + t * du
                v = ov + t * dv
                ok = live & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                hit = ok & (t > 0.0) & (t < bt)
                tm = jnp.where(hit, t, _BIG)
                t_it = jnp.min(tm, axis=1, keepdims=True)
                if fold:
                    improved = t_it < bt
                    fs = jnp.min(jnp.where(tm == t_it, slot_i, _BIGI),
                                 axis=1, keepdims=True)
                    first = ((slot_i == fs) & hit).astype(jnp.float32)
                    attr_new = jax.lax.dot_general(
                        first, woop_ref[0:12, 0:LANE],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
                    bt = jnp.where(improved, t_it, bt)
                    acc = jnp.where(improved, attr_new[:, 0:1], acc)
                else:
                    bt = jnp.minimum(bt, t_it)
            elif mode == "nop":
                bt = bt + 1.0
            elif mode == "reduce1":
                x = tn_ref[:, 0:LANE] + bt
                nar = jnp.minimum(nar, jnp.min(x, axis=1, keepdims=True))
            elif mode == "narrow20":
                v = nar
                for k in range(10):
                    v = v * 1.0000001 + 0.5
                nar = v
            elif mode == "pick2":
                # the production pick chain: candidate mask over (R, C_PAD),
                # per-subgroup min, K=2 vector-domain argmin picks + scalar
                # extraction + a dependent dynamic row load
                act = tn_ref[:, :] + vis
                cand = jnp.where(act < bt, act, _BIG)
                m = jnp.min(cand, axis=0, keepdims=True)
                bins = []
                for _ in range(2):
                    mn = jnp.min(m, axis=1, keepdims=True)
                    bv = jnp.min(jnp.where(m == mn, col, _BIGI), axis=1,
                                 keepdims=True)
                    bins.append(bv)
                    m = jnp.where(col == bv, _BIG, m)
                    vis = jnp.where(col == bv, _BIG, vis)
                b0 = bins[0][0, 0]
                bt = bt + woop_ref[0, pl.ds(
                    pl.multiple_of(b0 % 4 * LANE, LANE), LANE)][None, :].T
                vis = jnp.where(vis > 1e29, 0.0, vis)  # keep candidates alive
            elif mode in ("fill128", "fill256"):
                c = 128 if mode == "fill128" else C_PAD
                lox = tn_ref[0:1, 0:c]
                loy = tn_ref[1:2, 0:c]
                loz = tn_ref[2:3, 0:c]
                hix = tn_ref[3:4, 0:c]
                hiy = tn_ref[4:5, 0:c]
                hiz = tn_ref[5:6, 0:c]
                ix = 1.0 / jnp.where(dx < 0, -jnp.maximum(jnp.abs(dx), 1e-12),
                                     jnp.maximum(jnp.abs(dx), 1e-12))
                iy = 1.0 / jnp.where(dy < 0, -jnp.maximum(jnp.abs(dy), 1e-12),
                                     jnp.maximum(jnp.abs(dy), 1e-12))
                iz = 1.0 / jnp.where(dz < 0, -jnp.maximum(jnp.abs(dz), 1e-12),
                                     jnp.maximum(jnp.abs(dz), 1e-12))
                t0x = (lox - ox) * ix
                t1x = (hix - ox) * ix
                t0y = (loy - oy) * iy
                t1y = (hiy - oy) * iy
                t0z = (loz - oz) * iz
                t1z = (hiz - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), bt))
                e = jnp.where(tf >= tn, tn, _BIG)
                bt = jnp.minimum(bt, jnp.min(e, axis=1, keepdims=True))
            elif mode == "transpose6":
                v = bt + jnp.zeros((R, 8), jnp.float32)
                for k in range(6):
                    v = jnp.transpose(jnp.transpose(v) * 1.0000001)
                bt = bt + v[:, 0:1]
            elif mode == "colg8":
                gcol = jax.lax.broadcasted_iota(jnp.int32, (R, 8), 1)
                M = bt + jnp.zeros((R, 8), jnp.float32)
                s = bt
                for g in range(8):
                    s = s + jnp.sum(jnp.where(gcol == g, M, 0.0), axis=1,
                                    keepdims=True)
                bt = s
            return bt, nar, vis, acc

        init = (jnp.full((R, 1), _BIG), jnp.full((R, 1), _BIG),
                jnp.zeros((1, C_PAD), jnp.float32),
                jnp.zeros((R, 1), jnp.float32))
        bt, nar, vis, acc = jax.lax.fori_loop(0, n, body, init)
        out_ref[:, :] = bt + nar + acc + jnp.min(vis)

    return kernel


def run(mode):
    rs = np.random.default_rng(0)
    woop = jnp.asarray(rs.normal(size=(12, 4 * LANE)).astype(np.float32))
    rays = jnp.asarray(rs.normal(size=(8, R)).astype(np.float32))
    tn = jnp.asarray(
        np.abs(rs.normal(size=(R, C_PAD))).astype(np.float32) * 10)
    wnp = np.asarray(woop).reshape(12, 4, LANE).transpose(1, 0, 2)
    wz = np.zeros((4, 8, 6 * LANE), np.float32)
    for c in range(4):
        wz[c, 0:3, 0:LANE] = wnp[c, 0:3]
        wz[c, 3, 0:LANE] = wnp[c, 9]
        wz[c, 0:3, LANE:2 * LANE] = wnp[c, 3:6]
        wz[c, 3, LANE:2 * LANE] = wnp[c, 10]
        wz[c, 0:3, 2 * LANE:3 * LANE] = wnp[c, 6:9]
        wz[c, 3, 2 * LANE:3 * LANE] = wnp[c, 11]
        wz[c, 4:7, 3 * LANE:4 * LANE] = wnp[c, 0:3]
        wz[c, 4:7, 4 * LANE:5 * LANE] = wnp[c, 3:6]
        wz[c, 4:7, 5 * LANE:6 * LANE] = wnp[c, 6:9]
    w6 = jnp.asarray(np.concatenate(list(wz), axis=1).reshape(8, -1))
    r8 = np.zeros((R, 8), np.float32)
    r8[:, 0:3] = np.asarray(rays)[0:3].T
    r8[:, 3] = 1.0
    r8[:, 4:7] = np.asarray(rays)[3:6].T
    r8j = jnp.asarray(r8)

    def f(n, *args):
        return pl.pallas_call(
            make(mode, n),
            out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)

    ns = measure(f, (woop, w6, rays, r8j, tn))
    print(f"{mode:10s} {ns:8.1f} ns/round", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ("nop", "reduce1", "narrow20", "vpu_dyn",
                             "mxu_df", "mxu_hi", "mxu_fold", "pick2",
                             "fill128", "fill256", "transpose6", "colg8")
    for mode in modes:
        run(mode)
