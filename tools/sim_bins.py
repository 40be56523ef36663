#!/usr/bin/env python
"""Compare ftb traversal cost under different bin constructions.

Schemes:
  cons-<slots>  : current production bins — consecutive SAH leaves grouped
                  until <slots> triangle slots (bvh/binned.build_bins)
  cut-<target>  : subtree-cut bins (bvh/sah.sah_cuts): maximal SAH subtrees
                  of <= target tris, padded to `target` slots

Ray sets:
  incoh : origins on random triangle surfaces, random hemisphere dirs,
          sorted by the wavefront's ray sort key (worst case)
  tile  : blocks = 128 consecutive pixels' depth-1 diffuse bounce rays
          (origins from primary hits of an 8x16 pixel tile, cosine dirs) —
          the megakernel's actual block shape

Reports per scheme x ray set: fill, votes/ray, union, ftb rounds, and a
flop-model cost/ray -> est. Mrays/s at 0.8 Tflop/s VPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REF = "/root/reference/src/GPUSpectral/assets/scenes"
B = 128


def slab(o, d, lo, hi, tmax):
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    t0 = (lo[None] - o[:, None]) * inv[:, None]
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
    tf = np.minimum(np.maximum(t0, t1).min(-1), tmax[:, None])
    return np.where(tf >= tn, tn, 1e30)


def ftb_rounds(tn, t_final):
    r, c = tn.shape
    t_best = np.full(r, 1e30)
    vis = np.zeros(c, bool)
    rounds = 0
    while True:
        act = np.where(~vis[None, :], tn, 1e30)
        act = np.where(act < t_best[:, None], act, 1e30)
        if act.min() >= 1e30:
            return rounds
        binv = np.unravel_index(np.argmin(act), act.shape)[1]
        commit = (tn[:, binv] <= t_final) & (t_final < 1e29)
        t_best = np.where(commit, t_final, t_best)
        vis[binv] = True
        rounds += 1


def cut_bins(tri_pos, num_tris, target):
    from gpuspectral_tpu.bvh.sah import sah_cuts

    order, _sizes, bins = sah_cuts(tri_pos, num_tris, leaf_target=16,
                                   bin_target=target)
    starts = np.concatenate([[0], np.cumsum(bins)])
    lo = np.empty((len(bins), 3), np.float32)
    hi = np.empty((len(bins), 3), np.float32)
    p = np.asarray(tri_pos[:num_tris])[order]
    for i in range(len(bins)):
        chunk = p[starts[i]:starts[i + 1]]
        lo[i] = chunk.min((0, 1))
        hi[i] = chunk.max((0, 1))
    fill = num_tris / (len(bins) * target)
    return lo, hi, fill, target


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else f"{REF}/staircase2/scene.xml"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    import jax.numpy as jnp
    from gpuspectral_tpu.scene import load_mitsuba_scene
    from gpuspectral_tpu.ops.intersect import intersect_closest
    from gpuspectral_tpu.scene.camera import generate_rays
    from gpuspectral_tpu.utils.config import RenderConfig

    scene, bld = load_mitsuba_scene(scene_path)
    T = scene.num_tris
    print(f"tris={T} prod bins={scene.bvh_bins} slots={scene.bvh_bin_slots}")
    tp_slots = np.asarray(scene.tri_pos)  # slot-ordered (current layout)

    # --- schemes ---
    prod_lo = np.asarray(scene.bvh_bin_bounds)[0:3, : scene.bvh_bins].T
    prod_hi = np.asarray(scene.bvh_bin_bounds)[3:6, : scene.bvh_bins].T
    nslots = scene.bvh_bins * scene.bvh_bin_slots
    schemes = {
        f"cons-{scene.bvh_bin_slots}": (
            prod_lo, prod_hi, T / nslots, scene.bvh_bin_slots),
    }
    # un-permuted original triangles for the cut builds
    real = np.concatenate(bld.tri_pos).astype(np.float32)
    assert real.shape[0] == T, (real.shape, T)
    for target in (128, 256, 512, 1024):
        schemes[f"cut-{target}"] = cut_bins(real, real.shape[0], target)

    # --- ray sets ---
    rs = np.random.default_rng(0)

    def incoh_rays(n):
        ti = rs.integers(0, T, n)
        tp = real[: T]
        bc = rs.dirichlet((1, 1, 1), n).astype(np.float32)
        o = np.einsum("rk,rkc->rc", bc, tp[ti % tp.shape[0]])
        d = rs.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        nrm = np.cross(tp[ti, 1] - tp[ti, 0], tp[ti, 2] - tp[ti, 0])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        d = np.where((d * nrm).sum(-1, keepdims=True) < 0, -d, d)
        o = (o + 1e-4 * nrm).astype(np.float32)
        from gpuspectral_tpu.integrator.path_tracer import _ray_sort_key
        key = np.asarray(_ray_sort_key(scene, jnp.asarray(o), jnp.asarray(d),
                                       jnp.zeros((n,), bool)))
        srt = np.argsort(key)
        return o[srt], d[srt]

    def tile_rays(n):
        # depth-1 bounce rays for random 8x16 pixel tiles at 256x256
        W = H = 256
        pix = jnp.arange(W * H, dtype=jnp.int32)
        o_all, d_all = generate_rays(scene.camera, W, H, pix)
        o_all = np.asarray(o_all); d_all = np.asarray(d_all)
        os_, ds_ = [], []
        nblk = n // B
        for _ in range(nblk):
            ty = rs.integers(0, H // 8) * 8
            tx = rs.integers(0, W // 16) * 16
            idx = (np.arange(8)[:, None] + ty) * W + (np.arange(16)[None] + tx)
            idx = idx.ravel()
            t, prim, _, _ = intersect_closest(
                jnp.asarray(o_all[idx]), jnp.asarray(d_all[idx]), scene.tri_pos)
            t = np.asarray(t); prim = np.asarray(prim)
            hit = prim >= 0
            p = o_all[idx] + t[:, None] * d_all[idx]
            tri = tp_slots[np.maximum(prim, 0)]
            nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
            nrm /= np.maximum(np.linalg.norm(nrm, -1, keepdims=True), 1e-12)
            nrm = np.where((nrm * d_all[idx]).sum(-1, keepdims=True) > 0, -nrm, nrm)
            # cosine bounce
            u1, u2 = rs.random(B), rs.random(B)
            r = np.sqrt(u1); ph = 2 * np.pi * u2
            loc = np.stack([r * np.cos(ph), r * np.sin(ph), np.sqrt(1 - u1)], -1)
            up = np.where(np.abs(nrm[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
            tx_ = np.cross(up, nrm); tx_ /= np.maximum(np.linalg.norm(tx_, -1, keepdims=True), 1e-12)
            ty_ = np.cross(nrm, tx_)
            d2 = loc[:, 0:1] * tx_ + loc[:, 1:2] * ty_ + loc[:, 2:3] * nrm
            # missed-primary lanes: keep the primary ray (still coherent)
            o2 = np.where(hit[:, None], p + 1e-4 * nrm, o_all[idx])
            d2 = np.where(hit[:, None], d2, d_all[idx])
            os_.append(o2.astype(np.float32)); ds_.append(d2.astype(np.float32))
        return np.concatenate(os_), np.concatenate(ds_)

    ray_sets = {"incoh": incoh_rays(n), "tile": tile_rays(n)}

    # ground-truth closest t per ray set
    tfin = {}
    for name, (o, d) in ray_sets.items():
        ts = []
        for i in range(0, len(o), 4096):
            t, prim, _, _ = intersect_closest(jnp.asarray(o[i:i + 4096]),
                                              jnp.asarray(d[i:i + 4096]),
                                              scene.tri_pos)
            ts.append(np.where(np.asarray(prim) >= 0, np.asarray(t), 1e30))
        tfin[name] = np.concatenate(ts)

    print(f"{'scheme':>10} {'set':>6} {'bins':>5} {'fill':>5} {'votes':>6} "
          f"{'union':>6} {'rounds':>6} {'ns/ray':>7} {'Mrays':>6}")
    for sname, (lo, hi, fill, slots) in schemes.items():
        C = lo.shape[0]
        c_pad = -(-C // 128) * 128
        for rname, (o, d) in ray_sets.items():
            tmax = np.full(len(o), 1e30, np.float32)
            votes, unions, rounds = [], [], []
            for b in range(len(o) // B):
                sl = slice(b * B, (b + 1) * B)
                tn = slab(o[sl], d[sl], lo, hi, tmax[sl])
                voted = tn < 1e29
                votes.append(voted.sum(1).mean())
                unions.append(voted.any(0).sum())
                rounds.append(ftb_rounds(tn, tfin[rname][sl]))
            rounds_m = np.mean(rounds)
            # flop model per 128-ray block:
            #   entry fill: 128 * c_pad * 20
            #   per round: sweep 128 rays x slots x 25 + tn scan 128*c_pad*3
            flops = 128 * c_pad * 20 + rounds_m * (128 * slots * 25 + 128 * c_pad * 3 + 4000)
            ns = flops / 0.8e12 / B * 1e9
            print(f"{sname:>10} {rname:>6} {C:>5} {fill:>5.2f} "
                  f"{np.mean(votes):>6.1f} {np.mean(unions):>6.1f} "
                  f"{rounds_m:>6.1f} {ns:>7.1f} {1000/ns:>6.1f}")


if __name__ == "__main__":
    main()
