"""Pallas TPU kernels for BVH packet traversal.

Same algorithm as bvh/traverse.py (packet of rays + scalar stack over the
implicit cluster tree) but expressed as a Pallas kernel so we control the
memory hierarchy explicitly:

  * the node AABB arrays live in VMEM (two dense (N,4) float arrays — a
    few hundred KB even for 8k clusters), so node tests never touch HBM;
  * leaf triangle blocks are 64 contiguous Morton-sorted triangles staged
    VMEM-resident as (C, 64, 12)-padded tiles: a leaf visit is a dynamic
    slice on the sublane axis, dense VPU math across the ray lane axis;
  * the traversal stack is a scalar SMEM array, per-packet control flow is
    scalar (`lax.while_loop` + `pl.when`), per-ray state ((8,128) f32 tiles
    for a 1024-ray packet) stays in registers/VMEM.

Grid = packets.  Rays are laid out SoA as (P, B) component planes so each
grid step's block is a lane-aligned (B,) tile.

The kernel matches ops/intersect + bvh/traverse bit-for-bit on hits
(same Moller-Trumbore arithmetic); tests/test_pallas.py checks equivalence
in interpret mode, and the TPU path is validated against the XLA traversal
on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _pack_tris(tri_pos, n_clusters: int, leaf_size: int):
    """(T,3,3) sorted triangles -> (C, leaf, 12) padded cluster blocks:
    [v0.xyz, e1.xyz, e2.xyz, pad] precomputed for Moller-Trumbore."""
    t_needed = n_clusters * leaf_size
    t = tri_pos.shape[0]
    if t < t_needed:
        tri_pos = jnp.concatenate(
            [tri_pos, jnp.zeros((t_needed - t, 3, 3), tri_pos.dtype)], axis=0
        )
    else:
        tri_pos = tri_pos[:t_needed]
    v0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - v0
    e2 = tri_pos[:, 2] - v0
    packed = jnp.concatenate([v0, e1, e2, jnp.zeros_like(v0[:, :1])], axis=1)  # (T,10)->pad 12
    packed = jnp.concatenate(
        [packed, jnp.zeros((t_needed, 12 - packed.shape[1]), packed.dtype)], axis=1
    )
    return packed.reshape(n_clusters, leaf_size, 12)


def _traversal_kernel(
    # inputs
    node_min_ref,  # (N,4) VMEM
    node_max_ref,  # (N,4) VMEM
    tris_ref,  # (C, leaf, 12) VMEM (ANY -> compiler may spill to HBM)
    ox_ref, oy_ref, oz_ref,  # (B,) VMEM ray origins
    dx_ref, dy_ref, dz_ref,  # (B,) VMEM ray directions
    tmin_ref, tmax_ref,  # (B,) VMEM
    # outputs
    t_out, prim_out, u_out, v_out,  # (B,)
    # scratch
    stack_ref,  # SMEM (stack_cap,)
    *,
    n_clusters: int,
    leaf_size: int,
    any_hit: bool,
):
    first_leaf = n_clusters - 1
    b = ox_ref.shape[0]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    t_min = tmin_ref[:]
    t_max = tmax_ref[:]

    def inv(d):
        mag = jnp.maximum(jnp.abs(d), 1e-12)
        return 1.0 / jnp.where(d < 0, -mag, mag)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    stack_ref[0] = 0  # root

    def cond(carry):
        sp, best_t, prim, uu, vv, occ_all = carry
        go = sp > 0
        if any_hit:
            go = jnp.logical_and(go, jnp.logical_not(occ_all))
        return go

    def body(carry):
        sp, best_t, prim, uu, vv, occ_all = carry
        sp = sp - 1
        node = stack_ref[sp]

        bmn = node_min_ref[node]  # (4,)
        bmx = node_max_ref[node]

        tx0 = (bmn[0] - ox) * ix
        tx1 = (bmx[0] - ox) * ix
        ty0 = (bmn[1] - oy) * iy
        ty1 = (bmx[1] - oy) * iy
        tz0 = (bmn[2] - oz) * iz
        tz1 = (bmx[2] - oz) * iz
        t_enter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_exit = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        node_hit = (t_exit >= t_enter) & (t_exit >= t_min) & (t_enter <= best_t)
        anyh = jnp.any(node_hit)
        is_leaf = node >= first_leaf

        def leaf_body(args):
            best_t, prim, uu, vv = args
            cluster = node - first_leaf
            base = cluster * leaf_size

            def tri_loop(k, args):
                best_t, prim, uu, vv = args
                row = tris_ref[cluster, k]  # (12,)
                v0x, v0y, v0z = row[0], row[1], row[2]
                e1x, e1y, e1z = row[3], row[4], row[5]
                e2x, e2y, e2z = row[6], row[7], row[8]
                # h = d x e2
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                parallel = jnp.abs(a) < 1e-12
                f = 1.0 / jnp.where(parallel, 1.0, a)
                sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                ok = (
                    (~parallel)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > t_min)
                    & (t < best_t)
                )
                best_t = jnp.where(ok, t, best_t)
                prim = jnp.where(ok, base + k, prim)
                uu = jnp.where(ok, u, uu)
                vv = jnp.where(ok, v, vv)
                return best_t, prim, uu, vv

            return jax.lax.fori_loop(0, leaf_size, tri_loop, (best_t, prim, uu, vv))

        def visit_leaf(carry):
            sp, best_t, prim, uu, vv, occ_all = carry
            best_t, prim, uu, vv = leaf_body((best_t, prim, uu, vv))
            if any_hit:
                occ_all = jnp.all(prim >= 0)
            return sp, best_t, prim, uu, vv, occ_all

        def visit_internal(carry):
            sp, best_t, prim, uu, vv, occ_all = carry
            stack_ref[sp] = 2 * node + 1
            stack_ref[sp + 1] = 2 * node + 2
            return sp + 2, best_t, prim, uu, vv, occ_all

        def visit(carry):
            return jax.lax.cond(is_leaf, visit_leaf, visit_internal, carry)

        return jax.lax.cond(
            anyh, visit, lambda c: c, (sp, best_t, prim, uu, vv, occ_all)
        )

    init_best = jnp.where(t_max > t_min, t_max, -_BIG)
    init = (
        jnp.int32(1),
        init_best,
        jnp.full((b,), -1, jnp.int32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.bool_(False),
    )
    _, best_t, prim, uu, vv, _ = jax.lax.while_loop(cond, body, init)

    found = prim >= 0
    t_out[:] = jnp.where(found, best_t, _BIG)
    prim_out[:] = prim
    u_out[:] = uu
    v_out[:] = vv


@partial(
    jax.jit,
    static_argnames=("n_clusters", "leaf_size", "n_levels", "packet_size", "any_hit", "interpret"),
)
def traverse_pallas(
    origin,
    direction,
    tri_pos,
    node_min,
    node_max,
    n_clusters: int,
    leaf_size: int,
    n_levels: int,
    t_min,
    t_max,
    packet_size: int = 1024,
    any_hit: bool = False,
    interpret: bool = False,
):
    """Pallas BVH traversal over ray packets.

    Returns (t, prim, u, v); for any_hit queries use `prim >= 0` as the
    occlusion mask.
    """
    r = origin.shape[0]
    b = min(packet_size, max(r, 8))
    n_packets = -(-r // b)
    pad = n_packets * b - r

    def padv(x, v):
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], v, x.dtype)]) if pad else x

    origin = padv(origin, 0.0)
    direction = padv(direction, 1.0)
    t_min = padv(jnp.broadcast_to(t_min, (r,)), 0.0)
    t_max = padv(jnp.broadcast_to(t_max, (r,)), -_BIG)

    planes = dict(
        ox=origin[:, 0].reshape(n_packets, b),
        oy=origin[:, 1].reshape(n_packets, b),
        oz=origin[:, 2].reshape(n_packets, b),
        dx=direction[:, 0].reshape(n_packets, b),
        dy=direction[:, 1].reshape(n_packets, b),
        dz=direction[:, 2].reshape(n_packets, b),
        tn=t_min.reshape(n_packets, b),
        tx=t_max.reshape(n_packets, b),
    )

    n_nodes = node_min.shape[0]
    node_min4 = jnp.concatenate([node_min, jnp.zeros((n_nodes, 1), node_min.dtype)], axis=1)
    node_max4 = jnp.concatenate([node_max, jnp.zeros((n_nodes, 1), node_max.dtype)], axis=1)
    tris_packed = _pack_tris(tri_pos, n_clusters, leaf_size)

    stack_cap = 2 * n_levels + 4

    kernel = partial(
        _traversal_kernel,
        n_clusters=n_clusters,
        leaf_size=leaf_size,
        any_hit=any_hit,
    )

    ray_spec = pl.BlockSpec((1, b), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    t, prim, u, v = pl.pallas_call(
        # squeeze the leading packet axis inside the kernel via index 0
        lambda nm, nx, tr, ox, oy, oz, dx, dy, dz, tn, tx, to, po, uo, vo, st: kernel(
            nm, nx, tr,
            ox.at[0], oy.at[0], oz.at[0],
            dx.at[0], dy.at[0], dz.at[0],
            tn.at[0], tx.at[0],
            to.at[0], po.at[0], uo.at[0], vo.at[0],
            st,
        ),
        grid=(n_packets,),
        in_specs=[
            full(),  # node_min
            full(),  # node_max
            full(),  # tris
            ray_spec, ray_spec, ray_spec,  # o
            ray_spec, ray_spec, ray_spec,  # d
            ray_spec, ray_spec,  # t ranges
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_packets, b), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, b), jnp.int32),
            jax.ShapeDtypeStruct((n_packets, b), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, b), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((stack_cap,), jnp.int32)],
        interpret=interpret,
    )(
        node_min4, node_max4, tris_packed,
        planes["ox"], planes["oy"], planes["oz"],
        planes["dx"], planes["dy"], planes["dz"],
        planes["tn"], planes["tx"],
    )

    flat = lambda x: x.reshape(n_packets * b)[:r]
    return flat(t), flat(prim), flat(u), flat(v)
