"""BVH packet traversal (pure-JAX/XLA version).

This is the TPU re-thinking of `traceRayEXT`: instead of one divergent tree
walk per SIMT thread (the GPU model), a *packet* of rays walks the tree
together with a single scalar stack:

  * traversal decisions are packet-wide ("does ANY live ray hit this
    node?"), so control flow is scalar — `lax.while_loop` + `lax.cond` with
    scalar predicates, which XLA compiles to real branches, skipping
    untouched subtrees entirely;
  * all per-ray work (slab tests, leaf triangle tests) is dense vector math
    across the packet — full VPU width, no gathers: a leaf is LEAF_SIZE
    *contiguous* Morton-sorted triangles fetched with one dynamic_slice.

Packet coherence determines culling efficiency: primary rays come from image
tiles (coherent); bounce rays benefit from the integrator's Morton sorting.
The Pallas kernel in bvh/kernels.py implements the same algorithm with
explicit VMEM staging; this module is the portable reference + CPU path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.intersect import _mt_chunk

_BIG = 1e30


def _ray_aabb(origin, inv_dir, bb_min, bb_max):
    """Slab test: (B,3) rays vs one AABB. Returns (t_enter, t_exit)."""
    t0 = (bb_min[None, :] - origin) * inv_dir
    t1 = (bb_max[None, :] - origin) * inv_dir
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    return jnp.max(t_near, axis=-1), jnp.min(t_far, axis=-1)


def _safe_inv_dir(direction):
    d = direction
    tiny = 1e-12
    mag = jnp.maximum(jnp.abs(d), tiny)
    return 1.0 / jnp.where(d < 0, -mag, mag)


def _traverse_packet(
    origin,
    direction,
    t_min,
    t_max,
    tri_pos,
    node_min,
    node_max,
    n_clusters: int,
    leaf_size: int,
    n_levels: int,
    any_hit: bool,
):
    """One packet (B rays) against the whole tree.

    Returns (t, prim_sorted, u, v) for closest-hit, or occluded mask when
    any_hit=True.  prim indexes the *sorted* triangle array.
    """
    b = origin.shape[0]
    inv_dir = _safe_inv_dir(direction)
    stack_cap = 2 * n_levels + 2
    first_leaf = n_clusters - 1

    best_t = jnp.where(t_max > t_min, t_max, -_BIG)  # per-ray search window
    init = dict(
        stack=jnp.zeros((stack_cap,), jnp.int32),
        sp=jnp.int32(1),  # root pre-pushed (index 0)
        best_t=best_t,
        prim=jnp.full((b,), -1, jnp.int32),
        u=jnp.zeros((b,), jnp.float32),
        v=jnp.zeros((b,), jnp.float32),
        occluded=jnp.zeros((b,), bool),
    )

    def cond(c):
        go = c["sp"] > 0
        if any_hit:
            go = go & (~jnp.all(c["occluded"]))
        return go

    def body(c):
        sp = c["sp"] - 1
        node = c["stack"][sp]
        t_enter, t_exit = _ray_aabb(origin, inv_dir, node_min[node], node_max[node])
        live = (~c["occluded"]) if any_hit else jnp.ones((b,), bool)
        node_hit = (t_exit >= t_enter) & (t_exit >= t_min) & (t_enter <= c["best_t"]) & live
        anyh = jnp.any(node_hit)
        is_leaf = node >= first_leaf

        def do_leaf(c, sp):
            off = (node - first_leaf) * leaf_size
            tris = jax.lax.dynamic_slice(tri_pos, (off, 0, 0), (leaf_size, 3, 3))
            hit, t, u, v = _mt_chunk(origin, direction, tris, t_min, c["best_t"])
            if any_hit:
                occ = c["occluded"] | jnp.any(hit, axis=1)
                return dict(c, occluded=occ, sp=sp)
            t = jnp.where(hit, t, _BIG)
            arg = jnp.argmin(t, axis=1)
            row = jnp.arange(b)
            t_new = t[row, arg]
            closer = t_new < c["best_t"]
            return dict(
                c,
                sp=sp,
                prim=jnp.where(closer, off + arg.astype(jnp.int32), c["prim"]),
                u=jnp.where(closer, u[row, arg], c["u"]),
                v=jnp.where(closer, v[row, arg], c["v"]),
                best_t=jnp.where(closer, t_new, c["best_t"]),
            )

        def do_internal(c, sp):
            # push right child first so the LIFO pop visits the LEFT subtree
            # first: leaves are then visited in ascending prim order and
            # exact-t ties resolve to the lowest prim id, matching the
            # brute-force scan (near-first ordering would need a per-packet
            # vote; plain order is fine for closest-hit thanks to best_t)
            stack = c["stack"].at[sp].set(2 * node + 2).at[sp + 1].set(2 * node + 1)
            return dict(c, stack=stack, sp=sp + 2)

        def visit(c):
            return jax.lax.cond(is_leaf, do_leaf, do_internal, c, sp)

        return jax.lax.cond(anyh, visit, lambda c: dict(c, sp=sp), c)

    out = jax.lax.while_loop(cond, body, init)
    if any_hit:
        return out["occluded"]
    found = out["prim"] >= 0
    t = jnp.where(found, out["best_t"], _BIG)
    return t, out["prim"], out["u"], out["v"]


@partial(
    jax.jit,
    static_argnames=("n_clusters", "leaf_size", "n_levels", "packet_size"),
)
def intersect_closest_bvh(
    origin,
    direction,
    tri_pos,
    node_min,
    node_max,
    n_clusters: int,
    leaf_size: int,
    n_levels: int,
    t_min=None,
    t_max=None,
    active=None,
    packet_size: int = 1024,
):
    """Closest hit via BVH. Same contract as ops.intersect.intersect_closest
    (prim indexes the sorted triangle array; -1 = miss)."""
    r = origin.shape[0]
    t_min = jnp.zeros((r,), jnp.float32) if t_min is None else jnp.broadcast_to(t_min, (r,))
    t_max = jnp.full((r,), _BIG) if t_max is None else jnp.broadcast_to(t_max, (r,))
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)

    b = min(packet_size, r)
    n_packets = -(-r // b)
    pad = n_packets * b - r
    if pad:
        padf = lambda x, v: jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], v, x.dtype)])
        origin = padf(origin, 0.0)
        direction = padf(direction, 1.0)
        t_min = padf(t_min, 0.0)
        t_max = padf(t_max, -_BIG)

    def run(args):
        o, d, tn, tx = args
        return _traverse_packet(
            o, d, tn, tx, tri_pos, node_min, node_max,
            n_clusters, leaf_size, n_levels, any_hit=False,
        )

    packs = (
        origin.reshape(n_packets, b, 3),
        direction.reshape(n_packets, b, 3),
        t_min.reshape(n_packets, b),
        t_max.reshape(n_packets, b),
    )
    t, prim, u, v = jax.lax.map(run, packs)
    flat = lambda x: x.reshape(n_packets * b, *x.shape[2:])[:r]
    t, prim, u, v = flat(t), flat(prim), flat(u), flat(v)
    prim = jnp.where(t < _BIG, prim, -1)
    return t, prim, u, v


@partial(
    jax.jit,
    static_argnames=("n_clusters", "leaf_size", "n_levels", "packet_size"),
)
def intersect_any_bvh(
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
    active=None,
    packet_size: int = 1024,
):
    """Any-hit (shadow) query via BVH with packet-level early exit."""
    r = origin.shape[0]
    t_min = jnp.broadcast_to(t_min, (r,))
    t_max = jnp.broadcast_to(t_max, (r,))
    if active is not None:
        t_max = jnp.where(active, t_max, -_BIG)

    b = min(packet_size, r)
    n_packets = -(-r // b)
    pad = n_packets * b - r
    if pad:
        padf = lambda x, v: jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], v, x.dtype)])
        origin = padf(origin, 0.0)
        direction = padf(direction, 1.0)
        t_min = padf(t_min, 0.0)
        t_max = padf(t_max, -_BIG)

    def run(args):
        o, d, tn, tx = args
        return _traverse_packet(
            o, d, tn, tx, tri_pos, node_min, node_max,
            n_clusters, leaf_size, n_levels, any_hit=True,
        )

    packs = (
        origin.reshape(n_packets, b, 3),
        direction.reshape(n_packets, b, 3),
        t_min.reshape(n_packets, b),
        t_max.reshape(n_packets, b),
    )
    occ = jax.lax.map(run, packs)
    return occ.reshape(n_packets * b)[:r]
