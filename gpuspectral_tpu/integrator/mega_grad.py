"""Fused forward+gradient ("fwdgrad") kernels for the megakernels.

The declared metric is grad-steps/s (BASELINE.json); round 2 measured the
XLA-wavefront gradient at 42x the megakernel forward because the megakernel
was forward-only.  Rounds 2-4 ran path-replay backprop as a SECOND
persistent Pallas kernel (re-trace with the bit-exact counter RNG,
ops/rng.py; Vicini et al. 2021).  Round 5 removed the second launch: the
counting-identity gradient is LINEAR in the per-pixel loss cotangent, so
the forward kernel itself accumulates un-contracted gradient PARTIALS in
VMEM planes and emits them alongside radiance; custom_vjp's backward is
then a single XLA einsum (_contract_partials) instead of a replay launch.
Measured (staircase2 128^2@8spp d5, slope-timed): the replay backward cost
the same as a forward (149 ms each), so this halves every gradient step —
and the sharded step drops from three kernel passes to two.

Scope (gated by `mega_grad_eligible`): diffuse-only scenes — exactly the
headline Cornell gradient config — with gradients for

  * diffuse albedo  (bsdf_params[:, 0:3]),
  * emitter radiance (tri_emission of emissive triangles + light_emission),

the north-star inverse-rendering parameters.  For a multiplicative
throughput parameter the adjoint needs no stored tape: with n_b = number of
prior bounces on BSDF row b, dW_k/dkd_b = n_b * W_k / kd_b, so one forward
replay suffices (the `n_b` counting identity).  Sampling pdfs and ray
geometry are kd-independent for diffuse (cosine sampling), so these
gradients equal full autodiff's — finite-difference-checked in
tests/test_mega_grad.py.  Depth is gated to <= rr_start_depth: Russian
roulette's 1/q reweight does depend on kd, a term this estimator drops.

BVH scenes get the same treatment through the fused-BVH kernel twin
(render_mega_bvh_diff below — mixed-BSDF scenes included: specular
factors are kd-independent constants under the counting identity).

GGX roughness (alpha) stays on the XLA-wavefront autodiff DELIBERATELY:
the pathwise alpha derivative flows through sampleHalf's half-vector —
alpha perturbs the sampled direction, which moves every downstream hit
point, so matching finite differences requires propagating direction
derivatives through the traversal (closest_diff's (t,u,v) vjp), a term
no local replay identity can express.  A detached-sampler alpha estimate
would NOT FD-match (rough bounces are importance-sampled, so most of the
local dependence cancels in f/pdf).  The wavefront's full AD is
FD-checked for alpha (tests/test_gradients.py:
test_alpha_ad_matches_finite_differences) and diff/invert.py's coverage
gate routes alpha-optimizing problems there automatically.

Everything else (textures on the brute kernel, envmap scenes, deep RR
paths) also falls back to the XLA-wavefront differentiable path
(diff/, grad_remat).

kd at exactly 0 is a removable singularity of the counting identity
(suffix radiance is 0 but its kd-derivative is not); the division is
clamped at 1e-4.  Inverse rendering reparameterizes through sigmoids
(diff/invert.py), so the clamp is never active there.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bsdf.table import BSDF_DIFFUSE
from ..ops import rng
from ..scene.data import SceneData
from ..utils.config import RenderConfig
from .mega import (
    _BIG,
    _CH_JITTER_X,
    _CH_JITTER_Y,
    _CH_LIGHT_INDEX,
    _NA,
    BLOCK,
    LANES,
    SUB,
    _fdivmod_exact,
    _pack_tables,
    _u2f,
    _uniform,
    _uniform_mod,
    make_bounce_body,
    mega_eligible,
    render_mega,
)

M_PI = float(np.pi)

MAX_GRAD_BSDFS = 8
MAX_GRAD_LIGHTS = 4
_KD_EPS = 1e-4  # clamp for the removable kd=0 singularity (module docstring)


def mega_grad_eligible(scene: SceneData, cfg: RenderConfig) -> bool:
    return (
        mega_eligible(scene, cfg)
        # env scenes: the replay hook's NEE-attribution masks don't
        # distinguish the env strategy yet; XLA autodiff covers them
        and not scene.has_envmap
        and scene.kinds_present == (BSDF_DIFFUSE,)
        and scene.bsdf_kind.shape[0] <= MAX_GRAD_BSDFS
        and scene.num_lights <= MAX_GRAD_LIGHTS
        and cfg.max_depth <= cfg.rr_start_depth
    )


def make_diffuse_grad_hook(grad_rows, n_grad_lights, kd_ref, bidx_row):
    """Shared fwdgrad hook (mega.make_bounce_body grad_hook).

    grad_rows: static list of DIFFUSE bsdf-table rows to differentiate.
    The counting identity stays exact on MIXED scenes: the path throughput
    factorizes as W = prod_k f_k cos/pdf and only diffuse bounces on row b
    carry kd_b, so dW/dkd_b = n_b W / kd_b with n_b the number of prior
    row-b bounces — non-diffuse factors are kd-independent constants.
    Emission gradients are tracked for the first n_grad_lights lights
    (0 disables them: big-light-count scenes get kd-only gradients).
    bidx_row: attr row holding the hit's bsdf-table index.

    The loss cotangent enters the gradient LINEARLY, so the planes
    accumulate un-contracted per-lane PARTIALS (round 5): the forward
    pass carries the whole gradient computation and the cotangent
    contraction happens outside the kernel (_contract_partials) —
    eliminating the rounds-2-4 replay-backward launch, which measured
    the same cost as a forward."""
    b2f = lambda b: jnp.where(b, 1.0, 0.0)  # noqa: E731

    def grad_hook(st, ctx):
        a = ctx["a"]
        W = ctx["weight"]
        accf = b2f(ctx["acc"])
        hitm = accf * b2f(ctx["hit"])
        neem = accf * b2f(ctx["nee_done"]) * ctx["lfront"]
        bidx = jnp.round(a[bidx_row]).astype(jnp.int32)
        lhit = jnp.round(a[13]).astype(jnp.int32)
        emit_coeff = ctx["emit_w"] * ctx["light_flag"]
        nee_s = ctx["nee_s"]
        e = ctx["e"]
        st = dict(st)
        # counts are per-SAMPLE: a lane at depth 0 just started a fresh
        # path (regeneration reset), so its prior-factor counts are zero
        fresh_path = st["depth"] == 0
        for i, b in enumerate(grad_rows):
            selb = b2f(bidx == b)
            nbi = jnp.where(fresh_path, 0, st[f"n_{i}"])
            nb = nbi.astype(jnp.float32)
            for c in range(3):
                # suffix: this bounce's contribution through the n_b prior
                # kd_b factors of W; direct: this bounce's NEE.  For
                # diffuse, f_light = kd*tex/pi is MULTIPLICATIVE in kd
                # (tex = 1 untextured), so d f_light/d kd = f_light/kd —
                # this also covers vertex-sampled texture modulation.
                dfl = ctx["f_light"][c] / jnp.maximum(kd_ref[i, c], _KD_EPS)
                direct = neem * selb * nee_s * W[c] * ctx["lemit"][c] * dfl
                suffix = accf * e[c] * nb / jnp.maximum(kd_ref[i, c], _KD_EPS)
                st[f"gkd_{i}_{c}"] = st[f"gkd_{i}_{c}"] + (
                    direct + suffix)
            st[f"n_{i}"] = nbi + jnp.where(
                ctx["cont"] & (bidx == b), 1, 0)
        for li in range(n_grad_lights):
            sel_hit = hitm * b2f(lhit == li)
            sel_nee = neem * b2f(ctx["lidx"] == li)
            for c in range(3):
                # d e/d tri_emission[tri(l), c] (emitter-hit term)
                st[f"gte_{li}_{c}"] = st[f"gte_{li}_{c}"] + (
                    sel_hit * emit_coeff * W[c])
                # d e/d light_emission[l, c] (NEE term)
                st[f"gle_{li}_{c}"] = st[f"gle_{li}_{c}"] + (
                    sel_nee * nee_s * ctx["f_light"][c] * W[c])
        return st

    return grad_hook


def init_grad_state(state, zf, zi, n_rows, n_grad_lights):
    for i in range(n_rows):
        state[f"n_{i}"] = zi
        for c in range(3):
            state[f"gkd_{i}_{c}"] = zf
    for li in range(n_grad_lights):
        for c in range(3):
            state[f"gte_{li}_{c}"] = zf
            state[f"gle_{li}_{c}"] = zf


def grad_plane_keys(n_rows, n_grad_lights):
    """Ordered state keys of the per-lane gradient-partial planes the
    fwdgrad kernels emit: [0, 3R) d kd (row-major b, c), then 3L
    tri_emission, then 3L light_emission.  Every plane's cotangent channel
    is its index mod 3 (see _contract_partials)."""
    keys = [f"gkd_{i}_{c}" for i in range(n_rows) for c in range(3)]
    keys += [f"gte_{li}_{c}" for li in range(n_grad_lights)
             for c in range(3)]
    keys += [f"gle_{li}_{c}" for li in range(n_grad_lights)
             for c in range(3)]
    return keys


def _contract_partials(parts, gp, R, Lg):
    """Contract per-lane gradient partials with the loss cotangent.

    parts: (n_blocks, NP, S, LANES) fwdgrad plane outputs (NP = 3R + 6Lg,
    grad_plane_keys order); gp: (n_blocks, S, LANES, 3) per-lane cotangents
    of the radiance sums (callers scale/mask).  Returns (d_kd (R,3),
    d_te_l (Lg,3), d_le (Lg,3))."""
    NP = 3 * R + 6 * Lg
    cidx = jnp.asarray(np.arange(NP) % 3, jnp.int32)
    gsel = jnp.moveaxis(gp, -1, 1)[:, cidx]  # (n_blocks, NP, S, LANES)
    tot = jnp.sum(parts * gsel, axis=(0, 2, 3))  # (NP,)
    d_kd = tot[: 3 * R].reshape(R, 3)
    d_te_l = tot[3 * R: 3 * R + 3 * Lg].reshape(Lg, 3)
    d_le = tot[3 * R + 3 * Lg:].reshape(Lg, 3)
    return d_kd, d_te_l, d_le


def _make_grad_kernel(cfg: RenderConfig, n_tris: int, n_lights: int,
                      n_bsdfs: int):
    """The fwdgrad kernel: mega.py's kernel with gradient-PARTIAL planes
    threaded through the shared bounce body via grad_hook (g_pix=None —
    the cotangent contraction happens outside, see _contract_partials).
    One pass emits radiance, ray counts AND the partial planes: there is
    no separate backward launch (round 5; backward measured ~= forward).

    Partial-plane layout: grad_plane_keys(B, L)."""
    width, height = cfg.width, cfg.height
    spp = cfg.spp
    max_iters = spp * (cfg.max_depth + 1)
    B, L = n_bsdfs, n_lights

    def kernel(pix_ref, woop_ref, attr_ref, light_ref, cam_ref, ts_ref,
               kd_ref, rad_r_ref, rad_g_ref, rad_b_ref, rays_ref,
               part_ref):
        t0 = ts_ref[0, 0]
        pix = jax.lax.bitcast_convert_type(pix_ref[:], jnp.uint32)
        zf = jnp.zeros((SUB, LANES), jnp.float32)
        zi = jnp.zeros((SUB, LANES), jnp.int32)
        oi = jnp.ones((SUB, LANES), jnp.int32)

        r00, r01, r02 = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        r10, r11, r12 = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        r20, r21, r22 = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        cox, coy, coz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        fov = cam_ref[0, 12]
        zplane = (max(width, height) / 2.0) / jnp.tan(fov / 2.0)

        def fresh(sample):
            # identical replay raygen (mega.py kernel `fresh`)
            seed = rng.pixel_seed(pix, t0 + sample)
            py, px = _fdivmod_exact(_u2f(pix), width)
            if cfg.jitter:
                px = px + _uniform(seed, jnp.uint32(0xFFFF), _CH_JITTER_X)
                py = py + _uniform(seed, jnp.uint32(0xFFFF), _CH_JITTER_Y)
            xx = px - width / 2.0
            yy = py - height / 2.0
            inv = jax.lax.rsqrt(xx * xx + yy * yy + zplane * zplane)
            dcx, dcy, dcz = -xx * inv, -yy * inv, zplane * inv
            dwx = r00 * dcx + r01 * dcy + r02 * dcz
            dwy = r10 * dcx + r11 * dcy + r12 * dcz
            dwz = r20 * dcx + r21 * dcy + r22 * dcz
            o = (jnp.zeros_like(dwx) + cox, jnp.zeros_like(dwy) + coy,
                 jnp.zeros_like(dwz) + coz)
            return o, (dwx, dwy, dwz), seed

        def _woop_test(ti, o, d, t_lo, t_hi):
            ax0, ax1, ax2 = woop_ref[0, ti], woop_ref[1, ti], woop_ref[2, ti]
            ay0, ay1, ay2 = woop_ref[3, ti], woop_ref[4, ti], woop_ref[5, ti]
            az0, az1, az2 = woop_ref[6, ti], woop_ref[7, ti], woop_ref[8, ti]
            bx, by, bz = woop_ref[9, ti], woop_ref[10, ti], woop_ref[11, ti]
            opz = o[0] * az0 + o[1] * az1 + o[2] * az2 + bz
            dpz = d[0] * az0 + d[1] * az1 + d[2] * az2
            live = jnp.abs(dpz) > 1e-12
            t = -opz / jnp.where(live, dpz, 1.0)
            px = o[0] + t * d[0]
            py = o[1] + t * d[1]
            pz = o[2] + t * d[2]
            u = px * ax0 + py * ax1 + pz * ax2 + bx
            v = px * ay0 + py * ay1 + pz * ay2 + by
            hit = live & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_lo) & (t < t_hi)
            return t, u, v, hit

        def intersect_closest(o, d, alive):
            t_max0 = jnp.where(alive, _BIG, -_BIG)

            def tri(ti, carry):
                best_t, best_prim, best_u, best_v = carry
                t, u, v, hit = _woop_test(ti, o, d, 0.0, t_max0)
                closer = hit & (t < best_t)
                return (
                    jnp.where(closer, t, best_t),
                    jnp.where(closer, ti, best_prim),
                    jnp.where(closer, u, best_u),
                    jnp.where(closer, v, best_v),
                )

            init = (jnp.full((SUB, LANES), _BIG, jnp.float32),
                    jnp.full((SUB, LANES), -1, jnp.int32), zf, zf)
            return jax.lax.fori_loop(0, n_tris, tri, init)

        def intersect_any(o, d, t_min, t_max, active):
            t_max = jnp.where(active, t_max, -1.0)

            def tri(ti, occ):
                _t, _u, _v, hit = _woop_test(ti, o, d, t_min, t_max)
                return jnp.where(hit, 1, occ)

            return jax.lax.fori_loop(0, n_tris, tri, zi) != 0

        def gather_attrs(prim):
            def tri(ti, acc):
                sel = prim == ti
                return tuple(
                    jnp.where(sel, attr_ref[c, ti], acc[c]) for c in range(_NA + 1)
                )

            init = tuple(zf for _ in range(_NA + 1))
            return jax.lax.fori_loop(0, n_tris, tri, init)

        def gather_light(lidx):
            def li(ti, acc):
                sel = lidx == ti
                return tuple(
                    jnp.where(sel, light_ref[c, ti], acc[c]) for c in range(12)
                )

            init = tuple(zf for _ in range(12))
            return jax.lax.fori_loop(0, n_lights, li, init)

        def closest(o, d, alive):
            t, prim, bu, bv = intersect_closest(o, d, alive)
            return t, (prim >= 0) & alive, bu, bv, gather_attrs(prim)

        def pick_light(seed, bounce):
            lbits = rng.random_bits(seed, bounce, _CH_LIGHT_INDEX)
            lidx = _uniform_mod(lbits, n_lights)
            lr = gather_light(lidx)
            return ((lr[0], lr[1], lr[2]), (lr[3], lr[4], lr[5]),
                    (lr[6], lr[7], lr[8]), (lr[9], lr[10], lr[11]),
                    1.0 / n_lights, lidx)

        grad_hook = make_diffuse_grad_hook(
            list(range(B)), L, kd_ref, bidx_row=_NA)

        body = make_bounce_body(
            cfg, (BSDF_DIFFUSE,),
            closest=closest,
            any_hit=intersect_any,
            pick_light=pick_light,
            sel_pdf_of_hit=lambda a: 1.0 / n_lights,
            fresh=fresh,
            pix=pix, spp=spp,
            grad_hook=grad_hook,
        )

        o0, d0, seed0 = fresh(jnp.uint32(0))
        state = dict(
            ox=o0[0], oy=o0[1], oz=o0[2],
            dx=d0[0], dy=d0[1], dz=d0[2],
            wr=jnp.ones((SUB, LANES), jnp.float32),
            wg=jnp.ones((SUB, LANES), jnp.float32),
            wb=jnp.ones((SUB, LANES), jnp.float32),
            direct_weight=jnp.ones((SUB, LANES), jnp.float32),
            prev_pdf=jnp.ones((SUB, LANES), jnp.float32),
            prev_nee=zi,
            was_delta=zi,
            count_emitted=oi,
            done=zi,
            rad_r=zf, rad_g=zf, rad_b=zf,
            rays=zi,
            seed=seed0,
            depth=jnp.zeros((SUB, LANES), jnp.uint32),
            sample=jnp.zeros((SUB, LANES), jnp.uint32),
            it=jnp.int32(0),
        )
        init_grad_state(state, zf, zi, B, L)

        def cond(st):
            exhausted = (st["done"] != 0) & (st["sample"] + 1 >= spp)
            return (st["it"] < max_iters) & (~jnp.all(exhausted))

        state = jax.lax.while_loop(cond, body, state)

        rad_r_ref[:] = state["rad_r"]
        rad_g_ref[:] = state["rad_g"]
        rad_b_ref[:] = state["rad_b"]
        rays_ref[:] = state["rays"]
        for p, k in enumerate(grad_plane_keys(B, L)):
            part_ref[0, p] = state[k]

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def _mega_fwdgrad_blocks(scene: SceneData, cfg: RenderConfig, timestamp0,
                         pix, interpret: bool = False):
    """Fwdgrad kernel over explicit pixel rows.  pix (rows, LANES) int32.
    Returns (rad_r, rad_g, rad_b, rays) per-lane sums over cfg.spp, each
    (rows, LANES), plus partials (n_blocks, NP, SUB, LANES) in
    grad_plane_keys(B, L) order — contract with the cotangent via
    _contract_partials."""
    woop_t, attr, light, camv = _pack_tables(scene)
    # appended row: bsdf table index per triangle (the grad scatter key)
    attr = jnp.concatenate(
        [attr, scene.tri_bsdf[None, :].astype(jnp.float32)], axis=0)
    B = scene.bsdf_kind.shape[0]
    L = scene.num_lights
    NP = 3 * B + 6 * L
    kd = scene.bsdf_params[:, 0:3]
    n_blocks = pix.shape[0] // SUB
    ts = jnp.asarray(timestamp0, jnp.uint32).reshape(1, 1)

    kernel = _make_grad_kernel(cfg, scene.num_tris, L, B)
    blk = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    rowshape = jax.ShapeDtypeStruct((n_blocks * SUB, LANES), jnp.float32)
    rr, rg, rb, rays, parts = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[blk, smem, smem, smem, smem, smem, smem],
        out_specs=[blk, blk, blk, blk,
                   pl.BlockSpec((1, NP, SUB, LANES), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[rowshape, rowshape, rowshape,
                   jax.ShapeDtypeStruct((n_blocks * SUB, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n_blocks, NP, SUB, LANES),
                                        jnp.float32)],
        interpret=interpret,
    )(pix, woop_t, attr, light, camv, ts, kd)
    return rr, rg, rb, rays, parts


def _scatter_grads_brute(scene, d_kd, d_te_l, d_le):
    """Assemble full-shape gradients from the contracted brute partials."""
    d_bp = jnp.zeros_like(scene.bsdf_params).at[:, 0:3].set(d_kd)
    # scatter per-light emitter-hit grads onto each light's triangle(s):
    # lights are per-triangle (Loader.cpp:316-330), but be robust to several
    # tris sharing a light row — the derivative applies to each member
    d_te = d_te_l[jnp.maximum(scene.tri_light_idx, 0)]
    d_te = jnp.where((scene.tri_light_idx >= 0)[:, None], d_te, 0.0)
    return d_bp, d_te, d_le


def _brute_pix_rows(cfg):
    n_pixels = cfg.width * cfg.height
    n_blocks = -(-n_pixels // BLOCK)
    padded = n_blocks * BLOCK
    pix = jnp.arange(padded, dtype=jnp.int32)
    return (jnp.where(pix < n_pixels, pix, 0).reshape(n_blocks * SUB, LANES),
            n_pixels, padded)


def _brute_gp(cfg, g):
    """Mean-image cotangent in block layout: img = rad/spp so d rad =
    g/spp; padding lanes re-render pixel 0 — zero their cotangent."""
    pix, n_pixels, padded = _brute_pix_rows(cfg)
    gflat = jnp.concatenate(
        [g.reshape(n_pixels, 3) / cfg.spp,
         jnp.zeros((padded - n_pixels, 3), jnp.float32)])
    return gflat.reshape(-1, SUB, LANES, 3)


def _zero_cotangent(tree):
    def z(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(jnp.shape(x), jax.dtypes.float0)

    return jax.tree.map(z, tree)


@lru_cache(maxsize=None)
def _diff_fn(cfg: RenderConfig, interpret: bool):
    @jax.custom_vjp
    def f(bp, te, le, scene_rest, ts):
        sc = scene_rest.replace(bsdf_params=bp, tri_emission=te,
                                light_emission=le)
        return render_mega(sc, cfg, ts, interpret=interpret)[0]

    def fwd(bp, te, le, scene_rest, ts):
        # ONE fwdgrad pass yields the image AND the gradient partials
        # (round 5): no separate replay-backward launch remains.
        sc = scene_rest.replace(bsdf_params=bp, tri_emission=te,
                                light_emission=le)
        pix, n_pixels, _ = _brute_pix_rows(cfg)
        rr, rg, rb, _rays, parts = _mega_fwdgrad_blocks(
            sc, cfg, ts, pix, interpret=interpret)
        rad = jnp.stack([x.reshape(-1)[:n_pixels] for x in (rr, rg, rb)],
                        axis=-1)
        img = (rad / cfg.spp).reshape(cfg.height, cfg.width, 3)
        return img, (scene_rest, parts, ts)

    def bwd(res, g):
        scene_rest, parts, ts = res
        B = scene_rest.bsdf_kind.shape[0]
        L = scene_rest.num_lights
        d_kd, d_te_l, d_le = _contract_partials(
            parts, _brute_gp(cfg, g), B, L)
        d_bp, d_te, d_le = _scatter_grads_brute(
            scene_rest, d_kd, d_te_l, d_le)
        return (d_bp, d_te, d_le, _zero_cotangent(scene_rest),
                np.zeros(jnp.shape(ts), jax.dtypes.float0))

    f.defvjp(fwd, bwd)
    return f


def render_mega_diff(scene: SceneData, cfg: RenderConfig, timestamp0=0,
                     interpret: bool = False):
    """Differentiable megakernel render: (H, W, 3) image whose vjp runs the
    path-replay backward kernel (gradients w.r.t. bsdf_params kd columns,
    tri_emission, light_emission; zeros elsewhere)."""
    f = _diff_fn(cfg, interpret)
    sg = jax.lax.stop_gradient
    return f(scene.bsdf_params, scene.tri_emission, scene.light_emission,
             sg(scene), jnp.asarray(timestamp0, jnp.uint32))

# ---------------------------------------------------------------------------
# Fused-BVH path-replay backward (VERDICT r3 #5a): the same estimator run
# against integrator/mega_bvh's traversal, so BVH-scene inversion leaves the
# XLA-wavefront 0.05-steps/s class.  Mixed-BSDF scenes are supported: kd
# gradients cover up to MAX_GRAD_BSDFS *diffuse* rows (see
# make_diffuse_grad_hook for why the counting identity stays exact), and
# emission gradients are tracked when the scene has <= MAX_GRAD_LIGHTS
# lights (big-light-count scenes get kd-only gradients).
# ---------------------------------------------------------------------------


def mega_bvh_grad_rows(scene: SceneData) -> tuple:
    """Static tuple of diffuse bsdf rows the fused backward differentiates
    (first MAX_GRAD_BSDFS).  Needs a concrete scene (host-side call)."""
    kinds = np.asarray(scene.bsdf_kind)
    rows = np.nonzero(kinds == BSDF_DIFFUSE)[0][:MAX_GRAD_BSDFS]
    return tuple(int(r) for r in rows)


def mega_bvh_grad_eligible(scene: SceneData, cfg: RenderConfig) -> bool:
    from .mega_bvh import mega_bvh_eligible

    return (
        mega_bvh_eligible(scene, cfg)
        and not scene.has_envmap  # see mega_grad_eligible
        and cfg.max_depth <= cfg.rr_start_depth
        and len(mega_bvh_grad_rows(scene)) > 0
    )


@partial(jax.jit, static_argnames=("cfg", "grad_rows", "n_grad_lights",
                                   "interpret"))
def _mega_bvh_fwdgrad_blocks(scene: SceneData, cfg: RenderConfig,
                             timestamp0, pix, grad_rows: tuple,
                             n_grad_lights: int, interpret: bool = False):
    """Fused-BVH fwdgrad kernel over explicit pixel blocks.  pix
    (n_blocks, ROWS, LANES) int32.  Returns (rad_r, rad_g, rad_b, rays)
    per-lane sums over cfg.spp, each (n_blocks, ROWS, LANES), plus
    partials (n_blocks, NP, ROWS, LANES) in grad_plane_keys order — one
    pass carries both the render and the whole gradient computation
    (round 5: the replay backward measured ~= a forward, and the
    cotangent enters linearly, so contracting outside halves the step)."""
    from .mega_bvh import (
        _NA as NA_BVH, _NA_TEX as NA_TEX_BVH, LANES as B_LANES, ROWS,
        _make_kernel as _make_bvh_kernel, _pack_tables_bvh,
        mega_bvh_stream)

    light_mode = cfg.light_sampling
    stream = mega_bvh_stream(scene)
    bounds, c_pad, gat, light, camv = _pack_tables_bvh(
        scene, light_mode, stream=stream, grad=True)
    # + 1: the appended bsdf-row scatter key (last attr row)
    n_attr = (NA_TEX_BVH if scene.has_textures else NA_BVH) + 1
    n_rows = -(-(n_attr + 12) // 8) * 8
    assert gat.shape[1 if stream else 0] == n_rows
    R = len(grad_rows)
    L = scene.num_lights
    NP = 3 * R + 6 * n_grad_lights
    kd = scene.bsdf_params[jnp.asarray(grad_rows), 0:3]
    n_blocks = pix.shape[0]
    ts = jnp.asarray(timestamp0, jnp.uint32).reshape(1, 1)

    kernel = _make_bvh_kernel(
        cfg, scene.bvh_bins, scene.bvh_bin_slots, c_pad, L,
        scene.kinds_present, light_mode, n_attr=n_attr, stream=stream,
        grad_cfg=dict(rows=grad_rows, n_lights=n_grad_lights),
        has_env=scene.has_envmap, has_area=scene.has_area_lights)

    blk = pl.BlockSpec((1, ROWS, B_LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda x: pl.BlockSpec(  # noqa: E731
        x.shape, lambda i: tuple(0 for _ in x.shape), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    slots = scene.bvh_bin_slots
    scratch = []
    if stream:
        nbuf = 2
        scratch = ([pltpu.VMEM((n_rows, slots), jnp.float32)] * nbuf
                   + [pltpu.SemaphoreType.DMA] * nbuf)
    out_shape = jax.ShapeDtypeStruct((n_blocks, ROWS, B_LANES), jnp.float32)
    rr, rg, rb, rays, parts = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[blk, full(bounds),
                  hbm if stream else full(gat),
                  full(light), smem, smem, smem],
        out_specs=[blk, blk, blk, blk,
                   pl.BlockSpec((1, NP, ROWS, B_LANES),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[out_shape, out_shape, out_shape,
                   jax.ShapeDtypeStruct((n_blocks, ROWS, B_LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((n_blocks, NP, ROWS, B_LANES),
                                        jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024),
        interpret=interpret,
    )(pix, bounds, gat, light, camv, ts, kd)
    return rr, rg, rb, rays, parts


def _scatter_grads_bvh(scene, grad_rows, n_grad_lights, d_kd, d_te_l,
                       d_le_g):
    """Assemble full-shape gradients from the contracted BVH partials."""
    L = scene.num_lights
    Lg = n_grad_lights
    d_bp = jnp.zeros_like(scene.bsdf_params)
    d_bp = d_bp.at[jnp.asarray(grad_rows), 0:3].set(d_kd)
    if Lg:
        d_te_l = jnp.concatenate(
            [d_te_l, jnp.zeros((L - Lg, 3), jnp.float32)])
        d_le = jnp.concatenate(
            [d_le_g, jnp.zeros((L - Lg, 3), jnp.float32)])
        d_te = d_te_l[jnp.maximum(scene.tri_light_idx, 0)]
        d_te = jnp.where((scene.tri_light_idx >= 0)[:, None], d_te, 0.0)
    else:
        d_te = jnp.zeros_like(scene.tri_emission)
        d_le = jnp.zeros_like(scene.light_emission)
    return d_bp, d_te, d_le


def _bvh_gp(scene, cfg, g):
    """Mean-image cotangent in BVH block layout (img = rad/spp; invalid
    pad lanes re-render real pixels — zero their cotangent)."""
    from .mega_bvh import LANES as B_LANES, ROWS, _pix_blocks, \
        mega_bvh_stream

    n_pixels = cfg.width * cfg.height
    pix_np, valid = _pix_blocks(cfg, mega_bvh_stream(scene))
    pix = jnp.asarray(pix_np)
    gflat = g.reshape(n_pixels, 3) / cfg.spp
    gp = gflat[pix.reshape(-1)] * jnp.asarray(
        valid.reshape(-1, 1), jnp.float32)
    return gp.reshape(pix.shape[0], ROWS, B_LANES, 3)


@lru_cache(maxsize=None)
def _diff_fn_bvh(cfg: RenderConfig, grad_rows: tuple, n_grad_lights: int,
                 interpret: bool):
    from .mega_bvh import _pix_blocks, mega_bvh_stream, render_mega_bvh

    @jax.custom_vjp
    def f(bp, te, le, scene_rest, ts):
        sc = scene_rest.replace(bsdf_params=bp, tri_emission=te,
                                light_emission=le)
        return render_mega_bvh(sc, cfg, ts, interpret=interpret)[0]

    def fwd(bp, te, le, scene_rest, ts):
        # ONE fwdgrad pass yields the image AND the gradient partials
        # (round 5): no separate replay-backward launch remains.
        sc = scene_rest.replace(bsdf_params=bp, tri_emission=te,
                                light_emission=le)
        n_pixels = cfg.width * cfg.height
        pix_np, valid = _pix_blocks(cfg, mega_bvh_stream(sc))
        pix = jnp.asarray(pix_np)
        rr, rg, rb, _rays, parts = _mega_bvh_fwdgrad_blocks(
            sc, cfg, ts, pix, grad_rows, n_grad_lights,
            interpret=interpret)
        pix_flat = pix.reshape(-1)
        scatter = lambda x: (  # noqa: E731
            jnp.zeros((n_pixels,), x.dtype).at[pix_flat].set(x.reshape(-1)))
        rad = jnp.stack([scatter(rr), scatter(rg), scatter(rb)], axis=-1)
        img = (rad / cfg.spp).reshape(cfg.height, cfg.width, 3)
        return img, (scene_rest, parts, ts)

    def bwd(res, g):
        scene_rest, parts, ts = res
        d_kd, d_te_l, d_le_g = _contract_partials(
            parts, _bvh_gp(scene_rest, cfg, g), len(grad_rows),
            n_grad_lights)
        d_bp, d_te, d_le = _scatter_grads_bvh(
            scene_rest, grad_rows, n_grad_lights, d_kd, d_te_l, d_le_g)
        return (d_bp, d_te, d_le, _zero_cotangent(scene_rest),
                np.zeros(jnp.shape(ts), jax.dtypes.float0))

    f.defvjp(fwd, bwd)
    return f


def render_mega_bvh_diff(scene: SceneData, cfg: RenderConfig, timestamp0=0,
                         interpret: bool = False, grad_rows=None):
    """Differentiable fused-BVH render: (H, W, 3) image whose vjp runs the
    BVH path-replay backward kernel.  Gradients cover the kd columns of the
    diffuse rows in `grad_rows` (default: mega_bvh_grad_rows(scene) —
    requires a concrete scene when omitted) and, for scenes with
    <= MAX_GRAD_LIGHTS lights, emitter radiance; zeros elsewhere."""
    if grad_rows is None:
        grad_rows = mega_bvh_grad_rows(scene)
    n_grad_lights = (scene.num_lights
                     if scene.num_lights <= MAX_GRAD_LIGHTS else 0)
    sg = jax.lax.stop_gradient
    # host-side spp chunking (ADVICE r4 medium): a single 64-spp BVH-scale
    # launch exceeds the TPU watchdog in BOTH the forward and the
    # spp*(depth+1)-iteration backward; disjoint progressive-frame chunks
    # keep each launch bounded and the summed estimator (and its replay
    # gradient) identical.
    chunk = 0
    if not interpret and cfg.spp > 8 and jax.default_backend() == "tpu":
        for c in (8, 4, 2):
            if cfg.spp % c == 0:
                chunk = c
                break
    sub = cfg.replace(spp=chunk) if chunk else cfg
    f = _diff_fn_bvh(sub, tuple(grad_rows), n_grad_lights, interpret)
    args = (scene.bsdf_params, scene.tri_emission, scene.light_emission,
            sg(scene))
    if not chunk:
        return f(*args, jnp.asarray(timestamp0, jnp.uint32))
    total = None
    for i in range(cfg.spp // chunk):
        img = f(*args, jnp.asarray(timestamp0, jnp.uint32)
                + jnp.uint32(i * chunk))
        total = img if total is None else total + img
    return total * (chunk / cfg.spp)


# ---------------------------------------------------------------------------
# Block-level differentiable renders for the SHARDED gradient step
# (parallel/dist.grad_step_sharded_fast): each mesh shard runs the fused
# forward over its pixel blocks and the replay backward over the same
# blocks; parameter gradients are psum'd outside.  Outputs/cotangents are
# PER-LANE radiance sums over cfg.spp (no /spp, no scatter) so the shard
# math stays local.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _diff_fn_blocks(cfg: RenderConfig, bvh: bool, grad_rows: tuple,
                    n_grad_lights: int, interpret: bool):
    if bvh:
        from .mega_bvh import render_mega_bvh_blocks

    @jax.custom_vjp
    def f(bp, te, le, scene_rest, pix, ts):
        sc = scene_rest.replace(bsdf_params=bp, tri_emission=te,
                                light_emission=le)
        if bvh:
            rr, rg, rb, _ = render_mega_bvh_blocks(sc, cfg, pix, ts,
                                                   interpret=interpret)
        else:
            from .mega import render_mega_rows

            shp = pix.shape
            rr, rg, rb, _ = render_mega_rows(
                sc, cfg, pix.reshape(-1, LANES), ts, interpret=interpret)
            rr, rg, rb = (x.reshape(shp) for x in (rr, rg, rb))
        return jnp.stack([rr, rg, rb], axis=-1)

    def fwd(bp, te, le, scene_rest, pix, ts):
        # ONE fwdgrad pass per shard: radiance + gradient partials
        # (round 5); the bwd contracts the partials with the cotangent.
        sc = scene_rest.replace(bsdf_params=bp, tri_emission=te,
                                light_emission=le)
        if bvh:
            rr, rg, rb, _rays, parts = _mega_bvh_fwdgrad_blocks(
                sc, cfg, ts, pix, grad_rows, n_grad_lights,
                interpret=interpret)
        else:
            shp = pix.shape
            rr, rg, rb, _rays, parts = _mega_fwdgrad_blocks(
                sc, cfg, ts, pix.reshape(-1, LANES), interpret=interpret)
            rr, rg, rb = (x.reshape(shp) for x in (rr, rg, rb))
        out = jnp.stack([rr, rg, rb], axis=-1)
        return out, (scene_rest, parts, pix, ts)

    def bwd(res, g):
        scene_rest, parts, pix, ts = res
        if bvh:
            d_kd, d_te_l, d_le_g = _contract_partials(
                parts, g, len(grad_rows), n_grad_lights)
            d_bp, d_te, d_le = _scatter_grads_bvh(
                scene_rest, grad_rows, n_grad_lights, d_kd, d_te_l,
                d_le_g)
        else:
            B = scene_rest.bsdf_kind.shape[0]
            L = scene_rest.num_lights
            d_kd, d_te_l, d_le = _contract_partials(
                parts, g.reshape(parts.shape[0], SUB, LANES, 3), B, L)
            d_bp, d_te, d_le = _scatter_grads_brute(
                scene_rest, d_kd, d_te_l, d_le)
        return (d_bp, d_te, d_le, _zero_cotangent(scene_rest),
                np.zeros(jnp.shape(pix), jax.dtypes.float0),
                np.zeros(jnp.shape(ts), jax.dtypes.float0))

    f.defvjp(fwd, bwd)
    return f


def render_blocks_diff(scene: SceneData, cfg: RenderConfig, pix, timestamp0,
                       bvh: bool, grad_rows: tuple = (),
                       n_grad_lights: int = 0, interpret: bool = False):
    """Differentiable per-lane radiance sums over cfg.spp for explicit
    pixel blocks (pix int32: (n, ROWS, LANES) for the BVH kernel,
    (n, SUB, LANES) for the brute one).  The vjp runs the matching replay
    backward over the same blocks only."""
    f = _diff_fn_blocks(cfg, bvh, tuple(grad_rows), n_grad_lights,
                        interpret)
    sg = jax.lax.stop_gradient
    return f(scene.bsdf_params, scene.tri_emission, scene.light_emission,
             sg(scene), pix, jnp.asarray(timestamp0, jnp.uint32))
