"""Per-stage TPU profile of the wavefront body on real evolving state.

Replays render_wavefront's body stage by stage with explicit syncs at
bench scale (cornell 1024^2, 1M pool), printing per-stage ms for each
iteration.  python scripts/stage_profile.py [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Location-stripped lowering for stable cache keys (utils/cache.py);
# the cache DIR itself comes from the caller's env
# (JAX_COMPILATION_CACHE_DIR — bench.py and the queue scripts set it).
jax.config.update("jax_traceback_in_locations_limit", 0)

import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import get_rand, seed_from_pixel
from logipathtracer_tpu.render.megakernel import (pick_intersect,
                                                  ray_sort_key, shade_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--amortize", type=int, default=8)
    ap.add_argument("--shade", default="auto")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "outside", "soup", "box"])
    ap.add_argument("--nee", action="store_true",
                    help="profile with next-event estimation on "
                         "(BASELINE config-5 decomposition): the shade "
                         "stage then includes the shadow-ray intersect")
    ap.add_argument("--textured", action="store_true",
                    help="with --scene box: textured materials (the "
                         "nee_textured bench extra's scene)")
    ap.add_argument("--pool", type=int, default=1 << 20)
    ap.add_argument("--dump", default=None,
                    help="npz path: save post-sort pool rays per iteration")
    ap.add_argument("--sort-split", action="store_true",
                    help="also time key/sortkv/gather separately")
    ap.add_argument("--no-worklist", action="store_true",
                    help="resident compact sweep: octant order over all "
                         "clusters instead of per-tile fired lists")
    ap.add_argument("--mxu", action="store_true",
                    help="(removed round 4: MXU MT pruned; ignored)")
    ap.add_argument("--no-sort-variadic", action="store_true",
                    help="sort via sort_key_val + wide row gather "
                         "(the round-2 production form) instead of "
                         "one variadic lax.sort")
    ap.add_argument("--shade-split", action="store_true",
                    help="also time the shade stage's pieces: the two "
                         "32-wide shade-table row gathers, the "
                         "component-major rows build, and the fused "
                         "kernel alone (untextured configs only)")
    ap.add_argument("--cm", action="store_true",
                    help="profile the component-major pool layout "
                         "(cfg.pool_cm): state rides as [3, P]/[2, P] "
                         "rows through sort/regen/isect/shade")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing the "
                         "profile harness off-TPU)")
    ap.add_argument("--json", action="store_true",
                    help="also print ONE JSON line of the per-stage "
                         "means (machine-readable: bench.py's "
                         "stage-split extra parses it)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf
    cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                       shade=args.shade, nee=args.nee,
                       compact_worklist=not args.no_worklist,
                       sort_variadic=not args.no_sort_variadic,
                       pool_cm=args.cm)
    cm = args.cm
    # Layout helpers (mirror render/wavefront.py): broadcast a per-lane
    # condition over vector state, pick component i, restack rows.
    vbc = ((lambda c: c[None, :]) if cm else (lambda c: c[:, None]))
    comp = ((lambda a, i: a[i]) if cm else (lambda a, i: a[:, i]))
    vstack = ((lambda xs: jnp.stack(xs, axis=0)) if cm
              else (lambda xs: jnp.stack(xs, axis=1)))
    if args.scene == "outside":
        from logipathtracer_tpu.scene.procedural import make_outside_scene
        scene = compile_scene(make_outside_scene(), cfg)
    elif args.scene == "soup":
        from logipathtracer_tpu.scene.procedural import make_triangle_soup
        scene = compile_scene(make_triangle_soup(), cfg)
    elif args.scene == "box":
        from logipathtracer_tpu.scene.procedural import make_box_scene
        scene = compile_scene(
            make_box_scene(spheres=6, subdiv=3, textured=args.textured),
            cfg)
    else:
        scene = compile_scene(load_gltf(
            "/root/reference/resources/cornell_box.gltf"), cfg)
    cam = scene.cameras[0]
    h = w = args.res
    npix = h * w
    s = 16
    p = min(args.pool, s * npix)
    total = s * npix
    ubo_seeds = jnp.asarray(np.random.default_rng(0).integers(
        1, 2 ** 31, (s, 2)), jnp.uint32)
    isect = pick_intersect(cfg, scene, cm=cm)
    rand = get_rand(cfg.parity_rng)
    cam_world = jnp.asarray(cam.world_matrix)
    fov = jnp.float32(cam.yfov)

    from logipathtracer_tpu.render.megakernel import intersect_tile
    bw, bh = 32, max(intersect_tile(cfg, scene) // 32, 1)

    def pix_coords(pixi):
        per_block = bh * bw
        blk = pixi // per_block
        within = pixi % per_block
        bx = blk % (w // bw)
        by = blk // (w // bw)
        return ((bx * bw + within % bw).astype(jnp.float32),
                (by * bh + within // bw).astype(jnp.float32))

    @jax.jit
    def regen(origin, direction, mask, acc, seed, alive, pending,
              prev_pdf, bounce, pixid, next_work):
        dead = ~alive
        rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        item = next_work + rank
        valid = dead & (item < total)
        sampi = jnp.where(valid, item // npix, 0)
        pixi = jnp.where(valid, item % npix, 0)
        px, py = pix_coords(pixi)
        useed = jnp.take(ubo_seeds, sampi, axis=0)
        nseed = seed_from_pixel(useed, jnp.stack([px, py], -1))
        o_new, d_new, nseed = generate_ray(
            cam_world, fov, jnp.stack([px, py], -1), (w, h), nseed,
            active=valid, rand=rand)
        if cm:
            o_new, d_new, nseed = o_new.T, d_new.T, nseed.T
        vx = vbc(valid)
        alive2 = alive | valid
        origin = jnp.where(vx, o_new, origin)
        direction = jnp.where(vx, d_new, direction)
        # park still-dead lanes (production does this before isect)
        park = vbc(~alive2)
        origin = jnp.where(park, 1e30, origin)
        direction = jnp.where(park, 1.0, direction)
        return (origin, direction,
                jnp.where(vx, 1.0, mask), jnp.where(vx, 0.0, acc),
                jnp.where(vx, nseed, seed),
                jnp.where(valid, 0, bounce),
                jnp.where(valid, pixi, pixid), alive2,
                pending | valid, jnp.where(valid, 0.0, prev_pdf),
                jnp.minimum(next_work + jnp.sum(dead.astype(jnp.int32)),
                            total))

    @jax.jit
    def sort_pool(origin, direction, mask, acc, seed, alive, pending,
                  prev_pdf, bounce, pixid):
        bf = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        bi = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        # mirror production: retired tail keyed by pixid (wavefront.py)
        retired = pending & ~alive
        key = jnp.where(alive, ray_sort_key(scene, origin, direction),
                        jnp.where(retired, (1 << 18) + 1 + pixid,
                                  1 << 18))
        packed = jnp.concatenate([
            origin, direction, mask, acc, bf(seed.astype(jnp.int32)),
            bf(bounce)[:, None], bf(pixid)[:, None],
            bf(alive.astype(jnp.int32))[:, None],
            bf(pending.astype(jnp.int32))[:, None],
            prev_pdf[:, None]], axis=1)
        _, perm = jax.lax.sort_key_val(key, jnp.arange(p, dtype=jnp.int32))
        packed = jnp.take(packed, perm, axis=0)
        return (packed[:, 0:3], packed[:, 3:6], packed[:, 6:9],
                packed[:, 9:12],
                bi(packed[:, 12:14]).astype(jnp.uint32),
                bi(packed[:, 16]) != 0, bi(packed[:, 17]) != 0,
                packed[:, 18], bi(packed[:, 14]),
                bi(packed[:, 15]))

    @jax.jit
    def sort_pool_variadic(origin, direction, mask, acc, seed, alive,
                           pending, prev_pdf, bounce, pixid):
        # production cfg.sort_variadic=True form (wavefront.py)
        retired = pending & ~alive
        key = jnp.where(alive,
                        ray_sort_key(scene, origin, direction, cm=cm),
                        jnp.where(retired, (1 << 18) + 1 + pixid,
                                  1 << 18))
        bf = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        bi = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        seedf = bf(seed.astype(jnp.int32))
        # pixid, bounce, alive, pending packed into ONE payload column
        # (production pack_pix form, wavefront.py — each operand costs
        # a full gather pass).
        flags = (pixid | (bounce << 24)
                 | (alive.astype(jnp.int32) << 30)
                 | (pending.astype(jnp.int32) << 31))
        out = jax.lax.sort(
            (key, comp(origin, 0), comp(origin, 1), comp(origin, 2),
             comp(direction, 0), comp(direction, 1), comp(direction, 2),
             comp(mask, 0), comp(mask, 1), comp(mask, 2),
             comp(acc, 0), comp(acc, 1), comp(acc, 2),
             comp(seedf, 0), comp(seedf, 1),
             bf(flags), prev_pdf), num_keys=1)
        fl = bi(out[15])
        return (vstack(out[1:4]), vstack(out[4:7]),
                vstack(out[7:10]), vstack(out[10:13]),
                bi(vstack(out[13:15])).astype(jnp.uint32),
                (fl >> 30) & 1 != 0, (fl >> 31) & 1 != 0, out[16],
                (fl >> 24) & 0x3F, fl & 0xFFFFFF)

    @jax.jit
    def sort_key_only(origin, direction, alive, pending, pixid):
        retired = pending & ~alive
        return jnp.where(alive, ray_sort_key(scene, origin, direction),
                         jnp.where(retired, (1 << 18) + 1 + pixid,
                                   1 << 18))

    @jax.jit
    def sort_perm_only(key):
        return jax.lax.sort_key_val(key, jnp.arange(p, dtype=jnp.int32))[1]

    @jax.jit
    def sort_gather_only(perm, origin, direction, mask, acc, seed,
                         alive, pending, prev_pdf, bounce, pixid):
        bf = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        packed = jnp.concatenate([
            origin, direction, mask, acc, bf(seed.astype(jnp.int32)),
            bf(bounce)[:, None], bf(pixid)[:, None],
            bf(alive.astype(jnp.int32))[:, None],
            bf(pending.astype(jnp.int32))[:, None],
            prev_pdf[:, None]], axis=1)
        return jnp.take(packed, perm, axis=0)

    @jax.jit
    def intersect(origin, direction):
        return isect(scene, origin, direction, eps=cfg.eps)

    @jax.jit
    def shade(origin, direction, acc, mask, alive, seed, bounce, t,
              obj, tri, prev_pdf):
        return shade_step(scene, cfg, origin, direction, acc, mask,
                          alive, seed, bounce, t, obj, tri,
                          prev_pdf=prev_pdf, isect=isect, rand=rand,
                          cm=cm)

    # Feature-ablated shade twins for the nee/textured --shade-split:
    # the texture prologue, the NEE machinery (in-kernel light sampling
    # + the shadow-ray sweep), and the base shade share gather/row
    # machinery, so DELTAS against the production step are the honest
    # attribution (the round-4 q14 decomposition, now reproducible).
    if args.shade_split and (cfg.nee or scene.has_textures):
        import dataclasses as _dc
        _scene_nt = _dc.replace(scene, has_textures=False,
                                tex_slots=(False,) * 5)
        _cfg_nn = _dc.replace(cfg, nee=False)

        @jax.jit
        def shade_notex(origin, direction, acc, mask, alive, seed,
                        bounce, t, obj, tri, prev_pdf):
            return shade_step(_scene_nt, cfg, origin, direction, acc,
                              mask, alive, seed, bounce, t, obj, tri,
                              prev_pdf=prev_pdf, isect=isect, rand=rand,
                              cm=cm)

        @jax.jit
        def shade_nonee(origin, direction, acc, mask, alive, seed,
                        bounce, t, obj, tri, prev_pdf):
            return shade_step(scene, _cfg_nn, origin, direction, acc,
                              mask, alive, seed, bounce, t, obj, tri,
                              prev_pdf=prev_pdf, isect=isect, rand=rand,
                              cm=cm)

        @jax.jit
        def shade_base(origin, direction, acc, mask, alive, seed,
                       bounce, t, obj, tri, prev_pdf):
            return shade_step(_scene_nt, _cfg_nn, origin, direction,
                              acc, mask, alive, seed, bounce, t, obj,
                              tri, prev_pdf=prev_pdf, isect=isect,
                              rand=rand, cm=cm)

    flush_cap = min(p, 1 << 18)
    use_bins = (cfg.flush_bins and jax.default_backend() == "tpu"
                and npix < (1 << 24))

    @jax.jit
    def flush(accum, pixid, pending, alive, acc):
        """Mirrors the production flush (wavefront.py): the dense
        bin-matmul kernel on TPU, else the tail-slice cond ladder +
        sorted-indices scatter; runs on the SORTED state (retired =
        pool tail), like production."""
        fl = pending & ~alive
        n_flush = jnp.sum(fl.astype(jnp.int32))

        if use_bins:
            from logipathtracer_tpu.ops.pallas.flush import flush_bins

            accum = flush_bins(accum, jnp.where(fl, pixid, -1), acc,
                               cm=cm)
            return accum, pending & alive

        def flush_tail(cap_k):
            def f(accum):
                sl = slice(p - cap_k, p)
                idx = jnp.where(fl[sl], pixid[sl], 0)
                vals = (jnp.where(fl[sl][None, :], acc[:, sl], 0.0).T
                        if cm
                        else jnp.where(fl[sl, None], acc[sl], 0.0))
                return accum.at[idx].add(vals, indices_are_sorted=True)
            return f

        def flush_full(accum):
            vals = (jnp.where(fl[None, :], acc, 0.0).T if cm
                    else jnp.where(fl[:, None], acc, 0.0))
            return accum.at[pixid].add(vals)

        caps = [c for c in (flush_cap // 4, flush_cap // 2, flush_cap)
                if 0 < c < p]
        accum_fn = flush_full
        for c in reversed(caps):
            accum_fn = (lambda accum, c=c, nxt=accum_fn: jax.lax.cond(
                n_flush <= c, flush_tail(c), nxt, accum))
        accum = accum_fn(accum)
        return accum, pending & alive

    # state
    if cm:
        origin = jnp.zeros((3, p))
        direction = jnp.zeros((3, p)).at[2, :].set(1.0)
        mask = jnp.ones((3, p)); acc = jnp.zeros((3, p))
        seed = jnp.zeros((2, p), jnp.uint32)
    else:
        origin = jnp.zeros((p, 3))
        direction = jnp.zeros((p, 3)).at[:, 2].set(1.0)
        mask = jnp.ones((p, 3)); acc = jnp.zeros((p, 3))
        seed = jnp.zeros((p, 2), jnp.uint32)
    alive = jnp.zeros((p,), bool); pending = jnp.zeros((p,), bool)
    prev_pdf = jnp.zeros((p,))
    bounce = jnp.zeros((p,), jnp.int32); pixid = jnp.zeros((p,), jnp.int32)
    next_work = jnp.zeros((), jnp.int32)
    accum = jnp.zeros((npix, 3))

    def sync(x):
        # Fetch ONE element (block_until_ready does not synchronize
        # through the axon relay; whole-array fetches cost ~400 ms).
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.sum(leaf.reshape(-1)[0:1].astype(jnp.float32)))

    # measure the sync round-trip floor (warm first: even the trivial
    # sum graph pays a ~60 s remote AOT compile on its first call)
    z = jnp.zeros((4,))
    sync(z)
    t0 = time.perf_counter()
    for _ in range(10):
        sync(z)
    floor_ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"sync floor: {floor_ms:.1f} ms")

    # Amortized timing: the axon relay's dispatch+sync round-trip
    # (~160 ms) dwarfs most stages, so each stage is measured by
    # dispatching it K times back-to-back on fixed inputs with ONE sync
    # (the queue pipelines; device time dominates).
    K = args.amortize

    def timed(fn, *inputs):
        out = fn(*inputs)  # ensure compiled/warm
        sync(out)
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*inputs)
        sync(out)
        return (time.perf_counter() - t0 - floor_ms * 1e-3) / K, out

    if cm and (args.sort_split or args.shade_split or args.dump
               or not cfg.sort_variadic):
        raise SystemExit("--cm supports the production variadic path "
                         "only (no --sort-split/--shade-split/--dump)")

    stages = {k: [] for k in ("sort", "flush", "regen", "isect", "shade")}
    dumps = {}
    for it in range(args.iters):
        # Production body order (wavefront.py): sort -> flush (tail of
        # the sorted pool) -> regen (+ park) -> isect -> shade.
        if args.sort_split:
            # side measurements on the same pre-sort state (state still
            # evolves through the combined sort_pool below)
            dtk, key = timed(sort_key_only, origin, direction, alive,
                             pending, pixid)
            dtp, perm = timed(sort_perm_only, key)
            dtg, _ = timed(sort_gather_only, perm, origin, direction,
                           mask, acc, seed, alive, pending, prev_pdf,
                           bounce, pixid)
            print(f"    sort split: key {dtk*1e3:5.1f}  "
                  f"sortkv {dtp*1e3:5.1f}  gather {dtg*1e3:5.1f}",
                  flush=True)
        dt, out = timed(
            sort_pool_variadic if cfg.sort_variadic else sort_pool,
            origin, direction, mask, acc, seed,
            alive, pending, prev_pdf, bounce, pixid)
        (origin, direction, mask, acc, seed, alive, pending, prev_pdf,
         bounce, pixid) = out
        stages["sort"].append(dt)

        dt, out = timed(flush, accum, pixid, pending, alive, acc)
        accum, pending = out
        stages["flush"].append(dt)

        dt, out = timed(regen, origin, direction, mask, acc, seed, alive,
                        pending, prev_pdf, bounce, pixid, next_work)
        (origin, direction, mask, acc, seed, bounce, pixid, alive,
         pending, prev_pdf, next_work) = out
        stages["regen"].append(dt)
        if args.dump:
            dumps[f"o{it}"] = np.asarray(origin)
            dumps[f"d{it}"] = np.asarray(direction)
            dumps[f"alive{it}"] = np.asarray(alive)

        dt, (t, obj, tri) = timed(intersect, origin, direction)
        stages["isect"].append(dt)

        if args.shade_split and not scene.has_textures:
            from logipathtracer_tpu.ops.pallas import shade as ps

            @jax.jit
            def shade_gathers(obj, tri):
                # production form: ONE [T, 64] gather keyed by tri
                ts64 = jnp.take(scene.tri_shade, jnp.maximum(tri, 0),
                                axis=0)
                return ts64[:, 32:64], ts64[:, 0:32]

            @jax.jit
            def shade_rows(origin, direction, mask, acc, t, seed, alive,
                           prev_pdf, bounce, oshade, tshade):
                bf = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
                return jnp.concatenate([
                    origin.T, direction.T, mask.T, acc.T, t[None, :],
                    bf(seed.astype(jnp.int32)).T,
                    bf(alive.astype(jnp.int32))[None, :],
                    prev_pdf[None, :], bf(bounce)[None, :],
                    tshade.T, oshade.T], axis=0)

            env = float(cfg.env_color)
            cfg_tuple = (env, env, env, float(cfg.eps),
                         float(cfg.rr_threshold), int(cfg.rr_bounces),
                         int(cfg.heitz_max_order), bool(cfg.nee_mis),
                         float(scene.total_light_area))
            kern = jax.jit(lambda rows: ps.shade_pallas(
                rows, cfg_tuple, rand_kind="parity",
                tile=min(cfg.shade_tile, p)))
            dtg, (osh, tsh) = timed(shade_gathers, obj, tri)
            dtr, rows = timed(shade_rows, origin, direction, mask, acc,
                              t, seed, alive, prev_pdf, bounce, osh, tsh)
            dtk, _ = timed(kern, rows)
            print(f"    shade split: gathers {dtg*1e3:5.1f}  "
                  f"rows {dtr*1e3:5.1f}  kernel {dtk*1e3:5.1f}",
                  flush=True)

        if args.shade_split and (cfg.nee or scene.has_textures):
            sargs = (origin, direction, acc, mask, alive, seed, bounce,
                     t, obj, tri, prev_pdf)
            dt_nt, _ = timed(shade_notex, *sargs)
            dt_nn, _ = timed(shade_nonee, *sargs)
            dt_b, _ = timed(shade_base, *sargs)
            print(f"    shade ablations: notex {dt_nt*1e3:5.1f}  "
                  f"nonee {dt_nn*1e3:5.1f}  base {dt_b*1e3:5.1f}",
                  flush=True)

        shaded_alive = alive
        dt, out = timed(shade, origin, direction, acc, mask, alive, seed,
                        bounce, t, obj, tri, prev_pdf)
        origin, direction, acc, mask, alive, seed, prev_pdf = out
        bounce = jnp.where(shaded_alive, bounce + 1, bounce)
        alive = alive & (bounce < cfg.max_depth)
        stages["shade"].append(dt)

        n_alive = int(np.asarray(jnp.sum(alive)))
        print(f"it {it}: alive {n_alive}  " + "  ".join(
            f"{k} {v[-1]*1e3:6.1f}" for k, v in stages.items()),
            flush=True)

    print(f"\nmean of iters 2+ (ms/iteration, pool {p}):")
    tot = 0.0
    means = {}
    for k, v in stages.items():
        m = np.mean(v[2:]) * 1e3
        means[k] = round(m, 1)
        tot += m
        print(f"  {k:6s} {m:7.1f}")
    print(f"  total  {tot:7.1f}  -> {p / tot / 1e3:.2f} Mrays/s-iter")
    if args.json:
        import json
        print(json.dumps({**means, "total": round(tot, 1), "pool": p,
                          "mrays_iter": round(p / tot / 1e3, 2),
                          "isect_mrays": round(p / means["isect"] / 1e3,
                                               2)}))
    if args.dump:
        np.savez_compressed(args.dump, iters=args.iters, **dumps)
        print(f"dumped pool rays -> {args.dump}")


if __name__ == "__main__":
    main()
