"""Sort-permutation window statistics on the production wavefront.

The round-4 sort-wall lever (ROADMAP) is a Pallas windowed-permute
kernel: apply the maintenance sort's permutation with per-output-tile
one-hot matmuls over a bounded source WINDOW instead of XLA's
~0.55 ns/elem row gathers.  That only works if, for (almost) every
output tile of R rows, the tile's source rows span <= W old positions.

This probe steps the real wavefront body (CPU backend, real cornell
geometry + RNG) iteration by iteration, computes the pre-sort key the
body would sort by, and reports the per-tile source-spread
distribution of the stable sort permutation, plus the fraction of
tiles whose spread exceeds k*R for k in 2..32.  Also reports the
per-tile spread of best-hit TRIANGLE ids over the sorted alive rays
(the same windowed-gather question for the shade-table lever).

python scripts/perm_stats.py [--res 512] [--samples 8] [--iters 10]
                             [--pool 1048576] [--tiles 1024,2048,4096]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def spread_stats(perm, tiles):
    out = {}
    p = perm.shape[0]
    for r in tiles:
        nt = p // r
        pv = perm[: nt * r].reshape(nt, r)
        spread = pv.max(axis=1) - pv.min(axis=1)
        row = {"p50": int(np.percentile(spread, 50)),
               "p90": int(np.percentile(spread, 90)),
               "p99": int(np.percentile(spread, 99)),
               "max": int(spread.max())}
        for k in (2, 4, 8, 16, 32):
            row[f">{k}R"] = float((spread > k * r).mean())
        out[r] = row
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pool", type=int, default=1 << 20)
    ap.add_argument("--tiles", default="1024,2048,4096")
    ap.add_argument("--tri-every", type=int, default=4,
                    help="alive-tile tri-spread stats every k iterations"
                         " (needs an extra intersect pass; 0 = never)")
    args = ap.parse_args()
    tiles = [int(t) for t in args.tiles.split(",")]

    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.megakernel import ray_sort_key
    from logipathtracer_tpu.render.wavefront import (_make_body,
                                                     _make_pix_coords,
                                                     pix_layout,
                                                     wavefront_pool_state)
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    cfg = RenderConfig(width=args.res, height=args.res, max_depth=10)
    scene = compile_scene(
        load_gltf("/root/reference/resources/cornell_box.gltf"), cfg)
    cam = scene.cameras[0]
    h = w = args.res
    npix = h * w
    total = args.samples * npix
    p = min(args.pool, total)
    blocked, bh, bw = pix_layout(cfg, scene, h, w)
    pix_coords = _make_pix_coords(blocked, bh, bw, w,
                                  jnp.asarray(0, jnp.int32))
    ubo = jnp.asarray(np.random.default_rng(7).integers(
        1, 2 ** 31, (args.samples, 2)), jnp.uint32)
    body = jax.jit(_make_body(scene, cfg, jnp.asarray(cam.world_matrix),
                              jnp.float32(cam.yfov), ubo, p, npix, total,
                              min(p, 1 << 18), pix_coords))
    state = wavefront_pool_state(p, npix)
    print(f"pool {p}  npix {npix}  total {total}", flush=True)

    isect_fn = None
    for it in range(args.iters):
        # Pre-sort key: exactly what the body's sort_and_flush computes.
        alive = np.asarray(state["alive"])
        pending = np.asarray(state["pending"])
        retired = pending & ~alive
        key = np.asarray(ray_sort_key(scene, state["origin"],
                                      state["direction"]))
        pixid = np.asarray(state["pixid"])
        key = np.where(alive, key,
                       np.where(retired, (1 << 18) + 1 + pixid, 1 << 18))
        perm = np.argsort(key, kind="stable")
        n_alive = int(alive.sum())
        if it > 0:  # it 0 is the all-free cold pool (degenerate)
            st = spread_stats(perm, tiles)
            print(f"it {it}: alive {n_alive} retired "
                  f"{int(retired.sum())}", flush=True)
            for r, row in st.items():
                print(f"  R={r:5d} spread p50 {row['p50']:8d} "
                      f"p90 {row['p90']:8d} p99 {row['p99']:8d} "
                      f"max {row['max']:8d}  "
                      + "  ".join(f">{k}R {row[f'>{k}R']*100:5.1f}%"
                                  for k in (2, 4, 8, 16, 32)),
                      flush=True)
            # Alive-region-only stats (the tail segments are block
            # moves by construction; the alive region is the hard part)
            na_t = {r: (n_alive // r) * r for r in tiles}
            for r in tiles:
                if na_t[r] >= r:
                    row = spread_stats(perm[:na_t[r]], [r])[r]
                    print(f"  alive-only R={r:5d} p50 {row['p50']:8d} "
                          f"p90 {row['p90']:8d} p99 {row['p99']:8d} "
                          + "  ".join(f">{k}R {row[f'>{k}R']*100:5.1f}%"
                                      for k in (2, 4, 8, 16, 32)),
                          flush=True)
        if (args.tri_every and it > 0 and it % args.tri_every == 0):
            # Tri-id spread over sorted alive rays (shade-gather lever):
            # intersect the sorted pool the way the body is about to.
            if isect_fn is None:
                from logipathtracer_tpu.render.megakernel import \
                    pick_intersect
                ifn = pick_intersect(cfg, scene)
                isect_fn = jax.jit(lambda o, d: ifn(scene, o, d,
                                                    eps=cfg.eps))
            o_s = np.asarray(state["origin"])[perm]
            d_s = np.asarray(state["direction"])[perm]
            t, obj, tri = isect_fn(jnp.asarray(o_s), jnp.asarray(d_s))
            tri = np.asarray(tri)
            hit = tri >= 0
            for r in tiles:
                nt = p // r
                tv = tri[: nt * r].reshape(nt, r)
                hv = hit[: nt * r].reshape(nt, r)
                any_hit = hv.any(axis=1)
                tmax = np.where(hv, tv, -1).max(axis=1)
                tmin = np.where(hv, tv, 1 << 30).min(axis=1)
                spread = np.where(any_hit, tmax - tmin, 0)
                sp = spread[any_hit]
                if sp.size:
                    print(f"  tri R={r:5d} spread p50 {int(np.percentile(sp, 50)):7d} "
                          f"p90 {int(np.percentile(sp, 90)):7d} "
                          f"p99 {int(np.percentile(sp, 99)):7d} "
                          f"max {int(sp.max()):7d}  (of "
                          f"{scene.cl_tris.shape[0] * scene.cl_tris.shape[2]}"
                          f" padded tris)", flush=True)
        state = body(state)

    print("done", flush=True)


if __name__ == "__main__":
    main()
