"""Probe Mosaic lowering patterns for row-chunk masking (standalone).

Tries several ways to do per-8-row masked work on data that starts in
lane layout, at tiny sizes so compiles are fast.

python scripts/mosaic_probe.py <case>
"""

import sys
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128   # "triangles" (lanes)
INF = 3.4e38


def run(kernel, n_scr=0, scr_shape=(128, 128)):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 128)).astype(np.float32))
    trib = jnp.asarray(np.random.default_rng(1).normal(
        size=(9, S)).astype(np.float32))
    scratch = [pltpu.VMEM(scr_shape, jnp.float32)] * n_scr
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )(x, trib)
    print("OK", np.asarray(out).sum())


def case_a():
    """Transpose lane vec -> [128,1], slice [8,1], broadcast vs [1,S]."""
    def kernel(x_ref, trib_ref, o_ref, scr):
        lox = x_ref[0, :]                    # [128] lanes
        col = lox[:, None]                   # [128, 1]
        acc = jnp.zeros((8, 128), jnp.float32)
        scr[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = col[a:b] * trib_ref[0][None, :]   # [8, S]
                scr[a:b, 0:1] = jnp.min(t, axis=1, keepdims=True)
        o_ref[:, :] = acc + scr[0:8, :]
    run(kernel, n_scr=1)


def case_b():
    """Materialize the whole transposed col into scratch first, then
    static sublane slices of the scratch ref."""
    def kernel(x_ref, trib_ref, o_ref, cols, scr):
        lox = x_ref[0, :]
        cols[:, 0:1] = lox[:, None]
        scr[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = cols[a:b, 0:1] * trib_ref[0][None, :]
                scr[a:b, 0:1] = jnp.min(t, axis=1, keepdims=True)
        o_ref[:, :] = scr[0:8, :]
    run(kernel, n_scr=2)


def case_c():
    """8-lane static slices of the lane vector, transposed per chunk."""
    def kernel(x_ref, trib_ref, o_ref, scr):
        lox = x_ref[0, :]
        scr[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                seg = lox[a:b]                 # [8] lanes
                t = seg[:, None] * trib_ref[0][None, :]
                scr[a:b, 0:1] = jnp.min(t, axis=1, keepdims=True)
        o_ref[:, :] = scr[0:8, :]
    run(kernel, n_scr=1)


def case_d():
    """Full [128,S] compute per chunk is the baseline (sanity)."""
    def kernel(x_ref, trib_ref, o_ref):
        lox = x_ref[0, :]
        t = lox[:, None] * trib_ref[0][None, :]   # [128, S]
        o_ref[:, :] = jnp.min(t, axis=1).reshape(8, 16)[:, 0:128//8].repeat(8, 1)[:, :128] * 0 + 1.0
    def kernel2(x_ref, trib_ref, o_ref):
        lox = x_ref[0, :]
        t = lox[:, None] * trib_ref[0][None, :]
        m = jnp.min(t, axis=1)                    # [128]
        o_ref[:, :] = jnp.broadcast_to(m[None, :], (8, 128))
    run(kernel2)




def case_e():
    """Int epilogue: iota slice + [8,1] i32 writes + scratch-read slices."""
    def kernel(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        lox = x_ref[0, :]
        ids = jax.lax.broadcasted_iota(jnp.int32, (128, S), 1)
        best[0, :] = jnp.full((128,), INF)
        bt2 = best[0, :]
        btr = bt2[:, None]
        scr_t[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                ok = (t > 1e-4) & (t < btr[a:b])
                t = jnp.where(ok, t, INF)
                tm = jnp.min(t, axis=1, keepdims=True)
                is_min = (t == tm) & (tm < INF)
                sl = jnp.min(jnp.where(is_min, ids[a:b], S),
                             axis=1, keepdims=True)
                scr_t[a:b, 0:1] = tm
                scr_i[a:b, 0:1] = sl.astype(jnp.float32)
        tmin = scr_t[:, 0]
        upd = tmin < bt2
        best[0, :] = jnp.where(upd, tmin, bt2)
        o_ref[:, :] = jnp.broadcast_to(best[0, :][None, :], (8, 128))

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 128)).astype(np.float32))
    trib = jnp.asarray(np.random.default_rng(1).normal(
        size=(9, S)).astype(np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32),
                        pltpu.VMEM((128, 128), jnp.float32),
                        pltpu.VMEM((2, 128), jnp.float32)],
    )(x, trib)
    print("OK", np.asarray(out).sum())


def case_f():
    """bool hit vector -> where -> transpose -> sliced predicate."""
    def kernel(x_ref, trib_ref, o_ref, scr):
        lox = x_ref[0, :]
        hit = lox > 0.0                      # [128] bool lanes
        hf = jnp.where(hit, 1.0, 0.0)[:, None]
        scr[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(hf[a:b]) > 0.0)
            def _(a=a, b=b):
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                scr[a:b, 0:1] = jnp.min(t, axis=1, keepdims=True)
        o_ref[:, :] = scr[0:8, :]
    run(kernel, n_scr=1)




def _run_like_e(body):
    def kernel(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        body(x_ref, trib_ref, o_ref, scr_t, scr_i, best)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 128)).astype(np.float32))
    trib = jnp.asarray(np.random.default_rng(1).normal(
        size=(9, S)).astype(np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32),
                        pltpu.VMEM((128, 128), jnp.float32),
                        pltpu.VMEM((2, 128), jnp.float32)],
    )(x, trib)
    print("OK", np.asarray(out).sum())


def case_g():
    """e minus the btr (scratch-read transpose) slice."""
    def body(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        lox = x_ref[0, :]
        ids = jax.lax.broadcasted_iota(jnp.int32, (128, S), 1)
        scr_t[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                ok = (t > 1e-4) & (t < INF)
                t = jnp.where(ok, t, INF)
                tm = jnp.min(t, axis=1, keepdims=True)
                is_min = (t == tm) & (tm < INF)
                sl = jnp.min(jnp.where(is_min, ids[a:b], S),
                             axis=1, keepdims=True)
                scr_t[a:b, 0:1] = tm
                scr_i[a:b, 0:1] = sl.astype(jnp.float32)
        o_ref[:, :] = scr_t[0:8, :]
    _run_like_e(body)


def case_h():
    """e minus the iota/slot epilogue (keeps btr slice)."""
    def body(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        lox = x_ref[0, :]
        best[0, :] = jnp.full((128,), INF)
        bt2 = best[0, :]
        btr = bt2[:, None]
        scr_t[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                ok = (t > 1e-4) & (t < btr[a:b])
                t = jnp.where(ok, t, INF)
                scr_t[a:b, 0:1] = jnp.min(t, axis=1, keepdims=True)
        o_ref[:, :] = scr_t[0:8, :]
    _run_like_e(body)




def case_i():
    """g with float iota, no [8,1] bool broadcast, f32 slot."""
    def body(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        lox = x_ref[0, :]
        ids_f = jax.lax.broadcasted_iota(
            jnp.int32, (128, S), 1).astype(jnp.float32)
        scr_t[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                ok = (t > 1e-4) & (t < INF)
                t = jnp.where(ok, t, INF)
                tm = jnp.min(t, axis=1, keepdims=True)
                sl = jnp.min(jnp.where(t == tm, ids_f[a:b], float(S)),
                             axis=1, keepdims=True)
                scr_t[a:b, 0:1] = tm
                scr_i[a:b, 0:1] = sl
        o_ref[:, :] = scr_t[0:8, :] + scr_i[0:8, :]
    _run_like_e(body)


def case_j():
    """g with int iota but no [8,1] bool broadcast (drop tm<INF)."""
    def body(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        lox = x_ref[0, :]
        ids = jax.lax.broadcasted_iota(jnp.int32, (128, S), 1)
        scr_t[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                ok = (t > 1e-4) & (t < INF)
                t = jnp.where(ok, t, INF)
                tm = jnp.min(t, axis=1, keepdims=True)
                sl = jnp.min(jnp.where(t == tm, ids[a:b], S),
                             axis=1, keepdims=True)
                scr_t[a:b, 0:1] = tm
                scr_i[a:b, 0:1] = sl.astype(jnp.float32)
        o_ref[:, :] = scr_t[0:8, :] + scr_i[0:8, :]
    _run_like_e(body)




def case_k():
    """h + (t == tm) compare + second keepdims min, no iota."""
    def body(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        lox = x_ref[0, :]
        scr_t[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                tm = jnp.min(t, axis=1, keepdims=True)
                sl = jnp.min(jnp.where(t == tm, t * 2.0, INF),
                             axis=1, keepdims=True)
                scr_t[a:b, 0:1] = tm
                scr_i[a:b, 0:1] = sl
        o_ref[:, :] = scr_t[0:8, :] + scr_i[0:8, :]
    _run_like_e(body)


def case_l():
    """iota created per chunk with shape (8, S) — no big-iota slice."""
    def body(x_ref, trib_ref, o_ref, scr_t, scr_i, best):
        lox = x_ref[0, :]
        scr_t[:, 0:1] = jnp.full((128, 1), INF)
        for rk in range(4):
            a, b = rk * 8, rk * 8 + 8

            @pl.when(jnp.sum(x_ref[1, a:b]) > -1e30)
            def _(a=a, b=b):
                ids = jax.lax.broadcasted_iota(
                    jnp.int32, (8, S), 1).astype(jnp.float32)
                t = lox[a:b][:, None] * trib_ref[0][None, :]
                tm = jnp.min(t, axis=1, keepdims=True)
                sl = jnp.min(jnp.where(t == tm, ids, float(S)),
                             axis=1, keepdims=True)
                scr_t[a:b, 0:1] = tm
                scr_i[a:b, 0:1] = sl
        o_ref[:, :] = scr_t[0:8, :] + scr_i[0:8, :]
    _run_like_e(body)


if __name__ == "__main__":
    {"a": case_a, "b": case_b, "c": case_c, "d": case_d, "e": case_e, "f": case_f, "g": case_g, "h": case_h, "i": case_i, "j": case_j, "k": case_k, "l": case_l}[sys.argv[1]]()
