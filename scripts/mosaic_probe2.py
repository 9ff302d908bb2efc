"""Bisect the 'Unsupported target bitwidth for truncation' failure in
the shade kernel. python scripts/mosaic_probe2.py <case>"""

import sys
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 512
_MUL = np.uint32(1103515245)
_INVP = np.float32(1.0) / np.float32(4294967295.0)


def run(kernel):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, T)).astype(np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, T), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    print("OK", float(np.asarray(out).sum()))


def case_a():
    """u32 bitcast + parity rand + masked state advance + f32 out."""
    def kernel(x_ref, o_ref):
        s0 = jax.lax.bitcast_convert_type(x_ref[0, :], jnp.uint32)
        s1 = jax.lax.bitcast_convert_type(x_ref[1, :], jnp.uint32)
        active = x_ref[2, :] > 0.0
        n0 = s0 + jnp.uint32(1)
        n1 = s1 + jnp.uint32(1)
        qx = _MUL * ((n0 >> jnp.uint32(1)) ^ n1)
        qy = _MUL * ((n1 >> jnp.uint32(1)) ^ n0)
        n = _MUL * (qx ^ (qy >> jnp.uint32(3)))
        hi = jax.lax.bitcast_convert_type(n >> jnp.uint32(16), jnp.int32)
        lo = jax.lax.bitcast_convert_type(n & jnp.uint32(0xFFFF), jnp.int32)
        val = (hi.astype(jnp.float32) * 65536.0
               + lo.astype(jnp.float32)) * _INVP
        s0 = jnp.where(active, n0, s0)
        o_ref[0, :] = val
        o_ref[1, :] = jax.lax.bitcast_convert_type(s0, jnp.float32)
        o_ref[2, :] = x_ref[3, :]
        o_ref[3, :] = x_ref[4, :]
    run(kernel)


def case_b():
    """bool from bitcast-i32 != 0, logic, astype back out."""
    def kernel(x_ref, o_ref):
        alive = jax.lax.bitcast_convert_type(x_ref[0, :], jnp.int32) != 0
        skip = jax.lax.bitcast_convert_type(x_ref[1, :], jnp.int32) != 0
        miss = alive & (x_ref[2, :] >= 1.0)
        alive = alive & ~miss
        v = jnp.where(alive, x_ref[3, :], x_ref[4, :])
        o_ref[0, :] = v
        o_ref[1, :] = jax.lax.bitcast_convert_type(
            alive.astype(jnp.int32), jnp.float32)
        o_ref[2, :] = jax.lax.bitcast_convert_type(
            skip.astype(jnp.int32), jnp.float32)
        o_ref[3, :] = v
    run(kernel)


def case_c():
    """int bounce compare + where chains on bools."""
    def kernel(x_ref, o_ref):
        bounce = jax.lax.bitcast_convert_type(x_ref[0, :], jnp.int32)
        q = x_ref[1, :]
        alive = x_ref[2, :] > 0.0
        rr = alive & (q < 0.5) & (bounce > 2)
        kill = rr & (x_ref[3, :] > q)
        alive = alive & ~kill
        boost = rr & ~kill
        inv_q = 1.0 / jnp.where(q == 0.0, 1.0, q)
        o_ref[0, :] = jnp.where(boost, q * inv_q, q)
        o_ref[1, :] = jax.lax.bitcast_convert_type(
            alive.astype(jnp.int32), jnp.float32)
        o_ref[2, :] = x_ref[4, :]
        o_ref[3, :] = x_ref[5, :]
    run(kernel)


def case_d():
    """is_metal/is_trans/is_diff where-merge of three directions."""
    def kernel(x_ref, o_ref):
        r = x_ref[0, :]
        is_metal = r < 0.3
        is_trans = (~is_metal) & (r < 0.6)
        is_diff = ~(is_metal | is_trans)
        a, b, c = x_ref[1, :], x_ref[2, :], x_ref[3, :]
        v = jnp.where(is_diff, a, jnp.where(is_trans, b, c))
        w = jnp.where(is_diff & is_metal, a, b)
        o_ref[0, :] = v
        o_ref[1, :] = w
        o_ref[2, :] = jnp.where(is_trans, a, c)
        o_ref[3, :] = x_ref[4, :]
    run(kernel)


def case_e():
    """pow 2.4 + log + trig on lanes."""
    def kernel(x_ref, o_ref):
        c = jnp.abs(x_ref[0, :])
        o_ref[0, :] = ((c + 0.055) / 1.055) ** 2.4
        o_ref[1, :] = -jnp.log(jnp.maximum(1.0 - c * 0.1, 1e-6))
        o_ref[2, :] = jnp.cos(c) + jnp.sin(c)
        o_ref[3, :] = jnp.sqrt(jnp.maximum(c, 0.0))
    run(kernel)


if __name__ == "__main__":
    dict(a=case_a, b=case_b, c=case_c, d=case_d, e=case_e)[sys.argv[1]]()
