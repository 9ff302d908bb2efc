"""Bin-matmul radiance flush (Pallas TPU).

The wavefront's flush scatters retired paths' radiance into the
accumulation buffer.  XLA's scatter-add costs ~110-370 ns/ROW on v5e
regardless of payload (scripts/maint_probe.py) — 22 ms/iteration on
the cornell 1M pool, the largest maintenance stage after round 3's
intersect work.

This kernel replaces the scatter with dense MXU work, exploiting the
round-3 sort-key change (wavefront.py: retired lanes sort to the pool
tail KEYED BY PIXID, so the flush tail's scatter indices are
ascending):

  * the image is cut into BW-pixel bins; a searchsorted prepass finds
    each bin's contiguous row segment of the sorted tail;
  * grid (bins,): each step DMAs its segment (128-row-aligned blocks
    of ``cap`` rows, major-dim slices of a [blocks, 4, 128] layout —
    Mosaic forbids dynamic lane-dim DMA offsets), builds ONE [BW, cap]
    one-hot from the in-bin pixel offsets, and accumulates ONE
    [BW, cap] @ [cap, 9] matmul per cap-block (sub-blocks ride the
    contraction dim, the bf16 hi/mid/lo splits ride the output dim) —
    the splits keep every f32 addend exact (same argument as
    compact_intersect._dot_onehot);
  * rows outside the bin (alignment padding, the slice's non-retired
    prefix, neighbours' rows) match no one-hot column, so alignment
    and masking are free.

Cost is O(npix / BW) grid steps + O(retired rows / 128) sub-block
matmuls — independent of the pool size, which also caps the
drain-tail iterations' maintenance cost.

TPU-only (manual DMA inside fori_loop has no interpreter support);
the XLA scatter stays as the CPU/interpret twin and the n_flush >
tail-capacity fallback.  Reference analog: the framebuffer
accumulation of shaders/path_tracing.comp:360-377, restructured from
per-thread += into a sorted bulk commit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flush_kernel(s0_ref, nb_ref, ain_ref, tail_ref, aout_ref, tbuf, sem,
                  *, bw: int, cap: int, nbins: int):
    """Per-bin one-hot accumulate with CROSS-STEP DMA prefetch: each
    grid step waits the block its predecessor started (the scratch
    persists across steps), then immediately starts the next bin's
    first block — so the typical one-block bin never exposes DMA
    latency (a synchronous per-bin start+wait measured 41 us/bin,
    barely beating the scatter it replaces)."""
    b = pl.program_id(0)
    n = nb_ref[b]
    sub = cap // 128

    def first_dma(bb, slot):
        return pltpu.make_async_copy(
            tail_ref.at[pl.ds(s0_ref[bb], sub)], tbuf.at[slot],
            sem.at[slot])

    @pl.when(b == 0)
    def _():
        first_dma(0, 0).start()

    @pl.when(b + 1 < nbins)
    def _():
        first_dma(b + 1, (b + 1) % 2).start()

    aout_ref[...] = ain_ref[...]

    iota_bw = jax.lax.broadcasted_iota(jnp.int32, (bw, 1), 0).astype(
        jnp.float32)
    binf = jax.lax.convert_element_type(b * bw, jnp.float32)
    slot0 = b % 2
    first_dma(b, slot0).wait()

    def block(slot):
        """ONE [BW, cap] @ [cap, 9] matmul per cap-block (the per-
        128-sub-block form issued 3 x sub tiny matmuls per block —
        ~12k launch-bound dispatches per 1M-pixel flush; collapsing
        the sub-blocks onto the contraction dim and the hi/mid/lo
        splits onto the output dim keeps the exactness argument: each
        0/1 x bf16 product is an exact f32 addend, only the f32
        addition order changes — the class the tests already admit)."""
        rows = [tbuf[slot, s] for s in range(sub)]        # [4, 128] each
        # row 3 holds the pixel id as an exact f32 (-1 = skip); rows
        # outside this bin match no one-hot row.
        pix_rel = jnp.concatenate(
            [r[3:4, :] for r in rows], axis=1) - binf     # [1, cap]
        ohb = (iota_bw == pix_rel).astype(jnp.bfloat16)   # [BW, cap]

        def split3(a):
            ah = a.astype(jnp.bfloat16)
            r1 = a - ah.astype(jnp.float32)
            am = r1.astype(jnp.bfloat16)
            al = (r1 - am.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.concatenate([ah, am, al], axis=0)  # [9, 128]

        x9 = jnp.concatenate(
            [split3(r[0:3, :]) for r in rows], axis=1)    # [9, cap]
        c9 = jax.lax.dot_general(
            ohb, x9, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)           # [BW, 9]
        return c9[:, 0:3] + c9[:, 3:6] + c9[:, 6:9]

    @pl.when(n > 0)
    def _():
        aout_ref[...] += block(slot0)

    # long segments (> cap rows in one bin): rare, serial extra blocks
    # through a third scratch slot so the prefetch slots stay clean
    def body(j, _):
        dma = pltpu.make_async_copy(
            tail_ref.at[pl.ds(s0_ref[b] + j * sub, sub)], tbuf.at[2],
            sem.at[2])
        dma.start()
        dma.wait()
        aout_ref[...] += block(2)
        return 0

    jax.lax.fori_loop(1, n, body, 0)


def flush_bin_segments(pix_sorted, npix: int, bw: int, cap: int):
    """Searchsorted prepass: per-bin 128-row-aligned block starts (in
    128-row units) and cap-block counts over the ascending
    (-1-prefixed) pixel-id tail."""
    nbins = -(-npix // bw)
    bounds = jnp.arange(nbins + 1, dtype=pix_sorted.dtype) * bw
    edges = jnp.searchsorted(pix_sorted, bounds, side="left")
    start_al = (edges[:-1] // 128) * 128
    nb = jnp.maximum(edges[1:] - start_al, 0)
    nb = (nb + cap - 1) // cap
    return (start_al // 128).astype(jnp.int32), nb.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bw", "cap", "cm"))
def flush_bins(accum, pix_tail, acc_tail, bw: int = 4096, cap: int = 1024,
               cm: bool = False):
    """accum [npix, 3] += per-pixel sums of acc_tail rows, where
    pix_tail [FC] is ascending with a -1 prefix for rows to skip.

    ``cm``: acc_tail arrives component-major [3, FC] (cfg.pool_cm) —
    already the kernel's tail layout, so the transpose is elided.

    Exact: every addend enters the accumulator as its f32 value (bf16
    split products against a 0/1 one-hot); only the addition ORDER
    differs from a scalar scatter (same class as accumulation-order
    ULPs between the wavefront and megakernel renderers).
    """
    npix = accum.shape[0]
    fc = pix_tail.shape[0]
    assert cap % 128 == 0
    nbins = -(-npix // bw)
    pad = nbins * bw - npix
    if pad:
        accum = jnp.concatenate(
            [accum, jnp.zeros((pad, 3), accum.dtype)], axis=0)

    # component-major tail (acc.xyz + pixel id as exact f32; npix <
    # 2^24), padded by one cap block and reshaped to [blocks, 4, 128]
    # so the kernel's DMA slices the MAJOR dim
    fcp = -(-(fc + cap) // cap) * cap
    tail4 = jnp.concatenate(
        [acc_tail if cm else acc_tail.T,
         pix_tail.astype(jnp.float32)[None, :]], axis=0)
    tail4 = jnp.concatenate(
        [tail4, jnp.full((4, fcp - fc), -1.0, jnp.float32)], axis=1)
    tail3 = tail4.reshape(4, fcp // 128, 128).transpose(1, 0, 2)

    s0, nb = flush_bin_segments(pix_tail, nbins * bw, bw, cap)

    out = pl.pallas_call(
        functools.partial(_flush_kernel, bw=bw, cap=cap, nbins=nbins),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # (s0, nb)
            grid=(nbins,),
            in_specs=[
                pl.BlockSpec((bw, 3), lambda b, s, n: (b, 0),
                             memory_space=pltpu.VMEM),    # accum in
                pl.BlockSpec(memory_space=pl.ANY),        # tail3 (HBM)
            ],
            out_specs=pl.BlockSpec((bw, 3), lambda b, s, n: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                # slots 0/1: cross-step prefetch ping-pong; slot 2:
                # serial extra blocks of long segments
                pltpu.VMEM((3, cap // 128, 4, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbins * bw, 3), jnp.float32),
    )(s0, nb, accum, tail3)
    return out[:npix]
