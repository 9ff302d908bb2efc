"""Render configuration.

Unifies the reference's three config layers into one runtime dataclass
(reference: compile-time C++ consts in src/Main.cpp:13-34, the
RendererConfiguration struct in include/RendererCore.hpp:13-27, and the
GLSL #defines in shaders/path_tracing.comp:16-22 /
shaders/heitz/BSDF.glsl:8 / shaders/tex_to_quad.frag:21-22).

All fields become static arguments of the jitted render step, so a
config change triggers a recompile exactly like rebuilding a shader
variant would in the reference.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Image (reference: src/Main.cpp:30, RendererConfiguration.renderScale
    # applied at src/RendererPT.cpp:254-255,532-533).
    width: int = 1920
    height: int = 1080
    render_scale: int = 1

    # Path tracing (reference: shaders/path_tracing.comp:19-22).
    max_depth: int = 10
    rr_bounces: int = 2           # RUSSIAN_ROULETTE_BOUNCES
    rr_threshold: float = 0.5     # q < 0.5 gate (path_tracing.comp:318)
    use_microfacet: bool = True   # USE_MICROFACET: Heitz vs basic BSDFs
    heitz_max_order: int = 16     # shaders/heitz/BSDF.glsl:8

    # Environment: constant grey on miss
    # (path_tracing.comp:221, rtx/miss.rmiss:11).
    env_color: float = 0.2

    # Display transform (shaders/tex_to_quad.frag:21-22).
    exposure: float = 1.5
    gamma: float = 2.2

    # Intersection epsilon (shaders/common/constants.glsl:4).
    eps: float = 1e-4

    # Next-event estimation (BEYOND the reference — it has no light
    # sampling, path_tracing.comp:269; breaks RNG parity when on).
    nee: bool = False
    nee_mis: bool = True          # balance-heuristic MIS combining the
                                  # light sample with BSDF-sampled
                                  # emission; False = classic NEE
                                  # (BSDF-found emission suppressed on
                                  # light-sampled diffuse chains)

    # Mipmapped texture sampling (BEYOND the reference — it samples
    # implicit LOD 0 from compute, shaders/path_tracing.comp:244-261).
    # mip_levels > 1 builds a 2x2 box mip chain at scene compile and
    # selects trilinear LODs with a ray-cone footprint approximation
    # (constant per-segment spread; see render/megakernel.py tap()).
    mip_levels: int = 1           # 1 = LOD 0 only (reference parity)
    mip_spread: float = 0.001     # cone spread (radians-ish per unit t)
    tex_quad: bool = True         # pack each texel's 2x2 bilinear
                                  # neighborhood as ONE 4-col u32 atlas
                                  # row (scene compile) so a tap is one
                                  # wide row gather instead of four
                                  # narrow ones (gathers price per ROW
                                  # per OP; shade_gather_probe).  Auto-
                                  # disabled for MIRROR wraps, f32
                                  # atlases, and atlases > 16M texels
                                  # (quad = 16 B/texel of HBM).
                                  # Sampler output is bit-identical
                                  # (tests/test_textures.py); inside a
                                  # jit graph XLA forms FMAs
                                  # differently around the two
                                  # fetch shapes, so full renders can
                                  # differ by ~1 ulp of radiance.

    # BVH build knobs (ours; the reference delegates to lsg's SBVH).
    bvh_leaf_size: int = 4        # max triangles per mesh-BVH leaf
    bvh_bins: int = 16            # SAH bins
    bvh_spatial_splits: bool = True  # mesh-level SBVH (native builder;
                                  # matches lsg::bvh::SplitBVHBuilder,
                                  # src/PTSceneConverter.cpp:97-98);
                                  # numpy fallback has no splits
    cluster_size: int = 0         # triangles per sweep cluster (lane
                                  # dim).  0 = auto: 256 for resident-
                                  # class scenes (won the on-chip
                                  # autotune), 512 for HBM-streamed
                                  # scenes (the stream kernels'
                                  # per-fired-cluster machinery is
                                  # launch-bound at ~17 passing lanes;
                                  # 512 measured +30% bounce intersect
                                  # on the outside-class scene)

    # Execution.
    renderer: str = "auto"        # auto | megakernel | wavefront
                                  # (auto: wavefront on TPU, megakernel
                                  #  elsewhere)
    pool_size: int = 1 << 20      # wavefront ray-pool lanes
    intersect: str = "auto"       # auto | compact (Pallas, VMEM-resident
                                  # per-cluster ray compaction) | sweep
                                  # (Pallas, VMEM-resident tile sweep) |
                                  # stream (Pallas, HBM-streamed clusters)
                                  # | sweep_jnp | sweep_interpret |
                                  # compact_interpret | stream_interpret
                                  # | bvh (while-loop walk).  auto:
                                  # compact on TPU, stream when the
                                  # scene exceeds the VMEM budget, bvh
                                  # elsewhere.
    sweep_tile: int = 1024        # rays per Pallas sweep tile
    compact_tile: int = 4096      # rays per compaction-sweep tile
                                  # (bigger tiles densify the per-
                                  # cluster ray buckets; 4096 measured
                                  # best round 3, scripts/compact_probe)
    compact_cap: int = 128        # compacted MT block width (rays per
                                  # Moller-Trumbore pass of one fired
                                  # cluster)
    compact_worklist: bool = True  # resident compact sweep visits only
                                  # per-tile fired clusters (XLA world-
                                  # AABB prepass, scalar-prefetched
                                  # lists) instead of all clusters with
                                  # an in-kernel skip; parked/retired
                                  # tiles cost zero cluster steps
    stream_tile: int = 4096       # rays per streamed-sweep tile (bigger
                                  # tiles amortize the per-tile HBM
                                  # re-stream of the cluster data;
                                  # object-count independent since
                                  # round 3's on-demand local rays)
    stream_chunk: int = 16        # clusters per streamed HBM block
    stream_cap: int = 32          # compacted MT block width for the
                                  # STREAMED sweeps: big scenes fire
                                  # many near-empty clusters (measured
                                  # mean ~17 passing lanes/cluster on
                                  # the outside pool), so a narrow
                                  # block beats compact_cap=128 there
    flush_bins: bool = True       # TPU wavefront flush uses the dense
                                  # bin-matmul kernel (ops/pallas/
                                  # flush.py) instead of XLA scatter
    stream_worklist: bool = True  # TPU stream mode uses the worklist-
                                  # driven kernel (grid over ray tiles
                                  # only; per-tile fired-chunk lists
                                  # with dynamic trip counts + manual
                                  # double-buffered chunk DMAs) instead
                                  # of the (tiles x chunks) grid
    stream_granularity: str = "cluster"
                                  # worklist cull granularity:
                                  # "cluster" = per-tile fired-CLUSTER
                                  # lists from the interval frustum
                                  # mask, one 32 KB block DMA per
                                  # visit (ops/pallas/stream_cluster);
                                  # "chunk" = 16-cluster chunk lists
                                  # (compact_intersect worklist).
                                  # Hit-identical up to cross-cluster
                                  # near-ties (sweep order); cluster
                                  # measured >= chunk everywhere on
                                  # the outside dumps, +15% primaries
                                  # (queue 19, scripts/
                                  # cluster_wl_probe.py)
    stream_compact: bool = True   # streamed sweep uses the ray-
                                  # compaction MT update (compact_cap)
    shade: str = "auto"           # auto | pallas | shade_interpret | jnp
                                  # (auto: fused Pallas shading kernel on
                                  #  TPU for untextured non-NEE Heitz
                                  #  configs, jnp elsewhere)
    shade_tile: int = 2048        # rays per Pallas shade tile
    sort_rays: bool = True        # octant+Morton sort before each
                                  # intersect (coherence for the sweep)
    sort_variadic: bool = True    # wavefront sort carries the state
                                  # columns as lax.sort payload
                                  # operands (one variadic sort) vs
                                  # sort_key_val + one wide row gather
                                  # (round-2 form).  Measured EQUAL on
                                  # v5e (XLA lowers payload sorts to
                                  # key-sort + per-operand gathers);
                                  # kept for the simpler graph.  Same
                                  # stable permutation either way.
    pool_cm: bool = False         # component-major wavefront pool:
                                  # ray-state vectors live as [3, P]
                                  # rows ([2, P] seeds) instead of
                                  # [P, 3] columns, so the shade-kernel
                                  # row build, the rays8 intersect
                                  # pack, and the sort stack-backs are
                                  # row concats instead of transposes
                                  # (the [P, 3] relayout tax measured
                                  # in scripts/layout_probe.py).
                                  # Arithmetic is unchanged — images
                                  # are bit-identical either way
                                  # (tests/test_wavefront.py).
                                  # Requires sort_variadic (the packed
                                  # sort stays the [P, 3] form).
    pool_carryover: bool = True   # progressive wavefront keeps the ray
                                  # pool alive ACROSS step() chunks:
                                  # each chunk stops as soon as its
                                  # work items are all injected,
                                  # leaving in-flight paths for the
                                  # next chunk instead of draining the
                                  # pool at collapsing occupancy every
                                  # chunk (the drain tail is ~10 full-
                                  # maintenance iterations per chunk).
                                  # Reads (radiance/image/checkpoint)
                                  # drain first, so results are exact.
    sort_every: int = 1           # wavefront: sort/flush every k-th
                                  # iteration (alive coherence decays
                                  # slowly; >1 trades stale order for
                                  # skipped sort passes)
    lazy_regen: int = 0           # wavefront: 0 = refill free lanes
                                  # every iteration; k>0 = refill only
                                  # when free*k >= pool (regen cost is
                                  # pool-proportional, not free-count-
                                  # proportional, so batching it saves
                                  # whole passes; parked lanes are
                                  # near-free in intersect/shade)
    parity_rng: bool = True       # True: bit-faithful LCG-hash RNG
                                  # (shaders/common/random.glsl:9-15,
                                  # incl. its degenerate zero streams);
                                  # False: Threefry-2x32 counter RNG
                                  # (ops/rng.py — quality path, breaks
                                  # reference parity)

    @property
    def render_width(self) -> int:
        return self.width * self.render_scale

    @property
    def render_height(self) -> int:
        return self.height * self.render_scale

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
