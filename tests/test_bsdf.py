"""BSDF sampling tests (SURVEY.md §4: white-furnace energy bounds,
Fresnel closed forms, distribution sanity)."""

import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.ops import bsdf
from logipathtracer_tpu.ops.rng import seed_from_pixel


def _seeds(n, salt=1):
    px = np.arange(1, n + 1, dtype=np.uint32)
    return jnp.asarray(np.stack([px * 48271 + salt, px * 16807 + salt], -1),
                       jnp.uint32)


def _view(n, z=0.8):
    v = np.zeros((n, 3), np.float32)
    v[:, 0] = np.sqrt(1 - z * z)
    v[:, 2] = z
    return jnp.asarray(v)


def test_fresnel_normal_incidence():
    # vdoth=1, eta=1.5: R0 = ((1-eta)/(1+eta))^2 = 0.04.
    f = float(bsdf.fresnel_dielectric(jnp.float32(1.0), jnp.float32(1.5)))
    assert abs(f - 0.04) < 1e-6


def test_fresnel_tir():
    # Leaving a dense medium at a grazing angle: total internal refl.
    f = float(bsdf.fresnel_dielectric(jnp.float32(0.2), jnp.float32(1 / 1.5)))
    assert f == 1.0


def test_refract_eta_snell():
    wi = jnp.asarray([[0.0, 0.0, 1.0]])
    wm = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(bsdf.refract_eta(wi, wm, jnp.asarray([1.5])))[0]
    assert np.allclose(out, [0, 0, -1], atol=1e-6)  # straight through


def test_vndf_upper_hemisphere():
    n = 4096
    seeds = _seeds(n)
    from logipathtracer_tpu.ops.rng import rand_parity
    r1, seeds = rand_parity(seeds)
    r2, _ = rand_parity(seeds)
    ne = np.asarray(bsdf.sample_vndf(_view(n), jnp.full((n,), 0.25), r1, r2))
    assert (ne[:, 2] >= 0).all()
    assert np.allclose(np.linalg.norm(ne, axis=1), 1.0, atol=1e-5)


def test_conductor_white_furnace():
    """F0=1 conductor: every microsurface bounce has weight 1, so the
    walk returns exactly 1 (no energy loss — the point of the Heitz
    multiple-scattering model)."""
    n = 8192
    w, ld, _ = bsdf.heitz_sample(
        jnp.ones((n, 3)), _view(n, 0.6), jnp.full((n,), 0.7),
        jnp.zeros((n,)), jnp.full((n,), 1.5), jnp.ones((n,), bool),
        jnp.full((n,), bsdf.LOBE_METALLIC, jnp.int32),
        _seeds(n), jnp.ones((n,), bool))
    w = np.asarray(w)
    assert np.allclose(w, 1.0), f"max dev {np.abs(w - 1).max()}"
    ld = np.asarray(ld)
    assert np.allclose(np.linalg.norm(ld, axis=1), 1.0, atol=2e-5)
    # Reflection: overwhelmingly upper hemisphere.
    assert (ld[:, 2] > 0).mean() > 0.95


def test_diffuse_energy_bounded():
    n = 8192
    w, ld, _ = bsdf.heitz_sample(
        jnp.ones((n, 3)), _view(n, 0.7), jnp.full((n,), 0.5),
        jnp.zeros((n,)), jnp.full((n,), 1.5), jnp.ones((n,), bool),
        jnp.full((n,), bsdf.LOBE_DIFFUSE, jnp.int32),
        _seeds(n), jnp.ones((n,), bool))
    w = np.asarray(w)
    # White diffuse: weight is 1 unless the walk exhausts (then 0).
    assert set(np.unique(w.round(6))) <= {0.0, 1.0}
    assert w.mean() > 0.95  # exhaustion is rare at alpha=0.25


def test_dielectric_returns_f0_and_both_sides():
    n = 8192
    f0 = jnp.full((n, 3), 0.7)
    w, ld, _ = bsdf.heitz_sample(
        f0, _view(n, 0.7), jnp.full((n,), 0.3),
        jnp.ones((n,)), jnp.full((n,), 1.5), jnp.ones((n,), bool),
        jnp.full((n,), bsdf.LOBE_TRANSMISSION, jnp.int32),
        _seeds(n), jnp.ones((n,), bool))
    assert np.allclose(np.asarray(w), 0.7)  # heitz/BSDF.glsl:208
    ld = np.asarray(ld)
    up = (ld[:, 2] > 0).mean()
    # ior 1.5 at 45deg: mostly refracted (below), some reflected.
    assert 0.02 < up < 0.6


def test_interaction_type_frequencies():
    n = 1 << 15
    seeds = _seeds(n, salt=77)
    metallic = jnp.full((n,), 0.3)
    transmission = jnp.full((n,), 0.4)
    lobe, _ = bsdf.determine_interaction(metallic, transmission, seeds,
                                         jnp.ones((n,), bool))
    lobe = np.asarray(lobe)
    # weights: m=0.3, t=(1-m)*0.4=0.28, d=(1-0.4)*(1-0.3)=0.42; norm=1.
    freq = [(lobe == k).mean() for k in range(3)]
    assert abs(freq[1] - 0.3) < 0.02
    assert abs(freq[2] - 0.28) < 0.02
    assert abs(freq[0] - 0.42) < 0.02


def test_basic_diffuse_cosine():
    n = 1 << 14
    w, ld, _ = bsdf.basic_sample(
        jnp.ones((n, 3)), _view(n), jnp.zeros((n,)), jnp.full((n,), 1.5),
        jnp.ones((n,), bool), jnp.full((n,), bsdf.LOBE_DIFFUSE, jnp.int32),
        _seeds(n, salt=5), jnp.ones((n,), bool))
    ld = np.asarray(ld)
    assert (ld[:, 2] >= 0).all()
    # Cosine-weighted: E[cos theta] = 2/3.
    assert abs(ld[:, 2].mean() - 2 / 3) < 0.01
    # Weight = F0 * cos (basic/BSDF.glsl:10).
    assert np.allclose(np.asarray(w)[:, 0], ld[:, 2], atol=1e-6)
