"""BSDF sampling tests (SURVEY.md §4: white-furnace energy bounds,
Fresnel closed forms, distribution sanity)."""

import jax.numpy as jnp
import numpy as np
import pytest

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


class TestHeitzNeeEstimator:
    """Vertex-level pin of the NEE eval hook (VERDICT r2 weak item 6):
    heitz_sample's f_eval must be an unbiased estimate of the SAME
    quantity the sampling walk estimates.  For any cone C about a light
    direction, E[W * 1{L in C}] = integral of f*cos over C, while
    E[f_eval(l)] with l uniform in C estimates the same integral / |C|.
    Comparing the two ties the stochastic evaluation (phase * escape
    probability) to the oracle-validated sampling path to ~1%."""

    def _run(self, rough, view_theta, light_theta, light_phi, n, seed,
             cone_deg=25.0):
        import jax.numpy as jnp

        from logipathtracer_tpu.ops import bsdf

        rng = np.random.default_rng(seed)
        cone_cos = np.cos(np.radians(cone_deg))
        # Cone center + per-lane uniform directions inside the cone.
        ct, st = np.cos(light_theta), np.sin(light_theta)
        center = np.array([st * np.cos(light_phi), st * np.sin(light_phi),
                           ct], np.float32)
        up = np.array([0.0, 0.0, 1.0])
        if abs(center[2]) > 0.9:
            up = np.array([1.0, 0.0, 0.0])
        t1 = np.cross(up, center)
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(center, t1)
        z = rng.uniform(cone_cos, 1.0, n).astype(np.float32)
        phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        r = np.sqrt(1.0 - z * z)
        ldirs = (r * np.cos(phi))[:, None] * t1 \
            + (r * np.sin(phi))[:, None] * t2 + z[:, None] * center
        ldirs = ldirs.astype(np.float32)
        solid_angle = 2.0 * np.pi * (1.0 - cone_cos)

        view = np.broadcast_to(np.array(
            [np.sin(view_theta), 0.0, np.cos(view_theta)], np.float32),
            (n, 3))
        base = np.full((n, 3), 0.8, np.float32)
        seeds = rng.integers(1, 2 ** 31, (n, 2)).astype(np.uint32)
        ones = jnp.ones((n,), bool)

        w, ld, _, f_eval = bsdf.heitz_sample(
            jnp.asarray(base), jnp.asarray(view),
            jnp.full((n,), rough, jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.full((n,), 1.5, jnp.float32),
            ones, jnp.zeros((n,), jnp.int32), jnp.asarray(seeds), ones,
            eval_dir=jnp.asarray(ldirs), eval_mask=ones)
        w = np.asarray(w)
        ld = np.asarray(ld)
        in_cone = (ld @ center) > cone_cos
        ref = w[in_cone, 0].sum() / n / solid_angle
        est = float(np.asarray(f_eval)[:, 0].mean())
        return ref, est

    @pytest.mark.parametrize("rough,vt,lt,lp", [
        (0.4, 0.5, 0.35, 0.8),     # moderate roughness
        (0.8, 1.1, 0.6, 2.5),      # rough, grazing view
        (1.0, 0.3, 0.9, -1.2),     # max roughness, grazing light
    ])
    def test_eval_matches_sampling_density(self, rough, vt, lt, lp):
        ref, est = self._run(rough, vt, lt, lp, n=1_500_000, seed=9)
        assert ref > 0.01
        np.testing.assert_allclose(est, ref, rtol=0.02)
