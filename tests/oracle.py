"""Scalar reference oracle.

A one-pixel-at-a-time numpy float32 transcription of the reference's
device pipeline (shaders/path_tracing.comp main/traceRay + heitz/BSDF +
common/*), with the exact scalar control flow — every branch taken or
not per pixel, every rand() drawn in reference order.  Used to validate
the vectorized/masked production renderer: if the lockstep masking in
logipathtracer_tpu.render.megakernel consumes RNG draws in a different
order or mixes lanes, pixels diverge immediately.

Intersection uses brute force over all triangles (traversal order is
irrelevant to min-t; the BVH is validated separately in test_bvh /
test_traverse).

This module intentionally re-derives the math from the GLSL semantics
documented in SURVEY.md — it is test infrastructure, not a copy.
"""

from __future__ import annotations

import numpy as np

F = np.float32
U32 = np.uint32
PI = F(3.141592653589)
INF = F(3.4e38)
EPS = F(1e-4)
MUL = U32(1103515245)
INV_MAX = F(1.0) / F(4294967295.0)


class Rng:
    """The GLSL uvec2 hash stream (shaders/common/random.glsl:9-15)."""

    def __init__(self, seed_xy):
        self.s = np.asarray(seed_xy, np.uint32).copy()

    def rand(self) -> F:
        with np.errstate(over="ignore"):
            self.s = self.s + U32(1)
            sx, sy = self.s[0], self.s[1]
            qx = MUL * U32((sx >> U32(1)) ^ sy)
            qy = MUL * U32((sy >> U32(1)) ^ sx)
            n = MUL * U32(qx ^ (qy >> U32(3)))
        return F(F(n) * INV_MAX)


def _norm(v):
    return (v / np.sqrt(np.maximum(F(v @ v), F(1e-38)))).astype(np.float32)


def _f32(*a):
    return np.asarray(a, np.float32)


def generate_ray(cam_world, fov_y, pix, res, rng: Rng):
    r1 = F(2) * rng.rand()
    r2 = F(2) * rng.rand()
    jx = np.sqrt(r1) - 1 if r1 < 1 else 1 - np.sqrt(F(2) - r1)
    jy = np.sqrt(r2) - 1 if r2 < 1 else 1 - np.sqrt(F(2) - r2)
    res = np.asarray(res, np.float32)
    uv = (F(2) * np.asarray(pix, np.float32) / res - 1
          + _f32(jx, jy) / (res * F(0.5))).astype(np.float32)
    aspect = res[0] / res[1]
    th = np.tan(F(fov_y) / 2, dtype=np.float32)
    ux = uv[0] * aspect * th
    uy = uv[1] * th
    m = np.asarray(cam_world, np.float32)
    d = _norm(ux * m[:3, 0] + uy * m[:3, 1] - m[:3, 2])
    return m[:3, 3].copy(), d


def brute_intersect(scene, o, d):
    """min-t over all triangles, object-space rays (f32)."""
    best = (INF, -1, -1)
    meta = np.asarray(scene.fused_meta)
    leaves = meta[meta[:, 0] == 1]
    vtx = np.asarray(scene.vtx_pos, np.float32).reshape(-1, 3, 3)
    inv = np.asarray(scene.obj_world_inv, np.float32)
    tri_obj = np.zeros(vtx.shape[0], np.int32)
    for a, b, obj in zip(leaves[:, 1], leaves[:, 2], leaves[:, 3]):
        tri_obj[a:b] = obj
    for obj in range(scene.num_objects):
        m = inv[obj]
        ol = (m[:3, :3] @ o + m[:3, 3]).astype(np.float32)
        dl = (m[:3, :3] @ d).astype(np.float32)
        for tr in np.where(tri_obj == obj)[0]:
            v0, v1, v2 = vtx[tr]
            t = _moller(ol, dl, v0, v1, v2)
            if t > EPS and t < best[0]:
                best = (F(t), obj, int(tr))
    return best


def _moller(o, d, v0, v1, v2):
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d, e2).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        det = F(1.0) / F(e1 @ p)
        tv = (o - v0).astype(np.float32)
        u = F(tv @ p) * det
        if not (0.0 <= u <= 1.0):
            return INF
        q = np.cross(tv, e1).astype(np.float32)
        v = F(d @ q) * det
        if v < 0.0 or u + v > 1.0:
            return INF
        return F(F(e2 @ q) * det)


def srgb_to_linear(c):
    c = np.asarray(c, np.float32)
    out = np.where(c <= 0.04045, c / F(12.92),
                   np.power((c + F(0.055)) / F(1.055), F(2.4),
                            dtype=np.float32))
    return out.astype(np.float32)


def sample_vndf(ve, alpha, rng: Rng):
    r1, r2 = rng.rand(), rng.rand()
    vh = _norm(_f32(alpha * ve[0], alpha * ve[1], ve[2]))
    if vh[2] < 1.0:
        t1 = _norm(np.cross(_f32(0, 0, 1), vh).astype(np.float32))
    else:
        t1 = _f32(1, 0, 0)
    t2 = np.cross(vh, t1).astype(np.float32)
    r = np.sqrt(r1, dtype=np.float32)
    phi = F(2) * PI * r2
    t1c = F(r * np.cos(phi, dtype=np.float32))
    t2c = F(r * np.sin(phi, dtype=np.float32))
    s = F(0.5) * (F(1) + vh[2])
    t2c = F((F(1) - s) * np.sqrt(max(F(1) - t1c * t1c, F(0)),
                                 dtype=np.float32) + s * t2c)
    nz = np.sqrt(max(F(0), F(1) - t1c * t1c - t2c * t2c), dtype=np.float32)
    nh = (t1c * t1 + t2c * t2 + nz * vh).astype(np.float32)
    return _norm(_f32(alpha * nh[0], alpha * nh[1], max(F(0), nh[2])))


def sample_height(direction, height, alpha, rng: Rng):
    scaled = (direction * _f32(alpha, alpha, 1)).astype(np.float32)
    length = np.sqrt(F(scaled @ scaled), dtype=np.float32)
    proj = max(F(0.5) * (length - direction[2]), F(1e-7))
    r = rng.rand()
    delta = F(-np.log(F(1) - r, dtype=np.float32) * direction[2] / proj)
    return F(height + delta)


def fresnel(vdoth, eta):
    ct2 = F(1) - (F(1) - vdoth * vdoth) / (eta * eta)
    if ct2 <= 0:
        return F(1)
    ct = np.sqrt(ct2, dtype=np.float32)
    rs = (vdoth - eta * ct) / (vdoth + eta * ct)
    rp = (eta * vdoth - ct) / (eta * vdoth + ct)
    return F(F(0.5) * (rs * rs + rp * rp))


def refract_eta(wi, wm, eta):
    ci = F(wi @ wm)
    ct2 = F(1) - (F(1) - ci * ci) / (eta * eta)
    ct = -np.sqrt(max(F(0), ct2), dtype=np.float32)
    return (wm * (ci / eta + ct) - wi / eta).astype(np.float32)


def conductor_brdf(f0, view, roughness, rng: Rng, max_order=16):
    alpha = F(roughness * roughness)
    energy = np.ones(3, np.float32)
    ld = (-view).astype(np.float32)
    height = F(0)
    order = 0
    while order < max_order:
        height = sample_height(ld, height, alpha, rng)
        if height > 0:
            break
        wo = (-ld).astype(np.float32)
        micro = sample_vndf(wo, alpha, rng)
        vdoth = min(max(F(wo @ micro), F(0)), F(1))
        ld = (F(2) * micro * vdoth - wo).astype(np.float32)
        energy = (energy * f0).astype(np.float32)
        order += 1
    return energy, ld


def dielectric_bsdf(f0, view, roughness, transmission, ior, outside,
                    rng: Rng, max_order=16):
    alpha = F(roughness * roughness)
    ld = (-view).astype(np.float32)
    height = F(0)
    if outside:
        ior_out, ior_in = F(1.0), F(ior)
    else:
        ior_out, ior_in = F(ior), F(1.0)
    outside = True
    order = 0
    while order < max_order:
        if outside:
            height = sample_height(ld, height, alpha, rng)
            if height > 0:
                break
        else:
            height = F(-sample_height(-ld, -height, alpha, rng))
            if height < 0:
                break
        eta = F(ior_in / ior_out) if outside else F(ior_out / ior_in)
        wo = (-ld).astype(np.float32)
        micro = sample_vndf(wo, alpha, rng)
        vdoth = F(wo @ micro)
        fr = fresnel(vdoth, eta)
        if rng.rand() < fr:
            ld = (F(2) * micro * vdoth - wo).astype(np.float32)
        else:
            outside = not outside
            ld = _norm(refract_eta(wo, micro, eta))
        order += 1
    return np.asarray(f0, np.float32), ld


def diffuse_bsdf(f0, view, roughness, rng: Rng, max_order=16):
    alpha = F(roughness * roughness)
    energy = np.ones(3, np.float32)
    ld = (-view).astype(np.float32)
    height = F(0)
    order = 0
    while order < max_order:
        height = sample_height(ld, height, alpha, rng)
        if height > 0:
            break
        wo = (-ld).astype(np.float32)
        micro = sample_vndf(wo, alpha, rng)
        if micro[2] < 1.0:
            u = _norm(np.cross(_f32(0, 0, 1), micro).astype(np.float32))
        else:
            u = _f32(1, 0, 0)
        v = np.cross(micro, u).astype(np.float32)
        r1 = F(2) * rng.rand() - 1
        r2 = F(2) * rng.rand() - 1
        if r1 == 0 and r2 == 0:
            radius = phi = F(0)
        elif r1 * r1 > r2 * r2:
            radius = r1
            phi = F(PI / 4) * (r2 / r1)
        else:
            radius = r2
            phi = F(PI / 2) - (r1 / r2) * F(PI / 4)
        x = F(radius * np.cos(phi, dtype=np.float32))
        y = F(radius * np.sin(phi, dtype=np.float32))
        z = np.sqrt(max(F(0), F(1) - x * x - y * y), dtype=np.float32)
        ld = (x * u + y * v + z * micro).astype(np.float32)
        energy = (energy * f0).astype(np.float32)
        order += 1
    if order >= max_order:
        return np.zeros(3, np.float32), _f32(0, 0, 1)
    return energy, ld


def interaction_type(metallic, transmission, rng: Rng):
    mb = F(metallic)
    tb = F((1 - metallic) * transmission)
    db = F((1 - transmission) * (1 - metallic))
    norm = F(1) / (mb + tb + db)
    mb, tb = mb * norm, tb * norm
    r = rng.rand()
    if r < mb:
        return 1  # metallic
    if r < mb + tb:
        return 2  # transmission
    return 0      # diffuse


def barycentric(point, v0, v1, v2):
    ab = v1 - v0
    ac = v2 - v0
    ah = (point - v0).astype(np.float32)
    ab_ab = F(ab @ ab)
    ab_ac = F(ab @ ac)
    ac_ac = F(ac @ ac)
    ab_ah = F(ab @ ah)
    ac_ah = F(ac @ ah)
    inv_den = F(1) / (ab_ab * ac_ac - ab_ac * ab_ac)
    v = (ac_ac * ab_ah - ab_ac * ac_ah) * inv_den
    w = (ab_ab * ac_ah - ab_ac * ab_ah) * inv_den
    return _f32(F(1) - v - w, v, w)


def trace_pixel(scene, cfg, cam_world, fov_y, ubo_seed, pix):
    """Full scalar path trace of one pixel; returns rgb radiance."""
    with np.errstate(over="ignore"):
        seed0 = (np.asarray(ubo_seed, np.uint32)
                 * np.asarray(pix, np.uint32))
    rng = Rng(seed0)
    res = (cfg.render_width, cfg.render_height)
    o, d = generate_ray(cam_world, fov_y, pix, res, rng)

    acc = np.zeros(3, np.float32)
    mask = np.ones(3, np.float32)

    obj_world = np.asarray(scene.obj_world, np.float32)
    obj_inv = np.asarray(scene.obj_world_inv, np.float32)
    vtx = np.asarray(scene.vtx_pos, np.float32)
    nrm = np.asarray(scene.vtx_nrm, np.float32)

    for bounce in range(cfg.max_depth):
        t, obj, tr = brute_intersect(scene, o, d)
        if t >= INF:
            acc = (mask * F(cfg.env_color)).astype(np.float32)
            break
        w = obj_world[obj]
        wi = obj_inv[obj]
        ol = (wi[:3, :3] @ o + wi[:3, 3]).astype(np.float32)
        dl = (wi[:3, :3] @ d).astype(np.float32)
        pos_w = (o + t * d).astype(np.float32)
        pos_l = (ol + t * dl).astype(np.float32)
        v0, v1, v2 = vtx[3 * tr], vtx[3 * tr + 1], vtx[3 * tr + 2]
        bary = barycentric(pos_l, v0, v1, v2)

        base = srgb_to_linear(np.asarray(scene.obj_base_color)[obj])
        emission = np.asarray(scene.obj_emission, np.float32)[obj]
        mrti = np.asarray(scene.obj_mrti, np.float32)[obj]
        metallic = F(mrti[0])
        roughness = max(F(mrti[1]), F(0.001))
        transmission = F(mrti[2])
        ior = F(mrti[3])

        lobe = interaction_type(metallic, transmission, rng)
        acc = (acc + mask * emission).astype(np.float32)

        n_l = (bary[0] * nrm[3 * tr] + bary[1] * nrm[3 * tr + 1]
               + bary[2] * nrm[3 * tr + 2]).astype(np.float32)
        n = _norm((w[:3, :3] @ n_l).astype(np.float32))
        ff = n if F(n @ d) < 0 else (-n).astype(np.float32)
        axis = _f32(0, 1, 0) if abs(ff[0]) > 0.1 else _f32(1, 0, 0)
        u = _norm(np.cross(axis, ff).astype(np.float32))
        v = np.cross(ff, u).astype(np.float32)
        view = _f32(F(-d @ u), F(-d @ v), F(-d @ ff))
        outside = F(n @ (-d)) > 0

        if cfg.use_microfacet:
            if lobe == 0:
                wgt, ld = diffuse_bsdf(base[:3], view, roughness, rng,
                                       cfg.heitz_max_order)
            elif lobe == 1:
                wgt, ld = conductor_brdf(base[:3], view, roughness, rng,
                                         cfg.heitz_max_order)
            else:
                wgt, ld = dielectric_bsdf(base[:3], view, roughness,
                                          transmission, ior, outside, rng,
                                          cfg.heitz_max_order)
        else:
            wgt, ld = _basic(base[:3], view, transmission, ior, outside,
                             lobe, rng)

        mask = (mask * wgt).astype(np.float32)
        ld_w = (ld[0] * u + ld[1] * v + ld[2] * ff).astype(np.float32)
        o, d = pos_w, ld_w

        q = F(mask.max())
        if q < cfg.rr_threshold and bounce > cfg.rr_bounces:
            if rng.rand() > q:
                break
            mask = (mask / q).astype(np.float32)

    return acc


def _basic(base, view, transmission, ior, outside, lobe, rng: Rng):
    z = _f32(0, 0, 1)
    if lobe == 0:
        r1 = F(2) * PI * rng.rand()
        r2 = rng.rand()
        r2s = np.sqrt(r2, dtype=np.float32)
        ld = _f32(np.cos(r1, dtype=np.float32) * r2s,
                  np.sin(r1, dtype=np.float32) * r2s,
                  np.sqrt(F(1) - r2, dtype=np.float32))
        return (base * ld[2]).astype(np.float32), ld
    if lobe == 1:
        i = (-view).astype(np.float32)
        ld = (i - 2 * F(z @ i) * z).astype(np.float32)
        return np.asarray(base, np.float32), ld
    # transmission
    normal = z if outside else (-z).astype(np.float32)
    rd = (-view).astype(np.float32)
    nc, nt = F(1.0), F(ior)
    nnt = nc / nt if F(rd @ normal) < 0 else nt / nc
    ndoti = F(z @ rd)
    k = F(1) - nnt * nnt * (F(1) - ndoti * ndoti)
    if k < 0:
        tdir = np.zeros(3, np.float32)
    else:
        tdir = (nnt * rd - (nnt * ndoti + np.sqrt(k, dtype=np.float32)) * z
                ).astype(np.float32)
    cos_inc = F(z @ rd)
    cos_tra = F(z @ tdir)
    cp = (nt * cos_inc - nc * cos_tra) / (nt * cos_inc + nc * cos_tra)
    cs = (nc * cos_inc - nt * cos_tra) / (nc * cos_inc + nt * cos_tra)
    re = F((cp * cp + cs * cs) * F(0.5))
    if rng.rand() < re:
        ld = (rd - 2 * F(normal @ rd) * normal).astype(np.float32)
        return np.ones(3, np.float32), ld
    return (base * transmission).astype(np.float32), tdir
