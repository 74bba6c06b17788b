"""Golden NumPy re-implementation of the reference's exact estimator.

An independent, dependency-free (NumPy-only) transcription of the F#
renderer's live path (`RenderTest/Sample/RayTracing4.fs` flow):

- pinhole camera, view plane 0.5 ahead, hori = tan(0.5*fov*pi/360)
  (`Core/Camera.fs:122-139`)
- brute-force closest hit with double-sided Moller-Trumbore (|det|,
  `Core/Shape/Trangle.fs:120-145`); flat geometric normals
- uniform-hemisphere lambert with the reference's folded weight
  `albedo/pi * cos * 2pi` (`Core/Materials/Material.fs:33-36`)
- NEE: point on the light rect, visibility `bvh.Hit(p, dir, 1e-6, d-1e-6)`
  (`Core/Integrator/Integrators.fs:40-54`), light term
  `I * |cos_l| * Area / d^2` with the facing check cos_o < 0
  (`Core/Lights/Light.fs:48-56`), divided by `pdf = 1/Area`
  (`Light.fs:57-59`) — i.e. the Area^2 fold
- combination `(l/pdf_li + TraceRay(bounce, depth-1)) * col / pdf`
  (`Integrators.fs:130-136`); miss/exhausted -> black; depth counts down
  from maxDepth with a `depth >= 0` guard (maxDepth+1 interactions)

The framework's `estimator="mafrix"` must converge to the same image
(equal-spp converged-mean comparison — the reference's System.Random is
unseeded, so per-sample parity is undefined; SURVEY §7 hard part (e)).

This module is used by tests/test_parity.py as the BASELINE.md
"allclose to the reference algorithm" anchor.
"""
from __future__ import annotations

import numpy as np


def _normalize(v):
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, 1e-12)


class GoldenScene:
    """Triangles (v0, e1, e2, albedo per tri) + one rect area light."""

    def __init__(self, v0, e1, e2, albedo, light_corner, light_e1, light_e2,
                 light_normal, light_intensity):
        self.v0 = np.asarray(v0, np.float64)
        self.e1 = np.asarray(e1, np.float64)
        self.e2 = np.asarray(e2, np.float64)
        self.albedo = np.asarray(albedo, np.float64)       # (T, 3)
        self.lc = np.asarray(light_corner, np.float64)
        self.le1 = np.asarray(light_e1, np.float64)
        self.le2 = np.asarray(light_e2, np.float64)
        self.ln = _normalize(np.asarray(light_normal, np.float64))
        self.li = np.asarray(light_intensity, np.float64)
        self.area = float(np.linalg.norm(np.cross(self.le1, self.le2)))


def closest_hit(scene, o, d, t_min, t_max):
    """Vectorized brute-force closest hit. o, d: (B, 3). Returns
    (t (B,), idx (B,), valid (B,))."""
    pvec = np.cross(d[:, None, :], scene.e2[None, :, :])
    det = np.einsum("tj,btj->bt", scene.e1, pvec)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o[:, None, :] - scene.v0[None, :, :]
    u = np.einsum("btj,btj->bt", tvec, pvec) * inv
    qvec = np.cross(tvec, scene.e1[None, :, :])
    v = np.einsum("bj,btj->bt", d, qvec) * inv
    t = np.einsum("tj,btj->bt", scene.e2, qvec) * inv
    tmax = t_max if np.ndim(t_max) else np.full(o.shape[0], t_max)
    valid = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < tmax[:, None])
    t = np.where(valid, t, np.inf)
    idx = np.argmin(t, axis=1)
    tbest = t[np.arange(t.shape[0]), idx]
    return tbest, idx, np.isfinite(tbest)


def uniform_hemisphere(rng, n):
    """Uniform hemisphere around unit normals n (B, 3) — the distribution of
    the reference's `GetRandomInUnitSphere(nm).Normalize`
    (`Material.fs:9-14`): uniform in the half-ball, normalized."""
    B = n.shape[0]
    v = rng.normal(size=(B, 3))
    v = _normalize(v)
    flip = np.einsum("bj,bj->b", v, n) < 0
    v[flip] = -v[flip]
    return v


def trace(scene, o, d, depth, rng):
    """Iterative transcription of `PathIntegrator.TraceRay`
    (`Integrators.fs:107-138`):
        L = (l/pdf_li + L_next) * col/pdf
    expanded iteratively: radiance = sum_k direct_k * prod_{j<=k} w_j."""
    B = o.shape[0]
    radiance = np.zeros((B, 3))
    throughput = np.ones((B, 3))
    alive = np.ones(B, bool)

    for _ in range(depth + 1):  # reference guard is depth >= 0
        t, idx, valid = closest_hit(scene, o, d, 1e-6, 99999999.0)
        alive = alive & valid
        if not alive.any():
            break
        idx = np.where(valid, idx, 0)
        t_safe = np.where(valid, t, 0.0)
        p = o + t_safe[:, None] * d
        gn = _normalize(np.cross(scene.e1[idx], scene.e2[idx]))
        # reference triangles are double-sided but keep the stored normal;
        # its Cornell walls wind inward so flip toward the ray like the
        # estimator effectively sees
        gn = np.where(np.einsum("bj,bj->b", gn, d)[:, None] < 0, gn, -gn)

        # BSDF sample first (weight multiplies direct AND indirect)
        wi = uniform_hemisphere(rng, gn)
        cos_wi = np.maximum(np.einsum("bj,bj->b", wi, gn), 0.0)
        w = scene.albedo[idx] * (2.0 * cos_wi)[:, None]  # a/pi * cos * 2pi
        throughput = np.where(alive[:, None], throughput * w, throughput)

        # NEE with the reference folds (see module docstring)
        lp = (
            scene.lc
            + rng.random(B)[:, None] * scene.le1
            + rng.random(B)[:, None] * scene.le2
        )
        to_l = lp - p
        d2 = np.maximum(np.einsum("bj,bj->b", to_l, to_l), 1e-12)
        dist = np.sqrt(d2)
        wl = to_l / dist[:, None]
        cos_s = np.einsum("bj,bj->b", gn, wl)
        cos_o = np.einsum("j,bj->b", scene.ln, wl)  # toLight . lightNormal
        # reference casts the shadow ray from hit.point directly with
        # t in (1e-6, dist - 1e-6)
        _, _, blocked = closest_hit(scene, p, wl, 1e-6, dist - 1e-6)
        direct_ok = alive & ~blocked & (cos_o < 0.0) & (cos_s > 0.0)
        l_term = scene.li[None, :] * (
            cos_s * np.abs(cos_o) * scene.area**2 / d2
        )[:, None]
        radiance = radiance + np.where(direct_ok[:, None], throughput * l_term, 0.0)

        o = p  # next ray starts at the hit point (reference does the same)
        d = wi

    return radiance


def render(scene, cam_pos, cam_dir, fov, width, height, spp, depth, seed=0):
    """Full-frame golden render with jittered pixel sampling
    (`PixelIntegrator.Sample`, `Integrators.fs:161-171`)."""
    rng = np.random.default_rng(seed)
    cam_pos = np.asarray(cam_pos, np.float64)
    cam_dir = _normalize(np.asarray(cam_dir, np.float64))
    up = np.array([0.0, 1.0, 0.0])
    hori_u = _normalize(np.cross(cam_dir, up))
    vert_u = np.cross(hori_u, cam_dir)
    h = np.tan(0.5 * fov * np.pi / 360.0)
    right = hori_u * h
    upv = vert_u * (h / (width / height))
    topleft = cam_pos + 0.5 * cam_dir - 0.5 * right + 0.5 * upv

    img = np.zeros((height, width, 3))
    ys, xs = np.mgrid[0:height, 0:width]
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    B = xs.size
    for s in range(spp):
        u = (xs + rng.random(B)) / width
        v = (ys + rng.random(B)) / height
        target = topleft + u[:, None] * right + v[:, None] * (-upv)
        d = _normalize(target - cam_pos)
        o = np.tile(cam_pos, (B, 1))
        rad = trace(scene, o, d, depth, rng)
        img += rad.reshape(height, width, 3)
    return img / spp
