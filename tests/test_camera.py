import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.camera.camera import Camera


def _ref_pinhole_ray(pos, direction, fov, aspect, u, v):
    """Literal NumPy transcription of the reference pinhole math
    (Core/Camera.fs:96-139) used as the golden model."""
    pos = np.asarray(pos, np.float64)
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    up = np.array([0.0, 1.0, 0.0])
    hori = np.cross(d, up)
    vert = np.cross(hori, d)
    h = np.tan(0.5 * fov * np.pi / 360.0)
    w = h / aspect
    right = hori * h
    upv = vert * w
    topleft = pos + 0.5 * d - 0.5 * right + 0.5 * upv
    target = topleft + u * right + v * (-upv)
    out = target - pos
    return out / np.linalg.norm(out)


def test_pinhole_matches_reference_math():
    cam = Camera.pinhole((0, 1, 3), (0, 0, -1), 120.0, 1.0)
    for u, v in [(0.5, 0.5), (0.0, 0.0), (1.0, 1.0), (0.25, 0.75)]:
        rays = cam.get_rays(jnp.array([u]), jnp.array([v]))
        want = _ref_pinhole_ray((0, 1, 3), (0, 0, -1), 120.0, 1.0, u, v)
        np.testing.assert_allclose(rays.direction[0], want, atol=1e-5)
        np.testing.assert_allclose(rays.origin[0], [0, 1, 3], atol=1e-6)


def test_pinhole_center_ray_is_forward():
    cam = Camera.pinhole((0, 0, 0), (0, 0, -1), 90.0, 1.0)
    rays = cam.get_rays(jnp.array([0.5]), jnp.array([0.5]))
    np.testing.assert_allclose(rays.direction[0], [0, 0, -1], atol=1e-6)


def test_v_zero_is_top():
    cam = Camera.pinhole((0, 0, 0), (0, 0, -1), 90.0, 1.0)
    top = cam.get_rays(jnp.array([0.5]), jnp.array([0.0]))
    bot = cam.get_rays(jnp.array([0.5]), jnp.array([1.0]))
    assert float(top.direction[0, 1]) > 0 > float(bot.direction[0, 1])


def test_standard_fov_convention():
    cam = Camera.pinhole((0, 0, 0), (0, 0, -1), 90.0, 1.0, fov_convention="standard")
    left = cam.get_rays(jnp.array([0.0]), jnp.array([0.5]))
    # 90 degree horizontal fov -> edge ray at 45 degrees
    ang = np.degrees(np.arctan2(abs(float(left.direction[0, 0])), abs(float(left.direction[0, 2]))))
    np.testing.assert_allclose(ang, 45.0, atol=0.1)


def test_thin_lens_focus_invariance():
    """Points on the focal plane must be hit by all lens samples."""
    cam = Camera.thin_lens(
        (0, 0, 0), (0, 0, -2.0), 90.0, 1.0, aperture=0.5, focus_dist=2.0
    )
    u = jnp.full((8,), 0.3)
    v = jnp.full((8,), 0.7)
    lens = jnp.stack(
        [jnp.linspace(0.05, 0.95, 8), jnp.linspace(0.9, 0.1, 8)], axis=-1
    )
    rays = cam.get_rays(u, v, lens_uv=lens)
    # march each ray to z = -2 and check they converge to one point
    t = (-2.0 - rays.origin[:, 2]) / rays.direction[:, 2]
    pts = rays.origin + t[:, None] * rays.direction
    assert float(jnp.max(jnp.std(pts, axis=0))) < 1e-5
    # origins actually vary (defocus happening)
    assert float(jnp.max(jnp.std(rays.origin, axis=0))) > 1e-3
