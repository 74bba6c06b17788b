import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.core import math as m
from mafrixraytracing_tpu.core import transform as tf


def test_normalize_unit_and_zero_safe():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    out = m.normalize(v)
    np.testing.assert_allclose(out[0], [0.6, 0.8, 0.0], atol=1e-6)
    # zero vector passes through unchanged (reference Point.fs:52-56 semantics)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0], atol=1e-6)


def test_reflect():
    v = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = m.reflect(v, n)
    np.testing.assert_allclose(r, [[1.0 / np.sqrt(2), 1.0 / np.sqrt(2), 0.0]], atol=1e-6)


def test_refract_snell():
    # straight-on ray refracts straight through
    v = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    ok, r = m.refract(v, n, jnp.array([1.0 / 1.5]))
    assert bool(ok[0])
    np.testing.assert_allclose(r, [[0.0, -1.0, 0.0]], atol=1e-6)
    # oblique: check Snell's law  sin_t = eta * sin_i
    v = m.normalize(jnp.array([[1.0, -1.0, 0.0]]))
    ok, r = m.refract(v, n, jnp.array([1.0 / 1.5]))
    sin_i = v[0, 0]
    sin_t = m.normalize(r)[0, 0]
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-6)


def test_total_internal_reflection():
    v = m.normalize(jnp.array([[1.0, -0.2, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    ok, _ = m.refract(v, n, jnp.array([1.5]))  # dense -> sparse, steep angle
    assert not bool(ok[0])


def test_fresnel_limits():
    # normal incidence, glass: ~4% reflectance
    fr = m.fresnel_dielectric(jnp.array([1.0]), jnp.array([1.0]), jnp.array([1.5]))
    np.testing.assert_allclose(fr, [0.04], atol=2e-3)
    # grazing: -> 1
    fr = m.fresnel_dielectric(jnp.array([0.001]), jnp.array([1.0]), jnp.array([1.5]))
    assert fr[0] > 0.98


def test_orthonormal_basis():
    key = jax.random.key(0)
    n = m.normalize(jax.random.normal(key, (64, 3)))
    t, b = m.orthonormal_basis(n)
    np.testing.assert_allclose(m.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(b, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(t, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.length(t), 1.0, atol=1e-5)
    np.testing.assert_allclose(m.cross(t, b), n, atol=1e-5)


def test_transform_roundtrip():
    mat = tf.compose(
        tf.scale((2.0, 3.0, 4.0)), tf.rotation_y(30.0), tf.translation((1, 2, 3))
    )
    p = jnp.array([[0.5, -1.0, 2.0]])
    back = tf.apply_point(tf.inverse(mat), tf.apply_point(mat, p))
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_rotation_degrees():
    p = jnp.array([[1.0, 0.0, 0.0]])
    out = tf.apply_point(tf.rotation_z(90.0), p)
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-6)


def test_normal_transform_nonuniform_scale():
    mat = tf.scale((2.0, 1.0, 1.0))
    # plane x+y=0 has normal (1,1,0)/sqrt2; after scaling x by 2 the plane
    # contains (2,-1,0) so the normal must tilt, not scale
    n = m.normalize(jnp.array([[1.0, 1.0, 0.0]]))
    nt = m.normalize(tf.apply_normal(mat, n))
    tangent = tf.apply_vector(mat, jnp.array([[1.0, -1.0, 0.0]]))
    np.testing.assert_allclose(m.dot(nt, tangent), 0.0, atol=1e-6)
