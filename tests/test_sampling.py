import jax
import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.core import sampling as smp
from mafrixraytracing_tpu.core.math import dot, length


def _uniforms(n, d=2, seed=0):
    return jax.random.uniform(jax.random.key(seed), (n, d))


def test_uniform_hemisphere_orientation_and_mean():
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (20000, 1))
    d = smp.uniform_hemisphere(_uniforms(20000), n)
    cos = dot(d, n)
    assert float(jnp.min(cos)) >= -1e-6
    np.testing.assert_allclose(length(d), 1.0, atol=1e-5)
    # E[cos] = 1/2 for uniform hemisphere
    np.testing.assert_allclose(float(jnp.mean(cos)), 0.5, atol=0.02)


def test_cosine_hemisphere_pdf_and_mean():
    n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (20000, 1))
    d, pdf = smp.cosine_hemisphere(_uniforms(20000), n)
    cos = dot(d, n)
    np.testing.assert_allclose(pdf, np.maximum(np.asarray(cos), 1e-8) / np.pi, atol=1e-5)
    # E[cos] = 2/3 for cosine-weighted
    np.testing.assert_allclose(float(jnp.mean(cos)), 2.0 / 3.0, atol=0.02)


def test_uniform_sphere_mean_zero():
    d = smp.uniform_sphere(_uniforms(20000))
    np.testing.assert_allclose(length(d), 1.0, atol=1e-5)
    assert float(jnp.max(jnp.abs(jnp.mean(d, axis=0)))) < 0.02


def test_uniform_disk_radius():
    p = smp.uniform_disk(_uniforms(20000))
    r = jnp.sqrt(jnp.sum(p * p, axis=-1))
    assert float(jnp.max(r)) <= 1.0 + 1e-6
    # E[r] = 2/3 for uniform disk
    np.testing.assert_allclose(float(jnp.mean(r)), 2.0 / 3.0, atol=0.01)


def test_uniform_triangle_barycentric_valid_and_uniform():
    b = smp.uniform_triangle(_uniforms(40000))
    assert float(jnp.min(b)) >= 0.0
    assert float(jnp.max(jnp.sum(b, axis=-1))) <= 1.0 + 1e-6
    # centroid of uniform samples -> (1/3, 1/3)
    np.testing.assert_allclose(jnp.mean(b, axis=0), [1 / 3, 1 / 3], atol=0.01)


def test_stratified_jitter_not_diagonal():
    """Regression guard for the reference's JitteredSampler bug
    (Core/Samples/JitteredSampler.fs:16): samples must not be perfectly
    correlated across axes."""
    s = smp.stratified_jitter(jax.random.key(1), 16)
    assert s.shape == (16, 2)
    corr = np.corrcoef(np.asarray(s[:, 0]), np.asarray(s[:, 1]))[0, 1]
    assert abs(corr) < 0.9
    # stratification: one sample per 4x4 cell
    cells = set(map(tuple, (np.asarray(s) * 4).astype(int).tolist()))
    assert len(cells) == 16
