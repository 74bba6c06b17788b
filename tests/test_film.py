import os

import jax.numpy as jnp
import numpy as np

from mafrixraytracing_tpu.film import image as img_io
from mafrixraytracing_tpu.film import tonemap as tm
from mafrixraytracing_tpu.film.film import FilmState


def test_aces_reference_values():
    """Golden values computed from the Narkowicz curve the reference uses
    (Scene/Scene.fs:280-289)."""
    def ref(x):
        return min(max((x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14), 0.0), 1.0)

    xs = np.array([0.0, 0.18, 0.5, 1.0, 2.0, 10.0], np.float32)
    got = np.asarray(tm.aces(jnp.asarray(xs)))
    want = np.array([ref(float(x)) for x in xs], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_tonemap_monotone_and_bounded():
    x = jnp.linspace(0.0, 20.0, 256)
    y = np.asarray(tm.tonemap(x))
    assert (np.diff(y) >= -1e-6).all()
    assert y.min() >= 0.0 and y.max() <= 1.0


def test_film_accumulation_mean():
    f = FilmState.create(4, 4)
    f = f.add_frame(jnp.full((4, 4, 3), 2.0))
    f = f.add_frame(jnp.full((4, 4, 3), 4.0))
    np.testing.assert_allclose(np.asarray(f.mean), 3.0)
    assert int(f.frame_count) == 2
    f2 = f.reset()
    assert int(f2.frame_count) == 0
    np.testing.assert_allclose(np.asarray(f2.radiance_sum), 0.0)


def test_to_bytes_scale():
    f = FilmState.create(1, 1).add_frame(jnp.full((1, 1, 3), 1e9))
    b = np.asarray(f.to_bytes())
    assert b.dtype == np.uint8
    assert (b >= 254).all()  # huge radiance -> white


def test_png_roundtrip(tmp_path):
    arr = (np.random.default_rng(0).random((8, 6, 3)) * 255).astype(np.uint8)
    p = os.path.join(tmp_path, "t.png")
    img_io.write_png(p, arr)
    back = (img_io.read_image(p) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(back, arr)


def test_png_zlib_fallback(tmp_path):
    arr = (np.random.default_rng(1).random((5, 7, 3)) * 255).astype(np.uint8)
    p = os.path.join(tmp_path, "t2.png")
    with open(p, "wb") as f:
        f.write(img_io._encode_png_zlib(arr))
    back = (img_io.read_image(p) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(back, arr)


def test_render_image_pixel_chunking_exact():
    """Frames larger than config.wavefront are rendered in pixel chunks
    (one wavefront per scan step). Chunking must be bit-exact vs the
    unchunked path: per-pixel RNG streams do not depend on the chunking."""
    import jax
    import numpy as np
    from dataclasses import replace as dreplace

    from mafrixraytracing_tpu.integrator.path import (
        PathTracerConfig,
        render_image,
    )
    from mafrixraytracing_tpu.scene.builtin import cornell_box
    from mafrixraytracing_tpu.scene.compiler import compile_scene

    cs = compile_scene(cornell_box(width=48, height=48))
    base = PathTracerConfig(max_depth=2, rr_enable=False, backend="jnp")
    small = dreplace(base, wavefront=512)  # 48*48 = 2304 -> 5 chunks
    key = jax.random.key(3)
    img_a = np.asarray(render_image(cs.scene, cs.camera, 48, 48, 1, key, base))
    img_b = np.asarray(render_image(cs.scene, cs.camera, 48, 48, 1, key, small))
    np.testing.assert_array_equal(img_a, img_b)


def test_live_preview_sink(tmp_path):
    """LivePreview: atomic PNG refresh + in-memory HTTP frame (the
    replacement for the reference's ImGui live window, Core/Film.fs:38-92).
    Served page and frame bytes must be fetchable while updates land."""
    import urllib.request

    import numpy as np

    from mafrixraytracing_tpu.film.preview import LivePreview

    out = tmp_path / "live.png"
    p = LivePreview(out, http_port=0)  # port 0: OS-assigned
    try:
        frame = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(
            np.uint8)
        p.update(frame)
        assert out.exists() and out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
        url = f"http://127.0.0.1:{p.port}"
        page = urllib.request.urlopen(url + "/", timeout=5).read()
        assert b"frame.png" in page
        png = urllib.request.urlopen(url + "/frame.png", timeout=5).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # second update replaces the frame atomically
        p.update(np.zeros((8, 8, 3), np.uint8))
        png2 = urllib.request.urlopen(url + "/frame.png", timeout=5).read()
        assert png2 != png
    finally:
        p.close()
