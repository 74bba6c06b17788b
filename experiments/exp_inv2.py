import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, optax
from mafrixraytracing_tpu.integrator.path import PathTracerConfig
from mafrixraytracing_tpu.opt import inverse
from mafrixraytracing_tpu.parallel.mesh import make_mesh
from mafrixraytracing_tpu.parallel.render import render_image_sharded
from mafrixraytracing_tpu.scene import spec as S
from mafrixraytracing_tpu.scene.compiler import compile_scene

W = H = 24
cfg = PathTracerConfig(max_depth=2, rr_enable=False, backend="jnp")
floor = S.make_rect_mesh((-2, 0, 2), (2, 0, 2), (2, 0, -2), (-2, 0, -2))
light = S.make_rect_mesh((-0.6, 2.0, -0.6), (0.6, 2.0, -0.6), (0.6, 2.0, 0.6), (-0.6, 2.0, 0.6))
spec = S.SceneSpec(
    camera=S.CameraSpec(position=(0.0, 1.2, 3.0), direction=(0.0, -0.3, -1.0),
                        fov=60.0, fov_convention="standard"),
    materials=[S.MaterialSpec(albedo=(0.7, 0.7, 0.7))],
    shapes=[S.ShapeSpec(floor, 0)],
    area_lights=[S.AreaLightSpec(light, radiance=(12.0,) * 3, visible=False)],
)
cs = compile_scene(spec)
scene, camera = cs.scene, cs.camera
mesh = make_mesh()
target = jax.block_until_ready(
    render_image_sharded(scene, camera, mesh, W, H, 32, jax.random.key(7), cfg))
true_v0 = np.asarray(scene.tri_v0)
mask = np.asarray(scene.tri_mask)
# raise the whole floor by 0.25: a strong, recoverable geometric error
pert_v0 = true_v0 + np.where(mask[:, None], np.array([[0.0, 0.25, 0.0]]), 0).astype(np.float32)
bad = scene.replace(tri_v0=jnp.asarray(pert_v0))

for lr, steps, spp in [(3e-2, 60, 8)]:
    params = inverse.extract_params(bad, ("tri_v0",))
    opt = optax.adam(lr)
    st = opt.init(params)
    step = inverse.make_train_step(mesh, opt, W, H, spp, cfg)
    key = jax.random.key(11); losses = []
    t0 = time.time()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, st, loss = step(params, st, bad, camera, target, sub)
        losses.append(float(loss))
    fv = np.asarray(params["tri_v0"])
    d_b = np.linalg.norm(pert_v0 - true_v0, axis=1)[mask].mean()
    d_a = np.linalg.norm(fv - true_v0, axis=1)[mask].mean()
    print(f"quad lr={lr} spp={spp}: loss {losses[0]:.4f}->{np.mean(losses[-5:]):.4f} "
          f"vtx {d_b:.4f}->{d_a:.4f} ({time.time()-t0:.0f}s)", flush=True)
