import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, optax
from mafrixraytracing_tpu.integrator.path import PathTracerConfig
from mafrixraytracing_tpu.opt import inverse
from mafrixraytracing_tpu.parallel.mesh import make_mesh
from mafrixraytracing_tpu.parallel.render import render_image_sharded
from mafrixraytracing_tpu.scene import assets
from mafrixraytracing_tpu.scene.compiler import compile_scene

W = H = 32
cfg = PathTracerConfig(max_depth=2, rr_enable=False, backend="jnp")
cs = compile_scene(assets.spot_scene(W, H))
scene, camera = cs.scene, cs.camera
mesh = make_mesh()
key = jax.random.key(7)
target = render_image_sharded(scene, camera, mesh, W, H, 16, key, cfg)
target = jax.block_until_ready(target)
true_albedo = np.asarray(scene.mat_albedo)
true_v0 = np.asarray(scene.tri_v0)
mask = np.asarray(scene.tri_mask)
rng_np = np.random.default_rng(3)
pert_albedo = true_albedo.copy(); pert_albedo[0] = (0.2, 0.8, 0.2)
pert_v0 = true_v0 + np.where(mask[:, None], rng_np.normal(0, 0.05, true_v0.shape), 0).astype(np.float32)
bad = scene.replace(mat_albedo=jnp.asarray(pert_albedo), tri_v0=jnp.asarray(pert_v0))

def run(opt, label, steps=80, spp=16):
    params = inverse.extract_params(bad, ("mat_albedo", "tri_v0"))
    opt_state = opt.init(params)
    step_fn = inverse.make_train_step(mesh, opt, W, H, spp, cfg)
    key2 = jax.random.key(11); losses = []
    t0 = time.time()
    for i in range(steps):
        key2, sub = jax.random.split(key2)
        params, opt_state, loss, _ = step_fn(params, opt_state, bad, camera, target, sub)
        losses.append(float(loss))
    fa = np.asarray(params["mat_albedo"]); fv = np.asarray(params["tri_v0"])
    err0 = np.abs(fa[0] - true_albedo[0]).max()
    d_b = np.linalg.norm(pert_v0 - true_v0, axis=1)[mask].mean()
    d_a = np.linalg.norm(fv - true_v0, axis=1)[mask].mean()
    print(f"{label}: loss {losses[0]:.3f}->{np.mean(losses[-5:]):.3f} albedo_err {err0:.3f} "
          f"vtx {d_b:.4f}->{d_a:.4f} ({time.time()-t0:.0f}s)", flush=True)

run(optax.multi_transform(
      {"a": optax.adam(5e-2), "v": optax.sgd(2e-2)},
      {"mat_albedo": "a", "tri_v0": "v"}), "s0.05 adam/sgd2e-2 spp16")
