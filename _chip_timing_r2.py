"""On-chip timings for round-2 additions: affine kernel + blocked shampoo.
Value-evolving chains, round-0 discarded (axon transport rules)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def timed(fn, args, rounds=3, evolve=None):
    out = fn(*args)
    _ = float(jnp.mean(out[0] if isinstance(out, tuple) else out))
    best = 1e9
    for r in range(rounds + 1):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.mean(out[0] if isinstance(out, tuple) else out))
        dt = time.perf_counter() - t0
        if r > 0:
            best = min(best, dt)
        if evolve is not None:
            args = evolve(args, out)
    return best

# ---- affine kernel: rotate + shears at b256 224^2
from myconvnet_tpu.ops.pallas.affine import rotate, shear_x
import math
n = 256
x = jnp.asarray(np.random.RandomState(0).rand(n, 224, 224, 3), jnp.float32)
ang = jnp.asarray(np.random.RandomState(1).uniform(-0.5, 0.5, n), jnp.float32)

shx = jax.jit(lambda x, s: shear_x(x, s, max_abs_slope=0.3))
t = timed(shx, (x, ang * 0.6), evolve=lambda a, o: (o, a[1] * 1.0001))
print(f"shear_x b256 224^2: {t*1e3:.2f} ms ({n/t:.0f} img/s)")

rot = jax.jit(lambda x, a: rotate(x, a, max_abs_radians=0.53))
t = timed(rot, (x, ang), evolve=lambda a, o: (o, a[1] * 1.0001))
print(f"rotate  b256 224^2: {t*1e3:.2f} ms ({n/t:.0f} img/s)")

# ---- full randaugment fold with geometry ops vs without
from myconvnet_tpu.data.randaugment import rand_augment, DEFAULT_OPS
ops_nogeo = tuple(o for o in DEFAULT_OPS
                  if o not in ("rotate", "shear_x", "shear_y"))
for name, ops in (("14-op (full, +geometry)", None),
                  ("12-op (no geometry)", ops_nogeo)):
    f = jax.jit(lambda k, x, _ops=ops: rand_augment(k, x, num_layers=2,
                                                    magnitude=9.0, ops=_ops))
    key = jax.random.key(0)
    def ev(args, out):
        k, _ = args
        return (jax.random.fold_in(k, 1), out)
    t = timed(f, (key, x), evolve=ev)
    print(f"randaugment {name}: {t*1e3:.2f} ms ({n/t:.0f} img/s)")

# ---- blocked shampoo step cost on resnet50 params
from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.train.shampoo import blocked_shampoo, shampoo
from myconvnet_tpu.train import optim as optim_lib

model = transform(lambda x, train=False: models.resnet50(x, 1000, train=train))
params, _ = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), False)
grads = jax.tree.map(lambda p: jnp.ones_like(p, jnp.float32) * 1e-3, params)

for label, opt in (
        ("blocked_shampoo b128", blocked_shampoo(0.1, precond_every=10, block_size=128)),
        ("capped shampoo d256", shampoo(0.1, precond_every=10, max_dim=256))):
    state = opt.init(params)
    step = jax.jit(lambda g, s, p, i: opt.update(g, s, p, i))
    # off-cadence step
    def run_off(g, s, p, i):
        return step(g, s, p, i)
    p1, s1 = step(grads, state, params, jnp.asarray(21))
    float(jnp.mean(p1["stem/conv"]["w"]))
    ts = []
    pp, ss = p1, s1
    for r in range(3):
        t0 = time.perf_counter()
        pp, ss = step(grads, ss, pp, jnp.asarray(23 + r * 2))  # odd: off-cadence
        float(jnp.mean(pp["stem/conv"]["w"]))
        ts.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    pp, ss = step(grads, ss, pp, jnp.asarray(30))  # refresh step
    float(jnp.mean(pp["stem/conv"]["w"]))
    tr = time.perf_counter() - t0
    print(f"{label}: off-cadence {min(ts[1:])*1e3:.1f} ms, refresh {tr*1e3:.1f} ms")
