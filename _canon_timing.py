import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from myconvnet_tpu.data.randaugment import rand_augment, CANONICAL_OPS, FAST_OPS

n = 256
x = jnp.asarray(np.random.RandomState(0).rand(n, 224, 224, 3), jnp.float32)
for name, ops in (("canonical-14", CANONICAL_OPS), ("fast-12", FAST_OPS)):
    f = jax.jit(lambda k, x, _o=ops: rand_augment(k, x, num_layers=2, magnitude=9.0, ops=_o))
    key = jax.random.key(0)
    out = f(key, x); float(jnp.mean(out))
    best = 1e9
    for r in range(4):
        t0 = time.perf_counter()
        out = f(jax.random.fold_in(key, r + 1), out)
        float(jnp.mean(out))
        dt = time.perf_counter() - t0
        if r > 0:
            best = min(best, dt)
    print(f"randaugment {name} (2 layers, b256 224^2): {best*1e3:.1f} ms")
