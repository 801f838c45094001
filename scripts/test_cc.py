import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu"
x = jnp.asarray(np.random.default_rng(0).standard_normal((100_000, 128)).astype(np.float32))
@jax.jit
def f(x):
    return jnp.sum(jnp.dot(x.T, x)) + 12345.0
t0 = time.perf_counter(); np.asarray(f(x)); print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
