import time
import jax, jax.numpy as jnp

M, K, N = 4608, 3072, 3072
ITERS = 30

def bench(name, make_w, matmul):
    w = make_w(jax.random.PRNGKey(0))
    def chained(x, w):
        def body(i, xx):
            out = matmul(xx, w)           # [M, N] f32/bf16
            # renormalize + cast back to input dtype to chain
            return (out / (1.0 + jnp.max(jnp.abs(out)))).astype(x.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    if name.startswith("int8"):
        x0 = (x0 * 10).astype(jnp.int8)
    jfn = jax.jit(chained)
    float(jfn(x0, w))
    t0 = time.perf_counter(); float(jfn(x0, w)); t = (time.perf_counter()-t0)/ITERS
    print(f"{name}: {t*1e3:.3f}ms  {2*M*K*N/t/1e12:.1f} TF/s", flush=True)

bench("bf16", lambda k: jax.random.normal(k, (K, N), jnp.bfloat16),
      lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32))
bench("int8xint8->int32", lambda k: (jax.random.normal(k, (K, N)) * 10).astype(jnp.int8),
      lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.int32).astype(jnp.float32))
