"""In-program-sized y-pass A/B: B=160 maps of (126, 166), DT along H.
Compares transpose+chunked vs the sublane-scan kernel."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from partsbaseddetector_tpu.ops.pallas_dt import dt1d_pallas, dt1d_sublane

for B, H, W in [(160, 126, 166), (160, 91, 119), (160, 66, 86)]:
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(B, H, W).astype(np.float32))
    a = jnp.full((B,), -0.03, jnp.float32)
    b = jnp.full((B,), 0.01, jnp.float32)
    sh = jnp.zeros((B,), jnp.float32)

    @jax.jit
    def chunked(s):
        st = jnp.swapaxes(s, -1, -2)
        o, p = dt1d_pallas(st, a[:, None], b[:, None], sh[:, None], H, 1)
        return jnp.swapaxes(o, -1, -2), jnp.swapaxes(p, -1, -2)

    @jax.jit
    def sublane(s):
        return dt1d_sublane(s, a, b, sh, H, 1)

    o1 = chunked(src); jax.block_until_ready(o1)
    o2 = sublane(src); jax.block_until_ready(o2)
    assert np.array_equal(np.asarray(o1[1]), np.asarray(o2[1]))
    for name, f in [("chunked+T", chunked), ("sublane", sublane)]:
        best = 1e9
        for rep in range(5):
            t0 = time.perf_counter(); K = 30
            for _ in range(K): o = f(src)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter()-t0)/K*1e3)
        print(f"B={B} H={H} W={W} {name:10s} {best:7.3f} ms "
              f"({B*H*H*W/best*1e3/1e9:6.1f} Gsample/s)")
