"""A/B the y-pass: transpose+chunked kernel vs the sublane-scan kernel.

Shapes follow the person26 VGA top buckets: (B=S*M, H, W) maps,
DT along H, dlen=H.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from partsbaseddetector_tpu.ops.pallas_dt import dt1d_pallas, dt1d_sublane

CASES = [(20, 124, 164), (20, 88, 116), (20, 62, 82)]

for B, H, W in CASES:
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(B, H, W).astype(np.float32))
    a = jnp.full((B,), -0.03, jnp.float32)
    b = jnp.full((B,), 0.01, jnp.float32)
    sh = jnp.zeros((B,), jnp.float32)

    @jax.jit
    def chunked(src):
        st = jnp.swapaxes(src, -1, -2)  # (B, W, H)
        out, ptr = dt1d_pallas(
            st, a[:, None], b[:, None], sh[:, None], H, 1)
        return jnp.swapaxes(out, -1, -2), jnp.swapaxes(ptr, -1, -2)

    @jax.jit
    def sublane(src):
        return dt1d_sublane(src, a, b, sh, H, 1)

    o1 = chunked(src); jax.block_until_ready(o1)
    o2 = sublane(src); jax.block_until_ready(o2)
    assert np.allclose(np.asarray(o1[0]), np.asarray(o2[0]), atol=1e-4), "value mismatch"
    assert np.array_equal(np.asarray(o1[1]), np.asarray(o2[1])), "ptr mismatch"

    for name, f in [("chunked+T", chunked), ("sublane", sublane)]:
        best = 1e9
        for rep in range(5):
            t0 = time.perf_counter(); N = 50
            for _ in range(N):
                o = f(src)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / N * 1e3)
        samples = B * H * H * W
        print(f"B={B} H={H} W={W} {name:10s} {best:7.3f} ms "
              f"({samples/best*1e3/1e9:6.1f} Gsample/s)")
