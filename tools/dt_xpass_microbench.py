"""A/B the pack=1 chunked DT kernel (x-pass shape) with/without the
affine decomposition: PBD_DT_AFFINE=0|1 python tools/dt_xpass_microbench.py
Shape mirrors the dominant in-program call: 20160 rows x 166 sources,
dlen=166, with aux (the Iy carry)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from partsbaseddetector_tpu.ops.pallas_dt import dt1d_pallas

CASES = [
    ("xpass-big", 20160, 166, 166, True),
    ("xpass-mid", 12608, 119, 119, True),
    ("ypass-mid", 9104, 91, 91, False),
]
for name, B, N, DLEN, has_aux in CASES:
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(B, N).astype(np.float32))
    aux = jnp.asarray(rng.randint(0, 2000, (B, N)).astype(np.int32)) if has_aux else None
    a = jnp.full((B,), -0.03, jnp.float32)
    b = jnp.full((B,), 0.01, jnp.float32)
    sh = jnp.zeros((B,), jnp.float32)
    f = jax.jit(lambda s, x: dt1d_pallas(s, a, b, sh, DLEN, 1, aux=x)) if has_aux \
        else jax.jit(lambda s, x: dt1d_pallas(s, a, b, sh, DLEN, 1))
    o = f(src, aux); jax.block_until_ready(o)
    best = 1e9
    for rep in range(5):
        t0 = time.perf_counter(); K = 30
        for _ in range(K): o = f(src, aux)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter()-t0)/K*1e3)
    print(f"{name} affine={os.environ.get('PBD_DT_AFFINE','1')}: {best:.3f} ms "
          f"({B*N*DLEN/best*1e3/1e9:.1f} Gsample/s)")
