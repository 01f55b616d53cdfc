"""A/B the lane-chunked x-pass vs the transposed sublane x-pass on the
dominant in-program shapes (maps of (dlen_y, W), aux carried).

  python tools/dt_xpass_sublane_microbench.py

Lane form: rows = maps * dlen_y, scan W on lanes, dlen_x output lanes.
Sublane form: transpose to (W, dlen_y), scan W on sublanes (dlen_y on
lanes), transpose back — the transposes are included in the timing.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from partsbaseddetector_tpu.ops.pallas_dt import dt1d_pallas, dt1d_sublane

# (name, maps, dlen_y, W): x-pass input is (maps, dlen_y, W), dlen_x = W
CASES = [
    ("xpass-big", 160, 126, 166),
    ("xpass-mid", 106, 91, 119),
    ("xpass-small", 80, 47, 61),
]
for name, M, HY, W in CASES:
    rng = np.random.RandomState(0)
    tmp = jnp.asarray(rng.randn(M, HY, W).astype(np.float32))
    aux = jnp.asarray(rng.randint(0, 2000, (M, HY, W)).astype(np.int32))
    a = jnp.full((M,), -0.03, jnp.float32)
    b = jnp.full((M,), 0.01, jnp.float32)
    sh = jnp.zeros((M,), jnp.float32)

    def lane(t, x):
        a2 = jnp.broadcast_to(a[:, None], (M, HY))
        b2 = jnp.broadcast_to(b[:, None], (M, HY))
        s2 = jnp.broadcast_to(sh[:, None], (M, HY))
        return dt1d_pallas(t, a2, b2, s2, W, 1, aux=x)

    def subl(t, x):
        o, p = dt1d_sublane(
            jnp.swapaxes(t, -1, -2), a, b, sh, W, 1,
            aux=jnp.swapaxes(x, -1, -2),
        )
        return jnp.swapaxes(o, -1, -2), jnp.swapaxes(p, -1, -2)

    fns = {"lane": jax.jit(lane), "sublane": jax.jit(subl)}
    outs = {}
    for label, f in fns.items():
        o = f(tmp, aux); jax.block_until_ready(o)
        outs[label] = tuple(np.asarray(v) for v in o)
        best = 1e9
        for rep in range(5):
            t0 = time.perf_counter(); K = 30
            for _ in range(K):
                o = f(tmp, aux)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / K * 1e3)
        gs = M * HY * W * W / best * 1e3 / 1e9
        print(f"{name} {label:8s}: {best:.3f} ms ({gs:.1f} Gsample/s)")
    dv = np.max(np.abs(outs["lane"][0] - outs["sublane"][0]))
    dp = np.mean(outs["lane"][1] != outs["sublane"][1])
    print(f"{name} parity: max|dv|={dv:.2e} ptr-mismatch={dp:.2e}")
