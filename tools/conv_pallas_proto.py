"""Prototype: Pallas implicit-GEMM filter-bank conv (EXPERIMENTAL).

Feature arrives pre-transposed (S, H, C, W) so each row slice is a
(C=32 sublane, W lane) tile; the patch matrix is built with static
lane shifts (j < FW) written at static sublane offsets (32 per tap) —
no in-kernel transposes. One dot per TOH-row block contracts K=800 on
dim 0 of both operands. Verifies vs lax.conv and trace-times.

STATUS (r2): bit-exact vs lax.conv in interpret mode (INTERP=1 on the
CPU backend, tiny shapes). The first TPU run at TOH=8 WEDGED the axon
worker (~30 min outage) — the full-scale feature block + the
(K, TOH*OWP) scratch + pipeline double-buffering total ~17 MB, over
the ~16 MB VMEM budget, and the tunnel hangs instead of erroring.
Next attempt must set pltpu.CompilerParams(vmem_limit_bytes=...),
shrink the feature block to row windows (grid over row-blocks with a
halo-free layout or manual HBM DMA), and start from TOH<=2. Motivation
unchanged: lax.conv runs at ~7 TFLOP/s on these shapes while the same
GEMM as a plain dot hits ~25 (tools/conv_variants2.py).
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from partsbaseddetector_tpu.utils.profiling import device_op_breakdown

S, C, F, FH, FW = int(os.environ.get("PS", "5")), 32, int(os.environ.get("PF", "104")), 5, 5
H, W = int(os.environ.get("PH", "126")), int(os.environ.get("PW", "166"))
OH, OW = H - FH + 1, W - FW + 1
TOH = int(os.environ.get("TOH", "2"))
OWP = ((OW + 127) // 128) * 128  # lane-padded per-row column width
FP = ((F + 127) // 128) * 128
K = FH * FW * C

rng = np.random.RandomState(0)
feat = rng.randn(S, H, W, C).astype(np.float32)
filt = rng.randn(F, FH, FW, C).astype(np.float32)

# reference
kern = jnp.transpose(jnp.asarray(filt), (1, 2, 3, 0))
ref = jax.lax.conv_general_dilated(
    jnp.asarray(feat), kern, (1, 1), "VALID",
    dimension_numbers=("NHWC", "HWIO", "NHWC"),
    precision=jax.lax.Precision.HIGHEST,
    preferred_element_type=jnp.float32)
ref = np.asarray(ref)

# weights as (K, FP): row 32*(i*FW+j)+c = filt[f, i, j, c]
w2 = np.zeros((K, FP), np.float32)
for i in range(FH):
    for j in range(FW):
        w2[32 * (i * FW + j):32 * (i * FW + j) + 32, :F] = (
            filt[:, i, j, :].T)
w2 = jnp.asarray(w2)

NOH = -(-OH // TOH)


def kernel(feat_ref, w_ref, out_ref, patch):
    # feat_ref: (1, HP, C, W) full-scale block (index constant across
    # the row-grid axis -> fetched once per scale); w_ref: (K, FP)
    # out_ref: (1, TOH, OW, FP); patch scratch: (K, TOH*OWP)
    base = pl.program_id(1) * TOH
    for t in range(TOH):
        for i in range(FH):
            row = feat_ref[0, base + t + i]  # (C, W)
            for j in range(FW):
                k = i * FW + j
                patch[
                    pl.ds(32 * k, 32), pl.ds(t * OWP, OW)
                ] = row[:, j : j + OW]
    acc = jax.lax.dot_general(
        patch[:, :], w_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TOH*OWP, FP)
    out_ref[0] = acc.reshape(TOH, OWP, FP)[:, :OW, :]


def conv_pallas(feat_t):
    # feat_t: (S, H, C, W), H padded so every TOH block is full
    hp = NOH * TOH + FH - 1
    feat_t = jnp.pad(feat_t, ((0, 0), (0, hp - H), (0, 0), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(S, NOH),
        in_specs=[
            pl.BlockSpec(
                (1, hp, C, W),
                lambda s, r: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TOH, OW, FP), lambda s, r: (s, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((S, NOH * TOH, OW, FP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, TOH * OWP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 << 20  # error at compile, never wedge
        ),
        interpret=bool(int(os.environ.get("INTERP", "0"))),
    )(feat_t, w2)
    return out[:, :OH, :, :F]


@jax.jit
def run(feat_nhwc):
    return conv_pallas(jnp.transpose(feat_nhwc, (0, 1, 3, 2)))


got = np.asarray(run(jnp.asarray(feat)))
err = np.max(np.abs(got - ref))
print("max err vs lax.conv:", err)
assert err < 2e-3, err

if not int(os.environ.get("INTERP", "0")):
    d = device_op_breakdown(run, jnp.asarray(feat), iters=20)
    ms = d.get("program_total", 0)
    fl = 2 * S * OH * OW * K * F
    print(f"pallas conv TOH={TOH}: {ms:.3f} ms  {fl/ms*1e3/1e12:.1f} TFLOP/s  {d}")
