"""partsbaseddetector_tpu — a TPU-native (JAX/XLA/Pallas) parts-based detection framework.

A from-scratch rebuild of the capabilities of the Yang–Ramanan
"Articulated Pose Estimation with Flexible Mixtures-of-Parts" detector
(reference: marcros/PartsBasedDetector, C++/MATLAB, CPU-only) as an
idiomatic TPU framework:

- the HOG scale pyramid is computed with MXU matmul resampling and a
  strided depthwise-conv histogram formulation (no scatters),
- part-filter responses are one batched XLA convolution over all parts,
  mixtures and scales (plus an FFT engine),
- the generalized distance transform + min-sum tree message passing are
  batched max-plus tensor passes (exact argmax parity with the
  sequential lower-envelope algorithm),
- NMS / candidate extraction run on device; batched multi-image detect
  scales over a `jax.sharding.Mesh`.

Public API mirrors the reference's surfaces: `PartsBasedDetector`
(detect / distribute_model), `Candidate`, model loaders
(`FileStorageModel`, `MatlabIOModel`), `Visualize`, evaluation
(PCK/APK), and a training stack.
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache (warm builds of the
    big detect programs take seconds instead of minutes).

    The JAX in this environment ignores the JAX_COMPILATION_CACHE_DIR
    env var (the cache stays 'disabled/not initialized'), so we apply
    the config programmatically. Honors the env var for the directory;
    PBD_COMPILE_CACHE=0 disables.

    Key stability: the cache key hashes the serialized program, and for
    Pallas programs the Mosaic kernel payload embeds (a) source
    locations of the frames that triggered kernel tracing and (b) MLIR
    attribute interning order from the process's shared context. (a)
    would make the key depend on the *calling script's* file/line — the
    two traceback flags below strip it (measured: without them, moving
    the call site by one line changes the key). (b) cannot be stripped
    from outside: keys are therefore stable for a fixed program-build
    order per process (a server that always builds the same programs in
    the same order always hits), but a process that builds program B
    after a different program A gets a different key for B than a
    process building B alone. PBD_STABLE_CACHE_KEYS=0 keeps full
    tracebacks in locations (better debug info, unstable keys)."""
    import os

    if os.environ.get("PBD_COMPILE_CACHE", "1") == "0":
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".jax_cache"),
    )
    try:
        import jax

        # skip the cache on the CPU platform: XLA:CPU AOT entries load
        # with a machine-feature mismatch warning ("could lead to
        # SIGILL") on this host, and CPU compiles are fast anyway. Read
        # jax.config (not the env var): it carries the env default AND
        # the runtime overrides the test suite / multichip dryrun apply
        # via jax.config.update before importing this package.
        # jax_platforms is a priority list (e.g. "axon,cpu" with cpu as
        # the fallback) — only a cpu PRIMARY means the process actually
        # runs on CPU
        plat = str(jax.config.jax_platforms or "")
        if plat.split(",")[0].strip().lower() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if os.environ.get("PBD_STABLE_CACHE_KEYS", "1") != "0":
            jax.config.update("jax_traceback_in_locations_limit", 0)
            jax.config.update(
                "jax_include_full_tracebacks_in_locations", False
            )
    except Exception:
        pass  # never let cache setup break imports


_enable_compile_cache()

from .types import Candidate, DetectionResult
from .models import (
    Model,
    ModelSpec,
    load_model,
    save_model,
    make_synthetic_model,
)
from .detector import PartsBasedDetector
from .cpu_detector import CPUPartsBasedDetector
from .visualize import Visualize

__all__ = [
    "Candidate",
    "CPUPartsBasedDetector",
    "DetectionResult",
    "Model",
    "ModelSpec",
    "PartsBasedDetector",
    "Visualize",
    "load_model",
    "save_model",
    "make_synthetic_model",
    "__version__",
]
