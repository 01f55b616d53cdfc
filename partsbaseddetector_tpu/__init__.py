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
