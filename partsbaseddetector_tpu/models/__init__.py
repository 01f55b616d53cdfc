"""Model layer: canonical part-model container, packed device form,
format loaders (OpenCV FileStorage XML/YAML, MATLAB .mat), the npz
canonical serialization, and synthetic model generators for tests and
benchmarks."""

from .model import (
    Model,
    ModelSpec,
    PackedComponent,
    PackedModel,
    pack_model,
    make_synthetic_model,
    save_model,
    load_model,
)
from .filestorage import FileStorageModel
from .matlabio import MatlabIOModel
