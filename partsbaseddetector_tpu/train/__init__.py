"""Training stacks.

Two paths with shared semantics:
  - TPU-native SSVM by batched subgradient descent (sgd.py, fit.py,
    checkpoint.py) — the whole detection pipeline is differentiable;
  - QP-faithful latent training reproducing the reference's dual
    coordinate-descent recipe (qp.py, latent.py, trainmodel.py).

Support: flat weight layout (layout.py), placement feature extraction +
the score-reconstruction invariant (features.py), model builders
(builder.py), data preparation (data.py), annotation/datasets
(annotate.py).
"""

from .builder import (
    build_model,
    cluster_parts,
    init_part_model,
    merge_models,
    relative_part_positions,
)
from .data import crop_positive, point_to_box, warp_positive_feature
from .features import Placement, placement_feature, reconstruct_score
from .fit import fit
from .latent import train
from .layout import ParamLayout
from .qp import QPSolver
from .sgd import (
    apply_params,
    batch_root_masks,
    make_loss_fn,
    make_train_step,
    model_params,
)
from .trainmodel import train_model
