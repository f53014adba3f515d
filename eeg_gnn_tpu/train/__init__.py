from eeg_gnn_tpu.train.losses import (  # noqa: F401
    bce_with_logits,
    cross_entropy,
    masked_mae_loss,
    masked_mse_loss,
    compute_regression_loss,
)
from eeg_gnn_tpu.train.optim import make_optimizer  # noqa: F401
from eeg_gnn_tpu.train.metrics import eval_dict, thresh_max_f1  # noqa: F401
