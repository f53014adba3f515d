from eeg_gnn_tpu.models.dcgru import (  # noqa: F401
    DCGRUConfig,
    init_dcgru_cell,
    dcgru_cell_apply,
    encoder_init,
    encoder_apply,
    decoder_init,
    decoder_apply,
)
from eeg_gnn_tpu.models.dcrnn import (  # noqa: F401
    DCRNNConfig,
    init_classification_model,
    classification_apply,
    init_next_time_pred_model,
    next_time_pred_apply,
)
