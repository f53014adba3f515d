from eeg_gnn_tpu.io.torch_import import (  # noqa: F401
    load_torch_state_dict,
    import_next_time_pred_params,
    import_classification_params,
)
