from eeg_gnn_tpu.data.scaler import StandardScaler  # noqa: F401
from eeg_gnn_tpu.data.datasets import (  # noqa: F401
    DetectionDataset,
    ClassificationDataset,
    SSLDataset,
    load_dataset_detection,
    load_dataset_classification,
    load_dataset_ssl,
)
from eeg_gnn_tpu.data.loader import DataLoader  # noqa: F401
