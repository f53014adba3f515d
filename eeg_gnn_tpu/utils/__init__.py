from eeg_gnn_tpu.utils.logging import get_logger, MetricsWriter  # noqa: F401
from eeg_gnn_tpu.utils.timing import Timer, timer  # noqa: F401
