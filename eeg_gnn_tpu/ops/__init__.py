from eeg_gnn_tpu.ops.fft_features import (  # noqa: F401
    log_amplitude_fft,
    log_amplitude_fft_np,
    featurize_clip,
    featurize_clip_np,
)
from eeg_gnn_tpu.ops.diffusion import (  # noqa: F401
    chebyshev_diffusion,
    diffusion_conv,
)
