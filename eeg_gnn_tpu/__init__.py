"""eeg_gnn_tpu — a TPU-native (JAX/XLA/Pallas) framework for graph neural
seizure analysis, built from scratch with the capabilities of
``tsy935/eeg-gnn-ssl`` (DCRNN model family, self-supervised pre-training,
TUSZ data pipeline).

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

- ``constants``   — electrode channels, sampling frequency, label dicts.
- ``config``      — typed experiment configuration (argparse surface parity).
- ``graphs``      — distance / correlation graph builders and spectral
                    supports (host numpy oracles + batched on-device jnp).
- ``ops``         — compute primitives: diffusion convolution, fused FFT
                    featurizer, Pallas kernels.
- ``models``      — DCRNN (classification / next-time-pred), LSTM, CNN-LSTM,
                    DenseCNN baselines, as pure functions over param pytrees.
- ``data``        — markers, datasets, augmentation, scaler, host->device
                    prefetch pipeline, EDF ingest.
- ``train``       — losses, metrics, optimizer, train/eval loops, checkpoints.
- ``parallel``    — mesh construction, data-parallel sharding, edge-partition
                    shard_map collectives.
- ``io``          — torch/orbax checkpoint import/export.
"""

__version__ = "0.1.0"
