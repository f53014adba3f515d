"""Experiment configuration: typed dataclass + CLI parity with the
reference's ``args.py:4-221`` flag surface.

Derived-field semantics reproduced (args.py:196-221): ``maximize_metric``
from ``metric_name``; ``filter_type`` forced from ``graph_type``; eval-only
runs require a checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class ExperimentConfig:
    # General
    save_dir: Optional[str] = None
    load_model_path: Optional[str] = None
    do_train: bool = False
    rand_seed: int = 123
    task: str = "detection"  # detection | classification | SS pre-training
    fine_tune: bool = False

    # Input
    graph_type: str = "individual"  # individual | combined
    max_seq_len: int = 60
    output_seq_len: int = 12
    time_step_size: int = 1
    input_dir: Optional[str] = None
    raw_data_dir: Optional[str] = None
    preproc_dir: Optional[str] = None
    top_k: int = 3

    # Model
    model_name: str = "dcrnn"  # dcrnn | lstm | densecnn | cnnlstm
    num_nodes: int = 19
    num_rnn_layers: int = 2
    pretrained_num_rnn_layers: int = 3
    rnn_units: int = 64
    dcgru_activation: str = "tanh"
    input_dim: int = 100
    num_classes: int = 1
    output_dim: int = 100
    max_diffusion_step: int = 2
    cl_decay_steps: int = 3000
    use_curriculum_learning: bool = False
    use_fft: bool = False

    # Training / test
    train_batch_size: int = 40
    test_batch_size: int = 128
    num_workers: int = 8
    dropout: float = 0.0
    eval_every: int = 1
    metric_name: str = "auroc"  # F1 | acc | loss | auroc
    lr_init: float = 3e-4
    l2_wd: float = 5e-4
    num_epochs: int = 100
    max_grad_norm: float = 5.0
    metric_avg: str = "weighted"
    data_augment: bool = False
    patience: int = 5
    sampling_ratio: float = 1.0  # detection train-split subsampling: keep
    # this fraction of seizure rows (negatives matched 1:1) — the
    # reference's ``scale_ratio`` (dataloader_detection.py:89-118),
    # exposed for label-scarcity protocols (benchmarks/ssl_efficacy.py)

    # TPU-framework extensions (no reference counterpart)
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    mesh_shape: str = "data:-1"  # e.g. "data:8" / "data:4,graph:2"
    device_pipeline: bool = False  # fused on-device input pipeline (raw clips in)
    hbm_cache: bool = False  # keep the featurized splits resident in device
    # HBM and gather batches in-step (dcrnn family;
    # data/device_cache.py — for hosts where H2D can't feed the chip)
    hbm_budget_gb: float = 12.0  # per-device HBM budget for cached splits
    # (the remainder holds params/activations/workspace); splits beyond it
    # rotate through fixed-shape shards (data/rotating_cache.py)
    reflect_invariant: bool = False  # combined-graph reflection augmentation
    # as a true node relabeling (shared supports — the kernels' fast path).
    # DIVERGENCE from the reference's literal swapped adjacency at the
    # multi-pair intersection entries; see DIVERGENCES.md.
    use_pallas: bool = False  # Pallas kernels for diffusion (auto where safe)
    scan_unroll: int = 1  # lax.scan unroll factor for the DCGRU time loop
    fused_steps: int = 1  # optimizer steps fused into one XLA program
    recurrence: str = "pallas"  # DCGRU scan backend: pallas | stacked | naive
    input_fusion: bool = True  # run the input diffusion + projection
    # INSIDE the Pallas recurrence kernels (no external x_proj GEMM):
    # measured 11.4k -> 18.5k clips/s bf16 B=128 (f32 7.8k -> 14.0k) on
    # v5e; numerics parity-gated on chip (benchmarks/tpu_kernel_parity).
    # --recurrence stacked or non-TPU backends ignore it.
    batch_tile: int = 36  # clips per grid step in the Pallas whole-sequence
    # recurrence kernels (perf knob; VMEM-bounded; rounded down to a
    # group multiple — requests 36-48 all resolve to tile 35 at the
    # flagship shape, measured equal within noise; the VMEM estimator
    # charges Mosaic's multi-group pipeline buffer, so oversized
    # requests clamp to compiling tiles). Auto-clamped for small
    # batches; see benchmarks/NOTES.md round 5.

    # Derived
    maximize_metric: bool = True
    filter_type: str = "dual_random_walk"

    def finalize(self) -> "ExperimentConfig":
        """Apply the reference's derived-field rules (args.py:196-221)."""
        if self.metric_name == "loss":
            self.maximize_metric = False
        elif self.metric_name in ("F1", "acc", "auroc"):
            self.maximize_metric = True
        else:
            raise ValueError(f'Unrecognized metric name: "{self.metric_name}"')
        if self.load_model_path is None and not self.do_train:
            raise ValueError(
                "For evaluation only, please provide trained model checkpoint "
                "in argument load_model_path."
            )
        if self.graph_type == "individual":
            self.filter_type = "dual_random_walk"
        if self.graph_type == "combined":
            self.filter_type = "laplacian"
        return self

    @property
    def num_supports(self) -> int:
        from eeg_gnn_tpu.graphs import num_supports_for

        return num_supports_for(self.filter_type)

    def dcrnn_config(self, num_rnn_layers: Optional[int] = None):
        from eeg_gnn_tpu.models.dcrnn import DCRNNConfig

        return DCRNNConfig(
            input_dim=self.input_dim,
            output_dim=self.output_dim,
            rnn_units=self.rnn_units,
            num_rnn_layers=num_rnn_layers or self.num_rnn_layers,
            max_diffusion_step=self.max_diffusion_step,
            num_nodes=self.num_nodes,
            num_supports=self.num_supports,
            num_classes=self.num_classes,
            dcgru_activation=self.dcgru_activation,
            dropout=self.dropout,
            cl_decay_steps=self.cl_decay_steps,
            use_curriculum_learning=self.use_curriculum_learning,
            use_pallas=self.use_pallas,
            scan_unroll=self.scan_unroll,
            compute_dtype=self.dtype,
            recurrence=self.recurrence,
            batch_tile=self.batch_tile,
            input_fusion=self.input_fusion,
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=4, sort_keys=True)


def _add_bool_flag(parser, name, help_str):
    parser.add_argument(f"--{name}", default=False, action="store_true", help=help_str)


def build_parser() -> argparse.ArgumentParser:
    """CLI with the reference's flag names (args.py) plus TPU extensions."""
    d = ExperimentConfig()
    p = argparse.ArgumentParser("Train DCRNN-family models on TUH EEG data (TPU-native).")

    p.add_argument("--save_dir", type=str, default=d.save_dir)
    p.add_argument("--load_model_path", type=str, default=d.load_model_path)
    _add_bool_flag(p, "do_train", "Whether to perform training.")
    p.add_argument("--rand_seed", type=int, default=d.rand_seed)
    p.add_argument("--task", type=str, default=d.task,
                   choices=("detection", "classification", "SS pre-training"))
    _add_bool_flag(p, "fine_tune", "Fine-tune from a pretrained SSL model.")

    p.add_argument("--graph_type", choices=("individual", "combined"),
                   default=d.graph_type)
    p.add_argument("--max_seq_len", type=int, default=d.max_seq_len)
    p.add_argument("--output_seq_len", type=int, default=d.output_seq_len)
    p.add_argument("--time_step_size", type=int, default=d.time_step_size)
    p.add_argument("--input_dir", type=str, default=d.input_dir)
    p.add_argument("--raw_data_dir", type=str, default=d.raw_data_dir)
    p.add_argument("--preproc_dir", type=str, default=d.preproc_dir)
    p.add_argument("--top_k", type=int, default=d.top_k)

    p.add_argument("--model_name", type=str, default=d.model_name,
                   choices=("dcrnn", "lstm", "densecnn", "cnnlstm"))
    p.add_argument("--num_nodes", type=int, default=d.num_nodes)
    p.add_argument("--num_rnn_layers", type=int, default=d.num_rnn_layers)
    p.add_argument("--pretrained_num_rnn_layers", type=int,
                   default=d.pretrained_num_rnn_layers)
    p.add_argument("--rnn_units", type=int, default=d.rnn_units)
    p.add_argument("--dcgru_activation", type=str, choices=("relu", "tanh"),
                   default=d.dcgru_activation)
    p.add_argument("--input_dim", type=int, default=d.input_dim)
    p.add_argument("--num_classes", type=int, default=d.num_classes)
    p.add_argument("--output_dim", type=int, default=d.output_dim)
    p.add_argument("--max_diffusion_step", type=int, default=d.max_diffusion_step)
    p.add_argument("--cl_decay_steps", type=int, default=d.cl_decay_steps)
    _add_bool_flag(p, "use_curriculum_learning", "Scheduled sampling for seq2seq.")
    _add_bool_flag(p, "use_fft", "Input is log-amplitude FFT features.")

    p.add_argument("--train_batch_size", type=int, default=d.train_batch_size)
    p.add_argument("--test_batch_size", type=int, default=d.test_batch_size)
    p.add_argument("--num_workers", type=int, default=d.num_workers)
    p.add_argument("--dropout", type=float, default=d.dropout)
    p.add_argument("--eval_every", type=int, default=d.eval_every)
    p.add_argument("--metric_name", type=str, default=d.metric_name,
                   choices=("F1", "acc", "loss", "auroc"))
    p.add_argument("--lr_init", type=float, default=d.lr_init)
    p.add_argument("--l2_wd", type=float, default=d.l2_wd)
    p.add_argument("--num_epochs", type=int, default=d.num_epochs)
    p.add_argument("--max_grad_norm", type=float, default=d.max_grad_norm)
    p.add_argument("--metric_avg", type=str, default=d.metric_avg)
    _add_bool_flag(p, "data_augment", "Random reflection + scaling augmentation.")
    p.add_argument("--patience", type=int, default=d.patience)
    p.add_argument("--sampling_ratio", type=float, default=d.sampling_ratio,
                   help="Detection train-split subsampling (the "
                        "reference's scale_ratio): keep this fraction of "
                        "seizure rows, negatives matched 1:1.")

    p.add_argument("--dtype", type=str, default=d.dtype,
                   choices=("float32", "bfloat16"))
    p.add_argument("--mesh_shape", type=str, default=d.mesh_shape)
    _add_bool_flag(p, "device_pipeline",
                   "Fused on-device input pipeline (featurize+graphs in-step).")
    _add_bool_flag(p, "hbm_cache",
                   "Keep featurized splits resident in device HBM; batches "
                   "are gathered in-step (dcrnn family). "
                   "Numerics match the streaming loader; combine with "
                   "--reflect_invariant for the shared-support fast path.")
    p.add_argument("--hbm_budget_gb", type=float, default=d.hbm_budget_gb,
                   help="Per-device HBM budget (GB) for cached splits; "
                        "larger splits rotate through fixed-shape shards.")
    _add_bool_flag(p, "reflect_invariant",
                   "Treat combined-graph reflection augmentation as a true "
                   "node relabeling: supports stay ONE shared slab (the "
                   "kernels' fast path) instead of per-clip stacks. "
                   "DIVERGES from the reference's literal swapped adjacency "
                   "at multi-pair intersection entries (DIVERGENCES.md "
                   "'Reflection-invariant supports'); exact-gradient "
                   "equivalence holds for deterministic models (dropout 0).")
    _add_bool_flag(p, "use_pallas", "Use Pallas diffusion kernels.")
    p.add_argument("--scan_unroll", type=int, default=d.scan_unroll)
    p.add_argument("--fused_steps", type=int, default=d.fused_steps,
                   help="Optimizer steps scanned inside one XLA program "
                        "(amortizes per-step dispatch latency).")
    p.add_argument("--recurrence", type=str, default=d.recurrence,
                   choices=("stacked", "naive", "pallas"),
                   help="DCGRU scan backend: precomputed Chebyshev operator "
                        "stack with hand-written BPTT; the naive per-step "
                        "diffusion with XLA auto-adjoint; or whole-sequence "
                        "Pallas kernels (TPU; falls back to stacked "
                        "elsewhere).")
    p.add_argument("--no_input_fusion", dest="input_fusion",
                   action="store_false", default=d.input_fusion,
                   help="Disable the in-kernel input diffusion + "
                        "projection (fall back to the hoisted x_proj "
                        "GEMM path).")
    p.add_argument("--batch_tile", type=int, default=d.batch_tile,
                   help="Clips packed per block-diagonal operator in the "
                        "Pallas whole-sequence recurrence kernels.")
    return p


def get_config(argv=None) -> ExperimentConfig:
    ns = build_parser().parse_args(argv)
    cfg = ExperimentConfig(**vars(ns))
    return cfg.finalize()
