"""SSL pre-training efficacy, end-to-end (round-3 verdict item 2).

The reference's headline capability is that self-supervised next-window
pre-training IMPROVES downstream seizure detection
(/root/reference/train.py:133-151 transplant via ``utils.build_finetune_
model``, utils.py:166-176; recipes README.md:66-105). The repo already
proves the transplant mechanics checkpoint-level; this demonstrates the
full chain at convergence scale on the synthetic corpus, through the real
CLI end to end:

    1. SSL-pretrain a 3-layer DCRNN encoder-decoder (next-window
       prediction, the run_dcrnn_ssl.sh recipe shape, lr 5e-4)
    2. transplant encoder layers into a 2-layer detection model
       (--fine_tune --load_model_path, train/checkpoint.py:
       build_finetune_params) and fine-tune
    3. train the identical detection model from scratch with the
       IDENTICAL budget (same corpus, epochs, lr, batch, augmentation)

Budget choice: the fine-tune/scratch budget (FT_EPOCHS) is set where the
from-scratch arm is still mid-climb on this corpus (its 100-epoch curve
saturates ~0.97 dev AUROC; see bf16_quality_results.json), so a
pre-training advantage is measurable rather than ceiling-masked.

Writes benchmarks/ssl_efficacy_results.json, gated by
tests/test_artifacts.py::test_ssl_efficacy_artifact (fine-tune beats or
matches from-scratch, and reaches the from-scratch final dev AUROC in at
most half the epochs). bench.py's artifact freshness check requires the
artifact to exist.

Run serially on the TPU host:  python benchmarks/ssl_efficacy.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIP_LEN = 60
NUM_FILES = 100
FILE_SECONDS = 480
CORPUS = f"/tmp/bf16_quality_corpus_{NUM_FILES}x{FILE_SECONDS}"  # shared
SAVE_ROOT = "/tmp/ssl_efficacy_runs"
OUT = os.path.join(os.path.dirname(__file__), "ssl_efficacy_results.json")

PRETRAIN_EPOCHS = 100
FT_EPOCHS = 10


def _corpus():
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    marker = os.path.join(CORPUS, "markers")
    if not os.path.isdir(marker):
        return make_synthetic_corpus(CORPUS, num_files=NUM_FILES,
                                     file_seconds=FILE_SECONDS,
                                     clip_len=CLIP_LEN, seed=7)
    return {"input_dir": os.path.join(CORPUS, "resampled"),
            "raw_data_dir": os.path.join(CORPUS, "edf"),
            "marker_dir": os.path.join(CORPUS, "markers"),
            "adj_mat_dir": os.path.join(CORPUS, "adj_mx_3d.pkl")}


def _base_args(dirs, save_dir):
    return [
        "--input_dir", dirs["input_dir"],
        "--raw_data_dir", dirs["raw_data_dir"],
        "--marker_dir", dirs["marker_dir"],
        "--adj_mat_dir", dirs["adj_mat_dir"],
        "--save_dir", save_dir,
        "--do_train", "--use_fft", "--data_augment", "--hbm_cache",
        "--graph_type", "combined", "--max_seq_len", str(CLIP_LEN),
        "--rnn_units", "64", "--max_diffusion_step", "2",
        "--train_batch_size", "32", "--test_batch_size", "32",
        "--num_workers", "2",
    ]


def _curves(save_dir, tags=("eval/auroc", "eval/loss")):
    run_dirs = sorted(glob.glob(os.path.join(save_dir, "train", "*")))
    out = {t: [] for t in tags}
    with open(os.path.join(run_dirs[-1], "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] in out:
                out[rec["tag"]].append(round(rec["value"], 4))
    return out


def pretrain(dirs) -> str:
    """SSL pretraining (3-layer, next-window); returns best-ckpt path."""
    from eeg_gnn_tpu.cli.train import main

    save_dir = os.path.join(SAVE_ROOT, "pretrain")
    os.makedirs(save_dir, exist_ok=True)
    t0 = time.time()
    main(_base_args(dirs, save_dir) + [
        "--task", "SS pre-training", "--model_name", "dcrnn",
        "--output_seq_len", "12", "--num_rnn_layers", "3",
        "--metric_name", "loss", "--lr_init", "5e-4",
        "--num_epochs", str(PRETRAIN_EPOCHS),
        "--patience", str(PRETRAIN_EPOCHS),
    ])
    run_dir = sorted(glob.glob(os.path.join(save_dir, "train", "*")))[-1]
    return os.path.join(run_dir, "best.npz"), time.time() - t0


def detect(dirs, name: str, extra) -> dict:
    from eeg_gnn_tpu.cli.train import main

    save_dir = os.path.join(SAVE_ROOT, name)
    os.makedirs(save_dir, exist_ok=True)
    t0 = time.time()
    results = main(_base_args(dirs, save_dir) + [
        "--task", "detection", "--model_name", "dcrnn",
        "--num_rnn_layers", "2", "--num_classes", "1",
        "--metric_name", "auroc", "--lr_init", "1e-4",
        "--num_epochs", str(FT_EPOCHS), "--patience", str(FT_EPOCHS),
    ] + extra)
    return {
        "test": {k: round(float(v), 4) for k, v in results.items()},
        "dev_auroc": _curves(save_dir)["eval/auroc"],
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    dirs = _corpus()
    ckpt, pre_wall = pretrain(dirs)

    ft = detect(dirs, "finetune", [
        "--fine_tune", "--load_model_path", ckpt,
        "--pretrained_num_rnn_layers", "3",
    ])
    scratch = detect(dirs, "scratch", [])

    scratch_final = scratch["dev_auroc"][-1]
    reach = next((i + 1 for i, v in enumerate(ft["dev_auroc"])
                  if v >= scratch_final), None)
    out = {
        "protocol": {
            "corpus": {"num_files": NUM_FILES,
                       "file_seconds": FILE_SECONDS,
                       "clip_len": CLIP_LEN, "seed": 7},
            "pretrain_epochs": PRETRAIN_EPOCHS,
            "budget_epochs": FT_EPOCHS,
            "recipe": "3-layer SSL (lr 5e-4) -> transplant -> 2-layer "
                      "detection fine-tune vs from-scratch, identical "
                      "budgets (lr 1e-4, B=32, augment, hbm_cache)",
        },
        "pretrain_wall_s": round(pre_wall, 1),
        "finetune": ft,
        "scratch": scratch,
        "scratch_final_dev_auroc": scratch_final,
        "ft_epochs_to_reach_scratch_final": reach,
        "test_auroc_gain": round(ft["test"]["auroc"]
                                 - scratch["test"]["auroc"], 4),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        "ft_test_auroc": ft["test"]["auroc"],
        "scratch_test_auroc": scratch["test"]["auroc"],
        "ft_epochs_to_reach_scratch_final": reach,
    }))


if __name__ == "__main__":
    main()
