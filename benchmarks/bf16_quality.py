"""bf16 end-to-end QUALITY evidence (round-2 verdict item 4).

bf16 is the declared throughput point of record (bench.py, +20-23% over
f32), but speed without accuracy is nothing: this trains the flagship
detection recipe (Dist-DCRNN: 2 layers, 64 units, K=2, T=60, fft input —
configs/run_dcrnn_detection.sh hyperparameters) on the synthetic corpus to
convergence in BOTH dtypes through the real CLI, and records the full dev
AUROC / loss curves plus final test metrics.

This script writes benchmarks/bf16_quality_results.json, which is gated by
tests/test_artifacts.py::test_bf16_quality_artifact: test-AUROC gap
|f32 - bf16| <= 0.01 and both runs well above chance. bench.py's artifact
freshness check fails loudly if the artifact is missing.

Run serially on the TPU host:  python benchmarks/bf16_quality.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAVE_ROOT = "/tmp/bf16_quality_runs"
OUT = os.path.join(os.path.dirname(__file__), "bf16_quality_results.json")

CLIP_LEN = 60          # the flagship 60 s detection clip length
# Corpus sizing: the balanced detection train split keeps ALL positives +
# an equal negative sample (reference dataloader_detection.py class
# balancing), so the effective train-set size is ~2x the positive count —
# positives scale with num_files (~1.8 positive clips/file). 100 files ->
# ~360 balanced train clips / ~36 test positives; a 20-file corpus left
# only 38 train clips and 80 optimizer steps, and the resulting
# barely-trained model exposed test AUROC as checkpoint-selection noise
# (round-4 postmortem).
NUM_FILES = 100
FILE_SECONDS = 480
NUM_EPOCHS = 100       # flagship recipe epochs (configs/run_dcrnn_detection.sh)
CORPUS = f"/tmp/bf16_quality_corpus_{NUM_FILES}x{FILE_SECONDS}"


def _corpus():
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    marker = os.path.join(CORPUS, "markers")
    if not os.path.isdir(marker):
        return make_synthetic_corpus(CORPUS, num_files=NUM_FILES,
                                     file_seconds=FILE_SECONDS,
                                     clip_len=CLIP_LEN, seed=7)
    return {"input_dir": os.path.join(CORPUS, "resampled"),
            "raw_data_dir": os.path.join(CORPUS, "edf"),
            "marker_dir": marker,
            "adj_mat_dir": os.path.join(CORPUS, "adj_mx_3d.pkl"),
            "clip_len": CLIP_LEN}


def _run(dtype: str, dirs) -> dict:
    """One full CLI training run; returns curves + final test metrics."""
    from eeg_gnn_tpu.cli.train import main

    save_dir = os.path.join(SAVE_ROOT, dtype)
    os.makedirs(save_dir, exist_ok=True)
    t0 = time.time()
    results = main([
        "--input_dir", dirs["input_dir"],
        "--raw_data_dir", dirs["raw_data_dir"],
        "--marker_dir", dirs["marker_dir"],
        "--adj_mat_dir", dirs["adj_mat_dir"],
        "--save_dir", save_dir,
        "--do_train", "--use_fft", "--data_augment",
        "--model_name", "dcrnn", "--task", "detection",
        "--graph_type", "combined", "--max_seq_len", str(CLIP_LEN),
        "--num_epochs", str(NUM_EPOCHS), "--patience", str(NUM_EPOCHS),
        "--metric_name", "auroc", "--lr_init", "1e-4",
        "--num_rnn_layers", "2", "--rnn_units", "64",
        "--max_diffusion_step", "2", "--num_classes", "1",
        "--train_batch_size", "32", "--test_batch_size", "32",
        "--num_workers", "2", "--dtype", dtype,
        # production input path on this link-bound host (numerics match the
        # streaming loader — tests/test_device_cache.py); without it each
        # arm spends ~95% of its wall time in host->device batch uploads
        "--hbm_cache",
    ])
    wall = time.time() - t0

    # harvest the per-epoch dev curves from the run's metrics.jsonl
    run_dirs = sorted(glob.glob(os.path.join(save_dir, "train", "*")))
    metrics_path = os.path.join(run_dirs[-1], "metrics.jsonl")
    curves = {"dev_auroc": [], "dev_loss": [], "train_loss_last": None}
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "eval/auroc":
                curves["dev_auroc"].append(round(rec["value"], 4))
            elif rec["tag"] == "eval/loss":
                curves["dev_loss"].append(round(rec["value"], 4))
            elif rec["tag"] == "train/Loss":
                curves["train_loss_last"] = round(rec["value"], 4)
    return {
        "dtype": dtype,
        "test": {k: round(float(v), 4) for k, v in results.items()},
        "curves": curves,
        "wall_s": round(wall, 1),
    }


def main():
    from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    dirs = _corpus()
    out = {
        "recipe": "dcrnn_detection flagship (2 layers, 64 units, K=2, "
                  f"T={CLIP_LEN}, fft, augment, combined graph, hbm_cache)",
        "corpus": {"num_files": NUM_FILES, "file_seconds": FILE_SECONDS,
                   "clip_len": CLIP_LEN, "seed": 7},
        "num_epochs": NUM_EPOCHS,
    }
    for dtype in ("float32", "bfloat16"):
        out[dtype] = _run(dtype, dirs)
        print(json.dumps({dtype: out[dtype]["test"]}), flush=True)

    out["test_auroc_gap"] = round(
        abs(out["float32"]["test"]["auroc"]
            - out["bfloat16"]["test"]["auroc"]), 4)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"test_auroc_gap": out["test_auroc_gap"]}))


if __name__ == "__main__":
    main()
