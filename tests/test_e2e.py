"""End-to-end smoke tests: full pipeline (markers -> slicing -> FFT ->
graphs -> training -> eval -> checkpoints) for every task and model family
on a synthetic corpus, on the virtual CPU mesh."""

import json
import os

import numpy as np
import pytest

from eeg_gnn_tpu.cli.train import main as train_main
from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    return make_synthetic_corpus(root, num_files=4, file_seconds=96,
                                 clip_len=12, seed=0), root


def _run(corpus, extra, task="detection", train=True):
    paths, root = corpus
    args = [
        "--task", task, "--max_seq_len", "12", "--use_fft",
        "--num_rnn_layers", "1", "--rnn_units", "16",
        "--max_diffusion_step", "1", "--train_batch_size", "4",
        "--test_batch_size", "8", "--num_epochs", "1", "--num_workers", "1",
        "--input_dir", paths["input_dir"],
        "--raw_data_dir", paths["raw_data_dir"],
        "--marker_dir", paths["marker_dir"],
        "--adj_mat_dir", paths["adj_mat_dir"],
        "--save_dir", os.path.join(root, "save"),
    ] + (["--do_train"] if train else []) + extra
    return train_main(args)


def test_detection_dcrnn_distance_graph(corpus):
    res = _run(corpus, ["--graph_type", "combined"])
    assert np.isfinite(res["loss"]) and "auroc" in res


def test_detection_dcrnn_correlation_graph(corpus):
    res = _run(corpus, ["--graph_type", "individual", "--top_k", "3"])
    assert np.isfinite(res["loss"]) and "auroc" in res


def test_classification_dcrnn(corpus):
    res = _run(corpus, ["--graph_type", "combined", "--num_classes", "4",
                        "--metric_name", "F1"], task="classification")
    assert np.isfinite(res["loss"]) and res["F1"] >= 0.0


def test_ssl_pretrain_then_finetune(corpus):
    paths, root = corpus
    res = _run(corpus, ["--graph_type", "combined", "--output_seq_len", "12",
                        "--metric_name", "loss", "--use_curriculum_learning"],
               task="SS pre-training")
    assert np.isfinite(res["loss"])

    # locate the SSL checkpoint and fine-tune detection from it
    save_root = os.path.join(root, "save", "train")
    runs = sorted(os.listdir(save_root))
    best = os.path.join(save_root, runs[-1], "best.npz")
    assert os.path.exists(best)
    res2 = _run(corpus, ["--graph_type", "combined", "--fine_tune",
                         "--load_model_path", best,
                         "--pretrained_num_rnn_layers", "1"])
    assert np.isfinite(res2["loss"])


def test_ssl_from_preproc_cache(corpus):
    """AOT-cache SSL clips via the preprocess CLI, then train SSL consuming
    them through --preproc_dir (reference dataloader_ssl.py:312-315)."""
    from eeg_gnn_tpu.cli.preprocess import main as preprocess_main

    paths, root = corpus
    cache = os.path.join(root, "ssl_cache")
    preprocess_main([
        "ssl", "--resampled_dir", paths["input_dir"],
        "--marker_dir", paths["marker_dir"], "--output_dir", cache,
        "--clip_len", "12",
    ])
    assert len(os.listdir(cache)) > 0
    res = _run(corpus, ["--graph_type", "combined", "--output_seq_len", "12",
                        "--metric_name", "loss", "--preproc_dir", cache],
               task="SS pre-training")
    assert np.isfinite(res["loss"])


def test_detection_lstm(corpus):
    res = _run(corpus, ["--graph_type", "combined", "--model_name", "lstm"])
    assert np.isfinite(res["loss"])


def test_classification_densecnn(corpus):
    res = _run(corpus, ["--model_name", "densecnn", "--num_classes", "4",
                        "--metric_name", "F1"], task="classification")
    assert np.isfinite(res["loss"])


def test_detection_device_pipeline(corpus):
    """Fused on-device input pipeline through the CLI (raw clips in)."""
    res = _run(corpus, ["--graph_type", "individual", "--top_k", "3",
                        "--device_pipeline", "--data_augment"])
    assert np.isfinite(res["loss"]) and "auroc" in res


def test_detection_cnnlstm(corpus):
    res = _run(corpus, ["--graph_type", "combined", "--model_name", "cnnlstm"])
    assert np.isfinite(res["loss"])


def test_finetune_from_reference_torch_checkpoint(corpus):
    """--fine_tune with a shipped reference .pth.tar transplants the SSL
    encoder diffusion weights directly (train.py:133-151 parity)."""
    ckpt = "/root/reference/pretrained/pretrained_distance_graph_12s.pth.tar"
    if not os.path.exists(ckpt):
        pytest.skip("no reference mount")
    res = _run(corpus, ["--graph_type", "combined", "--fine_tune",
                        "--load_model_path", ckpt,
                        "--pretrained_num_rnn_layers", "3",
                        "--num_rnn_layers", "2", "--rnn_units", "64",
                        "--max_diffusion_step", "2"])
    assert np.isfinite(res["loss"])


def test_eval_only_with_npz_checkpoint(corpus):
    """Eval-only mode (no --do_train) warm-starts from an .npz checkpoint
    and writes test-NN run dirs (reference train.py:166-194, utils.py:61-80)."""
    paths, root = corpus
    _run(corpus, ["--graph_type", "combined"])  # produce a checkpoint
    save_root = os.path.join(root, "save", "train")
    runs = sorted(os.listdir(save_root))
    best = os.path.join(save_root, runs[-1], "best.npz")
    assert os.path.exists(best)

    res = _run(corpus, ["--graph_type", "combined",
                        "--load_model_path", best], train=False)
    # eval-only still produced metrics and a test-NN dir
    assert np.isfinite(res["loss"])
    assert os.path.isdir(os.path.join(root, "save", "test", "test-01"))


def test_ssl_device_pipeline(corpus):
    """SSL through the fused on-device pipeline (raw clip pairs in)."""
    res = _run(corpus, ["--graph_type", "individual", "--top_k", "3",
                        "--device_pipeline", "--data_augment",
                        "--output_seq_len", "12", "--metric_name", "loss"],
               task="SS pre-training")
    assert np.isfinite(res["loss"])
