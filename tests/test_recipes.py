"""Smoke tests for the run recipes of record (configs/*.sh): every recipe's
flag set must parse and drive one tiny epoch end-to-end on the synthetic
corpus (scaled-down sizes, same flag surface). Mirrors the reference's
baseline_scripts/*.sh + README.md:66-105 hyperparameters."""

import glob
import os
import shlex

import numpy as np
import pytest

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

# flags overridden to keep the smoke run tiny (the recipe's values are the
# hyperparameters of record; sizes are what we scale down)
_OVERRIDES = {
    "--max_seq_len": "12", "--num_epochs": "1", "--num_rnn_layers": "1",
    "--rnn_units": "16", "--max_diffusion_step": "1",
    "--train_batch_size": "4", "--test_batch_size": "4",
    "--num_workers": "0", "--output_seq_len": "4",
}


def _recipe_flags(path):
    """Extract the CLI flags from a recipe script (skip env-var plumbing)."""
    with open(path) as f:
        text = f.read()
    # the python command spans continuation lines
    cmd = text.split("python -m eeg_gnn_tpu.cli.train", 1)[1]
    toks = shlex.split(cmd.replace("\\\n", " "))
    return toks


def _scaled(toks, paths, tmp):
    out = []
    i = 0
    env_map = {
        "$INPUT_DIR": paths["input_dir"], "$RAW_DATA_DIR": paths["raw_data_dir"],
        "$MARKER_DIR": paths["marker_dir"], "$ADJ_MAT_DIR": paths["adj_mat_dir"],
        "$SAVE_DIR": os.path.join(tmp, "save"),
    }
    while i < len(toks):
        t = toks[i]
        if t in _OVERRIDES and i + 1 < len(toks) and not toks[i + 1].startswith("--"):
            out += [t, _OVERRIDES[t]]
            i += 2
            continue
        out.append(env_map.get(t, t))
        i += 1
    for k, v in _OVERRIDES.items():
        if k not in out:
            out += [k, v]
    return out


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from eeg_gnn_tpu.data.synthetic import make_synthetic_corpus

    root = str(tmp_path_factory.mktemp("recipes"))
    return root, make_synthetic_corpus(root, num_files=4, file_seconds=60,
                                       clip_len=12)


@pytest.mark.parametrize("script", sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(CONFIGS, "*.sh"))))
def test_recipe_smoke(script, corpus, tmp_path):
    from eeg_gnn_tpu.cli.train import main

    root, paths = corpus
    flags = _scaled(_recipe_flags(os.path.join(CONFIGS, script)), paths,
                    str(tmp_path))
    res = main(flags)
    assert np.isfinite(res["loss"]), script


def test_all_six_baseline_recipes_exist():
    """Reference ships 6 baseline scripts (baseline_scripts/*.sh) + 3 DCRNN
    configs of record (README.md:66-105); all 9 must exist here."""
    names = {os.path.basename(p) for p in glob.glob(
        os.path.join(CONFIGS, "*.sh"))}
    expected = {
        "run_lstm.sh", "run_lstm_classification.sh", "run_cnnlstm.sh",
        "run_cnnlstm_classification.sh", "run_densecnn.sh",
        "run_densecnn_classification.sh", "run_dcrnn_detection.sh",
        "run_dcrnn_classification.sh", "run_dcrnn_ssl.sh",
    }
    assert expected <= names, expected - names
