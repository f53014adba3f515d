"""Committed benchmark artifacts stay self-consistent.

These gate the *artifacts* (regenerated on the TPU host by their
benchmarks), not the hardware: regressions that silently weaken a claimed
result — a bf16 quality gap drifting past the round-2 verdict's 0.01
AUROC bound, or kernel-parity errors past the bench gate — fail here.
"""

import json
import os

import pytest

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "benchmarks")


def _load(name):
    path = os.path.join(BENCH_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated yet")
    with open(path) as f:
        return json.load(f)


def test_bf16_quality_artifact():
    """bf16 flagship training converges like f32 (verdict r2 item 4):
    test-AUROC gap <= 0.01 and both runs clearly above chance."""
    art = _load("bf16_quality_results.json")
    f32, bf16 = art["float32"], art["bfloat16"]
    assert art["test_auroc_gap"] <= 0.01
    assert abs(f32["test"]["auroc"] - bf16["test"]["auroc"]) == pytest.approx(
        art["test_auroc_gap"], abs=1e-6)
    for run in (f32, bf16):
        assert run["test"]["auroc"] >= 0.80, "flagship recipe must learn"
        # dev curves actually descend (training happened, not a stub)
        losses = run["curves"]["dev_loss"]
        assert len(losses) >= 10 and min(losses) < losses[0]


def test_tpu_kernel_parity_artifact():
    """Compiled-Mosaic vs stacked-XLA parity errors stay inside the same
    bounds bench.py's check_gate enforces on the chip."""
    art = _load("tpu_kernel_parity.json")
    assert art["backend"] == "tpu"
    assert len(art["cases"]) >= 4
    for case in art["cases"]:
        bf16 = case["config"]["bf16"]
        # xin + decoder cases run extra in-kernel dot layers per step vs
        # their oracles' schedules (more bf16-MXU-pass associativity)
        fused = (case["config"].get("xin", False)
                 or case["config"].get("decoder", False))
        tol = 2e-2 if bf16 else (8e-3 if fused else 5e-3)
        for name, err in case["errors"].items():
            assert err["rel"] <= tol, (case["name"], name, err)


def test_e2e_pipeline_artifact():
    """The HBM-cache path must sustain most of the step-only ceiling
    end-to-end and beat the streaming loader by >=20x on this link-bound
    host. Thresholds: bf16 (the declared point of record) >= 0.55;
    f32 >= 0.45 — each perf round grows the step-only DENOMINATOR faster
    than the dispatch-bound cached loop (round 5: 19.5k bf16 / 17.0k f32
    ceilings vs round 4's 17.6k / 14.5k) while ABSOLUTE cached
    throughput also keeps improving (bf16 11.6k vs 11.4k, f32 8.4k vs
    7.6k), so the ratio drops are a faster ceiling, not a slower
    pipeline; the traced device-side cache overhead is 2% — the residual
    is axon-tunnel per-dispatch host overhead that a co-located host
    does not pay (NOTES.md 'End-to-end input pipeline')."""
    art = _load("e2e_pipeline_results.json")
    assert art["h2d_sync_GBps"] > 0
    for dtype, floor in (("bfloat16", 0.55), ("float32", 0.45)):
        r = art[dtype]
        assert r["hbm_cache_efficiency"] >= floor
        assert (r["hbm_cache_clips_per_s"]
                >= 20 * r["clipstore_features_clips_per_s"])
        assert r["step_only_clips_per_s"] > 0


def test_ssl_efficacy_artifact():
    """SSL pre-training must demonstrably help downstream detection
    (verdict r3 item 2): with identical budgets, fine-tune >= from-scratch
    on test AUROC (small noise allowance), and the fine-tuned arm reaches
    the from-scratch run's FINAL dev AUROC in at most half the epochs."""
    art = _load("ssl_efficacy_results.json")
    ft, scratch = art["finetune"], art["scratch"]
    assert ft["test"]["auroc"] >= scratch["test"]["auroc"] - 0.005
    reach = art["ft_epochs_to_reach_scratch_final"]
    assert reach is not None
    assert reach <= art["protocol"]["budget_epochs"] / 2
    # both arms really trained (curves move, budget respected)
    for arm in (ft, scratch):
        assert len(arm["dev_auroc"]) == art["protocol"]["budget_epochs"]
        assert max(arm["dev_auroc"]) > 0.6


def test_rotating_cache_artifact():
    """The beyond-HBM rotating cache must sit near whichever wall binds
    (compute ceiling or H2D link roofline): overlap efficiency >= 0.6,
    replacing the round-3 streaming cliff (~1% of ceiling)."""
    art = _load("rotating_cache_results.json")
    assert art["config"]["shards"] >= 2
    assert art["overlap_efficiency"] >= 0.60
    assert art["rotating_clips_per_s"] > 0


def test_baseline_models_artifact():
    """Baseline-model perf evidence outside the DCRNN family (VERDICT r4
    #8): the jitted LSTM train step at the flagship shape must beat the
    executing torch-CPU reference by a wide margin (measured 114x)."""
    art = _load("baseline_models_results.json")
    ours = art["float32"]["clips_per_s"]
    ref = art["reference_torch_cpu"]["clips_per_s"]
    assert ref > 0 and ours >= 20 * ref


def test_serving_artifact():
    """The deployable Predictor's fused raw->probability program must
    sustain serving-grade throughput once inputs are device-resident
    (the link-bound figures carry the transport diagnosis in the note);
    B=1 latency is recorded."""
    art = _load("serving_results.json")
    assert art["raw_b256_device_resident_clips_per_s"] >= 1000
    assert art["raw_b1_latency_ms"] > 0
    assert art["featurized_b256_clips_per_s"] > 0


def test_baseline_family_coverage():
    """Every non-DCRNN model family has a recorded speedup over the
    executing torch-CPU reference (round-5 extension of the LSTM entry)."""
    art = _load("baseline_models_results.json")
    for fam in ("cnnlstm", "densecnn"):
        assert art[fam]["clips_per_s"] > 0
        assert art[fam]["speedup_vs_reference"] >= 20
