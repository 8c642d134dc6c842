"""Bit-rot guards for the round-4/5 measurement scripts.

benchmarks/experiments/{scaled_arms,pallas_repeat,sweep_pallas,sweep_mc_chunk}.py back
committed performance claims (docs/PERFORMANCE.md "Attacking the roof" /
"The Pallas verdict") and are rerun rarely, on real TPU hardware — an API
drift would otherwise surface only mid-way through a 45-minute TPU run.
These tests exercise their measurement cores at tiny shapes on CPU (the
pallas arm falls back to the XLA path off-TPU via ``_eligible`` — the
*plumbing* is what's guarded here, not kernel lowering) plus the pure
helpers (HLO census, cell-label parsing).
"""

import importlib.util
import os

import numpy as np
import pytest

_EXP = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                    "experiments")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EXP, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_cell_labels():
    scaled_arms = _load("scaled_arms")
    pallas_repeat = _load("pallas_repeat")
    for mod in (scaled_arms, pallas_repeat):
        assert mod._parse_cell("w512_b1024_mc64") == (512, 1024, 64)
        with pytest.raises(ValueError):
            mod._parse_cell("w512_b1024")


def test_top_hlo_shapes_census():
    """Defining occurrences are counted (operand repeats are not) and
    sub-MB tensors are filtered — the invariants the spill diagnosis in
    scaled_arms.json rests on."""
    scaled_arms = _load("scaled_arms")
    hlo = "\n".join([
        # two defs of the same 4 MB shape; one re-use as an operand
        "  %a = f32[1024,1024]{1,0} parameter(0)",
        "  %b = f32[1024,1024]{1,0} add(f32[1024,1024] %a, "
        "f32[1024,1024] %a)",
        # a 2 MB bf16 def
        "  %c = bf16[1024,1024]{1,0} convert(f32[1024,1024] %b)",
        # sub-MB: must be filtered
        "  %d = f32[16,16]{1,0} multiply(f32[16,16] %x, f32[16,16] %y)",
    ])
    rows = {r["shape"]: r for r in scaled_arms.top_hlo_shapes(hlo)}
    assert rows["f32[1024,1024]"]["defs"] == 2
    assert rows["f32[1024,1024]"]["bytes_mb"] == 4.0
    assert rows["f32[1024,1024]"]["total_mb"] == 8.0
    assert rows["bf16[1024,1024]"]["defs"] == 1
    assert rows["bf16[1024,1024]"]["bytes_mb"] == 2.0
    assert "f32[16,16]" not in rows


def test_merge_results_unions_arms_and_recomputes_speedups():
    """Arms-only reruns merge into the committed scaled_arms.json without
    dropping rows; speedups re-anchor on the merged cell's f32 row."""
    scaled_arms = _load("scaled_arms")
    old = {"meta": {"n_iter": 500}, "cells": [
        {"config": "w512_b1024_mc64",
         "arms": {"f32": {"steps_per_sec": 100.0},
                  "bf16": {"steps_per_sec": 150.0,
                           "speedup_vs_f32": 1.5}}},
        {"config": "w256_b1024_mc64", "arms": {"f32": {"steps_per_sec": 50.0}}},
    ]}
    new = {"meta": {"n_iter": 500, "fresh": True}, "cells": [
        {"config": "w512_b1024_mc64",
         "arms": {"f32": {"steps_per_sec": 110.0},
                  "mc8": {"steps_per_sec": 220.0}}},
    ]}
    out = scaled_arms.merge_results(old, new)
    assert out["meta"]["fresh"] is True
    cells = {c["config"]: c for c in out["cells"]}
    assert set(cells) == {"w512_b1024_mc64", "w256_b1024_mc64"}
    arms = cells["w512_b1024_mc64"]["arms"]
    # union: kept bf16, replaced f32, added mc8; speedups re-anchored
    assert set(arms) == {"f32", "bf16", "mc8"}
    assert arms["f32"]["steps_per_sec"] == 110.0
    assert arms["mc8"]["speedup_vs_f32"] == 2.0
    assert arms["bf16"]["speedup_vs_f32"] == round(150.0 / 110.0, 3)


@pytest.mark.slow
def test_pallas_repeat_measure_one_tiny():
    """Both arms of the single-run repeat protocol compile and time at a
    tiny widened cell; the row carries the merge keys scaling.json's
    "repeats" consumers expect."""
    pallas_repeat = _load("pallas_repeat")
    row = pallas_repeat.measure_one("w32_b8_mc2", n_iter=2,
                                    case_name="damped_oscillator")
    assert row["config"] == "w32_b8_mc2"
    assert (row["hidden_width"], row["n_batch"], row["n_mc_train"],
            row["decoder_rows"]) == (32, 8, 2, 16)
    for arm in ("xla", "pallas"):
        assert row[f"{arm}_steps_per_sec"] > 0
        assert np.isfinite(row[f"{arm}_step_us"])
    assert row["pallas_speedup"] > 0


@pytest.mark.slow
def test_sweep_pallas_measure_cell_tiny():
    """Both arms of the vmapped chunk program (what train_sweep runs)
    compile and time at a 2-member tiny cell; the row carries the keys
    sweep_pallas.json's resolver citation rests on."""
    import jax

    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig

    sweep_pallas = _load("sweep_pallas")
    case = get_case("damped_oscillator")
    base_cfg = (
        TrainConfig()
        .with_preset(case.presets["dpivae"])
        .replace(use_seed=True, patience=10**9,
                 n_batch=8, n_mc_train=2, n_train=64, n_val=32)
    )
    row = sweep_pallas.measure_cell(case, base_cfg, chunk=2, width=0,
                                    n_iter=2)
    assert row["chunk"] == 2 and row["hidden_width"] is None
    assert row["rows_per_member"] == 16
    assert row["effective_rows"] == 32
    for arm in ("xla", "pallas"):
        assert row[f"{arm}_member_steps_per_sec"] > 0
        assert row[f"{arm}_compile_s"] >= 0
    assert row["pallas_speedup"] > 0


@pytest.mark.slow
def test_sweep_mc_chunk_measure_cell_tiny():
    """All three mc_chunk arms of the vmapped chunk program compile and
    time at a 2-member tiny cell (chunk8 degenerates to a length-1 scan
    at n_mc=8 — the plumbing, not the cliff, is what's guarded); the row
    carries the keys sweep_mc_chunk.json's resolver rule rests on."""
    from dpivae_tpu.cases import get_case
    from dpivae_tpu.config import TrainConfig

    sweep_mc_chunk = _load("sweep_mc_chunk")
    case = get_case("damped_oscillator")
    base_cfg = (
        TrainConfig()
        .with_preset(case.presets["dpivae"])
        .replace(use_seed=True, patience=10**9, n_train=64, n_val=32,
                 n_mc_val=8)
    )
    row = sweep_mc_chunk.measure_cell(
        case, base_cfg, "tiny", (2, 8, 8, 0), n_iter=2)
    assert row["cell"] == "tiny" and row["hidden_width"] is None
    assert row["members"] == 2 and row["rows_per_member"] == 64
    for arm in ("single", "chunk8", "chunk8_bf16"):
        assert row[f"{arm}_member_steps_per_sec"] > 0
        assert row[f"{arm}_compile_s"] >= 0
    assert row["chunk8_speedup"] > 0
    assert row["chunk8_bf16_speedup"] > 0
