"""The scaling-study plot script renders from a scaling.json (smoke:
series selection, faceting by MC, and file output — Agg backend)."""

import importlib.util
import json
import os

import matplotlib

matplotlib.use("Agg")


def _load_plot_scaling():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "experiments", "plot_scaling.py",
    )
    spec = importlib.util.spec_from_file_location("plot_scaling", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plot_scaling_renders(tmp_path, monkeypatch):
    mod = _load_plot_scaling()
    rows = []
    for w in (128, 1024):
        for b in (64, 1024):
            for mc in (16, 64):
                rows.append({
                    "config": f"w{w}_b{b}_mc{mc}",
                    "hidden_width": w, "n_batch": b, "n_mc_train": mc,
                    "mxu_utilization": w * b * mc / (1024 * 1024 * 64),
                })
    rows.append({"config": "w512_b64_mc16", "error": "boom"})  # skipped
    src = tmp_path / "scaling.json"
    src.write_text(json.dumps({"train": rows, "micro": []}))
    out = tmp_path / "scaling_mxu.png"

    monkeypatch.setattr(
        "sys.argv",
        ["plot_scaling.py", "--json", str(src), "--out", str(out)],
    )
    mod.main()
    assert out.exists() and out.stat().st_size > 10_000  # a real PNG

    # the committed artifact was produced by this script from the
    # committed data — keep both present together
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    committed_json = os.path.join(repo, "benchmarks", "results",
                                  "scaling.json")
    committed_png = os.path.join(repo, "benchmarks", "results",
                                 "scaling_mxu.png")
    assert os.path.exists(committed_json) == os.path.exists(committed_png)
