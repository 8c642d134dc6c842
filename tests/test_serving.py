"""Serving-artifact tests: jax.export round-trip, ABI, and output parity."""

import json

import jax
import numpy as np
import pytest

from dpivae_tpu.cases import get_case
from dpivae_tpu.config import TrainConfig
from dpivae_tpu.serving import (
    SAMPLE_SLOTS,
    build_predict_fn,
    load_predictor,
    save_predictor,
)
from dpivae_tpu.train import setup_model
from dpivae_tpu.utils.data import sample_response


def _model(case_name="simple_beam", preset="dpivae"):
    case = get_case(case_name)
    cfg = TrainConfig().with_preset(case.presets[preset]).replace(
        n_train=64, n_val=16, n_test=16, n_batch=16, n_iter=5,
        n_mc_train=2, n_mc_val=2, n_mc_test=4, use_seed=True, name="srv",
    )
    data_train = sample_response(
        case, jax.random.PRNGKey(0), cfg.n_train, sample_dist=case.gt_dist()
    )
    model = setup_model(cfg, case, data_train)
    params = model.init(jax.random.PRNGKey(1))
    return case, cfg, model, params, data_train


def test_roundtrip_matches_live_model(tmp_path):
    case, cfg, model, params, data_train = _model()
    path = save_predictor(
        str(tmp_path / "beam.shlo"), model, params, cfg, case,
        outputs=("y", "zx"), platforms=("cpu",),
    )
    served = load_predictor(path)
    assert served.outputs == ("y", "zx")

    x, c = np.asarray(data_train[0][:8]), np.asarray(data_train[1][:8])
    got = served(x, c, seed=7)

    predict = build_predict_fn(model, params, cfg, outputs=("y", "zx"))
    key_data = np.asarray(
        jax.random.key_data(jax.random.PRNGKey(7)), np.uint32
    )
    want_y, want_zx = predict(key_data, x, c)
    np.testing.assert_allclose(got["y"], np.asarray(want_y), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(got["zx"], np.asarray(want_zx), rtol=1e-5,
                               atol=1e-6)


def test_batch_is_polymorphic(tmp_path):
    case, cfg, model, params, data_train = _model()
    path = save_predictor(
        str(tmp_path / "beam.shlo"), model, params, cfg, case,
        platforms=("cpu",),
    )
    served = load_predictor(path)
    for b in (1, 3, 17):
        x = np.zeros((b, case.nd_x), np.float32)
        c = np.zeros((b, case.nd_c), np.float32)
        out = served(x, c)
        assert out["y"].shape == (b, case.nd_y)
        assert np.isfinite(out["y"]).all()


def test_meta_sidecar_contract(tmp_path):
    case, cfg, model, params, _ = _model()
    path = save_predictor(
        str(tmp_path / "beam.shlo"), model, params, cfg, case,
        platforms=("cpu",), n=2,
    )
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    assert meta["case"] == "simple_beam"
    assert meta["case_fingerprint"] == case.fingerprint()
    assert meta["n_mc"] == 2
    assert meta["nd_x"] == case.nd_x
    assert [i["name"] for i in meta["inputs"]] == ["key_data", "x", "c"]
    # config snapshot restores
    assert meta["config"]["name"] == "srv"


def test_bridge_cond_export_roundtrip(tmp_path):
    """The hardest export path: bridge's frozen MLP physics surrogate baked
    into the artifact as constants, the idx_c_phys covariate concat, and the
    cond=True prior-net sampling branch."""
    case, cfg, model, params, data_train = _model("bridge", "dpivae")
    path = save_predictor(
        str(tmp_path / "bridge.shlo"), model, params, cfg, case,
        cond=True, platforms=("cpu",),
    )
    served = load_predictor(path)

    x, c = np.asarray(data_train[0][:6]), np.asarray(data_train[1][:6])
    got = served(x, c, seed=11)
    predict = build_predict_fn(model, params, cfg, cond=True)
    key_data = np.asarray(
        jax.random.key_data(jax.random.PRNGKey(11)), np.uint32
    )
    (want_y,) = predict(key_data, x, c)
    np.testing.assert_allclose(got["y"], np.asarray(want_y), rtol=1e-5,
                               atol=1e-6)


def test_unknown_output_rejected(tmp_path):
    case, cfg, model, params, _ = _model()
    with pytest.raises(ValueError, match="unknown outputs"):
        build_predict_fn(model, params, cfg, outputs=("nope",))


def test_prng_impl_cross_process_serving(tmp_path):
    """The artifact records its PRNG impl; a serving host whose process
    default differs (DPIVAE_PRNG=rbg) still constructs matching keys via
    seed=, and a wrong-impl explicit key fails loudly."""
    case, cfg, model, params, _ = _model()
    path = save_predictor(
        str(tmp_path / "beam.shlo"), model, params, cfg, case,
        platforms=("cpu",), n=2,
    )
    served = load_predictor(path)
    assert served.meta["prng_impl"] == "threefry2x32"
    x = np.zeros((2, case.nd_x), np.float32)
    c = np.zeros((2, case.nd_c), np.float32)

    rbg_key = jax.random.key(0, impl="rbg")
    with pytest.raises(ValueError, match="PRNG impl"):
        served(x, c, key=rbg_key)

    want = served(x, c, seed=3)["y"]
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        got = served(x, c, seed=3)["y"]  # seed= follows the artifact impl
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    np.testing.assert_allclose(got, want)


def test_slot_names_cover_sample_tuple():
    # model.sample returns a 9-tuple; dens_z (8) is intentionally unnamed.
    assert sorted(SAMPLE_SLOTS.values()) == list(range(8))


@pytest.mark.slow
def test_http_serving_host(tmp_path):
    """examples/serve_http.py serves an exported artifact over HTTP."""
    import os
    import subprocess
    import sys
    import time
    import urllib.error
    import urllib.request

    case, cfg, model, params, data_train = _model()
    path = save_predictor(
        str(tmp_path / "srv.shlo"), model, params, cfg, case,
        platforms=("cpu",), n=2,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "examples", "serve_http.py"),
         "--artifact", path, "--port", "0"],
        env=env, stdout=subprocess.PIPE, text=True,
    )
    try:
        line = proc.stdout.readline()  # "serving ... on http://host:port"
        url = line.strip().rsplit(" ", 1)[-1]
        assert url.startswith("http://")

        def call(route, payload=None, retries=20):
            for i in range(retries):
                try:
                    if payload is None:
                        req = urllib.request.Request(url + route)
                    else:
                        req = urllib.request.Request(
                            url + route, data=json.dumps(payload).encode(),
                            headers={"Content-Type": "application/json"},
                        )
                    with urllib.request.urlopen(req, timeout=30) as r:
                        return r.status, json.loads(r.read())
                except urllib.error.HTTPError as e:
                    return e.code, json.loads(e.read())
                except (urllib.error.URLError, ConnectionError):
                    if i == retries - 1:
                        raise
                    time.sleep(0.5)

        status, meta = call("/meta")
        assert status == 200 and meta["nd_x"] == case.nd_x

        x = np.zeros((3, case.nd_x), np.float32).tolist()
        c = np.zeros((3, case.nd_c), np.float32).tolist()
        status, out = call("/predict", {"x": x, "c": c, "seed": 1})
        assert status == 200
        assert np.asarray(out["y"]).shape == (3, case.nd_y)

        # malformed request -> 400 with an error message, server stays up
        status, err = call("/predict", {"x": x})
        assert status == 400 and "c" in err["error"]
        status, err = call("/predict", {"x": [[1.0]], "c": c})
        assert status == 400
        assert "batch" in err["error"] or "columns" in err["error"]

        status, out = call("/predict", {"x": x, "c": c})
        assert status == 200

        # Concurrency: the host is a ThreadingHTTPServer and the predictor
        # call is pure — N simultaneous requests (mixed batch sizes) must
        # all succeed and return exactly the single-client answer. (The
        # want-building pass above already compiled all three batch
        # shapes, so this phase exercises warm-path thread safety; the
        # cold-jit race is covered by the in-process predictor test.)
        from concurrent.futures import ThreadPoolExecutor

        payloads = [
            {
                "x": np.full((b, case.nd_x), 0.1 * b, np.float32).tolist(),
                "c": np.zeros((b, case.nd_c), np.float32).tolist(),
                "seed": b,
            }
            for b in (1, 2, 5, 1, 2, 5, 1, 2, 5, 1, 2, 5)
        ]
        want = {b: call("/predict", p)[1]["y"]
                for b, p in {p["seed"]: p for p in payloads}.items()}
        with ThreadPoolExecutor(max_workers=6) as pool:
            results = list(pool.map(
                lambda p: (p["seed"], call("/predict", p)), payloads
            ))
        for seed, (status, out) in results:
            assert status == 200
            np.testing.assert_array_equal(
                np.asarray(out["y"]), np.asarray(want[seed])
            )
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_served_predictor_thread_safety(tmp_path):
    """ServedPredictor is safe under concurrent callers: simultaneous calls
    (including races on the first jit of a new batch shape) return exactly
    the single-threaded answers. This is the in-process guarantee the
    threaded HTTP host (examples/serve_http.py) relies on."""
    from concurrent.futures import ThreadPoolExecutor

    case, cfg, model, params, _ = _model()
    path = save_predictor(
        str(tmp_path / "beam.shlo"), model, params, cfg, case,
        platforms=("cpu",), n=2,
    )
    served = load_predictor(path)

    def job(spec):
        b, seed = spec
        x = np.full((b, case.nd_x), 0.05 * seed, np.float32)
        c = np.zeros((b, case.nd_c), np.float32)
        return served(x, c, seed=seed)["y"]

    specs = [(b, seed) for b in (1, 4, 9) for seed in (0, 1, 2, 3)]
    want = {s: job(s) for s in specs}

    # Fresh predictor so the first jit of every batch shape happens UNDER
    # the concurrent load, not in the warm-up above.
    served = load_predictor(path)
    with ThreadPoolExecutor(max_workers=8) as pool:
        got = list(pool.map(job, specs * 3))
    for spec, y in zip(specs * 3, got):
        np.testing.assert_array_equal(y, want[spec])


def test_use_pallas_model_exports_via_xla_path(tmp_path):
    """A use_pallas model exports (the kernel cannot lower for the
    multi-platform artifact) by swapping to the XLA decode path — value-
    identical by the kernel's parity contract, so served outputs match a
    plain model's artifact exactly. With use_pallas='auto' as the config
    default, win-band models must stay exportable."""
    import dataclasses

    case, cfg, model, params, data_train = _model()
    m_pallas = dataclasses.replace(model, use_pallas=True)
    p_a = save_predictor(str(tmp_path / "a.shlo"), m_pallas, params, cfg,
                         case, platforms=("cpu",))
    p_b = save_predictor(str(tmp_path / "b.shlo"), model, params, cfg,
                         case, platforms=("cpu",))
    sa, sb = load_predictor(p_a), load_predictor(p_b)
    x, c = np.asarray(data_train[0][:4]), np.asarray(data_train[1][:4])
    np.testing.assert_array_equal(sa(x, c, seed=3)["y"],
                                  sb(x, c, seed=3)["y"])
