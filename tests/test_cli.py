"""CLI-level tests: train_bnn n_chains>1 dispatch (per-chain run dirs,
eval_bnn compatibility) and the sweep_tempering end-to-end artifact
contract (per-chain dirs + collect_runs round-trip)."""
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "experiments" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def small_random_data(monkeypatch):
    "shrink the `random` dataset so CLI runs finish in seconds"
    from bnn_priors_tpu import exp_utils
    from bnn_priors_tpu.data import RandomData
    real = exp_utils.get_data

    def fake(name, *a, **kw):
        if name == "random":
            return RandomData(dim=4, n_points=96, seed=0)
        return real(name, *a, **kw)
    monkeypatch.setattr(exp_utils, "get_data", fake)


def test_train_bnn_multichain_dispatch(tmp_path, small_random_data):
    """`n_chains>1` reaches MultiChainRunnerReject from the paper CLI:
    per-chain run dirs with the full artifact contract, per-chain +
    pooled results, and eval_bnn reproducing a chain's result from its
    dir unchanged (VERDICT r2 item 3)."""
    train_bnn = _load("train_bnn")
    eval_bnn = _load("eval_bnn")

    cfg = dict(train_bnn.DEFAULTS)
    cfg.update(data="random", model="densenet", inference="VerletSGLDReject",
               reject_samples=True, n_chains=2, cycles=2, warmup=1, burnin=0,
               n_samples=4, skip=1, skip_first=0, batch_size=16, lr=1e-3,
               metrics_skip=1, device="cpu", progressbar=False,
               log_dir=str(tmp_path / "logs"))
    summary = train_bnn.main(cfg)

    assert len(summary["chains"]) == 2
    assert summary["n_diverged"] == 0
    assert {"lp_ensemble", "acc_ensemble"} <= set(summary["pooled"])
    for c, d in enumerate(summary["chain_dirs"]):
        d = Path(d)
        for artifact in ("config.json", "run.json", "samples.pt",
                         "metrics.h5"):
            assert (d / artifact).exists(), (c, artifact)
        chain_cfg = json.loads((d / "config.json").read_text())
        assert chain_cfg["chain_index"] == c
        rj = json.loads((d / "run.json").read_text())
        assert rj["status"] == "COMPLETED"
        assert "acceptance" in rj["result"]

    # eval_bnn re-evaluates a chain dir unchanged and matches its result
    ecfg = dict(eval_bnn.DEFAULTS)
    ecfg.update(config_file=str(Path(summary["chain_dirs"][0]) /
                                "config.json"),
                skip_first=0, device="cpu",
                log_dir=str(tmp_path / "logs_eval"))
    res = eval_bnn.main(ecfg)
    np.testing.assert_allclose(res["lp_ensemble"],
                               summary["chains"][0]["lp_ensemble"],
                               rtol=1e-6)
    np.testing.assert_allclose(res["acc_ensemble"],
                               summary["chains"][0]["acc_ensemble"],
                               rtol=1e-6)


@pytest.fixture()
def small_fake_mnist(monkeypatch):
    "tiny FakeMNIST pair (same 784-dim inputs) for train + OOD eval"
    from bnn_priors_tpu import exp_utils
    from bnn_priors_tpu.data import FakeMNIST
    real = exp_utils.get_data

    def fake(name, *a, **kw):
        if name == "fake_mnist":
            return FakeMNIST(n_train=64, n_test=32, seed=0)
        if name == "fashion_mnist":  # stand-in OOD set, same input shape
            return FakeMNIST(n_train=64, n_test=32, seed=7)
        return real(name, *a, **kw)
    monkeypatch.setattr(exp_utils, "get_data", fake)


def test_train_eval_calibration_ood_pipeline(tmp_path, small_fake_mnist):
    """The reference's full eval contract end-to-end (VERDICT r2 'weak'):
    train via the paper CLI, then eval_bnn surfaces ece/ace/rmsce via
    calibration_eval and auroc/auprc via ood_eval (reference
    exp_utils.py:329-339, eval_bnn.py:120-124)."""
    train_bnn = _load("train_bnn")
    eval_bnn = _load("eval_bnn")

    cfg = dict(train_bnn.DEFAULTS)
    cfg.update(data="fake_mnist", model="classificationdensenet",
               inference="SGLD", width=8, depth=3, cycles=1, warmup=0,
               burnin=0, n_samples=3, skip=1, skip_first=0, batch_size=32,
               lr=1e-3, metrics_skip=1, device="cpu", progressbar=False,
               log_dir=str(tmp_path / "logs"))
    train_bnn.main(cfg)
    run_dirs = [d for d in (tmp_path / "logs").iterdir()
                if (d / "config.json").exists()]
    assert len(run_dirs) == 1

    ecfg = dict(eval_bnn.DEFAULTS)
    ecfg.update(run_dir=str(run_dirs[0]), skip_first=0, device="cpu",
                calibration_eval=True, log_dir=str(tmp_path / "ev_cal"))
    res = eval_bnn.main(ecfg)
    assert {"ece", "ace", "rmsce", "lp_ensemble", "acc_ensemble"} <= set(res)
    assert 0.0 <= res["ece"] <= 1.0 and 0.0 <= res["rmsce"] <= 1.0

    ocfg = dict(eval_bnn.DEFAULTS)
    ocfg.update(run_dir=str(run_dirs[0]), skip_first=0, device="cpu",
                eval_data="fashion_mnist", ood_eval=True,
                log_dir=str(tmp_path / "ev_ood"))
    ores = eval_bnn.main(ocfg)
    assert {"auroc", "auprc"} <= set(ores)
    assert 0.0 <= ores["auroc"] <= 1.0 and 0.0 <= ores["auprc"] <= 1.0


def test_sweep_tempering_end_to_end(tmp_path, small_random_data):
    """sweep_tempering with a toy 2-temperature x 2-replicate grid: one
    run dir per chain, results per (temperature, replicate), and
    notebook_utils.collect_runs round-trips the grid (VERDICT r2 item
    10)."""
    sweep = _load("sweep_tempering")
    from bnn_priors_tpu import notebook_utils

    cfg = dict(sweep.DEFAULTS)
    cfg.update(data="random", model="densenet", inference="VerletSGLDReject",
               temperatures=[0.01, 1.0], replicates=2, cycles=2, warmup=1,
               burnin=0, n_samples=4, skip=1, skip_first=0, batch_size=16,
               lr=1e-3, device="cpu", progressbar=False, n_devices=4,
               log_dir=str(tmp_path / "sweep"))
    results = sweep.main(cfg)
    assert len(results) == 4
    temps = sorted(r["temperature"] for r in results)
    assert temps == [0.01, 0.01, 1.0, 1.0]
    assert all("lp_ensemble" in r and "acceptance" in r for r in results)

    df = notebook_utils.collect_runs(tmp_path / "sweep")
    assert len(df) == 4
    assert set(df["temperature"]) == {0.01, 1.0}
    assert set(df["replicate"]) == {0, 1}
    assert "result.lp_ensemble" in df.columns
    # each run dir carries the full artifact contract
    for d in (tmp_path / "sweep").iterdir():
        if d.is_dir():
            assert (d / "samples.pt").exists()
            assert (d / "metrics.h5").exists()


def test_train_sgd_baseline_artifact_contract(tmp_path):
    """train_sgd.py (reference experiments/train_sgd.py): tiny run writes
    the full artifact contract and a COMPLETED result."""
    import subprocess
    out = subprocess.run(
        [sys.executable, str(REPO / "experiments" / "train_sgd.py"),
         "--data", "random", "--model", "densenet", "--width", "8",
         "--n_epochs", "3", "--epochs_per_sample", "1", "--skip_first", "1",
         "--batch_size", "64", "--lr", "0.01", "--device", "cpu",
         "--log_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    for artifact in ("config.json", "run.json", "samples.pt", "metrics.h5"):
        assert (tmp_path / artifact).exists(), artifact
    rj = json.loads((tmp_path / "run.json").read_text())
    assert rj["status"] == "COMPLETED"
    assert "lp_ensemble" in rj["result"]
    cfgj = json.loads((tmp_path / "config.json").read_text())
    assert cfgj["temperature"] == 0.0


def test_sweep_partitioned_bank(tmp_path, small_random_data):
    """max_chains_per_program: an oversized bank runs as sequential
    programs (the transport's ~60s single-dispatch watchdog, PERF.md r5)
    with identical per-chain artifacts and results."""
    sweep = _load("sweep_tempering")

    cfg = dict(sweep.DEFAULTS)
    cfg.update(data="random", model="densenet", inference="VerletSGLDReject",
               temperatures=[0.01, 1.0], replicates=3, cycles=2, warmup=1,
               burnin=0, n_samples=2, skip=1, skip_first=0, batch_size=16,
               lr=1e-3, device="cpu", progressbar=False, n_devices=1,
               max_chains_per_program=4,  # 6 chains -> 2 programs of 3
               log_dir=str(tmp_path / "sweep_part"))
    results = sweep.main(cfg)
    assert len(results) == 6
    assert sorted(r["temperature"] for r in results) == [0.01] * 3 + [1.0] * 3
    assert all("acceptance" in r for r in results)
    n_dirs = sum(1 for d in (tmp_path / "sweep_part").iterdir()
                 if d.is_dir())
    assert n_dirs == 6
    for d in (tmp_path / "sweep_part").iterdir():
        if d.is_dir():
            assert (d / "samples.pt").exists()
            assert (d / "metrics.h5").exists()
