"""Example scripts stay runnable (scaled down via CG_EXAMPLE_SCALE)."""

import os
import runpy
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(example, tmp_path, extra_env=None):
    env = dict(os.environ)
    env["CG_EXAMPLE_SCALE"] = "500"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    env["CG_FORCE_CPU"] = "1"
    if extra_env:
        env.update(extra_env)
    script = os.path.join(REPO, "examples", example)
    # prepend a platform override (examples run on whatever backend the
    # user has; tests pin CPU)
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            f"exec(open(r'{script}').read())")
    res = subprocess.run([sys.executable, "-c", code], cwd=tmp_path, env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    return res


@pytest.mark.slow
def test_single_cluster_example(tmp_path):
    res = _run("single_cluster.py", tmp_path)
    assert (tmp_path / "single_cluster_ic.h5").exists()
    assert "HSE residual" in res.stdout


@pytest.mark.slow
def test_binary_merger_example(tmp_path):
    _run("single_cluster.py", tmp_path)
    res = _run("binary_merger.py", tmp_path)
    assert (tmp_path / "merger_ic.h5").exists()
    assert (tmp_path / "merger_B.h5").exists()


@pytest.mark.slow
def test_ensemble_example(tmp_path):
    res = _run("ensemble.py", tmp_path)
    assert "built" in res.stdout and "clusters" in res.stdout


@pytest.mark.slow
def test_train_on_catalog_example(tmp_path):
    """The datagen-consumption loop: catalog -> shuffled prefetched
    batches -> jitted optax training step; the loss must improve."""
    pytest.importorskip("optax")  # optional extra: pip install .[examples]
    res = _run("train_on_catalog.py", tmp_path)
    assert "improved" in res.stdout and "NOT improved" not in res.stdout


def test_bench_smoke(tmp_path):
    """bench.py stays runnable and emits exactly one valid JSON line."""
    import json

    env = dict(os.environ)
    env["BENCH_SMOKE"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            f"exec(open(r'{os.path.join(REPO, 'bench.py')}').read())")
    res = subprocess.run([sys.executable, "-c", code], cwd=tmp_path, env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, res.stdout
    rec = json.loads(lines[0])
    # the driver contract is these four keys; bench.py may add
    # informational extras (aot, first_run_s)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["unit"] == "s" and rec["value"] > 0


@pytest.mark.slow
def test_bench_configs_smoke(tmp_path):
    """benchmarks/bench_configs.py covers BASELINE configs 1-3, 5 and the
    512^3 field: runnable, one valid JSON line per config."""
    import json

    env = dict(os.environ)
    env["BENCH_SMOKE"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    script = os.path.join(REPO, "benchmarks", "bench_configs.py")
    code = ("import sys; sys.argv=['bench_configs.py','all'];"
            "import jax; jax.config.update('jax_platforms','cpu');"
            f"g={{'__file__': r'{script}', '__name__': '__main__'}};"
            f"exec(open(r'{script}').read(), g)")
    res = subprocess.run([sys.executable, "-c", code], cwd=tmp_path, env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    metrics = set()
    for ln in lines:
        rec = json.loads(ln)
        assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
        assert rec["unit"] == "s" and rec["value"] > 0
        metrics.add(rec["metric"].split("_")[0])
    # every named config must report exactly once; new configs extend the
    # set (cfg1-3, cfg5/5b/5c, cfg6 merger scenes, 512^3 field)
    assert metrics == {"cfg1", "cfg2", "cfg3", "cfg5", "cfg5b", "cfg5c",
                       "cfg6", "field"}
    assert len(lines) == len(metrics), res.stdout


@pytest.mark.slow
def test_multichip_export_example(tmp_path):
    res = _run("multichip_export.py", tmp_path)
    assert "wrote 8 Gadget shard files" in res.stdout
    assert (tmp_path / "merger_ic.0.h5").exists()
    assert (tmp_path / "merger_ic.7.h5").exists()
    assert "reassembled" in res.stdout
