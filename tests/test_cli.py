"""CLI smoke tests: trainer and predictor end-to-end as subprocesses (CPU).

The CLIs are the reference's user-facing surface (rpn_trainer.py /
rpn_predictor.py — SURVEY.md §2 rows 1-2); run them for real with tiny
settings so argument plumbing, checkpoint save/restore, and the drawn-output
path are covered.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, *args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # no effect vs sitecustomize; belt+braces
    cmd = [
        sys.executable,
        "-c",
        # force CPU despite the axon sitecustomize (same trick as conftest)
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = ['{script}'] + {list(args)!r};"
        f"exec(open('{os.path.join(REPO, script)}').read())",
    ]
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO
    )


@pytest.mark.slow
def test_trainer_then_predictor_roundtrip(tmp_path):
    out_dir = str(tmp_path / "trained")
    r = run_cli(
        "rpn_trainer.py",
        "--backbone", "mobilenet_v2", "--img-size", "64", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "2",
        "--output-dir", out_dir, "--learning-rate", "0.001",
        "--eval-recall-every", "1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "saved best checkpoint" in r.stdout
    # --eval-recall-every: the north-star metric surfaces from the trainer
    assert "val_recall@300=" in r.stdout
    ckpt = os.path.join(out_dir, "rpn_mobilenet_v2")
    assert os.path.isdir(ckpt)

    r2 = run_cli(
        "rpn_predictor.py",
        "--backbone", "mobilenet_v2", "--img-size", "64", "--batch-size", "2",
        "--weights", ckpt, "--output-dir", out_dir, "--fast",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "proposal recall@300" in r2.stdout
    # --fast needs a TPU; on the CPU test backend it must warn and fall back
    assert "ignoring" in r2.stdout
    assert os.path.exists(os.path.join(out_dir, "proposals_mobilenet_v2.png"))


@pytest.mark.slow
def test_trainer_device_data_mode(tmp_path):
    """--device-data trains through the scanned device-resident path: same
    epoch/checkpoint surface, plus the resident-data banner; and the
    incompatible-flag combinations fail loudly."""
    out_dir = str(tmp_path / "trained")
    common = (
        "--backbone", "mobilenet_v2", "--img-size", "64", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "2",
        "--output-dir", out_dir, "--learning-rate", "0.001",
    )
    r = run_cli("rpn_trainer.py", *common, "--device-data")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "device-resident training data" in r.stdout
    assert "saved best checkpoint" in r.stdout
    assert os.path.isdir(os.path.join(out_dir, "rpn_mobilenet_v2"))

    # round 5: --device-data composes with --data-parallel — the dataset
    # shards over the mesh and each device walks its own shard (config 5's
    # no-host-feed combination); batch size must divide by the 8 virtual
    # devices the conftest provides to this subprocess via XLA_FLAGS
    r2 = run_cli(
        "rpn_trainer.py",
        "--backbone", "mobilenet_v2", "--img-size", "64", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "8",
        "--output-dir", str(tmp_path / "trained_dp"),
        "--learning-rate", "0.001", "--device-data", "--data-parallel",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "sharded over 8 devices" in r2.stdout
    assert "saved best checkpoint" in r2.stdout

    r3 = run_cli("rpn_trainer.py", *common, "--device-data", "--grad-accum", "2")
    assert r3.returncode != 0
    assert "incompatible with --grad-accum" in (r3.stdout + r3.stderr)


@pytest.mark.slow
def test_predictor_random_init_warns(tmp_path):
    r = run_cli(
        "rpn_predictor.py",
        "--backbone", "vgg16", "--img-size", "64", "--batch-size", "2",
        "--weights", str(tmp_path / "missing"), "--output-dir", str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "using random init" in r.stdout

@pytest.mark.slow
def test_trainer_resume_continues_optimizer(tmp_path):
    """Full train-state checkpointing: resume restores opt_state + step."""
    out_dir = str(tmp_path / "trained")
    common = [
        "--backbone", "mobilenet_v2", "--img-size", "64", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "2",
        "--output-dir", out_dir, "--learning-rate", "0.001",
    ]
    r = run_cli("rpn_trainer.py", *common)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(out_dir, "rpn_mobilenet_v2")

    r2 = run_cli("rpn_trainer.py", *common, "--weights", ckpt)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed full train state" in r2.stdout
    assert "(step 2)" in r2.stdout  # optimizer step count carried over


@pytest.mark.slow
def test_trainer_nan_guard_fails_loudly(tmp_path):
    """SURVEY.md §5 sanitizer row: a non-finite loss must abort with a clear
    error, not train silently."""
    r = run_cli(
        "rpn_trainer.py",
        "--backbone", "mobilenet_v2", "--img-size", "64", "--epochs", "1",
        "--steps-per-epoch", "2", "--batch-size", "2",
        "--output-dir", str(tmp_path), "--learning-rate", "nan",
    )
    assert r.returncode != 0
    assert "non-finite training loss" in r.stderr


def test_trainer_rejects_missing_weights(tmp_path):
    """--weights pointing nowhere must abort loudly, not silently train
    from random init."""
    from tpurpn.cli import trainer_main

    with pytest.raises(FileNotFoundError, match="refusing"):
        trainer_main([
            "--backbone", "mobilenet_v2", "--img-size", "96",
            "--weights", str(tmp_path / "nope.ckpt"), "--epochs", "1",
            "--steps-per-epoch", "1", "--batch-size", "2",
            "--output-dir", str(tmp_path),
        ])
