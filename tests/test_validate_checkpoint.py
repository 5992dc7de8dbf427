"""End-to-end test of the checkpoint quality gate itself.

Generates a TINY synthetic checkpoint in the real colSmol layout
(safetensors + config + tokenizer, shrunken dims) and runs
scripts/validate_checkpoint.py as a real subprocess — the exact command a
user runs on vidore weights. Guards the gate harness: loader rules,
processor bootstrapping from the checkpoint dir, torch-oracle
reconstruction, metric computation, and the PASS/FAIL exit semantics.
"""

import json
import pathlib
import subprocess
import sys

import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

REPO = pathlib.Path(__file__).resolve().parents[1]
SCRIPT = REPO / "scripts" / "validate_checkpoint.py"


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth") / "colsmol-tiny"
    env = {"PYTHONPATH": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"}
    r = subprocess.run(
        [sys.executable, str(SCRIPT), "--make-synth", "colsmol-tiny", str(out)],
        capture_output=True, text=True, env={**env}, cwd=str(REPO), timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "model.safetensors").exists() and (out / "tokenizer.json").exists()
    return out


def test_gate_passes_on_tiny_synth(tiny_ckpt, tmp_path):
    report = tmp_path / "report.md"
    r = subprocess.run(
        [sys.executable, str(SCRIPT), str(tiny_ckpt), "--family", "colidefics3",
         "--pages", "3", "--out", str(report)],
        capture_output=True, text=True, cwd=str(REPO), timeout=600,
        env={"PYTHONPATH": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"},
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PASS" in r.stdout
    # the JSON report carries the gate quantities
    payload = json.loads(r.stdout[r.stdout.index("{") : r.stdout.rindex("}") + 1])
    assert payload["ndcg@5_delta"] <= 0.1
    assert payload["ranking_agreement@5"] >= 0.0
    assert report.exists() and "validate_checkpoint" in report.read_text()


def test_finetuned_gate_is_diagonal_dominant(tiny_ckpt, tmp_path):
    """--finetune -> export -> gate: after a few in-env contrastive steps the
    score matrix must be diagonal-dominant in BOTH frameworks (non-trivial
    ranking agreement). This catches silent image-path breaks — e.g. a
    processor/model image_token_id skew means pages can't be told apart, the
    loss can't fall below log(B), and dominance never emerges."""
    env = {"PYTHONPATH": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"}
    trained = tmp_path / "trained"
    r = subprocess.run(
        [sys.executable, str(SCRIPT), str(tiny_ckpt), "--finetune", "60",
         "--finetune-out", str(trained), "--finetune-lr", "1e-3", "--pages", "6"],
        capture_output=True, text=True, cwd=str(REPO), timeout=900, env={**env},
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (trained / "model.safetensors").exists()
    r = subprocess.run(
        [sys.executable, str(SCRIPT), str(trained), "--pages", "6"],
        capture_output=True, text=True, cwd=str(REPO), timeout=900, env={**env},
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    payload = json.loads(r.stdout[r.stdout.index("{") : r.stdout.rindex("}") + 1])
    assert payload["flax_diag_dominant"] and payload["torch_diag_dominant"]
    assert payload["ndcg@5_delta"] <= 0.1
    assert payload["ranking_agreement@5"] == 1.0
