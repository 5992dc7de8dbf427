"""Wire-transport quality gate (scripts/transport_gate.py): the bandwidth-
saving pixel formats' measured retrieval-quality bounds.

Round-4's 2,810 pages/min headline rode the gray (luma-only) transport with
an asserted-but-unmeasured quality claim; this pins the measurement:
- rgb-u8 and yuv420 preserve ranking on BOTH page sets (incl. the
  adversarial iso-luminant set where a colored figure is the only
  discriminator),
- gray provably collapses on the color-critical set — the number PERF.md's
  transport table cites as gray's quality bound.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRIPT = os.path.join(REPO, "scripts", "transport_gate.py")


def test_transport_gate_quality_bounds(tmp_path):
    report_md = tmp_path / "report.md"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--pages", "5", "--steps", "110",
         "--out", str(report_md)],
        capture_output=True, text=True, cwd=REPO, timeout=900,
        env={"PYTHONPATH": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"},
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "PASS" in r.stdout
    report = json.loads(r.stdout[r.stdout.index("{"): r.stdout.rindex("}") + 1])

    # color-preserving transports: ranking intact everywhere
    for set_name in ("typical", "colorcrit"):
        for t in ("rgb-u8", "yuv420"):
            assert report[set_name][t]["recall@1"] == 1.0, (set_name, t)
            assert report[set_name][t]["ndcg@5"] >= 0.99, (set_name, t)

    # gray on the color-critical set: the discriminating signal is GONE —
    # gold margin collapses to ~0 (vs a healthy rgb margin) and ranking
    # drops far below the color-preserving transports
    cc = report["colorcrit"]
    assert cc["gray"]["min_gold_margin"] < 0.1 * cc["rgb-u8"]["min_gold_margin"]
    assert cc["gray"]["ndcg@5"] < 0.9

    # markdown table written for PERF.md citation
    text = report_md.read_text()
    assert "| colorcrit | gray |" in text
