"""End-to-end drive of the convert + merge spark-submit CLIs (subprocess):
the reference's `docling-graph convert` / `merge` command surfaces
(cli/commands/convert.py:192, cli/commands/merge.py:27) as cluster jobs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, expect_ok=True):
    out = subprocess.run(
        [sys.executable, *args], cwd=REPO, capture_output=True, text=True, timeout=420
    )
    if expect_ok:
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])
    return out


def test_convert_merge_and_template_gate(tmp_path):
    g1, g2, gm = str(tmp_path / "g1"), str(tmp_path / "g2"), str(tmp_path / "gm")
    r1 = _run(["sparkdoc/jobs/convert.py", "--input", "synth:12", "--out", g1,
               "--export", "csv"])
    assert r1["validation"]["is_valid"] and r1["counts"]["nodes"] > 0
    assert os.path.isfile(os.path.join(g1, "manifest.json"))
    assert os.path.isdir(os.path.join(g1, "export_csv"))

    r2 = _run(["sparkdoc/jobs/convert.py", "--input", "synth:8", "--seed", "7",
               "--out", g2])
    assert r2["template_schema_hash"] == r1["template_schema_hash"]

    rm = _run(["sparkdoc/jobs/merge.py", "--inputs", f"{g1},{g2}", "--out", gm,
               "--precedence", "richest", "--conflicts", "keep_all"])
    assert rm["counts"]["nodes"] > 0
    assert rm["counts"]["ledger"] > 0  # provenance sidecar merged
    assert rm["schema_hashes"] == [r1["template_schema_hash"]]
    assert os.path.isfile(os.path.join(gm, "merge_report.json"))

    # strict template gate: forge a mismatched schema hash → refusal
    mpath = os.path.join(g2, "manifest.json")
    m = json.load(open(mpath))
    m["template_schema_hash"] = "deadbeefdeadbeef"
    json.dump(m, open(mpath, "w"))
    out = _run(["sparkdoc/jobs/merge.py", "--inputs", f"{g1},{g2}",
                "--out", str(tmp_path / "gm2")], expect_ok=False)
    assert out.returncode != 0
    assert "TemplateMismatch" in out.stderr or "different template schemas" in out.stderr
