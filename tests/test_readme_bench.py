"""README benchmark-section provenance (round-4 verdict weak #1).

The README's benchmark table claims every number comes from a checked-in
artifact; round 4 showed the derivation was manual and drifted a full
round. These tests make the claim enforceable: the committed README must
byte-match a fresh regeneration from the artifacts, and every bolded
seconds figure in the section must literally appear in one of them.
"""

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


def _section() -> str:
    import gen_readme_bench as g

    readme = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(re.escape(g.BEGIN) + r".*?" + re.escape(g.END),
                  readme, re.DOTALL)
    assert m, "README.md lost its BENCH:BEGIN/BENCH:END markers"
    return m.group(0)


def test_readme_bench_section_is_fresh():
    import gen_readme_bench as g

    assert _section() == g.render(), (
        "README.md benchmark section is stale — run "
        "python tools/gen_readme_bench.py"
    )


def test_check_mode_exit_code():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_readme_bench.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr


def test_every_seconds_figure_traces_to_an_artifact():
    artifact_numbers: set[str] = set()

    def collect(obj):
        if isinstance(obj, dict):
            for v in obj.values():
                collect(v)
        elif isinstance(obj, list):
            for v in obj:
                collect(v)
        elif isinstance(obj, (int, float)) and not isinstance(obj, bool):
            artifact_numbers.add(f"{float(obj):.2f}")
            artifact_numbers.add(f"{float(obj):.1f}")

    import glob

    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")) + [
        os.path.join(ROOT, "BENCH_SUITE.json"),
        os.path.join(ROOT, "PROFILE.json"),
    ]:
        if os.path.exists(p):
            collect(json.load(open(p)))

    figures = re.findall(r"\*\*([\d.]+) (?:s|ms)\*\*", _section())
    assert figures, "benchmark section contains no figures"
    for fig in figures:
        assert fig in artifact_numbers, (
            f"README figure {fig} not found in any checked-in artifact"
        )
