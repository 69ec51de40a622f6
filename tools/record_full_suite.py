"""Records a green full-suite (--runslow) run as TESTS_FULL.json.

Usage: RUN_SLOW=1 python -m pytest tests/ --runslow -q > log 2>&1
       python tools/record_full_suite.py log

Parses the pytest summary line, stamps the HEAD sha, and writes the
repo-root TESTS_FULL.json artifact referenced from the README."""
import json
import os
import re
import subprocess
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(log_path):
    with open(log_path) as f:
        log = f.read()
    m = re.search(
        r"(?:(\d+) failed, )?(\d+) passed(?:, (\d+) skipped)?"
        r"(?:, (\d+) deselected)?(?:, (\d+) error[s]?)?"
        r" in ([0-9.]+)s(?: \(([^)]+)\))?", log)
    if not m:
        raise SystemExit("no pytest summary line found")
    failed = int(m.group(1) or 0)
    errors = int(m.group(5) or 0)
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=repo,
                          capture_output=True, text=True
                          ).stdout.strip()
    out = {
        "suite": "pytest tests/ --runslow (full tier)",
        "head": head,
        "passed": int(m.group(2)),
        "failed": failed,
        "skipped": int(m.group(3) or 0),
        "errors": errors,
        "wall_seconds": float(m.group(6)),
        "wall_human": m.group(7) or f"{float(m.group(6)):.0f}s",
        "green": failed == 0 and errors == 0,
        "host": "single-CPU verification box (virtual 8-device mesh)",
    }
    with open(os.path.join(repo, "TESTS_FULL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pytest_full.log")
