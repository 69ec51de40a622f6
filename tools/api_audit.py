"""API-surface audit: diff public symbols of the reference package vs sionna_tpu.

Statically (AST) collects public top-level classes/functions per module of
``/root/reference/src/sionna`` and checks each is importable somewhere under
``sionna_tpu`` (same subpackage preferred, any location accepted).  Prints a
report of missing names.  Run: ``python tools/api_audit.py``.
"""

from __future__ import annotations

import ast
import pathlib
import sys

REF = pathlib.Path("/root/reference/src/sionna")
REPO = pathlib.Path(__file__).resolve().parent.parent


def public_defs(path: pathlib.Path) -> set[str]:
    try:
        tree = ast.parse(path.read_text(errors="replace"))
    except SyntaxError:
        return set()
    names = set()
    for node in tree.body:
        if isinstance(node, (ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)):
            if not node.name.startswith("_"):
                names.add(node.name)
    return names


def collect(root: pathlib.Path) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for p in sorted(root.rglob("*.py")):
        rel = p.relative_to(root)
        if "__pycache__" in rel.parts:
            continue
        mod = str(rel.with_suffix("")).replace("/", ".")
        defs = public_defs(p)
        if defs:
            out[mod] = defs
    return out


def main() -> int:
    ref = collect(REF)
    repo = collect(REPO / "sionna_tpu")
    repo_all: set[str] = set()
    for s in repo.values():
        repo_all |= s

    missing_total = 0
    for mod in sorted(ref):
        missing = {n for n in ref[mod] if n not in repo_all}
        if missing:
            missing_total += len(missing)
            print(f"{mod}: {sorted(missing)}")
    print(f"\n{missing_total} reference symbols with no same-named definition in sionna_tpu")
    return 0


if __name__ == "__main__":
    sys.exit(main())
