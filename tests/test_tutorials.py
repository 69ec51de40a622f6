"""Executes every ```python code block in docs/tutorials/*.md so the
tutorial snippets cannot rot (the reference's notebooks are executed
documents by construction; this is the markdown analog).

Blocks within one tutorial share a namespace and run in order, like
notebook cells.  Matplotlib output is redirected to the Agg backend;
plt.show() is a no-op.  Slow tier: the blocks run real simulations.
"""

import os
import re
import glob
import textwrap

import pytest

_DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "tutorials")

TUTORIALS = sorted(glob.glob(os.path.join(_DOCS, "*.md")))

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path):
    with open(path, encoding="utf-8") as f:
        # dedent: blocks nested inside markdown lists are indented
        return [textwrap.dedent(b)
                for b in _BLOCK_RE.findall(f.read())]


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", TUTORIALS, ids=[os.path.basename(p) for p in TUTORIALS])
def test_tutorial_code_executes(path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    blocks = _blocks(path)
    assert blocks, f"{path} has no python blocks"
    ns = {"__name__": "__tutorial__"}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"{os.path.basename(path)}[block {i}]",
                         "exec"), ns)
        finally:
            plt.close("all")


def test_all_tutorials_have_code():
    assert len(TUTORIALS) >= 14
