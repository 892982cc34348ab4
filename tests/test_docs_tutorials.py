"""Execute every ```python block in docs/tutorial_*.md.

The reference ships executed notebooks (reference docs/notebooks/*.ipynb,
run by its CI notebook tox env); the TPU build's equivalent is markdown
tutorials whose code blocks run here, so the worked examples cannot rot.
Blocks within one file share a namespace and run in order. A block whose
info string contains ``notest`` is skipped (shell transcripts etc.).
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

DOCS = sorted((Path(__file__).resolve().parent.parent / "docs").glob("tutorial_*.md"))

_BLOCK = re.compile(r"^```python([^\n]*)\n(.*?)^```", re.S | re.M)


def _blocks(path: Path):
    text = path.read_text()
    return [(m.group(1).strip(), m.group(2)) for m in _BLOCK.finditer(text)]


@pytest.fixture
def _isolated_global_state():
    """Snapshot/restore registries a tutorial may legitimately mutate
    (tutorial_extending.md registers locales and indicators), so the
    worked examples cannot pollute later tests."""
    import copy

    from xclim_tpu.core import locales as _loc
    from xclim_tpu.core.indicator import registry as _reg

    loc_snap = copy.deepcopy(_loc._LOCALES)
    reg_snap = dict(_reg)
    yield
    _loc._LOCALES.clear()
    _loc._LOCALES.update(loc_snap)
    _reg.clear()
    _reg.update(reg_snap)


#: tutorials whose worked examples are heavyweight (tutorial_analogs runs
#: all 8 dissimilarity metrics over a grid: ~95 s of the fast subset's
#: budget) — run them in the slow tier, keep the other tutorials fast
_SLOW_TUTORIALS = {"tutorial_analogs"}


@pytest.mark.parametrize(
    "path",
    [pytest.param(p, marks=pytest.mark.slow) if p.stem in _SLOW_TUTORIALS
     else p for p in DOCS],
    ids=[p.stem for p in DOCS])
def test_tutorial_runs(path, _isolated_global_state):
    blocks = _blocks(path)
    assert blocks, f"{path.name} has no python blocks"
    ns: dict = {"__name__": f"docs.{path.stem}"}
    for i, (info, src) in enumerate(blocks):
        if "notest" in info:
            continue
        try:
            exec(compile(src, f"{path.name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{path.name} block {i} failed: {type(e).__name__}: {e}"
                        f"\n--- block source ---\n{src}")
