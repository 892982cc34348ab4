"""Regenerate docs/indicators_list.md from the indicator registry.

Run from the repo root: PYTHONPATH=. python tools/gen_catalog.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import xclim_tpu  # noqa: E402,F401
from xclim_tpu.core.indicator import registry  # noqa: E402

groups: dict = {}
for key, ind in sorted(registry.items()):
    groups.setdefault(ind.realm or "generic", []).append(ind)

lines = ["# Indicator catalog", "",
         f"All {len(registry)} registered indicators (generated from the "
         "registry; regenerate with `tools/gen_catalog.py`).", ""]
for realm in sorted(groups):
    inds = groups[realm]
    lines += [f"## {realm} ({len(inds)})", "", "| identifier | title | units |",
              "|---|---|---|"]
    for ind in inds:
        u = ind.cf_attrs[0].get("units", "")
        title = (ind.title or "").replace("|", "/")
        lines.append(f"| `{ind.identifier}` | {title} | {u} |")
    lines.append("")
open("docs/indicators_list.md", "w").write("\n".join(lines))
print(f"wrote docs/indicators_list.md ({len(registry)} indicators)")
