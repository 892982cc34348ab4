"""Measure every BASELINE.md numpy baseline at FULL problem fraction and pin
the constants into BASELINE_MEASURED.json (VERDICT round-2 item #3: the
vs_baseline denominator must be a committed constant, not re-rolled under
whatever host load the bench run happens to see).

Run on a quiet machine:  python tools/pin_baselines.py
bench.py then reads BASELINE_MEASURED.json and reports the pinned ratio; the
raw live seconds remain recorded alongside for audit.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import baselines  # noqa: E402

EFFICIENCY = 64 * 0.7

# full-fraction invocations for each config as bench.py uses them
CONFIGS = {
    "tg_mean": dict(fn="tg_mean", kw=dict(reps=3)),
    "tg_mean_512": dict(fn="tg_mean", kw=dict(ny=512, nx=512, reps=3)),
    "spells": dict(fn="spells", kw=dict(ny=100, nx=100, reps=3)),
    "spells_448": dict(fn="spells", kw=dict(ny=448, nx=448, reps=1)),
    "tx90p_bootstrap": dict(fn="tx90p_bootstrap",
                            kw=dict(sample_years=30, reps=1)),
    # matched-size pins for the device's bootstrap configs (r4 verdict #6b);
    # fractional sampling is recorded in the pin — cd/s normalizes by it
    "tx90p_bootstrap_4096": dict(fn="tx90p_bootstrap",
                                 kw=dict(cells=4096, sample_years=6, reps=1)),
    "tx90p_bootstrap_16k": dict(fn="tx90p_bootstrap",
                                kw=dict(cells=16384, sample_years=2, reps=1)),
    # 320x320 is the largest chain the 16 GB v5e fits (4 input vars = 5.98 GB
    # there; 384x384's 8.6 GB OOMs once spell-scan temporaries land on top)
    "chain_320": dict(fn="chain", kw=dict(ny=320, nx=320, reps=1)),
    "qdm": dict(fn="qdm", kw=dict(sample_doys=365, reps=1)),
    "ensembles": dict(fn="ensembles", kw=dict(ny=128, nx=256, reps=3)),
    "ensembles_192x448": dict(fn="ensembles", kw=dict(ny=192, nx=448, reps=2)),
}


def pin_one(name: str):
    """Measure and merge a single config into BASELINE_MEASURED.json."""
    cfg = CONFIGS[name]
    cd_s, sec, frac = baselines.ALL[cfg["fn"]](**cfg["kw"])
    path = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data[name] = {
        "numpy_1core_cd_s": round(cd_s, 1),
        "numpy_seconds": round(sec, 3),
        "fraction_measured": frac,
        "est_64core_cd_s": round(cd_s * EFFICIENCY, 1),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(f"{name}: {cd_s:,.0f} cd/s 1-core ({sec:.2f}s); merged into {path}")


def main():
    out = {}
    for name, cfg in CONFIGS.items():
        cd_s, sec, frac = baselines.ALL[cfg["fn"]](**cfg["kw"])
        out[name] = {
            "numpy_1core_cd_s": round(cd_s, 1),
            "numpy_seconds": round(sec, 3),
            "fraction_measured": frac,
            "est_64core_cd_s": round(cd_s * EFFICIENCY, 1),
        }
        print(f"{name}: {cd_s:,.0f} cd/s 1-core ({sec:.2f}s, "
              f"{frac:.0%} of problem)", flush=True)
    path = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        pin_one(sys.argv[1])
    else:
        main()
