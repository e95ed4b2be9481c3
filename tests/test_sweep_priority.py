"""scripts/sweep_priority.py — the generated registry order must put
the least-evidenced queries inside the driver's 50-query budget."""

from __future__ import annotations

import importlib.util
import json
import re
from glob import glob
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "sweep_priority", REPO / "scripts" / "sweep_priority.py"
)
sweep_priority = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sweep_priority)


def _last_seen() -> dict[str, int]:
    seen: dict[str, int] = {}
    for path in sorted(glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name in json.load(open(path)):
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def test_order_covers_registry_and_fronts_stale_entries():
    from azure_sales_etl_pipeline_spark.plans import registry

    queries, _ = registry()
    order = sweep_priority.compute_order()
    assert sorted(order) == sorted(queries)

    seen = _last_seen()
    pos = {n: i for i, n in enumerate(order)}
    never = [n for n in order if n not in seen]
    assert never, "expected at least one never-driver-checked query"
    newest = [n for n, r in seen.items() if r == max(seen.values()) and n in pos]
    # every never-checked query sorts before every newest-evidence query
    assert max(pos[n] for n in never) < min(pos[n] for n in newest)


def test_checked_in_file_matches_generator(tmp_path):
    """The committed _SWEEP_PRIORITY must be the generator's output —
    hand-edits would silently rot the driver's budget allocation."""
    from azure_sales_etl_pipeline_spark.plans import _SWEEP_PRIORITY

    assert list(_SWEEP_PRIORITY) == sweep_priority.compute_order()
