"""The per-pass memo-eviction preambles of bench.py and
scripts/time_family.py must evict the SAME set of shared-substrate
caches. r15 found time_family had drifted to 4 of the (then) 10 evicts,
which made targeted steady-state numbers read WARM — a memo built by
query A's pass survived into query B's timing. This test pins the two
lists together so the drift cannot recur (r15 verdict item 9), and pins
both against the package's actual evict_* surface so a NEW memo cannot
ship without joining the per-pass honesty contract.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_EVICT_CALL = re.compile(r"\b(?:evict_\w+)\s*\(")


def _evicts(path: Path) -> set[str]:
    return {
        m.rstrip("(").strip()
        for m in _EVICT_CALL.findall(path.read_text())
    }


def test_bench_and_time_family_evict_the_same_memos():
    bench = _evicts(REPO / "bench.py")
    family = _evicts(REPO / "scripts" / "time_family.py")
    assert bench == family, (
        f"bench.py evicts {sorted(bench - family)} that time_family.py "
        f"does not; time_family.py evicts {sorted(family - bench)} that "
        "bench.py does not — keep the two per-pass preambles in lockstep"
    )


def test_every_package_memo_evictor_is_in_the_bench_preamble():
    """Every evict_* function defined in the plans/ package (the shared
    memo caches) must be called by bench.py's per-pass preamble —
    otherwise a pass after the first reads that memo WARM and the
    bench number stops being the query's true cost."""
    defined: set[str] = set()
    for mod in (REPO / "azure_sales_etl_pipeline_spark" / "plans").glob("*.py"):
        defined |= set(re.findall(r"^def (evict_\w+)\(", mod.read_text(), re.M))
    # incremental.evict_demo_pipelines lives in plans/ too; schema cache
    # is metadata-only (catalog.py) and deliberately exempt.
    bench = _evicts(REPO / "bench.py")
    missing = sorted(defined - bench)
    assert not missing, (
        f"plans/ defines memo evictors {missing} that bench.py's "
        "per-pass preamble never calls — every shared memo must be "
        "evicted once per pass so each pass pays each build exactly once"
    )
