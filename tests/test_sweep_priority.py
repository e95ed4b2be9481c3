"""scripts/sweep_priority.py — the generated registry order must put
the least-evidenced queries inside the driver's 50-query budget.

The committed ``_SWEEP_PRIORITY`` is verified against the CORRECTNESS
files it was generated from (stamped as ``_SWEEP_PRIORITY_INPUTS``), NOT
against whatever artifacts happen to be on disk — the driver drops
``CORRECTNESS_r{N}.json`` AFTER the round's final commit, and that must
not turn the suite red (r8 verdict item 1)."""

from __future__ import annotations

import importlib.util
import json
import re
import warnings
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "sweep_priority", REPO / "scripts" / "sweep_priority.py"
)
sweep_priority = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sweep_priority)


def _stamped_inputs() -> list[str]:
    from azure_sales_etl_pipeline_spark.plans import _SWEEP_PRIORITY_INPUTS

    return list(_SWEEP_PRIORITY_INPUTS)


def _last_seen(files: list[str]) -> tuple[dict[str, int], set[str]]:
    """(last round each query had USABLE evidence, queries whose latest
    sample FAILED). Failed queries are pinned to the FRONT by the
    generator — ahead even of never-checked queries — so the staleness
    invariant below must exclude them from the 'newest evidence' tier.
    A rows-only sample of a query that NOW has a value oracle counts as
    no evidence (and not as a failure) — the generator sorts those with
    the never-checked tier until the driver samples the upgraded
    oracle."""
    from azure_sales_etl_pipeline_spark.plans import registry

    _, oracles = registry()
    seen: dict[str, int] = {}
    last_green: dict[str, int] = {}
    rows_only: dict[str, int] = {}
    for fname in sorted(files):
        rnd = int(re.search(r"_r(\d+)\.json$", fname).group(1))
        for name, rec in json.load(open(REPO / fname)).items():
            if sweep_priority._green(rec, value_required=name in oracles):
                seen[name] = max(seen.get(name, 0), rnd)
                last_green[name] = max(last_green.get(name, 0), rnd)
            elif rec.get("err") == "no_oracle":
                rows_only[name] = max(rows_only.get(name, 0), rnd)
            else:
                seen[name] = max(seen.get(name, 0), rnd)
    failed = {n for n, r in seen.items() if last_green.get(n, 0) < r}
    return seen, failed


def test_order_covers_registry_and_fronts_stale_entries():
    from azure_sales_etl_pipeline_spark.plans import registry

    queries, _ = registry()
    inputs = _stamped_inputs()
    order = sweep_priority.compute_order(inputs)
    assert sorted(order) == sorted(queries)

    seen, failed = _last_seen(inputs)
    pos = {n: i for i, n in enumerate(order)}
    # queries explicitly pinned stale (refactored after their last green
    # sample) legitimately sort ahead of the never-checked tier — exclude
    # them from the tier-ordering assertions below
    pinned = {
        n
        for n, rnd in sweep_priority._SWEEP_PINS.items()
        if n in pos and seen.get(n, 0) <= rnd and n not in failed
    }
    never = [n for n in order if n not in seen and n not in pinned]
    newest = [
        n
        for n, r in seen.items()
        if r == max(seen.values())
        and n in pos
        and n not in failed
        and n not in pinned
    ]
    if never and newest:
        # every never-checked query sorts before every newest-GREEN query
        assert max(pos[n] for n in never) < min(pos[n] for n in newest)
    # a pinned-stale query sorts ahead of the never-checked tier...
    for n in pinned:
        if never:
            assert pos[n] < min(pos[m] for m in never)
    # a query whose latest sample failed is pinned ahead of everything
    for n in failed:
        if n in pos and never:
            assert pos[n] < min(pos[m] for m in never)
        for m in pinned:
            if n in pos:
                assert pos[n] < pos[m]


def test_checked_in_file_matches_generator():
    """The committed _SWEEP_PRIORITY must be the generator's output over
    its OWN stamped inputs — hand-edits would silently rot the driver's
    budget allocation. A strictly-newer driver artifact on disk is a
    'regenerate at round start' reminder (warning), never a failure."""
    from azure_sales_etl_pipeline_spark.plans import _SWEEP_PRIORITY

    inputs = _stamped_inputs()
    missing = [f for f in inputs if not (REPO / f).exists()]
    assert not missing, f"stamped CORRECTNESS inputs missing from repo: {missing}"

    assert list(_SWEEP_PRIORITY) == sweep_priority.compute_order(inputs)

    newer = sorted(set(sweep_priority.correctness_files()) - set(inputs))
    if newer:
        warnings.warn(
            f"newer CORRECTNESS artifacts not in the committed order: {newer} — "
            "run `python scripts/sweep_priority.py --write` at round start",
            stacklevel=1,
        )


def test_round_close_gate_is_green():
    """scripts/round_close.py (the end-of-round hygiene gate) must pass
    at all times — it checks PLANS.md completeness, sweep-priority
    freshness, and COVERAGE.md inventory mentions without a Spark
    session, so there is no excuse for committing drift."""
    import importlib.util
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "round_close", repo / "scripts" / "round_close.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0
