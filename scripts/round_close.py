#!/usr/bin/env python
"""Round-close hygiene gate (r10 verdict item 8).

The r9 and r10 misses were both artifact drift, not code: a stale
sweep-priority order, a destroyed PLANS.md, a COVERAGE.md row never
added. This script checks every locally-verifiable end-of-round
artifact and exits non-zero listing what is stale, so the round's
snapshot commit can't silently ship drift:

1. PLANS.md          — exactly one ledger row per registry query
                       (regenerate: ``python scripts/plan_audit.py --write``).
2. sweep priority    — the committed ``_SWEEP_PRIORITY`` equals the
                       order computed from its STAMPED inputs; driver
                       artifacts newer than the last fold commit are
                       "pending next round" (warn, not fail — the
                       driver drops them after the final commit), while
                       an unfolded artifact that PRE-dates the fold
                       commit fails (regenerate:
                       ``python scripts/sweep_priority.py --write``).
3. COVERAGE.md       — every registry query name is mentioned at least
                       once (the operator-inventory mapping the judge
                       reads line by line).
4. SCALE.md          — every query FIRST driver-sampled in round 11 or
                       later (or never yet sampled, i.e. new this
                       round) is mentioned by name: since r11 each new
                       query gets a named family-ledger row stating its
                       100 TB strategy (r11 verdict item 7 — the
                       matryoshka row was the one gap). Pre-r11 queries
                       are covered by family-level rows and exempt.

No Spark session is started; everything here is file+registry
inspection, so it runs in seconds and belongs right before the final
commit of the round.

Usage::

    python scripts/round_close.py
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    from azure_sales_etl_pipeline_spark.plans import (
        _SWEEP_PRIORITY,
        _SWEEP_PRIORITY_INPUTS,
        registry,
    )

    queries, _ = registry()
    names = set(queries)
    problems: list[str] = []

    # 1. PLANS.md completeness
    plan_audit = _load("plan_audit")
    rows = plan_audit.existing_rows(REPO / "PLANS.md")
    missing = sorted(names - set(rows))
    extra = sorted(set(rows) - names)
    if missing:
        problems.append(
            f"PLANS.md missing {len(missing)} rows ({missing[:5]}…) — run"
            " python scripts/plan_audit.py --write"
        )
    if extra:
        problems.append(
            f"PLANS.md has {len(extra)} stale rows ({extra[:5]}…) — run"
            " python scripts/plan_audit.py --write"
        )

    # 2. sweep priority freshness.
    #
    # The driver delivers CORRECTNESS_r{N}.json AFTER the round's final
    # commit, so "committed inputs == files on disk" is structurally
    # unachievable at judge time (r11-r13 verdicts: the gate was the
    # suite's only red test three rounds running). The correct
    # classification (r13 verdict item 1):
    #   * a stamped input file missing from disk        -> FAIL
    #   * order != generator output over stamped inputs -> FAIL
    #   * extra artifacts that POST-date the last commit touching
    #     plans/__init__.py (the fold commit)           -> pending next
    #     round: WARN, exit 0 (mirrors test_checked_in_file_matches_
    #     generator's warning path)
    #   * extra artifacts that PRE-date the fold commit -> FAIL: the
    #     builder committed round work without folding available
    #     driver evidence.
    sweep = _load("sweep_priority")
    on_disk = sweep.correctness_files()
    stamped = list(_SWEEP_PRIORITY_INPUTS)
    missing_inputs = sorted(set(stamped) - set(on_disk))
    extra = sorted(set(on_disk) - set(stamped))
    if missing_inputs:
        problems.append(
            f"sweep priority stamped inputs missing from disk: {missing_inputs}"
            " — run python scripts/sweep_priority.py --write"
        )
    elif list(_SWEEP_PRIORITY) != sweep.compute_order(stamped):
        problems.append(
            "sweep priority order does not match its stamped inputs — run"
            " python scripts/sweep_priority.py --write"
        )
    if extra and not missing_inputs:
        import subprocess as _sp

        def _commit_ts(path: str) -> int | None:
            """Unix time of the last commit touching *path*; None if
            untracked / never committed / git unavailable."""
            try:
                out = _sp.run(
                    ["git", "-C", str(REPO), "log", "-1", "--format=%ct", "--", path],
                    capture_output=True,
                    text=True,
                    timeout=30,
                ).stdout.strip()
                return int(out) if out else None
            except Exception:
                return None

        def _artifact_ts(path: str) -> int | None:
            """Commit time when tracked, else file mtime: driver-delivered
            CORRECTNESS/BENCH artifacts are normally NEVER committed by
            this repo, so the old `or 2**62` default classified every
            untracked artifact as pending — the documented FAIL branch
            for pre-dating unfolded artifacts could not fire (r14
            advice). mtime is the honest fallback for untracked files."""
            ts = _commit_ts(path)
            if ts is not None:
                return ts
            try:
                return int((REPO / path).stat().st_mtime)
            except OSError:
                return None

        t_fold = _commit_ts("azure_sales_etl_pipeline_spark/plans/__init__.py")
        stale_extras = [
            f
            for f in extra
            if t_fold is not None
            and (_artifact_ts(f) or 2**62) < t_fold
        ]
        if stale_extras:
            problems.append(
                f"driver artifacts {stale_extras} pre-date the last sweep-"
                "priority fold commit but are not stamped — run"
                " python scripts/sweep_priority.py --write"
            )
        else:
            print(
                f"PENDING: {len(extra)} driver artifact(s) newer than the"
                f" fold commit ({extra}) — fold with"
                " `python scripts/sweep_priority.py --write` at next round"
                " start"
            )

    # 3. COVERAGE.md mentions
    cov = (REPO / "COVERAGE.md").read_text()
    uncovered = sorted(n for n in names if n not in cov)
    if uncovered:
        problems.append(
            f"COVERAGE.md never mentions {len(uncovered)} registry queries:"
            f" {uncovered[:10]} — add inventory rows"
        )

    # 3b. duplicate module-level assignments in plans modules — a
    # silently-shadowed oracle constant (r12: a second _REPETITION_SQL
    # replaced an older query's oracle at import time and only the full
    # sf0.001 sweep caught it). AST-scan every plans module for names
    # assigned twice at top level.
    import ast as _ast

    plans_dir = REPO / "azure_sales_etl_pipeline_spark" / "plans"
    for mod in sorted(plans_dir.glob("*.py")):
        seen_names: dict[str, int] = {}
        tree = _ast.parse(mod.read_text())
        for node in tree.body:
            targets = []
            if isinstance(node, _ast.Assign):
                targets = [
                    t.id for t in node.targets if isinstance(t, _ast.Name)
                ]
                # X = X + ... (self-referential build-up) is a deliberate
                # idiom (e.g. _QUALITY_SUITE_SQL appends its rows tail),
                # not a shadow — the new value READS the old one.
                reads = {
                    n.id
                    for n in _ast.walk(node.value)
                    if isinstance(n, _ast.Name)
                }
                targets = [t for t in targets if t not in reads]
            elif isinstance(node, _ast.AnnAssign):
                # `X: str = ...` binds too — same shadow class as Assign.
                if node.value is not None and isinstance(
                    node.target, _ast.Name
                ):
                    reads = {
                        n.id
                        for n in _ast.walk(node.value)
                        if isinstance(n, _ast.Name)
                    }
                    if node.target.id not in reads:
                        targets = [node.target.id]
            elif isinstance(
                node, (_ast.FunctionDef, _ast.AsyncFunctionDef, _ast.ClassDef)
            ):
                targets = [node.name]
            for t in targets:
                if t in seen_names:
                    problems.append(
                        f"{mod.name}: top-level name {t!r} assigned at lines"
                        f" {seen_names[t]} and {node.lineno} — the later one"
                        " silently shadows the earlier (oracle-clobber class)"
                    )
                seen_names[t] = node.lineno

    # 4. SCALE.md rows for queries new since round 11
    import glob as _glob
    import json as _json
    import re as _re

    first_round: dict[str, int] = {}
    for fname in sorted(_glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(_re.search(r"_r(\d+)\.json$", fname).group(1))
        for qname in _json.load(open(fname)):
            first_round.setdefault(qname, rnd)
    scale = (REPO / "SCALE.md").read_text()
    no_scale_row = sorted(
        n
        for n in names
        if first_round.get(n, 10**9) >= 11
        and not _re.search(rf"\b{_re.escape(n)}\b", scale)
    )
    if no_scale_row:
        problems.append(
            f"SCALE.md has no row naming {len(no_scale_row)} post-r10 queries:"
            f" {no_scale_row[:10]} — add a family-ledger row per new query"
        )

    for p in problems:
        print(f"STALE: {p}")
    print(
        f"round_close: {len(names)} registry queries,"
        f" {len(problems)} stale artifacts"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
