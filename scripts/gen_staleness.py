#!/usr/bin/env python
"""Generate STALENESS.json: per-query last-implementation-change round.

VERDICT r6 #3: the driver's evidence for a query can predate a rewrite of
that query (q71's broadcast un-pin landed in r6 but its green CORRECTNESS
row is from r3 — the driver has never executed the shipped spelling).
``registry.ordered_queries()`` should therefore spend leftover walk budget
re-sampling changed-since-evidence ids before stale-but-unchanged ones.

Mechanism (derivable from git, no hand-maintained lists):
- For each registered query function, take its source span (decorator
  lines included, so the DuckDB oracle string inside ``@query(...)``
  counts as implementation) via ``inspect.getsourcelines`` and ask
  ``git log -n1 -L start,end:file`` for the last commit touching it.
- Queries route through shared kernels (q305 -> ops.cdc_apply, q303 ->
  multimodal goertzel_batches, ...), so a one-level helper pass widens the
  span set: every module-level function in the package is indexed by name,
  and any index name appearing in the query function's ``co_names`` (its
  referenced globals / attribute names) contributes its own span's last
  commit. One level only — helpers-of-helpers are not chased; a deeper
  rewrite that leaves every direct helper's text unchanged would be
  missed, which is acceptable for a re-sampling *priority* (correctness is
  still guarded by the local parity suite).
- Commit timestamps map to driver rounds via PROGRESS.jsonl (each
  heartbeat line carries ts + round; a commit belongs to the latest round
  whose first heartbeat precedes it).

Output: STALENESS.json {qid: {"impl_round": N, "impl_ts": unix,
"commit": sha, "via": "self|<helper name>"}} — read by
``registry.ordered_queries()`` at load time. Regenerate near round end
(after the round's implementation commits) so the next driver walk sees
fresh priorities:

    python scripts/gen_staleness.py
"""

from __future__ import annotations

import inspect
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from eclypsium_etl_spark import registry  # noqa: E402


def round_starts() -> list[tuple[int, float]]:
    """[(round, first heartbeat ts)] ascending from PROGRESS.jsonl."""
    starts: dict[int, float] = {}
    path = os.path.join(ROOT, "PROGRESS.jsonl")
    try:
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                r, ts = row.get("round"), row.get("ts")
                if isinstance(r, int) and isinstance(ts, (int, float)):
                    starts[r] = min(starts.get(r, ts), ts)
    except OSError:
        pass
    return sorted(starts.items())


def round_of(ts: float, starts: list[tuple[int, float]]) -> int:
    """Latest round whose first heartbeat precedes ts (pre-history -> 1)."""
    r = starts[0][0] if starts else 1
    for rnd, start in starts:
        if ts >= start:
            r = rnd
    return r


_span_cache: dict[tuple[str, int, int], tuple[str, int] | None] = {}


def last_commit(relpath: str, start: int, end: int) -> tuple[str, int] | None:
    """(sha, ts) of the last commit touching file[start..end], else None."""
    key = (relpath, start, end)
    if key not in _span_cache:
        try:
            out = subprocess.run(
                ["git", "log", "-n1", "--format=%H %ct", "-s",
                 f"-L{start},{end}:{relpath}"],
                cwd=ROOT, capture_output=True, text=True, timeout=60,
            )
            line = out.stdout.strip().splitlines()
            if out.returncode == 0 and line:
                sha, ts = line[0].split()
                _span_cache[key] = (sha, int(ts))
            else:
                _span_cache[key] = None
        except (OSError, ValueError, subprocess.TimeoutExpired):
            _span_cache[key] = None
    return _span_cache[key]


def fn_span(fn) -> tuple[str, int, int] | None:
    """(repo-relative path, first line, last line) of a function's source,
    decorators included."""
    try:
        path = inspect.getsourcefile(fn)
        lines, start = inspect.getsourcelines(fn)
    except (OSError, TypeError):
        return None
    if not path or not path.startswith(ROOT):
        return None
    return os.path.relpath(path, ROOT), start, start + len(lines) - 1


def helper_index() -> dict[str, tuple[str, int, int]]:
    """name -> source span for every module-level function in the package
    (queries themselves included — some compose). On name collisions the
    later module wins; collisions only blur the *priority*, never
    correctness, so that's fine."""
    import importlib
    import pkgutil

    import eclypsium_etl_spark as pkg

    idx: dict[str, tuple[str, int, int]] = {}
    for mod_info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            mod = importlib.import_module(mod_info.name)
        except Exception:
            continue
        for name, obj in vars(mod).items():
            if inspect.isfunction(obj) and obj.__module__ == mod_info.name:
                span = fn_span(obj)
                if span:
                    idx[name] = span
    return idx


def _referenced_names(code) -> set[str]:
    """All co_names reachable from a code object, INCLUDING nested
    functions/lambdas/comprehensions: a shared kernel referenced only
    inside a closure lives in the nested code object's co_names
    (reachable via co_consts), so top-level co_names alone would miss
    it and the query's impl_round would not bump on a kernel rewrite
    (ADVICE r7). Recursion covers arbitrarily deep nesting; the helper
    EXPANSION in main() stays one level, as before."""
    import types

    names: set[str] = set()
    stack = [code] if code is not None else []
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        stack.extend(
            k for k in c.co_consts if isinstance(k, types.CodeType)
        )
    return names


def main() -> None:
    queries, _ = registry.load_all()
    starts = round_starts()
    idx = helper_index()
    out: dict[str, dict] = {}
    for qid, fn in queries.items():
        spans: list[tuple[str, tuple[str, int, int]]] = []
        own = fn_span(fn)
        if own:
            spans.append(("self", own))
        names = _referenced_names(getattr(fn, "__code__", None))
        for name in sorted(names & set(idx)):
            span = idx[name]
            if own and span == own:
                continue
            spans.append((name, span))
        best: tuple[int, str, str] | None = None  # (ts, sha, via)
        for via, (relpath, a, b) in spans:
            hit = last_commit(relpath, a, b)
            if hit and (best is None or hit[1] > best[0]):
                best = (hit[1], hit[0], via)
        if best:
            out[qid] = {
                "impl_ts": best[0],
                "impl_round": round_of(best[0], starts),
                "commit": best[1][:12],
                "via": best[2],
            }
    path = os.path.join(ROOT, "STALENESS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    by_round: dict[int, int] = {}
    for row in out.values():
        by_round[row["impl_round"]] = by_round.get(row["impl_round"], 0) + 1
    print(f"wrote {path}: {len(out)}/{len(queries)} ids; impl_round histogram "
          f"{dict(sorted(by_round.items()))}")


if __name__ == "__main__":
    main()
