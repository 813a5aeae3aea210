"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (plus the
                LLM-pipeline operators), keyed by catalog name.
oracle_sql()  — matching DuckDB SQL for the correctness gate.

The driver verifies ~50 entries per round, in iteration order — so
iteration order decides what gets driver-proven.  Rounds 1-3 used a
hand-maintained priority tuple; it went stale the moment it was written
(the round-3 verdict found ~71 entries whose last driver check predated
the code they now run).  This version derives the order from the
driver's own artifacts: every CORRECTNESS_r{N}.json at the repo root IS
the ledger of (entry, round, green?).  Order:

  1. entries RED at their most recent driver check (fixes need confirming),
  2. entries never driver-checked in any round (usually new this round),
  3. green entries whose implementing code CHANGED since their last check
     (the round-6 verdict found rewrites sitting mid-pack behind their
     stale greens) — detected by comparing the last git-commit time of
     the entry's module import-closure against the commit time of the
     CORRECTNESS file that recorded its last check, stalest first,
  4. remaining green entries, stalest last-check first (regression rotation).

No hand maintenance: next round's CORRECTNESS file reorders automatically,
and a code change re-prioritizes every entry it could have broken.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kwwhat_spark.queries import REGISTRY


def _ledger() -> dict[str, tuple[int, bool]]:
    """entry name -> (round, green) at its most recent driver check.

    Green means the strongest check the entry supports passed: a
    value-hash match, or a non-null row count for the documented
    rows-only ("no_oracle") entries.
    """
    led: dict[str, tuple[int, bool]] = {}
    root = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            green = bool(res.get("hash_match")) or (
                res.get("err") == "no_oracle" and res.get("spark_rows") is not None
            )
            prev = led.get(name)
            if prev is None or rnd >= prev[0]:
                led[name] = (rnd, green)
    return led


def _git_commit_times(root: str) -> dict[str, int]:
    """repo-relative path -> unix time of its most recent commit.

    One `git log --name-only` walk over the whole history; the first
    appearance of a path (newest-first order) is its last-touch time.
    Returns {} when git is unavailable — callers then skip change
    detection rather than guessing from checkout mtimes.
    """
    try:
        out = subprocess.run(
            # \x01-prefixed timestamp records: a path line can never be
            # mistaken for a commit time (an all-digit FILENAME would
            # satisfy line.isdigit() and silently shift attribution).
            ["git", "log", "--name-only", "--pretty=format:\x01%ct"],
            cwd=root,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return {}
    if out.returncode != 0:
        return {}
    times: dict[str, int] = {}
    cur = 0
    for line in out.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("\x01") and line[1:].isdigit():
            cur = int(line[1:])
        elif line not in times:
            times[line] = cur
    return times


_IMPORT_RE = re.compile(r"kwwhat_spark(?:\.\w+)+")
_FROM_RE = re.compile(r"^\s*from\s+(kwwhat_spark(?:\.\w+)*)\s+import\s+(.+)$", re.M)


def _module_closure(root: str) -> dict[str, set[str]]:
    """kwwhat_spark source file -> transitive set of package files it
    (statically) imports, itself included. Pure-regex scan: dotted
    `kwwhat_spark.x.y` references plus `from kwwhat_spark.x import y`
    submodule forms."""

    def dotted_to_file(dotted: str) -> str | None:
        rel = dotted.replace(".", "/")
        for cand in (f"{rel}.py", f"{rel}/__init__.py"):
            if os.path.exists(os.path.join(root, cand)):
                return cand
        return None

    edges: dict[str, set[str]] = {}
    pkg = os.path.join(root, "kwwhat_spark")
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, root)
        try:
            with open(path) as f:
                src = f.read()
        except OSError:
            continue
        deps: set[str] = set()
        for dotted in _IMPORT_RE.findall(src):
            f_ = dotted_to_file(dotted)
            if f_:
                deps.add(f_)
        for m in _FROM_RE.finditer(src):
            base, names = m.group(1), m.group(2)
            for nm in re.findall(r"\w+", names.split("#")[0]):
                f_ = dotted_to_file(f"{base}.{nm}")
                if f_:
                    deps.add(f_)
        edges[rel] = deps

    closure: dict[str, set[str]] = {}

    def walk(f: str) -> set[str]:
        if f in closure:
            return closure[f]
        closure[f] = {f}  # cycle guard: self while in progress
        acc = {f}
        for d in edges.get(f, ()):
            acc |= walk(d)
        closure[f] = acc
        return acc

    for f in edges:
        walk(f)
    return closure


def _changed_since_check(led: dict[str, tuple[int, bool]]) -> dict[str, int]:
    """Entries whose implementing code was committed AFTER the commit of
    the CORRECTNESS file recording their most recent driver check.

    Value 0 = the entry's OWN module file changed (a rewrite — highest
    urgency); 1 = only a transitive import changed (could have broken
    it, but less likely). Orders direct rewrites ahead of fallout.
    """
    root = os.path.dirname(os.path.abspath(__file__))
    times = _git_commit_times(root)
    if not times:
        return {}
    closure = _module_closure(root)

    round_files: dict[int, str] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            round_files[int(m.group(1))] = os.path.basename(path)

    # Function-level rewrite detection: the hub query modules are large
    # and touched every round, so file mtime alone flags everything in
    # them. Compare the AST-extracted source of the entry's implementing
    # function (decorator args included — the oracle SQL lives there)
    # between the check-round commit and HEAD.
    commit_of: dict[int, str] = {}

    def _round_commit(rnd: int) -> str | None:
        if rnd in commit_of:
            return commit_of[rnd] or None
        sha = ""
        fname = round_files.get(rnd)
        if fname:
            try:
                p = subprocess.run(
                    ["git", "log", "-1", "--format=%H", "--", fname],
                    cwd=root,
                    capture_output=True,
                    text=True,
                    timeout=15,
                )
                if p.returncode == 0:
                    sha = p.stdout.strip()
            except (OSError, subprocess.TimeoutExpired):
                pass
        commit_of[rnd] = sha
        return sha or None

    fn_src_cache: dict[tuple[str, str], dict[str, str]] = {}

    def _fn_sources(rel: str, ref: str) -> dict[str, str]:
        """function name -> source text (decorators included) of every
        top-level def in `rel` at git ref `ref` ('' = working tree)."""
        key = (rel, ref)
        if key in fn_src_cache:
            return fn_src_cache[key]
        out: dict[str, str] = {}
        try:
            if ref:
                p = subprocess.run(
                    ["git", "show", f"{ref}:{rel}"],
                    cwd=root,
                    capture_output=True,
                    text=True,
                    timeout=15,
                )
                src = p.stdout if p.returncode == 0 else ""
            else:
                with open(os.path.join(root, rel)) as f:
                    src = f.read()
            import ast

            lines = src.splitlines()
            for node in ast.parse(src).body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    start = min(
                        [node.lineno] + [d.lineno for d in node.decorator_list]
                    )
                    out[node.name] = "\n".join(lines[start - 1 : node.end_lineno])
        except (OSError, SyntaxError, ValueError):
            pass
        fn_src_cache[key] = out
        return out

    changed: dict[str, int] = {}
    for name, (rnd, green) in led.items():
        if not green or name not in REGISTRY:
            continue
        check_time = times.get(round_files.get(rnd, ""), None)
        if check_time is None:
            continue
        fn = REGISTRY[name].spark
        code = getattr(fn, "__code__", None)
        if code is None:
            continue
        rel = os.path.relpath(code.co_filename, root)
        closure_time = max(
            (times.get(f, 0) for f in closure.get(rel, {rel})), default=0
        )
        if closure_time <= check_time:
            continue  # nothing the entry runs has been committed since
        sha = _round_commit(rnd)
        if sha is not None:
            old = _fn_sources(rel, sha).get(fn.__name__)
            new = _fn_sources(rel, "").get(fn.__name__)
            if old is not None and old == new:
                changed[name] = 1  # only transitive imports changed
                continue
        changed[name] = 0  # the entry's own function was rewritten
    return changed


def _order_names(
    names: list[str],
    led: dict[str, tuple[int, bool]],
    changed: dict[str, int],
) -> list[str]:
    """Pure ordering logic (unit-tested): reds, never-checked, own-module
    rewrites (stalest first), then ALL remaining greens stalest first —
    transitively-changed entries break ties ahead of unchanged ones at
    the same round.

    r10 revision: transitive changes no longer form their own tier. A
    round that touches a shared module (functions/, operators/) flags
    100+ entries transitively, and a whole tier of those starved the
    staleness bound — three round-6-stale unchanged entries ranked
    behind 130 fresher "changed" ones. Staleness is the primary duty of
    the rotation; a transitive change is a weak re-prove signal, worth a
    tie-break only. Own-function rewrites keep their priority tier."""

    def key(n: str):
        got = led.get(n)
        if got is None:
            return (1, 0, 0, n)  # never checked → right after the reds
        rnd, green = got
        if not green:
            return (0, rnd, 0, n)  # red at latest check → first
        lvl = changed.get(n)
        if lvl == 0:
            return (2, rnd, 0, n)  # own rewrite → re-prove next
        # stalest first; transitive fallout ahead of unchanged per round
        return (3, rnd, 0 if lvl is not None else 1, n)

    return sorted(names, key=key)


def _ordered_names() -> list[str]:
    led = _ledger()
    return _order_names(list(REGISTRY), led, _changed_since_check(led))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
