"""Mechanical round-end gate: the committed CONTRACT/FUZZ artifacts must
POSTDATE every engine commit and cover every contract query (r8 verdict
#1 — twice running, the round's last engine commit slipped past the
"artifact postdates engine" habit: r7's CONTRACT was never committed,
r8's predated the final operator commit and held 165 of 166 queries).

Checks, all mechanical:
 1. The newest committed CONTRACT_r{N}.json / FUZZ_r{N}.json each have a
    last-touching commit NO OLDER than the last commit touching engine
    code (coolplaydruid_spark/, __spark_entry__.py, tests/test_fuzz_*).
 2. The working tree is clean on those engine paths (uncommitted engine
    edits make any committed artifact stale by construction).
 3. CONTRACT_r{N}.json contains EXACTLY the contract's query set — a
    query added after the gate ran (r8's corpus_overlap_matrix) fails
    loudly instead of silently shipping unverified.
 4. FUZZ_r{N}.json lists every tests/test_fuzz_*.py surface, so a fuzz
    generator added after the soak is equally loud.
 5. The BENCH/CORRECTNESS/PLANMETRICS families are covered too (r9
    advice — the gate passed while BENCH_r09/CORRECTNESS_r09 sat
    untracked): every BENCH_r*.json / CORRECTNESS_r*.json present on
    disk must be committed with no uncommitted edits (the driver writes
    them per round; they record the PREVIOUS round's run, so no
    postdates-engine requirement), and PLANMETRICS.json — which bench.py
    regenerates — must be committed, clean, and postdate engine commits
    just like CONTRACT/FUZZ.

Usage: python tools/check_artifacts_fresh.py [round_number]
(default: the highest N among committed CONTRACT_r*.json). Exit 0 =
fresh, 1 = stale/incomplete, 2 = usage/environment error. Run as the
FINAL act of every round, after the artifacts are committed.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

ENGINE_PATHS = ["coolplaydruid_spark", "__spark_entry__.py", "bench.py"]
FUZZ_GLOB = "tests/test_fuzz_*.py"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout.strip()


def _last_commit_ts(paths: list[str]) -> tuple[int, str]:
    out = _git("log", "-1", "--format=%ct %h %s", "--", *paths)
    if not out:
        return 0, "(no commit)"
    ts, rest = out.split(" ", 1)
    return int(ts), rest


def main() -> int:
    # resolve the round
    if len(sys.argv) > 1:
        n = int(sys.argv[1])
    else:
        tracked = _git("ls-files", "CONTRACT_r*.json").splitlines()
        rounds = [int(m.group(1)) for f in tracked
                  if (m := re.match(r"CONTRACT_r(\d+)\.json$", f))]
        if not rounds:
            print("FAIL: no committed CONTRACT_r*.json found", file=sys.stderr)
            return 1
        n = max(rounds)
    contract_f = f"CONTRACT_r{n:02d}.json"
    fuzz_f = f"FUZZ_r{n:02d}.json"

    failures: list[str] = []

    # 2. clean working tree on engine paths (and on the artifacts)
    dirty = _git("status", "--porcelain", "--",
                 *ENGINE_PATHS, FUZZ_GLOB, contract_f, fuzz_f)
    if dirty:
        failures.append(
            "uncommitted engine/artifact changes:\n  " +
            "\n  ".join(dirty.splitlines()))

    # 1. artifact commits postdate engine commits
    eng_ts, eng_desc = _last_commit_ts(ENGINE_PATHS + [FUZZ_GLOB])
    for f in (contract_f, fuzz_f):
        if not (ROOT / f).exists():
            failures.append(f"{f} does not exist")
            continue
        if not _git("ls-files", f):
            failures.append(f"{f} exists but is not committed")
            continue
        art_ts, art_desc = _last_commit_ts([f])
        if art_ts < eng_ts:
            failures.append(
                f"{f} last committed at {art_desc} ({art_ts}) but engine "
                f"code was committed later at {eng_desc} ({eng_ts}) — "
                "regenerate and recommit the artifact")

    # 3. CONTRACT covers exactly the contract query set
    contract_path = ROOT / contract_f
    if contract_path.exists():
        sys.path.insert(0, str(ROOT))
        from coolplaydruid_spark import contract as contract_mod

        want = set(contract_mod.QUERIES)
        art = json.load(open(contract_path))
        results = art.get("results", art)  # both artifact shapes
        got = {k for k in results
               if isinstance(results[k], dict) and "rows_match" in results[k]}
        if got != want:
            missing, extra = sorted(want - got), sorted(got - want)
            failures.append(
                f"{contract_f} query set mismatch: missing={missing} "
                f"extra={extra} (artifact {len(got)} vs contract {len(want)})")
        else:
            bad = [k for k in got
                   if results[k].get("err")
                   or not (results[k].get("rows_match")
                           and results[k].get("schema_match"))]
            if bad:
                failures.append(f"{contract_f} has failing entries: {sorted(bad)}")

    # 5. BENCH/CORRECTNESS on disk are committed + clean; PLANMETRICS is
    # committed, clean, and postdates the engine (bench.py regenerates it)
    for fam in ("BENCH_r*.json", "CORRECTNESS_r*.json"):
        tracked = set(_git("ls-files", fam).splitlines())
        on_disk = {p.name for p in ROOT.glob(fam)}
        untracked = sorted(on_disk - tracked)
        if untracked:
            failures.append(
                f"untracked {fam} artifacts: {untracked} — commit them")
        dirty_fam = _git("status", "--porcelain", "--", fam)
        if dirty_fam:
            failures.append(
                f"uncommitted {fam} edits:\n  "
                + "\n  ".join(dirty_fam.splitlines()))
    pm = "PLANMETRICS.json"
    if (ROOT / pm).exists():
        if not _git("ls-files", pm):
            failures.append(f"{pm} exists but is not committed")
        else:
            if _git("status", "--porcelain", "--", pm):
                failures.append(f"{pm} has uncommitted edits")
            pm_ts, pm_desc = _last_commit_ts([pm])
            if pm_ts < eng_ts:
                failures.append(
                    f"{pm} last committed at {pm_desc} ({pm_ts}) but engine "
                    f"code was committed later at {eng_desc} ({eng_ts}) — "
                    "re-run bench.py and recommit")

    # 4. FUZZ covers every fuzz surface
    fuzz_path = ROOT / fuzz_f
    if fuzz_path.exists():
        art = json.load(open(fuzz_path))
        want_s = {p.stem for p in (ROOT / "tests").glob("test_fuzz_*.py")}
        got_s = set((art.get("surfaces") or {}))
        if not want_s <= got_s:
            failures.append(
                f"{fuzz_f} missing fuzz surfaces: {sorted(want_s - got_s)} — "
                "re-run tools/fuzz_soak.py after adding a generator")
        if any((r.get("failed") or 0) != 0 for r in art.get("runs", [])):
            failures.append(f"{fuzz_f} records failing seed runs")

    if failures:
        print(f"STALE round-{n} artifacts:", file=sys.stderr)
        for f in failures:
            print(f" - {f}", file=sys.stderr)
        return 1
    print(f"round-{n} artifacts are fresh: {contract_f} + {fuzz_f} postdate "
          "all engine commits, cover the full contract and fuzz surfaces")
    return 0


if __name__ == "__main__":
    sys.exit(main())
