"""Doc-drift guard: generated tables must be newer than their inputs.

The stale-table bug class shipped twice (round 1: PERF headline on an
unconverged denominator; round 3: ZOO_FULL.md stale against four newer
election88 results).  tools/check_freshness.py makes it a test failure
instead: every generated doc carries a ``generated-at`` stamp and must
be >= the newest ``timestamp`` inside its source result JSONs.
"""

import importlib.util
import json
import os
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def checker():
    spec = importlib.util.spec_from_file_location(
        "check_freshness", os.path.join(REPO, "tools",
                                        "check_freshness.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stamp_roundtrip():
    from autoreparam_tpu.utils import docstamp
    t = 1786900000
    assert docstamp.parse("header\n" + docstamp.stamp(t) + "\n") == t
    assert docstamp.parse("no stamp here") is None


def test_repo_docs_are_fresh(checker):
    ok, report = checker.check()
    assert ok, "\n".join(report)


def _make_fake_repo(tmp_path, checker, doc_ts, result_ts):
    from autoreparam_tpu.utils import docstamp
    for doc, sources in checker.PAIRS.items():
        (tmp_path / doc).write_text("# t\n\n" + docstamp.stamp(doc_ts)
                                    + "\n")
        for src in sources:
            if src.endswith(".json"):
                (tmp_path / src).parent.mkdir(parents=True,
                                              exist_ok=True)
                (tmp_path / src).write_text(
                    json.dumps({"timestamp": result_ts}))
            else:
                d = tmp_path / src
                d.mkdir(parents=True, exist_ok=True)
                (d / "r.json").write_text(
                    json.dumps({"timestamp": result_ts}))


def test_detects_stale_doc(tmp_path, checker):
    now = time.time()
    _make_fake_repo(tmp_path, checker, doc_ts=now - 3600,
                    result_ts=now)
    ok, report = checker.check(repo=str(tmp_path))
    assert not ok
    assert sum("STALE" in line for line in report) == len(checker.PAIRS)


def test_passes_when_docs_newer(tmp_path, checker):
    now = time.time()
    _make_fake_repo(tmp_path, checker, doc_ts=now,
                    result_ts=now - 3600)
    ok, report = checker.check(repo=str(tmp_path))
    assert ok, "\n".join(report)


def test_detects_unstamped_doc(tmp_path, checker):
    now = time.time()
    _make_fake_repo(tmp_path, checker, doc_ts=now, result_ts=now)
    (tmp_path / "PERF.md").write_text("# no stamp\n")
    ok, report = checker.check(repo=str(tmp_path))
    assert not ok
    assert any("UNSTAMPED PERF.md" in line for line in report)


def test_detects_untimestamped_result(tmp_path, checker):
    now = time.time()
    _make_fake_repo(tmp_path, checker, doc_ts=now, result_ts=now - 10)
    (tmp_path / "results" / "zoo_full" / "naked.json").write_text(
        json.dumps({"model": "x"}))
    ok, report = checker.check(repo=str(tmp_path))
    assert not ok
    assert any("NO-TS" in line and "ZOO_FULL.md" in line
               for line in report)
