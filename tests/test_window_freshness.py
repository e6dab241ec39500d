"""Driver-window freshness invariant (r10 verdict #7).

The external driver's correctness gate checks only the first
_WINDOW_SIZE queries in __spark_entry__ order; the rotation rule says
queries whose engine path changed this round go FIRST. r10 hand-applied
the rule and missed lm_quality_score (its broadcast pin changed the
physical plan while the row sat in _REST at r6-last-green). This test
makes the rule mechanical:

* tests/window_manifest.json holds per-unit source hashes of the
  PREVIOUS round's committed tree (regenerated as the final step of
  each round via `python tools/window_manifest.py`);
* every registered query owns the transitive closure of source units
  its registry function references (tools/window_manifest.py);
* any query whose closure touches a unit that changed since the
  manifest — plus any newly registered query — must sit inside _WINDOW,
  or, when more queries changed than the window holds, the window must
  be spent entirely on changed ones.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _graph():
    from window_manifest import build_graph

    return build_graph()


def _manifest() -> dict:
    with open(os.path.join(REPO, "tests", "window_manifest.json")) as f:
        return json.load(f)


def test_changed_engine_paths_are_in_the_window():
    from window_manifest import affected_queries

    import __spark_entry__ as entry

    man = _manifest()
    g = _graph()
    affected = affected_queries(g, man["units"])
    new_queries = set(g.query_units) - set(man["queries"])
    must_rotate = affected | new_queries
    window = set(entry._WINDOW)
    if len(must_rotate) >= len(window):
        # more changed than the window holds: every slot must be spent
        # on a changed/new query — none wasted on an untouched one
        assert window <= must_rotate, sorted(window - must_rotate)
    else:
        missing = must_rotate - window
        assert not missing, (
            "queries whose engine path changed since the manifest are "
            f"outside the driver window: {sorted(missing)} — move them "
            "into _WINDOW (rotation rule a) or regenerate the manifest "
            "if this is the end-of-round refresh"
        )


def test_detector_catches_the_r10_miss_shape():
    """Perturbing lm_quality_score's engine function (the exact r10
    miss: operators/text.py changed, row stayed in _REST) must mark the
    query affected — and through the transitive closure, perturbing a
    helper two hops away must as well."""
    from window_manifest import affected_queries

    g = _graph()
    man_units = dict(g.hashes)

    man_units["databus_spark/operators/text.py::lm_quality_score"] = "STALE"
    assert "lm_quality_score" in affected_queries(g, man_units)

    man_units = dict(g.hashes)
    man_units["databus_spark/plans/hints.py::gated_broadcast"] = "STALE"
    aff = affected_queries(g, man_units)
    # gated_broadcast sits under the unigram lm scorer (the exactsubstr
    # cut tail gates inline on docs.count() — not through this helper)
    assert "lm_quality_score" in aff

    man_units = dict(g.hashes)
    man_units["databus_spark/operators/dedup.py::_exsub_cut"] = "STALE"
    # the cut tail is two hops under the stats/incremental rows too
    assert {
        "exactsubstr_dedup",
        "exactsubstr_stats",
        "exactsubstr_incremental",
    } <= affected_queries(g, man_units)

    man_units = dict(g.hashes)
    man_units["databus_spark/plans/hints.py::measure_under_cap"] = "STALE"
    aff = affected_queries(g, man_units)
    # measure_under_cap is lm2's hook AND gated_broadcast's internals,
    # so both scorer families rotate
    assert {"lm_quality_score", "lm2_quality_score"} <= aff


def test_every_query_has_a_nonempty_closure():
    """A query with a trivial closure means the reference extractor
    stopped resolving (an import-shape change in registry.py would
    silently disarm the invariant) — pin a floor."""
    g = _graph()
    cls = g.query_closures()
    assert len(cls) >= 154
    thin = [q for q, c in cls.items() if len(c) < 3]
    assert not thin, thin
