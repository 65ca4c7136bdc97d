"""Cross-operator CDC invariants: independent materializations of
the same changelog must agree. These catch semantic drift that
per-query oracles can't (both queries could change together and
still match their own SQL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from galaxy_spark.registry import all_queries
from tests.conftest import SF_ORACLE


def test_scd2_current_rows_equal_snapshot(spark):
    """The is_current slice of the SCD2 history IS the latest-wins
    snapshot: same keys, same values. (SCD2 additionally proves the
    interval chain; the snapshot additionally proves n_changes —
    the overlap is the live-record set.)"""
    q = all_queries()
    scd2 = q["cdc_scd2_history"](spark, SF_ORACLE)
    snap = q["cdc_apply_snapshot"](spark, SF_ORACLE)
    cur = {(r.database, r["table"], r.pk, r.value)
           for r in scd2.filter("is_current").collect()}
    latest = {(r.database, r["table"], r.pk, r.last_value)
              for r in snap.collect()}
    assert cur == latest


def test_scd2_intervals_chain_without_gaps(spark):
    """Within a key, version k's valid_to must equal the next
    change's position and versions must be dense 1..n — i.e. the
    history is a contiguous chain ordered by binlog position."""
    q = all_queries()
    scd2 = q["cdc_scd2_history"](spark, SF_ORACLE)
    rows = scd2.orderBy("database", "table", "pk", "version").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r.database, r["table"], r.pk), []).append(r)
    assert by_key, "no history rows"
    for key, versions in by_key.items():
        assert [r.version for r in versions] == list(
            range(1, len(versions) + 1)), f"versions not dense for {key}"
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from, \
                f"interval chain broken for {key}"
        # at most one open version, and only at the chain's end
        opens = [r for r in versions if r.valid_to is None]
        assert len(opens) <= 1
        if opens:
            assert opens[0] is versions[-1]
