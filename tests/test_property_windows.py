"""Property-based cross-checks for the sequential window semantics the
engine claims to compute declaratively: TTL-burst dedup (st8) and
point-in-time SCD2 enrichment (j14), each against an independent
pure-Python scan over hypothesis-generated event streams.

The fixture-data tests pin behavior on the driver tables; these pin it
on ADVERSARIAL streams — same-timestamp ties, empty keys, bursts that
straddle exactly the TTL boundary, single-event users."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TTL = 100  # µs, small so random streams straddle it

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.sampled_from(["a", "b"]),  # event_type / state
        st.integers(min_value=0, max_value=500),  # us
    ),
    min_size=1,
    max_size=40,
)


def _mk_df(spark, rows):
    return spark.createDataFrame(
        [(u, t, i, us) for i, (u, t, us) in enumerate(rows)],
        "user_id long, event_type string, event_id long, us long",
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_ttl_burst_property(spark, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = _mk_df(spark, rows)
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gap_new = (
        F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > TTL)
    )
    out = (
        ev.withColumn(
            "burst",
            F.sum(gap_new.cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "event_type", "burst")
        .agg(
            F.min(F.struct("us", "event_id")).alias("first"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    got = {
        (r.user_id, r.event_type, r.burst): (
            r.first.event_id,
            r.n - 1,
        )
        for r in out
    }
    by_key = defaultdict(list)
    for i, (u, t, us) in enumerate(rows):
        by_key[(u, t)].append((us, i))
    want = {}
    for key, evs in by_key.items():
        evs.sort()
        prev, burst = None, 0
        for us, eid in evs:
            if prev is None or us - prev > TTL:
                burst += 1
                want[key + (burst,)] = [eid, 0]
            else:
                want[key + (burst,)][1] += 1
            prev = us
    assert got == {k: tuple(v) for k, v in want.items()}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_pit_carry_property(spark, rows):
    """Every event's carried (state, version) must equal the Python
    scan's current-run answer — including same-µs ties resolved by
    event_id and zero-length runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = _mk_df(spark, rows).withColumnRenamed("event_type", "state")
    order = [F.col("us").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    marked = ev.withColumn(
        "chg",
        F.when(
            F.lag("state").over(w).isNull()
            | (F.lag("state").over(w) != F.col("state")),
            1,
        ).otherwise(0),
    )
    out = marked.withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).collect()
    got = {r.event_id: (r.state, r.version) for r in out}
    by_user = defaultdict(list)
    for i, (u, t, us) in enumerate(rows):
        by_user[u].append((us, i, t))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        prev_state, version = None, 0
        for us, eid, t in evs:
            if prev_state is None or t != prev_state:
                version += 1
            want[eid] = (t, version)
            prev_state = t
    assert got == want
