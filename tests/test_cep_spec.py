"""Declarative CEP pattern specs (plans/cep.py, r11 verdict Next #3).

Three tiers of evidence that the JSON compiler and the operators agree:

1. Validation: malformed specs return the COMPLETE jsonschema-shaped
   error listing (the reference's validate-before-publish contract).
2. Fixture parity: one spec, three execution paths — ``.stream()`` (the
   compiled funnel_match), a DIRECT funnel_match call with hand-written
   kwargs, and ``.batch()`` — all produce identical rows on an
   out-of-order replay.
3. Hypothesis property: random patterns (arity, alternation, {m,n}
   bounds, negation) over random event tables — the batch compiler must
   equal an INDEPENDENT pure-Python reference fold of the documented
   semantics (anchor at min step-0 event, m-th order statistic per step,
   interval-count veto, absence over (anchor, hi]).
"""

from __future__ import annotations

import uuid
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from nyuki_spark.plans.cep import compile_cep_pattern, validate_cep_spec
from nyuki_spark.plans.spec import SpecError
from nyuki_spark.streaming.runner import run_to_table

T0 = datetime(2026, 3, 1, 9, 0, 0)
SCHEMA = "user_id long, ts timestamp, event_type string"


def test_validate_cep_spec_full_listing():
    listing = validate_cep_spec(
        {
            "within_us": -5,
            "absent": "b",
            "steps": [
                {"types": []},
                {"types": ["a", 3]},
                {"types": "b"},
                {"types": "c", "min": 0, "max": 2},
                {"types": "d", "min": 3, "max": 1},
                {"types": "e", "bogus": 1},
            ],
        }
    )
    paths = {e["path"] for e in listing}
    assert "/within_us" in paths
    assert "/steps/0/types" in paths  # empty alternation
    assert "/steps/1/types/1" in paths  # non-string member
    assert "/steps/2/types" in paths  # absent type used as a step
    assert "/steps/3/min" in paths  # min < 1
    assert "/steps/4/max" in paths  # max < min
    assert "/steps/5/bogus" in paths  # unknown property
    with pytest.raises(SpecError) as ei:
        compile_cep_pattern({"steps": [{"types": "a", "min": 0}]})
    assert ei.value.errors


@pytest.mark.slow  # full streaming replay drain (~16 s)
def test_cep_spec_stream_equals_direct_and_batch(spark, tmp_path):
    """One spec -> .stream() == direct funnel_match == .batch() on an
    out-of-order replay of a small fixture covering every feature:
    alternation, {2,3} bounds, negation, and the 10-minute window."""
    from nyuki_spark.streaming.replay import replay_stream
    from nyuki_spark.streaming.stateful import funnel_match

    mins = timedelta(minutes=1)
    rows = [
        # user 1: A @0; (B|C) x2 within bounds (sat @3); D after -> match.
        Row(user_id=1, ts=T0, event_type="A"),
        Row(user_id=1, ts=T0 + 1 * mins, event_type="B"),
        Row(user_id=1, ts=T0 + 3 * mins, event_type="C"),
        Row(user_id=1, ts=T0 + 4 * mins, event_type="D"),
        # user 2: 4 union events in window -> max=3 veto.
        Row(user_id=2, ts=T0, event_type="A"),
        Row(user_id=2, ts=T0 + 1 * mins, event_type="B"),
        Row(user_id=2, ts=T0 + 2 * mins, event_type="B"),
        Row(user_id=2, ts=T0 + 3 * mins, event_type="C"),
        Row(user_id=2, ts=T0 + 4 * mins, event_type="C"),
        Row(user_id=2, ts=T0 + 5 * mins, event_type="D"),
        # user 3: valid chain but an X inside the window -> negated.
        Row(user_id=3, ts=T0, event_type="A"),
        Row(user_id=3, ts=T0 + 1 * mins, event_type="B"),
        Row(user_id=3, ts=T0 + 2 * mins, event_type="C"),
        Row(user_id=3, ts=T0 + 3 * mins, event_type="D"),
        Row(user_id=3, ts=T0 + 6 * mins, event_type="X"),
        # user 4: D lands outside the 10-minute window -> no match.
        Row(user_id=4, ts=T0, event_type="A"),
        Row(user_id=4, ts=T0 + 1 * mins, event_type="B"),
        Row(user_id=4, ts=T0 + 2 * mins, event_type="B"),
        Row(user_id=4, ts=T0 + 15 * mins, event_type="D"),
    ]
    spec = {
        "name": "abc",
        "key": "user_id",
        "ts": "ts",
        "type": "event_type",
        "within_us": 10 * 60 * 1_000_000,
        "steps": [
            {"types": "A"},
            {"types": ["B", "C"], "min": 2, "max": 3},
            {"types": "D"},
        ],
        "absent": "X",
    }
    pat = compile_cep_pattern(spec)
    df = spark.createDataFrame(rows, SCHEMA)

    def flushes():
        return [
            spark.createDataFrame(
                [Row(user_id=-1, ts=T0 + timedelta(days=d), event_type="__flush__")],
                SCHEMA,
            )
            for d in (10, 11)
        ]

    def run_stream(out_of):
        scratch = str(tmp_path / f"cep-{uuid.uuid4().hex[:8]}")
        sdf = replay_stream(
            spark, df, n_chunks=3, scratch_dir=scratch, flush_df=flushes()
        ).withWatermark("ts", "1 day")
        res = run_to_table(out_of(sdf), mode="append").collect()
        return sorted(
            (r.user_id, r.step1_ts, r.step2_ts, r.step3_ts)
            for r in res
            if r.user_id >= 0
        )

    via_spec = run_stream(pat.stream)
    via_direct = run_stream(
        lambda sdf: funnel_match(
            sdf,
            steps=("A", ("B", "C"), "D"),
            within_us=10 * 60 * 1_000_000,
            absent="X",
            min_counts=(1, 2, 1),
            max_counts=(None, 3, None),
        )
    )
    via_batch = sorted(
        (r.user_id, r.step1_ts, r.step2_ts, r.step3_ts)
        for r in pat.batch(df).collect()
    )
    assert via_spec == via_direct, "spec.stream() must equal the direct call"
    assert via_spec == via_batch, "stream and batch compilations must agree"
    assert [u for u, *_ in via_spec] == [1], "only user 1 matches"
    assert via_spec[0][2] == T0 + 3 * mins, "union step satisfied at 2nd event"


def _reference_fold(events, steps, within_us, absent):
    """Independent pure-Python implementation of the documented
    semantics: per key, anchor at the MIN step-0 event; step i satisfied
    at the min_i-th order statistic of its types in (prev, anchor +
    window] ([anchor, ...] for step 0); match vetoed when an interval
    count exceeds max_i or when any ``absent`` event lies in
    (anchor, anchor + window]."""
    by_key: dict[int, list[tuple[int, str]]] = {}
    for k, t, ty in events:
        by_key.setdefault(k, []).append((t, ty))
    out = []
    for k, evs in by_key.items():
        anchors = [t for t, ty in evs if ty in steps[0][0]]
        if not anchors:
            continue
        anchor = min(anchors)
        hi = anchor + within_us
        sats, ok = [], True
        prev, incl = anchor, True
        for types, mn, mx in steps:
            cands = sorted(
                t
                for t, ty in evs
                if ty in types and (t >= prev if incl else t > prev) and t <= hi
            )
            if len(cands) < mn or (mx is not None and len(cands) > mx):
                ok = False
                break
            prev, incl = cands[mn - 1], False
            sats.append(prev)
        if ok and absent is not None:
            ok = not any(ty == absent and anchor < t <= hi for t, ty in evs)
        if ok:
            out.append((k, *sats))
    return sorted(out)


@st.composite
def _pattern_and_events(draw):
    n_steps = draw(st.integers(1, 3))
    alphabet = ["A", "B", "C", "D"]
    steps = []
    for _ in range(n_steps):
        types = tuple(
            sorted(draw(st.sets(st.sampled_from(alphabet), min_size=1, max_size=2)))
        )
        mn = draw(st.integers(1, 2))
        mx = draw(st.one_of(st.none(), st.integers(mn, mn + 2)))
        steps.append((types, mn, mx))
    absent = draw(st.one_of(st.none(), st.just("X")))
    within_us = draw(st.sampled_from([3, 7, 15])) * 60 * 1_000_000
    n_events = draw(st.integers(1, 18))
    events = [
        (
            draw(st.integers(1, 3)),  # key
            draw(st.integers(0, 20)) * 60 * 1_000_000,  # ts (minute grid)
            draw(st.sampled_from(alphabet + ["X"])),
        )
        for _ in range(n_events)
    ]
    return steps, absent, within_us, events


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_pattern_and_events())
@pytest.mark.slow  # hypothesis sweep of Spark jobs (~15 s)
def test_cep_batch_compiler_matches_reference_fold(spark, data):
    steps, absent, within_us, events = data
    spec = {
        "key": "user_id",
        "ts": "ts",
        "type": "event_type",
        "within_us": within_us,
        "steps": [
            {"types": list(types), "min": mn, **({"max": mx} if mx else {})}
            for types, mn, mx in steps
        ],
        **({"absent": absent} if absent else {}),
    }
    pat = compile_cep_pattern(spec)
    rows = [
        Row(user_id=k, ts=T0 + timedelta(microseconds=t), event_type=ty)
        for k, t, ty in events
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r[0], *[int((r[i + 1] - T0).total_seconds() * 1e6) for i in range(len(steps))])
        for r in pat.batch(df).collect()
    )
    # frozenset membership for the reference fold's type sets
    ref_steps = [(frozenset(types), mn, mx) for types, mn, mx in steps]
    want = _reference_fold(events, ref_steps, within_us, absent)
    assert got == want, f"spec={spec} events={events}"


def test_cep_spec_predicates_stream_equals_batch(spark, tmp_path):
    """Predicates as data: the same spec drives funnel_match's DFS
    (stream) and the k-way-join + lexicographic-rank plan (batch) —
    including a step-1 backtrack (the earliest A admits no valid B)."""
    from nyuki_spark.streaming.replay import replay_stream

    mins = timedelta(minutes=1)
    rows = [
        # user 1: A(10) @0 has no pricier B; A(2) @1 -> B(5) @2. The
        # chain must be (t1=@1, t2=@2) on BOTH paths.
        Row(user_id=1, ts=T0, event_type="A", value=10.0),
        Row(user_id=1, ts=T0 + 1 * mins, event_type="A", value=2.0),
        Row(user_id=1, ts=T0 + 2 * mins, event_type="B", value=5.0),
        # user 2: no B above any A.
        Row(user_id=2, ts=T0, event_type="A", value=9.0),
        Row(user_id=2, ts=T0 + 1 * mins, event_type="B", value=1.0),
    ]
    spec = {
        "key": "user_id",
        "ts": "ts",
        "type": "event_type",
        "value": "value",
        "within_us": 10 * 60 * 1_000_000,
        "steps": [{"types": "A"}, {"types": "B"}],
        "predicates": [{"left": 2, "op": ">", "right": 1}],
    }
    pat = compile_cep_pattern(spec)
    schema = "user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)
    scratch = str(tmp_path / f"cep-pred-{uuid.uuid4().hex[:8]}")
    flush = [
        spark.createDataFrame(
            [Row(user_id=-1, ts=T0 + timedelta(days=d), event_type="__flush__", value=0.0)],
            schema,
        )
        for d in (10, 11)
    ]
    sdf = replay_stream(
        spark, df, n_chunks=2, scratch_dir=scratch, flush_df=flush
    ).withWatermark("ts", "1 day")
    via_stream = sorted(
        (r.user_id, r.step1_ts, r.step2_ts)
        for r in run_to_table(pat.stream(sdf), mode="append").collect()
        if r.user_id >= 0
    )
    via_batch = sorted(
        (r.user_id, r.step1_ts, r.step2_ts) for r in pat.batch(df).collect()
    )
    assert via_stream == via_batch
    assert [u for u, *_ in via_stream] == [1]
    assert via_stream[0][1] == T0 + 1 * mins, "step-1 backtrack required"


def test_cep_spec_predicate_validation():
    bad = validate_cep_spec(
        {
            "steps": [{"types": "A", "min": 2}, {"types": "B"}],
            "predicates": [
                {"left": 1, "op": "~", "right": 1},
                {"left": 9, "op": ">", "right": 2},
            ],
        }
    )
    paths = {e["path"] for e in bad}
    assert "/predicates" in paths  # missing value col + quantified step
    assert "/predicates/0/op" in paths
    assert "/predicates/0" in paths  # left == right
    assert "/predicates/1/left" in paths  # out of range
