"""Nyuki-semantics layer tests: rule chain, condition DSL, pipeline spec.

The DSL property test is the §5.4 strategy: the compiled Column predicate
must agree with a pure-Python evaluation of the same condition on random
payloads — one DataFrame of all generated rows, one comparison pass.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyuki_spark.functions.evaluate import ConditionError, compile_condition
from nyuki_spark.functions.transform import Extract, Lookup, RuleChain, Set, Sub, Unset
from nyuki_spark.plans.spec import SpecError, compile_pipeline


def test_rule_chain_composition(spark):
    df = spark.createDataFrame(
        [Row(id=1, name="item 007 x", kind="Gold"), Row(id=2, name="nope", kind="tin")]
    )
    chain = RuleChain(
        (
            Extract("num", "([0-9]+)", src="name"),
            Sub("name", "0+", "0"),
            Set("tag", "done"),
            Lookup("kind", (("gold", "G"), ("silver", "S")), icase=True),
            Unset("name"),
        )
    )
    rows = {r.id: r for r in chain(df).collect()}
    assert rows[1].num == "007" and rows[1].kind == "G" and rows[1].tag == "done"
    assert rows[2].num == "" and rows[2].kind == "tin"
    assert "name" not in rows[1].asDict()


def test_spec_validation_rejects_bad_specs():
    with pytest.raises(SpecError):
        compile_pipeline({"steps": [{"op": "launch_missiles"}]})
    with pytest.raises(SpecError):
        compile_pipeline({"no_steps": []})
    with pytest.raises((SpecError, ConditionError)):
        compile_pipeline({"steps": [{"op": "filter", "condition": "__import__('os')"}]})


@pytest.mark.parametrize(
    "bad",
    [
        "__import__('os').system('x')",
        "open('/etc/passwd')",
        "a.b",
        "x[0]",
        "[y for y in z]",
        "lambda: 1",
        "f(1)",
    ],
)
def test_dsl_rejects_unsafe_syntax(bad):
    with pytest.raises(ConditionError):
        compile_condition(bad)


_CONDITIONS = [
    "a > 3",
    "a + b * 2 < 10",
    "s == 'x' or (a >= 2 and not flag)",
    "a in [1, 2, 3] and s not in ['p', 'q']",
    "-a % 5 == 2",
    "a < b < 8",
    "flag and s != 'y'",
]


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
            st.sampled_from(["x", "y", "p", "z"]),
            st.booleans(),
        ),
        min_size=1,
        max_size=30,
    ),
    cond=st.sampled_from(_CONDITIONS),
)
def test_dsl_matches_python_eval(spark, rows, cond):
    df = spark.createDataFrame(
        [Row(i=i, a=a, b=b, s=s, flag=f) for i, (a, b, s, f) in enumerate(rows)]
    )
    got = sorted(
        r.i for r in df.where(compile_condition(cond)).select("i").collect()
    )
    want = sorted(
        i
        for i, (a, b, s, flag) in enumerate(rows)
        if eval(cond, {"__builtins__": {}}, {"a": a, "b": b, "s": s, "flag": flag})
    )
    assert got == want, f"{cond}: spark={got} python={want}"


def test_broadcast_lookup_matches_inline_lookup(spark):
    from pyspark.sql import Row as R

    from nyuki_spark.functions.transform import BroadcastLookup

    df = spark.createDataFrame([R(id=1, kind="gold"), R(id=2, kind="tin"), R(id=3, kind="silver")])
    lut = spark.createDataFrame([R(key="gold", value="G"), R(key="silver", value="S")])
    inline = Lookup("kind", (("gold", "G"), ("silver", "S"))).apply(df)
    bcast = BroadcastLookup("kind", lut).apply(df)
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, bcast.collect()))
    # The physical plan must broadcast the lookup table, not shuffle events.
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:400]
