"""Property tests for the round-8 key-parity surface: Short (SMALLINT)
and Char (1-char STRING) keys — the last two reference KeySerializer
instances (KeySerializer.scala:82-98) to gain oracle-pinned queries —
must behave exactly like a Python dict through build -> multiput ->
delete -> scan, including domain-boundary and non-ASCII keys."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_indexedrdd_spark.core import IndexedDataFrame

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_slow
@given(
    keys=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    put_keys=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
def test_short_key_mutation_matches_python_dict(spark, keys, put_keys):
    from pyspark.sql.types import (
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("k", ShortType()), StructField("v", LongType())]
    )
    rows = [(k, i) for i, k in enumerate(keys)]
    model = {k: i for i, k in enumerate(keys)}
    df = spark.createDataFrame(rows, schema=schema)
    kv = IndexedDataFrame.from_unique(df, "k", num_partitions=2)
    kv2 = kv.multiput({k: 999 for k in put_keys})
    for k in put_keys:
        model[k] = 999
    del_keys = keys[: len(keys) // 2]
    kv3 = kv2.delete(del_keys)
    for k in del_keys:
        model.pop(k, None)
    got = {r["k"]: r["v"] for r in kv3.collect()}
    assert got == model


@_slow
@given(
    chars=st.lists(
        st.characters(min_codepoint=33, max_codepoint=0x2FFF),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_char_key_mutation_matches_python_dict(spark, chars):
    rows = [(c, i) for i, c in enumerate(chars)]
    model = {c: i for i, c in enumerate(chars)}
    df = spark.createDataFrame(rows, "k string, v long")
    kv = IndexedDataFrame.from_unique(df, "k", num_partitions=2)
    updates = {chars[0]: 777, "": 888}
    kv2 = kv.multiput(updates)
    model.update(updates)
    got = {r["k"]: r["v"] for r in kv2.collect()}
    assert got == model
