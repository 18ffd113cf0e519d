"""Arrow-backed construction of small driver-side literal frames.

``spark.createDataFrame(list_of_rows, schema)`` builds a PICKLED
PARALLELIZE plan: the rows live in Python, and EVERY evaluation of any
plan containing the frame pays a Python-runner round trip per slice to
deserialize them (measured ~0.15 s per slice at local[32]; a
coalesce(1) over such a frame serializes ~n_cores handshakes into one
task — a flat ~4.8 s). These literal frames (multiget/delete key
batches, query-term maps, ANN probe rows, centroid/codebook tables) sit
on the hot path of almost every serve, so the overhead recurs per
query, not per session.

:func:`local_rows_df` builds the same frame through a ``pyarrow.Table``
instead: Spark 4 converts it eagerly into a JVM LocalRelation, so the
plan contains a ``LocalTableScan`` — zero Python involvement at
execution time, every downstream evaluation reads JVM-resident rows
(measured 0.46 s -> 0.13 s per evaluation for a 1k-row frame; rows,
schema and NULLs bit-identical — pa.array maps None to null exactly,
never NaN-coerced, unlike a pandas round trip).

Scale note: these frames are driver-bounded by contract everywhere they
appear (key batches, q x k probe rows, model tables); the Arrow path
changes WHERE the bytes live (JVM local relation vs Python pickle), not
how many there are.

Fallback: any schema the Arrow converter cannot express (or bare
column-name lists relying on type inference) falls back to the classic
path — behavior, not performance, is the contract here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T


def local_rows_df(spark, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with LocalRelation
    (Arrow) construction when the schema is explicit (DDL string or
    StructType); classic construction otherwise. Row values, types and
    NULLs are identical between the two paths."""
    if isinstance(schema, (str, T.StructType)):
        try:
            st = (
                T.StructType.fromDDL(schema)
                if isinstance(schema, str)
                else schema
            )
            if rows:
                import pyarrow as pa
                from pyspark.sql.pandas.types import to_arrow_schema

                pa_schema = to_arrow_schema(st)
                cols = list(zip(*rows))
                tbl = pa.Table.from_arrays(
                    [
                        pa.array(list(c), type=f.type)
                        for c, f in zip(cols, pa_schema)
                    ],
                    schema=pa_schema,
                )
                df = spark.createDataFrame(tbl)
                # belt-and-braces: the Arrow path must not silently
                # reshape the schema (nullability differences aside,
                # which Spark normalizes to nullable for local data
                # on both paths)
                if [f.dataType for f in df.schema.fields] == [
                    f.dataType for f in st.fields
                ] and [f.name for f in df.schema.fields] == [
                    f.name for f in st.fields
                ]:
                    return df
            else:
                return spark.createDataFrame([], st)
        except Exception:
            pass  # fall through to the classic path
    return spark.createDataFrame(rows, schema)
