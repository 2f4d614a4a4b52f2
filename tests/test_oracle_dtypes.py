"""Static dtype parity sweep over the whole oracle registry — the
test form of the round-5 q64 lesson: DuckDB's HUGEINT/DECIMAL results
reach pandas as float64 while Spark emits int64, and the driver
hashes FORMATTED values, so an int-vs-float divergence ships a red
row even when the numbers agree. This sweep needs no Spark jobs:
Spark schemas come from the lazy plan (.schema), DuckDB runs the
oracle for real but at sf0.001 (tiny). Any oracle whose output
column maps to a float/decimal pandas dtype while Spark's plan says
integer (or vice versa) fails HERE, in CI, not on the driver."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_INT_SPARK = {"byte", "short", "integer", "long"}
_FLOAT_SPARK = {"float", "double"}


def _spark_kind(dt) -> str:
    name = dt.typeName()
    if name in _INT_SPARK:
        return "i"
    if name in _FLOAT_SPARK:
        return "f"
    if name.startswith("decimal"):
        # Spark decimal reaches pandas as object(Decimal) — formats
        # like an int for scale-0; treat as integer-kind for scale 0
        return "i" if dt.scale == 0 else "f"
    if name == "boolean":
        return "b"
    return "o"


def _pandas_kind(dtype) -> str:
    k = np.dtype(dtype).kind if dtype != object else "O"
    if k in "iu":
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    return "o"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="module")
def spark_schemas(spark):
    out = {}
    for name, fn in entry.queries().items():
        out[name] = fn(spark, SF_DIR).schema
    return out


@pytest.mark.parametrize("qname", sorted(entry.oracle_sql()))
def test_oracle_dtype_parity(duck, spark_schemas, qname):
    sql = entry.oracle_sql()[qname]
    pdf = duck.sql(sql).df()
    schema = spark_schemas[qname]
    spark_kinds = {f.name: _spark_kind(f.dataType) for f in schema.fields}
    assert set(pdf.columns) == set(spark_kinds), (
        f"{qname}: column sets differ: duck={sorted(pdf.columns)} "
        f"spark={sorted(spark_kinds)}"
    )
    mismatches = []
    for c in pdf.columns:
        dk = _pandas_kind(pdf[c].dtype)
        sk = spark_kinds[c]
        # object columns on the DuckDB side can hold Decimal — check a
        # sample value to classify them
        if dk == "o" and len(pdf):
            import decimal

            v = pdf[c].iloc[0]
            if isinstance(v, decimal.Decimal):
                dk = "i" if v == v.to_integral_value() else "f"
        if dk == "f" and sk == "i":
            # a NULLable integer column reaches pandas as float64 from
            # BOTH engines (NaN has no int representation), so nulls +
            # integral values is parity, not divergence — the q64 bug
            # shape is specifically float64 WITHOUT nulls
            col = pdf[c]
            if col.isna().any() and (
                col.dropna() == col.dropna().round()
            ).all():
                continue
            mismatches.append(
                f"col {c}: duck={col.dtype} (no nulls) vs spark kind 'i'"
            )
        elif dk == "i" and sk == "f":
            mismatches.append(
                f"col {c}: duck={pdf[c].dtype} vs spark kind 'f'"
            )
    assert not mismatches, (
        f"{qname}: int-vs-float divergence (driver hash would differ): "
        + "; ".join(mismatches)
    )
