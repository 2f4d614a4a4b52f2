"""The ``Dataset.evaluate`` UDF adapter.

Parity target: reference ``python/opencosmo/dataset/dataset.py:433-528``
and strategies ``column/evaluate.py:18-66`` (ROW_WISE / CHUNKED /
VECTORIZE). Spark realization: everything is Arrow-batched
``mapInPandas`` — the "row-wise" strategy iterates rows *inside* an
Arrow batch rather than pickling per row, so even the slow path is
batch-transferred.

Signature-based column pruning (reference dataset.py:458-459): only
``func`` parameters that name dataset columns are selected before the
UDF runs, so the Parquet scan reads just those columns.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import types as T

_NUMPY_TO_SPARK = {
    "float64": T.DoubleType(),
    "float32": T.FloatType(),
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "int16": T.ShortType(),
    "int8": T.ByteType(),
    "bool": T.BooleanType(),
    "object": T.StringType(),
}


def _spark_type_of(value: Any) -> T.DataType:
    if isinstance(value, np.ndarray):
        if value.ndim > 1 or value.dtype.kind == "O":
            inner = _NUMPY_TO_SPARK.get("float64", T.DoubleType())
            return T.ArrayType(inner)
        return _NUMPY_TO_SPARK.get(value.dtype.name, T.DoubleType())
    if isinstance(value, (bool, np.bool_)):
        return T.BooleanType()
    if isinstance(value, (int, np.integer)):
        return T.LongType()
    if isinstance(value, (float, np.floating)):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, (list, tuple)):
        elem = _spark_type_of(value[0]) if value else T.DoubleType()
        return T.ArrayType(elem)
    return T.DoubleType()


def _needed_columns(func: Callable, columns: list[str], kwargs: dict) -> list[str]:
    params = inspect.signature(func).parameters
    needed = [p for p in params if p in columns and p not in kwargs]
    if not needed:
        raise ValueError(
            f"function {getattr(func, '__name__', func)} references no "
            f"dataset columns; available: {columns[:8]}..."
        )
    return needed


def _convert_batch(pdf: pd.DataFrame, format: str, cols: list[str]) -> dict[str, Any]:
    if format in ("numpy", None):
        return {c: pdf[c].to_numpy() for c in cols}
    if format == "pandas":
        return {c: pdf[c] for c in cols}
    if format == "arrow":
        import pyarrow as pa  # noqa: PLC0415

        tbl = pa.Table.from_pandas(pdf[cols])
        return {c: tbl[c] for c in cols}
    if format == "polars":
        import polars as pl  # noqa: PLC0415

        pldf = pl.from_pandas(pdf[cols])
        return {c: pldf[c] for c in cols}
    raise ValueError(f"unknown evaluate format {format!r}")


def evaluate_dataset(
    ds,
    func: Callable,
    vectorize: bool = False,
    insert: bool = True,
    format: str = "numpy",
    batch_size: int | None = None,
    **kwargs: Any,
):
    from .dataset import Dataset

    visible = ds.columns
    needed = _needed_columns(func, visible, kwargs)

    # --- infer output structure from a tiny driver-side sample --------
    sample_pdf = ds.spark_df.select(*needed).limit(8).toPandas()
    if len(sample_pdf) == 0:
        raise ValueError("cannot evaluate on an empty dataset")
    if vectorize:
        sample_out = func(**_convert_batch(sample_pdf, format, needed), **kwargs)
    else:
        first = {c: sample_pdf[c].iloc[0] for c in needed}
        sample_out = func(**first, **kwargs)

    def normalize(out, n_rows: int) -> dict[str, Any]:
        if out is None:
            return {}
        if isinstance(out, dict):
            return out
        name = getattr(func, "__name__", "result")
        return {name if name != "<lambda>" else "result": out}

    sample_norm = normalize(sample_out, len(sample_pdf))

    if not insert:
        # eager path: run over batches, collect raw results
        results = []
        pdf = ds.spark_df.select(*needed).toPandas()
        if vectorize:
            return func(**_convert_batch(pdf, format, needed), **kwargs)
        for _, row in pdf.iterrows():
            results.append(func(**{c: row[c] for c in needed}, **kwargs))
        return results

    if not sample_norm:
        raise ValueError("insert=True but the function returned nothing")

    # output schema = input schema + new fields
    base_schema = ds.spark_df.schema
    out_fields = list(base_schema.fields)
    new_names = []
    for k, v in sample_norm.items():
        probe = v
        if vectorize and isinstance(v, np.ndarray) and v.ndim == 1:
            probe = v[0] if len(v) else 0.0
        out_fields.append(T.StructField(k, _spark_type_of(probe), True))
        new_names.append(k)
    out_schema = T.StructType(out_fields)
    passthrough = [f.name for f in base_schema.fields]

    fn = func  # local capture (don't serialize the Dataset)
    needed_l, kwargs_l, vec_l, fmt_l = needed, kwargs, vectorize, format

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if vec_l:
                out = fn(**_convert_batch(pdf, fmt_l, needed_l), **kwargs_l)
                out = out if isinstance(out, dict) else {new_names[0]: out}
                for k in new_names:
                    v = out[k]
                    pdf[k] = np.asarray(v) if not np.isscalar(v) else v
            else:
                rows = {k: [] for k in new_names}
                cols_np = {c: pdf[c].to_numpy() for c in needed_l}
                for i in range(len(pdf)):
                    r = fn(**{c: cols_np[c][i] for c in needed_l}, **kwargs_l)
                    r = r if isinstance(r, dict) else {new_names[0]: r}
                    for k in new_names:
                        rows[k].append(r[k])
                for k in new_names:
                    pdf[k] = rows[k]
            yield pdf[passthrough + new_names]

    out_df = ds.spark_df.mapInPandas(run, out_schema)
    units = dict(ds._units)
    return Dataset(
        out_df,
        header=ds._header,
        units=units,
        descriptions=ds._descriptions,
        sort_keys=ds._sort_keys,
        region=ds._region,
        convention=ds._convention,
    )
