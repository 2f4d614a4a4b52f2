"""Diffsky synthetic-galaxy dtype.

Parity target: reference ``python/opencosmo/dtypes/diffsky.py:1-216``
and its tests (``test/test_diffsky.py``). Diffsky catalogs are
lightcone-like synthetic-galaxy tables (``data_type ==
"synthetic_galaxies"``) whose defining quirk is ``top_host_idx``: a
POSITIONAL self-reference — for every galaxy row, the row number of
its top host within the same file (hosts point at themselves, orphans
hold -1). The reference spends its whole plugin on keeping those
positions valid: remap after sorts (diffsky.py:175-183), offset when
concatenating lightcone files (:140-159), re-expand filtered samples
to whole host groups (:93-110), and partition MPI ranks on host
groups (:186-216).

The Spark translation replaces the positional index with a KEY at the
first touch (``host_keys_from_positions`` — same move the io layer
makes for SPEC start/size links): ``top_host_id`` holds the host
row's stable galaxy id, so sorts, filters, shuffles, and
concatenations never invalidate it and the PostSort / DatasetOpen
remap hooks become no-ops by construction. What remains meaningful —
multi-file concatenation, host-group closure under filters, and
host-group co-location at write — is implemented as plain DataFrame
algebra below and wired to the plugin registry by ``register()``.

Unit semantics come for free from the engine: ``redshift_true`` is a
known per-row scale-factor column (units/__init__.py), so
``with_units("physical")`` multiplies length columns by per-row
``a = 1/(1+z)`` exactly as ``test_diffsky.py::test_comoving_to_
physical`` demands, and comoving-base data already refuses
``with_units("scalefree")`` (dataset.py raises — the reference's
``test_comoving_to_scalefree``).

Scale posture: the numpy converters run at ingest (driver-side, like
all positional-to-key translation); the Spark operators are
semi-joins and one repartition — no collects, no windows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from .. import plugins

DATA_TYPE = "synthetic_galaxies"
HOST_IDX = "top_host_idx"  # positional (reference representation)
HOST_ID = "top_host_id"  # key-based (engine representation)


# ---------------------------------------------------------------------
# pure numpy (ingest-time; twin-tested without Spark)
# ---------------------------------------------------------------------
def host_keys_from_positions(
    top_host_idx: np.ndarray, ids: np.ndarray
) -> np.ndarray:
    """Positional ``top_host_idx`` -> key ``top_host_id``: the stable
    id of the host row (-1 stays -1). Run once at ingest while file
    order is still known — afterwards row positions are meaningless
    in a distributed table and no maintenance hook is ever needed."""
    idx = np.asarray(top_host_idx, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    if idx.shape != ids.shape:
        raise ValueError("top_host_idx and ids must align row-for-row")
    if np.any(idx >= len(ids)):
        raise ValueError("top_host_idx points past the end of the file")
    out = np.full(len(idx), -1, dtype=np.int64)
    m = idx >= 0
    out[m] = ids[idx[m]]
    return out


def offset_top_host_idx(
    idx_arrays: list[np.ndarray],
) -> list[np.ndarray]:
    """Reference ``offset_top_host_idx`` (diffsky.py:73-87) twin: when
    several per-file catalogs concatenate into one lightcone, each
    file's positional indices shift by the cumulative length of the
    files before it (-1 orphans excepted). Only needed when working
    positionally — ``concat_synthetic`` below does this then converts
    to keys so it never has to happen again."""
    out = []
    offset = 0
    for arr in idx_arrays:
        arr = np.asarray(arr, dtype=np.int64).copy()
        arr[arr >= 0] += offset
        offset += len(arr)
        out.append(arr)
    return out


# ---------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------
def concat_synthetic(datasets: list, id_col: str = "gal_id"):
    """Concatenate per-file synthetic-galaxy Datasets into one
    (the reference's LightconeInstantiate hook, diffsky.py:140-159).

    Positional semantics are preserved exactly — each file's
    ``top_host_idx`` still resolves to the same galaxy — but the
    result carries key-based ``top_host_id`` instead, so the union is
    just a union: host references survive any later repartition. Ids
    must be unique across files (diffsky catalogs use globally unique
    galaxy ids; a collision raises at ingest rather than corrupting
    links silently — checked cheaply via a count-distinct).
    """
    if not datasets:
        raise ValueError("no datasets to concatenate")
    converted = []
    for ds in datasets:
        converted.append(attach_host_keys(ds, id_col=id_col))
    out = converted[0]
    for ds in converted[1:]:
        out = out._clone(out.spark_df.unionByName(ds.spark_df))
    n = out.spark_df.count()
    n_ids = out.spark_df.select(id_col).distinct().count()
    if n_ids != n:
        raise ValueError(
            f"{id_col} collides across files ({n - n_ids} duplicates); "
            "host links would be ambiguous"
        )
    return out


def attach_host_keys(ds, id_col: str = "gal_id"):
    """Per-file positional->key conversion as a Spark self-join: row
    position within one file is ``row_number`` over the file's
    declared order, matched against ``top_host_idx``. For files small
    enough to ingest driver-side, ``host_keys_from_positions`` is the
    cheaper numpy path; this operator exists for catalogs that arrive
    as parquet with the positional column already attached and a
    per-file dense position column ``__pos`` or declared sort order.
    """
    df = ds.spark_df
    if HOST_ID in df.columns:
        return ds
    if HOST_IDX not in df.columns:
        raise ValueError(f"{HOST_IDX} column required")
    if "__pos" in df.columns:
        pos_col = "__pos"
    else:
        # one window over the file's total order: per-file ingest is
        # bounded by file size, mirroring the driver-side numpy path
        from pyspark.sql import Window

        order = ds._require_order("attach_host_keys")
        df = df.withColumn(
            "__pos", F.row_number().over(Window.orderBy(*order)) - 1
        )
        pos_col = "__pos"
    hosts = df.select(
        F.col(pos_col).alias("__host_pos"),
        F.col(id_col).alias(HOST_ID),
    )
    out = (
        df.join(
            hosts,
            df[HOST_IDX] == hosts["__host_pos"],
            "left",
        )
        .withColumn(
            HOST_ID,
            F.when(F.col(HOST_IDX) < 0, F.lit(-1)).otherwise(
                F.coalesce(F.col(HOST_ID), F.lit(-1))
            ),
        )
        .drop("__host_pos", "__pos")
    )
    return ds._clone(out)


def keep_top_host(full_ds, filtered_ds, id_col: str = "gal_id"):
    """Re-expand a filtered sample to whole host groups — the
    reference's ``keep_top_host_idx`` (diffsky.py:93-110, activated by
    ``open(..., keep_top_host=True)``): every host referenced by a
    surviving galaxy comes back, and so do all satellites of those
    hosts. Orphans in the sample stay; orphans outside it stay out.

    Plan shape: one distinct over the sample's host keys (small — one
    row per host group), then two semi-joins of the FULL table against
    it, deduplicated against the sample by id. No window, no collect;
    the host-key distinct broadcasts.
    """
    fdf = filtered_ds.spark_df
    full = full_ds.spark_df
    hosts = (
        fdf.filter(F.col(HOST_ID) >= 0)
        .select(F.col(HOST_ID).alias("__h"))
        .distinct()
    )
    members = full.join(
        F.broadcast(hosts),
        (full[id_col] == F.col("__h")) | (full[HOST_ID] == F.col("__h")),
        "left_semi",
    )
    out = fdf.unionByName(members).dropDuplicates([id_col])
    return full_ds._clone(out)


def repartition_by_host(ds, partitions: int | None = None):
    """Co-locate host groups (the reference's MPI Partition hook,
    diffsky.py:186-216, which assigns every rank its top hosts plus
    all their satellites): one hash repartition on the group key —
    hosts key on themselves, satellites on their host, orphans on
    their own id so they spread instead of skewing one partition."""
    df = ds.spark_df
    group_key = F.when(
        F.col(HOST_ID) >= 0, F.col(HOST_ID)
    ).otherwise(F.col("gal_id") if "gal_id" in df.columns else F.col(HOST_ID))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return ds._clone(df.repartition(n, group_key))


def _is_synthetic_with_hosts(ds) -> bool:
    header = getattr(ds, "header", None)
    return (
        header is not None
        and getattr(header, "data_type", None) == DATA_TYPE
        and (HOST_ID in ds.columns or HOST_IDX in ds.columns)
    )


_registered = False


def register() -> None:
    """Wire the dtype into the plugin registry (the reference does
    this with ``@hook`` decorators at import; here registration is
    explicit so tests control activation, and idempotent):

    * ``dataset_open`` — attach ``is_orphan``/``is_top_host`` derived
      flags (the engine-native analog of the reference's DatasetOpen
      column rebuild, which the key model makes otherwise moot);
    * ``partition`` — before a clustered write, co-locate host groups
      (io.py fires this with the raw DataFrame + dataset kwarg).
    """
    global _registered
    if _registered:
        return
    _registered = True

    @plugins.register("dataset_open", when=_is_synthetic_with_hosts)
    def _attach_flags(ds):
        df = ds.spark_df
        key = HOST_ID if HOST_ID in df.columns else HOST_IDX
        out = df.withColumn(
            "is_orphan", F.col(key) < 0
        )
        if "gal_id" in df.columns and key == HOST_ID:
            out = out.withColumn(
                "is_top_host", F.col(key) == F.col("gal_id")
            )
        return ds._clone(out)

    @plugins.register("partition")
    def _partition_hosts(df, dataset=None, **_kw):
        if (
            dataset is None
            or not _is_synthetic_with_hosts(dataset)
            or HOST_ID not in df.columns
        ):
            return None  # keep the engine's default layout
        group_key = F.when(F.col(HOST_ID) >= 0, F.col(HOST_ID)).otherwise(
            F.col("gal_id") if "gal_id" in df.columns else F.col(HOST_ID)
        )
        n = df.sparkSession.sparkContext.defaultParallelism
        return df.repartition(n, group_key)
