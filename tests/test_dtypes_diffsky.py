"""Diffsky dtype (`opencosmo_spark/dtypes/diffsky.py`) vs the
reference's semantics (`python/opencosmo/dtypes/diffsky.py`,
`test/test_diffsky.py`): positional->key host links, lightcone
concatenation offsets, host-group closure under filters, host-group
partitioning, and the redshift-dependent unit conversions.

Numpy twins below re-derive every expected value independently of the
module under test.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from opencosmo_spark import Dataset, OpenCosmoHeader, plugins
from opencosmo_spark.dtypes import diffsky
from opencosmo_spark.header import Cosmology


def _galaxies_pdf(n=12, seed=3):
    """A synthetic-galaxy file in REFERENCE form: positional
    top_host_idx, hosts self-referencing, some orphans (-1)."""
    rng = np.random.default_rng(seed)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    idx = np.full(n, -1, dtype=np.int64)
    hosts = sorted(rng.choice(n, size=max(2, n // 4), replace=False))
    for h in hosts:
        idx[h] = h  # hosts point at themselves
    for i in range(n):
        if idx[i] == -1 and rng.random() < 0.7:
            idx[i] = int(rng.choice(hosts))
    return pd.DataFrame(
        {
            "gal_id": ids,
            "top_host_idx": idx,
            "redshift_true": rng.uniform(0.1, 2.0, n),
            "x": rng.uniform(0, 64, n),
            "logsm_obs": rng.uniform(8, 12, n),
        }
    )


# ------------------------------------------------------ numpy layer


def test_host_keys_from_positions_twin():
    pdf = _galaxies_pdf()
    got = diffsky.host_keys_from_positions(
        pdf.top_host_idx.to_numpy(), pdf.gal_id.to_numpy()
    )
    want = np.array(
        [
            -1 if i < 0 else pdf.gal_id.to_numpy()[i]
            for i in pdf.top_host_idx
        ],
        dtype=np.int64,
    )
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError):
        diffsky.host_keys_from_positions(
            np.array([99]), np.array([1], dtype=np.int64)
        )


def test_offset_top_host_idx_matches_reference_semantics():
    """Reference diffsky.py:73-87: file k's indices shift by the total
    length of files 0..k-1; -1 never shifts."""
    a = np.array([0, -1, 0], dtype=np.int64)
    b = np.array([1, 1, -1, 0], dtype=np.int64)
    c = np.array([-1, 0], dtype=np.int64)
    oa, ob, oc = diffsky.offset_top_host_idx([a, b, c])
    np.testing.assert_array_equal(oa, [0, -1, 0])
    np.testing.assert_array_equal(ob, [4, 4, -1, 3])
    np.testing.assert_array_equal(oc, [-1, 7])
    # inputs untouched (the reference mutates; we don't)
    np.testing.assert_array_equal(b, [1, 1, -1, 0])


# ------------------------------------------------------ Spark layer


def _ds(spark, pdf, with_keys=False):
    if with_keys:
        pdf = pdf.copy()
        pdf["top_host_id"] = diffsky.host_keys_from_positions(
            pdf.top_host_idx.to_numpy(), pdf.gal_id.to_numpy()
        )
        pdf = pdf.drop(columns=["top_host_idx"])
    return Dataset(
        spark.createDataFrame(pdf),
        header=OpenCosmoHeader(
            cosmology=Cosmology(H0=70.0, Om0=0.3),
            data_type="synthetic_galaxies",
            unit_convention="comoving",
        ),
    )


def test_attach_host_keys_with_pos_column(spark):
    pdf = _galaxies_pdf()
    want = diffsky.host_keys_from_positions(
        pdf.top_host_idx.to_numpy(), pdf.gal_id.to_numpy()
    )
    pdf2 = pdf.copy()
    pdf2["__pos"] = np.arange(len(pdf))
    ds = _ds(spark, pdf2)
    out = diffsky.attach_host_keys(ds).spark_df.toPandas()
    got = out.set_index("gal_id").top_host_id
    np.testing.assert_array_equal(
        got.loc[pdf.gal_id].to_numpy(), want
    )
    assert "__pos" not in out.columns


def test_concat_synthetic_keys_survive_union(spark):
    """Two files whose positional indices would collide concatenate
    into one key-linked dataset: every galaxy still references the
    same host GALAXY, per the numpy twin of the reference offsets."""
    f1 = _galaxies_pdf(10, seed=5)
    f2 = _galaxies_pdf(8, seed=6)
    f2["gal_id"] = f2["gal_id"] + 1000  # globally unique ids
    for pdf in (f1, f2):
        pdf["__pos"] = np.arange(len(pdf))
    ds1, ds2 = _ds(spark, f1), _ds(spark, f2)
    out = diffsky.concat_synthetic([ds1, ds2]).spark_df.toPandas()
    assert len(out) == 18
    want = {}
    for pdf in (f1, f2):
        keys = diffsky.host_keys_from_positions(
            pdf.top_host_idx.to_numpy(), pdf.gal_id.to_numpy()
        )
        want.update(dict(zip(pdf.gal_id.tolist(), keys.tolist())))
    got = dict(zip(out.gal_id.tolist(), out.top_host_id.tolist()))
    assert got == want
    # id collisions are loud
    f3 = f1.copy()
    with pytest.raises(ValueError, match="collides"):
        diffsky.concat_synthetic([_ds(spark, f1), _ds(spark, f3)])


def test_keep_top_host_closure(spark):
    """Spark closure == the reference keep_top_host_idx semantics
    (diffsky.py:93-110) re-derived in numpy: sample ∪ hosts referenced
    by the sample ∪ all satellites of those hosts."""
    pdf = _galaxies_pdf(16, seed=9)
    full = _ds(spark, pdf, with_keys=True)
    filtered = full._clone(
        full.spark_df.filter("logsm_obs > 10")
    )
    out = diffsky.keep_top_host(full, filtered).spark_df.toPandas()

    # numpy twin of the reference logic, in key space
    keys = diffsky.host_keys_from_positions(
        pdf.top_host_idx.to_numpy(), pdf.gal_id.to_numpy()
    )
    sample = pdf.gal_id.to_numpy()[pdf.logsm_obs.to_numpy() > 10]
    hosts = np.unique(keys[np.isin(pdf.gal_id, sample)])
    hosts = hosts[hosts >= 0]
    satellites = pdf.gal_id.to_numpy()[np.isin(keys, hosts)]
    want = np.union1d(np.union1d(sample, hosts), satellites)
    np.testing.assert_array_equal(np.sort(out.gal_id.to_numpy()), want)
    # no duplicate rows
    assert out.gal_id.is_unique


def test_repartition_by_host_colocates_groups(spark):
    pdf = _galaxies_pdf(40, seed=11)
    ds = _ds(spark, pdf, with_keys=True)
    out = diffsky.repartition_by_host(ds, partitions=6).spark_df
    import pyspark.sql.functions as F

    part = out.withColumn("__p", F.spark_partition_id()).toPandas()
    grouped = part[part.top_host_id >= 0]
    # every host group lives in exactly one partition
    assert (
        grouped.groupby("top_host_id")["__p"].nunique() == 1
    ).all()


def test_register_hooks_and_unit_conversions(spark):
    pdf = _galaxies_pdf(10, seed=13)
    try:
        diffsky.register()
        ds = _ds(spark, pdf, with_keys=True)
        opened = plugins.fire("dataset_open", ds)
        out = opened.spark_df.toPandas().set_index("gal_id")
        keys = diffsky.host_keys_from_positions(
            pdf.top_host_idx.to_numpy(), pdf.gal_id.to_numpy()
        )
        by_id = dict(zip(pdf.gal_id.tolist(), keys.tolist()))
        for gid, k in by_id.items():
            assert out.loc[gid, "is_orphan"] == (k < 0)
            assert out.loc[gid, "is_top_host"] == (k == gid)

        # partition hook: fired the way io.write fires it
        df = ds.spark_df
        new_df = plugins.fire("partition", df, dataset=ds, path=None)
        assert new_df is not df  # hook replaced the layout
        # and it ignores non-synthetic data
        plain = Dataset(df, header=OpenCosmoHeader())
        same = plugins.fire(
            "partition", plain.spark_df, dataset=plain, path=None
        )
        assert same is plain.spark_df
    finally:
        plugins.clear("dataset_open")
        plugins.clear("partition")
        diffsky._registered = False

    # reference test_comoving_to_physical: physical x = comoving x * a
    # with PER-ROW a = 1/(1+redshift_true)
    from opencosmo_spark.units import parse_unit

    ds = Dataset(
        spark.createDataFrame(pdf),
        header=OpenCosmoHeader(
            data_type="synthetic_galaxies", unit_convention="comoving"
        ),
        units={"x": parse_unit("Mpc")},
    )
    phys = ds.with_units("physical").spark_df.toPandas().set_index(
        "gal_id"
    )
    com = pdf.set_index("gal_id")
    a = 1.0 / (1.0 + com.redshift_true)
    np.testing.assert_allclose(
        phys.loc[com.index, "x"], com.x * a, rtol=1e-12
    )
    # reference test_comoving_to_scalefree: must raise
    with pytest.raises(ValueError):
        ds.with_units("scalefree")
