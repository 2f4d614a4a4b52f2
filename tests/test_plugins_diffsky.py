"""Diffsky-shaped plugin consumer: the full context set wired end to
end (reference ``python/opencosmo/dtypes/diffsky.py`` — conditional
hooks over synthetic_galaxies data with a ``top_host_idx`` column).

The Spark twin differs where the execution model does: the reference
remaps POSITIONAL host indices after sorts/filters because its rows
are addressed by position; here links are key-based, so the consumer's
jobs become (a) derive columns at open, (b) co-locate host groups at
write via the partition hook, (c) observe ordering declarations.
"""

import numpy as np
import pandas as pd
import pytest

import opencosmo_spark as oc
from opencosmo_spark import Dataset, OpenCosmoHeader, plugins


def _synthetic_galaxies(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "gal_id": np.arange(12, dtype=np.int64),
            # hosts reference gal_ids; -1 = orphan
            "top_host_idx": np.array(
                [0, 0, 0, 3, 3, -1, 6, 6, 6, 6, -1, 3], dtype=np.int64
            ),
            "mass": np.linspace(1e10, 1e12, 12),
        }
    )
    ds = Dataset(
        spark.createDataFrame(pdf),
        header=OpenCosmoHeader(data_type="synthetic_galaxies"),
    )
    path = str(tmp_path / "synthetic_galaxies")
    oc.write(path, ds)
    return path


def _is_synthetic_with_hosts(ds):
    return (
        getattr(ds, "header", None) is not None
        and ds.header.data_type == "synthetic_galaxies"
        and "top_host_idx" in ds.columns
    )


def test_diffsky_consumer_full_context_set(spark, tmp_path):
    events = []

    # --- open: derive is_orphan (reference _attach_top_host_idx_column
    # adds a derived column at DatasetOpen the same way)
    @plugins.register("dataset_open", when=_is_synthetic_with_hosts)
    def attach_orphan_flag(ds):
        from opencosmo_spark import col

        events.append("open")
        return ds.with_new_columns(is_orphan=col("top_host_idx") == -1)

    # --- gating: this hook must NOT fire for non-synthetic data
    @plugins.register(
        "dataset_open",
        when=lambda ds: getattr(ds, "header", None) is not None
        and ds.header.data_type == "other_type",
    )
    def never_fires(ds):
        events.append("WRONG")

    # --- post_sort fires after every ordering declaration
    @plugins.register("post_sort", when=_is_synthetic_with_hosts)
    def observe_sort(ds):
        events.append(("post_sort", ds.sorted_by))

    # --- partition: co-locate host groups before the write (the Spark
    # twin of _partition_by_top_host_groups, diffsky.py:186-216)
    @plugins.register("partition")
    def partition_by_host(df, dataset=None, path=None):
        events.append("partition")
        if "top_host_idx" in df.columns:
            return df.repartition(2, "top_host_idx")

    try:
        path = _synthetic_galaxies(spark, tmp_path)
        assert "partition" in events  # fired during oc.write

        ds = oc.open(path)
        assert events.count("open") == 1
        assert "WRONG" not in events
        # the open hook's derived column is present and correct
        data = ds.get_data("pandas").set_index("gal_id")
        assert bool(data.loc[5, "is_orphan"]) and bool(data.loc[10, "is_orphan"])
        assert int(data.is_orphan.sum()) == 2

        sorted_ds = ds.sort_by("mass", invert=True)
        assert ("post_sort", (("mass", False),)) in events
        assert sorted_ds.sorted_by == (("mass", False),)
    finally:
        plugins.clear()


def test_instantiate_fires_for_typed_collections(spark, fixtures):
    seen = []

    @plugins.register("dataset_instantiate")
    def on_instantiate(obj):
        seen.append(type(obj).__name__)

    try:
        oc.open(f"{fixtures}/healpix_map")
        # multi-path open links into a StructureCollection
        oc.open(f"{fixtures}/halo_properties", f"{fixtures}/dm_particles")
        assert "HealpixMap" in seen
        assert "StructureCollection" in seen
        # plain datasets do NOT instantiate
        seen.clear()
        oc.open(f"{fixtures}/halo_properties")
        assert seen == []
    finally:
        plugins.clear()


def test_fold_order_and_gating_reevaluation(spark):
    """Hooks run in registration order; each replacement feeds the
    next hook, and `when` predicates see the CURRENT fold value (an
    earlier hook can enable a later one)."""
    pdf = pd.DataFrame({"x": [1.0]})
    ds = Dataset(spark.createDataFrame(pdf))

    order = []

    @plugins.register("index_update")
    def first(obj):
        order.append("first")
        return obj.with_new_columns(enabled=oc.col("x") * 0 + 1)

    @plugins.register(
        "index_update", when=lambda obj: "enabled" in obj.columns
    )
    def second(obj):
        order.append("second")

    try:
        out = plugins.fire("index_update", ds)
        assert order == ["first", "second"]
        assert "enabled" in out.columns
    finally:
        plugins.clear()


def test_make_named_tuple_diffsky_semantics(spark, fixtures):
    """Mirrors reference analysis/diffsky.py:16-43: select exactly the
    tuple's fields, return the namedtuple of bare numpy arrays in
    field order with dtypes preserved; a missing field errors like any
    select of an unknown column."""
    from collections import namedtuple

    from opencosmo_spark.analysis import make_named_tuple

    ds = oc.open(f"{fixtures}/halo_properties")

    HaloInput = namedtuple("HaloInput", ["fof_halo_mass", "fof_halo_tag"])
    out = make_named_tuple(ds, HaloInput)
    assert isinstance(out, HaloInput)
    ref = ds.get_data("numpy")
    # field order, values, and dtype all preserved
    assert out._fields == ("fof_halo_mass", "fof_halo_tag")
    np.testing.assert_array_equal(out.fof_halo_mass, ref["fof_halo_mass"])
    np.testing.assert_array_equal(out.fof_halo_tag, ref["fof_halo_tag"])
    assert out.fof_halo_mass.dtype == ref["fof_halo_mass"].dtype
    assert out.fof_halo_tag.dtype == ref["fof_halo_tag"].dtype
    # positional access follows field order (the model-input contract)
    np.testing.assert_array_equal(out[0], ref["fof_halo_mass"])

    Missing = namedtuple("Missing", ["fof_halo_mass", "no_such_col"])
    with pytest.raises(Exception, match="no_such_col"):
        make_named_tuple(ds, Missing)
