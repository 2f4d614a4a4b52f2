"""HDF5 ingest adapter: reference on-disk format -> Spark-native layout.

Parity target: the reference's native format (``/root/reference/
SPEC.md``) — per-column HDF5 datasets under a ``data`` group with
``unit``/``description`` attributes (SPEC.md:24-41, attr names from
``handler/hdf5.py:115-120`` and ``units/get.py:192``), positional
``data_linked`` start/size/idx link groups (SPEC.md:72-83), and an
optional per-file ``header`` group. Opening machinery:
``python/opencosmo/io/iopen.py:77-124``.

This module is the one-time bridge an OpenCosmo user runs on day one:
``hdf5_to_parquet`` converts a SPEC-layout file into this repo's
parquet + JSON-sidecar model (``io/io.py``), materializing the
positional links as explicit key columns (SURVEY §1.2 — "the single
biggest model translation"):

* a ``<name>_start``/``<name>_size`` 1:N link becomes a
  ``__link_<name>`` column ON THE CHILD table holding the source row
  id that owns each child row (equi-join key; size 0 -> no rows);
* a ``<name>_idx`` 1:1 link becomes a ``__link_<name>`` column ON THE
  SOURCE table holding the child row id (sentinel -1 -> null on join,
  reference SPEC.md:81-83).

Scale posture: h5py reads are driver-side (HDF5 is not splittable in
Spark), so this is an ingest tool, batched by ``batch_rows`` to bound
driver memory; the OUTPUT is fully distributed parquet. At 100 TB the
conversion parallelizes per-file (one driver task per HDF5 file — the
reference data model is many files per simulation), after which no
query ever touches HDF5 again.

The numpy link-key algebra (``link_keys_from_ranges`` /
``link_idx_to_column``) is dependency-free and tested
unconditionally; only the file-reading entry points gate on h5py.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Any

import numpy as np

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

LINK_PREFIX = "__link_"
CELL_COL = "__cell_id"  # = spatial.bound.CELL_COL (io stays import-light)


def _require_h5py():
    try:
        import h5py  # noqa: PLC0415

        return h5py
    except ImportError as e:  # pragma: no cover - depends on env
        raise ImportError(
            "hdf5 ingest requires h5py (not bundled in this environment): "
            "pip install h5py, or convert the file elsewhere — every "
            "downstream operator works on the parquet output only"
        ) from e


def link_keys_from_ranges(
    starts: np.ndarray, sizes: np.ndarray, n_child: int, source_ids: np.ndarray | None = None
) -> np.ndarray:
    """Invert a positional (start, size) link: for each CHILD row,
    the id of the source row that owns it (int64; -1 for orphan child
    rows no range covers).

    The reference addresses children positionally — child rows
    [start, start+size) belong to source row i (SPEC.md:76-80) and
    region data must be contiguous. The Spark model replaces that
    with this explicit key column, computed once at ingest: joins
    become hash-equi-joins Catalyst can plan freely, and the
    contiguity requirement disappears.

    ``source_ids`` optionally maps source row position -> a stable id
    column (e.g. halo_tag); default is the source row index.
    """
    starts = np.asarray(starts, dtype=np.int64)
    sizes = np.asarray(sizes, dtype=np.int64)
    if starts.shape != sizes.shape:
        raise ValueError("starts and sizes must have the same length")
    if np.any(sizes < 0):
        raise ValueError("negative link size")
    ends = starts + sizes
    if np.any(ends > n_child):
        raise ValueError("link range exceeds child table length")
    out = np.full(n_child, -1, dtype=np.int64)
    ids = (
        np.asarray(source_ids, dtype=np.int64)
        if source_ids is not None
        else np.arange(len(starts), dtype=np.int64)
    )
    # vectorized scatter: one np.repeat over the covered spans — no
    # python loop over rows (spans are disjoint per SPEC contiguity)
    nz = sizes > 0
    if nz.any():
        span_ids = np.repeat(ids[nz], sizes[nz])
        positions = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts[nz], ends[nz])]
        )
        out[positions] = span_ids
    return out


def link_idx_to_column(idx: np.ndarray) -> np.ndarray:
    """A 1:1 idx link is already a key column; validate the sentinel
    contract (-1 = no link, SPEC.md:81-83) and fix the dtype."""
    idx = np.asarray(idx, dtype=np.int64)
    if np.any(idx < -1):
        raise ValueError("idx link values must be >= -1")
    return idx


def read_hdf5_dataset(
    h5_path: str, group: str | None = None
) -> tuple[dict[str, np.ndarray], dict[str, str], dict[str, str], dict[str, Any]]:
    """Read one SPEC-layout OpenCosmo dataset from an HDF5 file.

    Returns (columns, units, descriptions, header_dict). ``group``
    selects the dataset group in a multi-dataset file (SPEC.md
    "Multiple OpenCosmo Datasets in a File"); None reads a
    single-dataset file rooted at ``/``.
    """
    h5py = _require_h5py()
    columns: dict[str, np.ndarray] = {}
    units: dict[str, str] = {}
    descriptions: dict[str, str] = {}
    header: dict[str, Any] = {}
    with h5py.File(h5_path, "r") as f:
        root = f[group] if group else f
        data = root["data"]
        for name, dset in data.items():
            arr = dset[()]
            if arr.ndim > 1:
                # multi-dim column (SPEC.md:22) -> array column
                arr = [row.tolist() for row in arr]
            columns[name] = arr
            u = dset.attrs.get("unit")
            if u is not None and str(u) not in ("", "None"):
                units[name] = str(u)
            d = dset.attrs.get("description")
            if d is not None:
                descriptions[name] = str(d)
        hgrp = root["header"] if "header" in root else f.get("header")
        if hgrp is not None:
            def walk(g, out):
                for k, v in g.attrs.items():
                    out[k] = v.item() if hasattr(v, "item") else v
                for k, v in g.items():
                    out[k] = {}
                    walk(v, out[k])
            walk(hgrp, header)
    return columns, units, descriptions, header


def read_links(h5_path: str, group: str | None = None) -> dict[str, dict[str, np.ndarray]]:
    """Read the ``data_linked`` group: {link_name: {"start": ...,
    "size": ...} | {"idx": ...}} (SPEC.md:72-83)."""
    h5py = _require_h5py()
    links: dict[str, dict[str, np.ndarray]] = {}
    with h5py.File(h5_path, "r") as f:
        root = f[group] if group else f
        if "data_linked" not in root:
            return links
        for name, dset in root["data_linked"].items():
            for suffix in ("start", "size", "idx"):
                if name.endswith("_" + suffix):
                    base = name[: -len(suffix) - 1]
                    links.setdefault(base, {})[suffix] = dset[()]
                    break
    return links


def hdf5_to_parquet(
    h5_path: str,
    out_path: str,
    spark: "SparkSession | None" = None,
    group: str | None = None,
    child_groups: dict[str, str] | None = None,
    overwrite: bool = False,
) -> None:
    """Convert a SPEC-layout HDF5 file into this engine's on-disk
    model: ``<out_path>/`` parquet + header sidecar (io/io.py), with
    positional links materialized as ``__link_*`` key columns.

    ``child_groups`` maps link names to the HDF5 group holding the
    link TARGET (e.g. {"haloparticles": "halo_particles"}); each child
    is written alongside as ``<out_path>_<link>`` with the generated
    key column attached.
    """
    from ..dataset import Dataset
    from ..header import OpenCosmoHeader
    from ..units import parse_unit
    from .io import write_dataset

    _require_h5py()
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    import pandas as pd

    columns, units, descriptions, header = read_hdf5_dataset(h5_path, group)
    links = read_links(h5_path, group)

    # 1:1 idx links live on the source table
    for name, parts in links.items():
        if "idx" in parts:
            columns[LINK_PREFIX + name] = link_idx_to_column(parts["idx"])

    pdf = pd.DataFrame(columns)
    hdr = _header_from_hdf5(header)
    ds = Dataset(
        spark.createDataFrame(pdf),
        header=hdr,
        units={c: parse_unit(u) for c, u in units.items()},
        descriptions=descriptions,
    )
    write_dataset(out_path, ds, overwrite=overwrite)

    # 1:N start/size links invert onto each child table
    for name, parts in links.items():
        if "start" not in parts:
            continue
        child_group = (child_groups or {}).get(name)
        if child_group is None:
            continue
        ccols, cunits, cdescs, _ = read_hdf5_dataset(h5_path, child_group)
        n_child = len(next(iter(ccols.values())))
        ccols[LINK_PREFIX + name] = link_keys_from_ranges(
            parts["start"], parts["size"], n_child
        )
        cds = Dataset(
            spark.createDataFrame(pd.DataFrame(ccols)),
            header=hdr,
            units={c: parse_unit(u) for c, u in cunits.items()},
            descriptions=cdescs,
        )
        write_dataset(
            os.path.join(os.path.dirname(out_path) or ".",
                         os.path.basename(out_path) + "_" + name),
            cds,
            overwrite=overwrite,
        )


def _header_from_hdf5(raw: dict[str, Any]):
    """Map the reference header group's nested attrs into an
    OpenCosmoHeader. Recognized keys (searched at any nesting level,
    case-insensitive): hubble constant (h / H0 / hubble), matter
    density (omega_m / Om0), redshift (redshift / z), box size. The
    full raw tree is preserved under ``extra['hdf5_header']``."""
    from ..header import Cosmology, OpenCosmoHeader

    flat: dict[str, Any] = {}

    def walk(d: dict):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v)
            else:
                flat.setdefault(str(k).lower(), v)

    walk(raw or {})

    def pick(*names, default=None):
        for n in names:
            if n in flat:
                try:
                    return float(flat[n])
                except (TypeError, ValueError):
                    continue
        return default

    ckw = {}
    h = pick("h", "hubble", "h0")
    if h is not None:
        ckw["H0"] = h * 100.0 if h < 10 else h
    om = pick("omega_m", "om0")
    if om is not None:
        ckw["Om0"] = om
    return OpenCosmoHeader(
        cosmology=Cosmology(**ckw),
        redshift=pick("redshift", "z", default=0.0),
        box_size=pick("box_size", default=None),
        extra={"hdf5_header": _jsonable(raw)} if raw else {},
    )


def _jsonable(d):
    if isinstance(d, dict):
        return {k: _jsonable(v) for k, v in d.items()}
    if isinstance(d, (np.integer,)):
        return int(d)
    if isinstance(d, (np.floating,)):
        return float(d)
    if isinstance(d, (np.ndarray,)):
        return d.tolist()
    if isinstance(d, bytes):
        return d.decode("utf-8", "replace")
    return d


# ---------------------------------------------------------------------
# export: Spark-native layout -> reference on-disk format
# ---------------------------------------------------------------------
def octree_index_ranges(
    cells: np.ndarray, level: int, dims: int = 3
) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """Rebuild the SPEC spatial-index tree (SPEC.md "index": per-level
    ``start``/``size`` over z-order cells) from a per-row cell-id
    column sorted ascending — the inverse of the cell-id-column model
    this engine uses in place of the reference's row-range tree.

    ``cells`` are Morton ids at ``level`` (``octree.morton_cell_column``
    — the same z-order family SPEC.md:56-60 prescribes). Level ``l``'s
    cell of a row is its level-``level`` id right-shifted by
    ``dims * (level - l)``, so coarser levels are prefix aggregations:
    one bincount + cumsum per level, no python loop over rows.

    Returns {lvl: (starts, sizes)} for lvl in 0..level, sizes summing
    to len(cells) at every level.
    """
    cells = np.asarray(cells, dtype=np.int64)
    if np.any(cells < 0) or (
        len(cells) and int(cells.max()) >= 1 << (dims * level)
    ):
        raise ValueError(f"cell ids out of range for level {level}")
    if np.any(np.diff(cells) < 0):
        raise ValueError("rows must be sorted by cell id (export sorts)")
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for lvl in range(level + 1):
        shift = dims * (level - lvl)
        ncell = 1 << (dims * lvl)
        sizes = np.bincount(cells >> shift, minlength=ncell).astype(
            np.int64
        )
        starts = np.concatenate(
            [[0], np.cumsum(sizes)[:-1]]
        ).astype(np.int64)
        out[lvl] = (starts, sizes)
    return out


def ranges_from_link_keys(
    child_keys: np.ndarray,
    n_source: int,
    source_ids: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Invert ``link_keys_from_ranges``: from a CHILD table's link-key
    column (already sorted/grouped by key — the export path sorts),
    the positional (start, size) arrays the reference format stores on
    the source side (SPEC.md:76-80). Orphan children (key -1) must be
    sorted first and are covered by no range; sources with no children
    get size 0 and start = the next covered offset (any value is valid
    for an empty range; this one keeps starts monotone).

    ``source_ids`` maps source row position -> the id space the key
    column uses (default: the row index).
    """
    child_keys = np.asarray(child_keys, dtype=np.int64)
    if np.any(np.diff(child_keys) < 0):
        raise ValueError("child keys must be sorted (sort_by the link key)")
    ids = (
        np.asarray(source_ids, dtype=np.int64)
        if source_ids is not None
        else np.arange(n_source, dtype=np.int64)
    )
    if len(ids) != n_source:
        raise ValueError("source_ids length != n_source")
    # positions of each source id's block in the sorted child keys
    starts = np.searchsorted(child_keys, ids, side="left").astype(np.int64)
    ends = np.searchsorted(child_keys, ids, side="right").astype(np.int64)
    return starts, ends - starts


def dataset_to_hdf5(
    ds,
    h5_path: str,
    group: str | None = None,
    children: "dict[str, Any] | None" = None,
    overwrite: bool = False,
) -> None:
    """Export a Dataset back to the reference SPEC layout — the
    round-trip twin of ``hdf5_to_parquet`` for users who interchange
    with reference tooling: per-column datasets under ``data`` with
    ``unit``/``description`` attributes (SPEC.md:24-41), the header
    group, and positional ``data_linked`` entries rebuilt from the
    explicit ``__link_*`` key columns.

    ``children`` maps link names to child Datasets carrying
    ``__link_<name>``; each child is sorted by its key (restoring the
    SPEC contiguity contract), written to the group
    ``<name>`` with its own data group, and the inverted
    (start, size) arrays land in the SOURCE group's ``data_linked``.
    1:1 ``__link_<name>`` columns on the source itself export as
    ``<name>_idx`` (null -> -1 sentinel, SPEC.md:81-83).

    When the dataset carries the ingest-time ``__cell_id`` column and
    its header records ``tree_level``, the SPEC spatial ``index``
    group is rebuilt too (``octree_index_ranges``): rows are sorted by
    cell id (restoring the tree's contiguity contract) and every level
    0..tree_level gets its ``start``/``size`` datasets, so reference
    tooling can spatially query the exported file. Internal columns
    (``__row_id``, ``__cell_id``, ``__link_*``) never appear in
    ``data`` — they are this engine's representation of what the SPEC
    stores positionally.

    Driver-side like all HDF5 touchpoints (the format is not
    splittable); at scale export one file per partition-range the same
    way ingest parallelizes per-file.
    """
    h5py = _require_h5py()
    import pandas as pd  # noqa: F401

    if os.path.exists(h5_path) and not overwrite:
        raise FileExistsError(f"{h5_path} exists (pass overwrite=True)")

    def _column_arrays(d, sort_cell=False):
        """(columns, orig_positions): orig_positions is the pre-sort
        row position of each output row (None when no sort applied) —
        the id space positional link keys were minted in."""
        pdf = d.df.toPandas()
        orig_pos = None
        if sort_cell and CELL_COL in pdf.columns:
            # SPEC index/tree contiguity: region rows must be adjacent
            order = np.argsort(
                pdf[CELL_COL].to_numpy(), kind="stable"
            )
            pdf = pdf.iloc[order].reset_index(drop=True)
            orig_pos = order.astype(np.int64)
        out = {}
        for c in pdf.columns:
            v = pdf[c]
            if len(v) and isinstance(v.iloc[0], (list, np.ndarray)):
                out[c] = np.stack([np.asarray(x) for x in v])
            else:
                out[c] = v.to_numpy()
        return out, orig_pos

    def _write_data_group(root, d, cols):
        data = root.create_group("data")
        units = getattr(d, "_units", {}) or {}
        descs = getattr(d, "_descriptions", {}) or {}
        for name, arr in cols.items():
            if name.startswith("__"):
                # engine-internal (__row_id / __cell_id / __link_*):
                # the SPEC stores these positionally, not as columns
                continue
            if arr.dtype == object:
                arr = arr.astype("S")
            dset = data.create_dataset(name, data=arr)
            u = units.get(name)
            if u is not None and str(u) not in ("", "None"):
                dset.attrs["unit"] = str(u)
            if name in descs:
                dset.attrs["description"] = str(descs[name])

    def _write_index_group(root, d, cols):
        hdr_ = getattr(d, "_header", None)
        lvl = int(((getattr(hdr_, "extra", None) or {})).get(
            "tree_level", 0
        )) if hdr_ is not None else 0
        if not lvl or CELL_COL not in cols:
            return
        igrp = root.create_group("index")
        igrp.attrs["index_type"] = "octtree"
        for l, (starts, sizes) in octree_index_ranges(
            cols[CELL_COL], lvl
        ).items():
            g = igrp.create_group(f"level_{l}")
            g.create_dataset("start", data=starts)
            g.create_dataset("size", data=sizes)

    with h5py.File(h5_path, "w") as f:
        root = f.create_group(group) if group else f
        src_cols, src_orig_pos = _column_arrays(ds, sort_cell=True)
        n_src = len(next(iter(src_cols.values()))) if src_cols else 0
        _write_data_group(root, ds, src_cols)
        _write_index_group(root, ds, src_cols)

        linked = None
        # 1:1 idx links carried on the source
        for name, arr in src_cols.items():
            if not name.startswith(LINK_PREFIX):
                continue
            lname = name[len(LINK_PREFIX):]
            idx = np.where(np.isnan(arr.astype("float64")), -1, arr).astype(
                np.int64
            ) if arr.dtype.kind == "f" else arr.astype(np.int64)
            linked = linked or root.create_group("data_linked")
            linked.create_dataset(lname + "_idx", data=idx)

        # 1:N links rebuilt from each child's key column. Positional
        # key values were minted against the source order AS GIVEN, so
        # if the cell sort permuted the source, the permutation is the
        # id lookup (ranges_from_link_keys source_ids).
        for lname, child in (children or {}).items():
            key = LINK_PREFIX + lname
            cdf = child.df.orderBy(key) if key in child.df.columns else child.df
            csorted = type(child)(
                cdf,
                header=getattr(child, "_header", None),
                units=getattr(child, "_units", None),
                descriptions=getattr(child, "_descriptions", None),
            )
            ccols, _ = _column_arrays(csorted)
            if key not in ccols:
                raise ValueError(f"child {lname!r} lacks {key} column")
            starts, sizes = ranges_from_link_keys(
                ccols[key], n_src, source_ids=src_orig_pos
            )
            linked = linked or root.create_group("data_linked")
            linked.create_dataset(lname + "_start", data=starts)
            linked.create_dataset(lname + "_size", data=sizes)
            cgrp = root.create_group(lname)
            _write_data_group(cgrp, child, ccols)

        hdr = getattr(ds, "_header", None)
        if hdr is not None:
            hgrp = root.create_group("header")
            cos = hgrp.create_group("cosmology")
            c = getattr(hdr, "cosmology", None)
            if c is not None:
                for attr in ("H0", "Om0", "Ode0", "w0", "wa"):
                    v = getattr(c, attr, None)
                    if v is not None:
                        cos.attrs[attr] = float(v)
            for attr in ("redshift", "box_size"):
                v = getattr(hdr, attr, None)
                if v is not None:
                    hgrp.attrs[attr] = v


def structure_collection_to_hdf5(
    collection, h5_path: str, overwrite: bool = False
) -> None:
    """Export a ``StructureCollection`` as a SPEC multi-dataset file
    (SPEC.md "Multiple OpenCosmo Datasets in a File"): one group per
    member (``/<source>/{data,data_linked,index}``, ``/<child>/data``)
    plus the shared root ``/header`` — the layout the reference itself
    writes for halo_properties + halo_particles files, so a collection
    processed here round-trips into the reference toolchain.

    Links are re-expressed positionally from the collection's
    LinkSpecs: for a 1:N link the child is written sorted by its
    ``child_key`` and the source group gets ``<name>_start``/
    ``<name>_size`` computed over the source's ``source_key`` values;
    for a 1:1 link the source group gets ``<name>_idx`` holding the
    child ROW position (or -1), matching SPEC.md:81-83.
    """
    h5py = _require_h5py()

    if os.path.exists(h5_path) and not overwrite:
        raise FileExistsError(f"{h5_path} exists (pass overwrite=True)")

    members = collection.members()
    src_name = collection.source_name
    source = members[src_name]
    links = collection.links

    def _pdf_arrays(pdf):
        out = {}
        for c in pdf.columns:
            v = pdf[c]
            if len(v) and isinstance(v.iloc[0], (list, np.ndarray)):
                out[c] = np.stack([np.asarray(x) for x in v])
            else:
                out[c] = v.to_numpy()
        return out

    def _write_data(root, d, cols):
        data = root.create_group("data")
        units = getattr(d, "_units", {}) or {}
        descs = getattr(d, "_descriptions", {}) or {}
        for name, arr in cols.items():
            if name.startswith("__"):
                continue
            if arr.dtype == object:
                arr = arr.astype("S")
            dset = data.create_dataset(name, data=arr)
            u = units.get(name)
            if u is not None and str(u) not in ("", "None"):
                dset.attrs["unit"] = str(u)
            if name in descs:
                dset.attrs["description"] = str(descs[name])

    src_pdf = source.df.toPandas()
    if CELL_COL in src_pdf.columns:
        order = np.argsort(src_pdf[CELL_COL].to_numpy(), kind="stable")
        src_pdf = src_pdf.iloc[order].reset_index(drop=True)
    src_cols = _pdf_arrays(src_pdf)

    with h5py.File(h5_path, "w") as f:
        sgrp = f.create_group(src_name)
        _write_data(sgrp, source, src_cols)
        hdr = getattr(source, "_header", None)
        lvl = int(((getattr(hdr, "extra", None) or {})).get(
            "tree_level", 0
        )) if hdr is not None else 0
        if lvl and CELL_COL in src_cols:
            igrp = sgrp.create_group("index")
            igrp.attrs["index_type"] = "octtree"
            for l, (st, sz) in octree_index_ranges(
                src_cols[CELL_COL], lvl
            ).items():
                g = igrp.create_group(f"level_{l}")
                g.create_dataset("start", data=st)
                g.create_dataset("size", data=sz)

        linked = None
        for lname, spec in links.items():
            child = members.get(lname)
            if child is None:
                continue
            cpdf = child.df.toPandas()
            ckeys = cpdf[spec.child_key].to_numpy()
            skeys = src_pdf[spec.source_key].to_numpy()
            if spec.kind == "1:N":
                # child grouped by key; source rows address their span
                corder = np.argsort(ckeys, kind="stable")
                cpdf = cpdf.iloc[corder].reset_index(drop=True)
                sorted_keys = np.asarray(ckeys, np.int64)[corder]
                starts = np.searchsorted(
                    sorted_keys, skeys, side="left"
                ).astype(np.int64)
                ends = np.searchsorted(
                    sorted_keys, skeys, side="right"
                ).astype(np.int64)
                linked = linked or sgrp.create_group("data_linked")
                linked.create_dataset(lname + "_start", data=starts)
                linked.create_dataset(lname + "_size", data=ends - starts)
            else:  # 1:1 — child row position per source row, -1 gap
                corder = np.arange(len(cpdf))
                pos_by_key = {
                    int(k): int(i) for i, k in enumerate(ckeys)
                }
                idx = np.array(
                    [pos_by_key.get(int(k), -1) for k in skeys],
                    dtype=np.int64,
                )
                linked = linked or sgrp.create_group("data_linked")
                linked.create_dataset(lname + "_idx", data=idx)
            cgrp = f.create_group(lname)
            _write_data(cgrp, child, _pdf_arrays(cpdf))

        if hdr is not None:
            hgrp = f.create_group("header")
            cos = hgrp.create_group("cosmology")
            c = getattr(hdr, "cosmology", None)
            if c is not None:
                for attr in ("H0", "Om0", "Ode0", "w0", "wa"):
                    v = getattr(c, attr, None)
                    if v is not None:
                        cos.attrs[attr] = float(v)
            for attr in ("redshift", "box_size"):
                v = getattr(hdr, attr, None)
                if v is not None:
                    hgrp.attrs[attr] = v


def write_hdf5(ds, h5_path: str, overwrite: bool = False, **kw) -> None:
    """One entry point for HDF5 export (the ``oc.write`` twin for the
    reference's on-disk format): dispatches on the input —
    ``StructureCollection`` -> multi-dataset SPEC file
    (``structure_collection_to_hdf5``), ``Dataset`` ->
    single-dataset SPEC file (``dataset_to_hdf5``; pass ``children=``
    for ad-hoc 1:N companions)."""
    from ..collection.structure import StructureCollection

    if isinstance(ds, StructureCollection):
        structure_collection_to_hdf5(ds, h5_path, overwrite=overwrite)
    else:
        dataset_to_hdf5(ds, h5_path, overwrite=overwrite, **kw)
