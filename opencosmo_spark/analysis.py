"""Analysis helpers: the map-reduce surface.

Parity target: reference ``python/opencosmo/analysis/mpi.py:21-196``
(``analysis.reduce``: evaluate per rank, MPI-combine SUM/PROD/AVG) and
the halo-mass-function idiom (:54-58). Spark realization: partial
results per Arrow batch via ``mapInPandas`` combined by a global
aggregation — or, for histogram-shaped reductions, a direct
``groupBy(bin).count()`` that never materializes per-rank partials.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def reduce(
    ds,
    func: Callable,
    operation: str = "sum",
    **kwargs,
) -> np.ndarray | float:
    """Apply ``func`` per Arrow batch; combine partial arrays with
    SUM / PROD / AVG (reference analysis/mpi.py operations).

    ``func(**columns)`` receives numpy arrays for the columns named in
    its signature and must return a numpy array (e.g. a histogram) —
    partials combine associatively, so the result equals a single-pass
    evaluation.
    """
    import inspect

    from pyspark.sql import types as T

    cols = [p for p in inspect.signature(func).parameters if p in ds.columns]
    if not cols:
        raise ValueError("function references no dataset columns")

    probe = ds.spark_df.select(*cols).limit(4).toPandas()
    sample = func(**{c: probe[c].to_numpy() for c in cols}, **kwargs)
    sample = np.atleast_1d(np.asarray(sample, dtype=np.float64))
    width = len(sample)
    schema = T.StructType(
        [T.StructField("partial", T.ArrayType(T.DoubleType())), T.StructField("n", T.LongType())]
    )
    fn = func

    def per_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = fn(**{c: pdf[c].to_numpy() for c in cols}, **kwargs)
            out = np.atleast_1d(np.asarray(out, dtype=np.float64))
            yield pd.DataFrame({"partial": [out.tolist()], "n": [len(pdf)]})

    partials = ds.spark_df.select(*cols).mapInPandas(per_batch, schema)
    idx = list(range(width))
    flat = partials.select(
        F.col("n"), *[F.col("partial")[i].alias(f"p{i}") for i in idx]
    )
    if operation == "sum":
        aggs = [F.sum(f"p{i}").alias(f"p{i}") for i in idx]
    elif operation == "avg":
        # Row-weighted mean, matching the reference's MPI combine
        # (analysis/mpi.py:142-146: weight = len(dataset)/total_size):
        # sum(partial_i * n_i) / sum(n_i), in ONE aggregation — no
        # second job re-executing the mapInPandas pipeline.
        aggs = [F.sum(F.col(f"p{i}") * F.col("n")).alias(f"p{i}") for i in idx]
    elif operation == "prod":
        # product via exp(sum(log)) is lossy; collect partials instead
        rows = flat.collect()
        acc = np.ones(width)
        for r in rows:
            acc *= np.array([r[f"p{i}"] for i in idx])
        return acc if width > 1 else float(acc[0])
    else:
        raise ValueError(f"unknown operation {operation!r}")
    row = flat.agg(F.sum("n").alias("n"), *aggs).collect()[0]
    total = np.array([row[f"p{i}"] for i in idx])
    if operation == "avg":
        total = total / row["n"]
    return total if width > 1 else float(total[0])


def halo_mass_function(
    ds,
    mass_col: str = "fof_halo_mass",
    bins: int = 20,
    lo: float = 11.0,
    hi: float = 15.0,
) -> DataFrame:
    """HMF as a native hash aggregate: groupBy(log-mass bin).count()
    — the scale path (no driver-side arrays at any size)."""
    width = (hi - lo) / bins
    b = F.floor((F.log10(F.col(mass_col)) - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(-1), F.least(F.lit(bins), b)).cast("long")
    return (
        ds.spark_df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("log_mass_lo", F.lit(lo) + F.col("bin") * F.lit(width))
    )


# ---------------------------------------------------------------------
# yt export (reference analysis/yt_utils.py:23-199), import-gated
# ---------------------------------------------------------------------
_YT_SPECIAL_FIELDS = {
    "x": "particle_position_x",
    "y": "particle_position_y",
    "z": "particle_position_z",
    "mass": "particle_mass",
    "rho": "density",
    "hh": "smoothing_length",
}


def yt_particle_payload(data: dict) -> tuple[dict, list[list[float]]]:
    """The engine-side half of ``create_yt_dataset`` (reference
    analysis/yt_utils.py:82-160), runnable without yt installed:

    * members whose name contains "particles" contribute fields;
    * reference field names map to yt's particle conventions
      (x -> particle_position_x, mass -> particle_mass, ...);
    * units travel as strings next to the arrays;
    * littleh-bearing units are rejected — yt has no littleh
      convention; convert with ``with_units("comoving")`` first
      (same error contract as the reference :109-115);
    * the bounding box comes from the x/y/z extrema across members
      (one Spark agg per member, not a driver scan).

    Returns ``(data_dict, bbox)`` with
    ``data_dict[(ptype, yt_field)] = (ndarray, unit_str)`` — exactly
    the structure ``yt.load_particles`` consumes.
    """
    data_dict: dict = {}
    bounds = [[np.inf, -np.inf], [np.inf, -np.inf], [np.inf, -np.inf]]
    for ptype, ds in data.items():
        if "particles" not in ptype:
            continue
        for c, u in ds.units.items():
            if u.h_power != 0:
                raise RuntimeError(
                    "cannot convert factors of littleh to yt convention, "
                    "try converting the dataset to comoving units first "
                    '(ds.with_units("comoving"))'
                )
        ptype_short = ptype.split("_")[0]
        arrays = ds.get_data("numpy")
        units = ds.units
        for field, arr in arrays.items():
            yt_name = _YT_SPECIAL_FIELDS.get(field, field)
            ustr = str(units.get(field, "")) or "dimensionless"
            data_dict[(ptype_short, yt_name)] = (np.asarray(arr), ustr)
        ext = ds.df.agg(
            *[f(c) for c in ("x", "y", "z") for f in (F.min, F.max)]
        ).collect()[0]
        for axis in range(3):
            bounds[axis][0] = min(bounds[axis][0], float(ext[axis * 2]))
            bounds[axis][1] = max(bounds[axis][1], float(ext[axis * 2 + 1]))
    if any(np.isinf(b) for axis in bounds for b in axis):
        raise ValueError(
            "bounding box contains infinite values — no particle member "
            "with x/y/z positions found"
        )
    return data_dict, bounds


def create_yt_dataset(data: dict, **load_kwargs):
    """Convert particle members to a yt particle dataset (reference
    analysis/yt_utils.py:23-199; the pyxsim X-ray path is out of scope).
    Import-gated: yt is not in this image, but the payload construction
    above is real and tested."""
    payload, bbox = yt_particle_payload(data)
    try:
        import yt  # noqa: PLC0415 - optional dep
    except ImportError as exc:  # pragma: no cover - lib not in image
        raise ImportError(
            "yt export needs the 'yt' package (pip install yt); "
            "yt_particle_payload() provides the converted arrays "
            "without it"
        ) from exc
    return yt.load_particles(  # pragma: no cover - needs yt
        {k: v for k, v in payload.items()},
        length_unit="Mpc",
        mass_unit="Msun",
        bbox=bbox,
        periodicity=(False, False, False),
        **load_kwargs,
    )


def approx_stats(
    ds,
    columns: list[str],
    rsd: float = 0.05,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> "pd.DataFrame":
    """Single-pass sketch profile per column: approximate distinct
    count (HyperLogLog++, relative error ``rsd``) and approximate
    percentiles (Greenwald-Khanna, rank error 1/``accuracy``), plus
    exact count/min/max.

    The 100 TB profiling primitive: every sketch is mergeable, so the
    whole profile is ONE scan + one O(sketch-size) combine — no sort,
    no per-column passes, bounded executor memory. (An exact distinct
    would shuffle the full column; an exact median would sort it.)
    """
    df = ds.df if hasattr(ds, "df") else ds
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__distinct"),
            F.percentile_approx(
                c, list(percentiles), accuracy
            ).alias(f"{c}__pct"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    out = []
    for c in columns:
        rec = {
            "column": c,
            "count": row[f"{c}__n"],
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            "approx_distinct": row[f"{c}__distinct"],
        }
        for p, v in zip(percentiles, row[f"{c}__pct"] or []):
            rec[f"p{int(p * 100)}"] = v
        out.append(rec)
    return pd.DataFrame(out)


def _pair_id_col(ds) -> str:
    """Pick the row-identity column for the pair engine. A NON-UNIQUE
    id silently corrupts pair analyses (the a<b filter drops same-id
    pairs; dropDuplicates([a,b]) collapses genuinely distinct pairs —
    think a particle table carrying its halo's fof_halo_tag), so EVERY
    ``*_tag``/``*_id`` column is probed by one combined
    count-vs-distinct aggregate (all candidates, still a single job)
    and the first unique one wins — a particle table whose first
    id-like column is the shared halo tag still finds its own unique
    particle id. If none is unique, fall back to the persisted
    ``__row_id`` (written by ``oc.write``, unique by construction) and
    raise if that's absent too. The probe is one aggregate — cheap
    next to the O(pairs) work that follows."""
    from pyspark.sql import functions as F

    from .dataset import ROW_ID

    cands = [
        c for c in ds.df.columns if c.endswith("_tag") or c.endswith("_id")
    ]
    if cands:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(cands):
            aggs.append(F.count(c).alias(f"n{i}"))
            aggs.append(F.count_distinct(c).alias(f"d{i}"))
        row = ds.df.agg(*aggs).collect()[0]
        for i, c in enumerate(cands):
            # unique AND non-null everywhere (count(c) skips NULLs;
            # a NULL id would vanish from the pair engine silently)
            if row[f"n{i}"] == row["__n"] and row[f"n{i}"] == row[f"d{i}"]:
                return c
    if ROW_ID in ds.df.columns:
        return ROW_ID
    if cands:
        raise ValueError(
            f"no unique id column among {cands} — pair analyses need a "
            f"unique row id; write the dataset with oc.write (persists "
            f"__row_id) or add one"
        )
    raise ValueError(
        "no unique row-id column found (need a unique *_tag/*_id column "
        "or a persisted __row_id) for the pair engine"
    )


def fof(ds, linking_length: float, select_by: tuple[str, str, str] | None = None):
    """Friends-of-friends groups over a Dataset's positions — the
    Dataset-level entry to ``spatial.pairs.fof_groups``: coordinates
    are discovered the same way spatial queries discover them
    (reference spatial/check.py conventions), the box size and
    periodicity come from the header, and the result is
    ``(row id, group_id)`` keyed by the dataset's first id-like
    column (``*_tag`` / ``*_id``), falling back to ``__row_id``.
    """
    from .spatial.bound import find_coords
    from .spatial.pairs import fof_groups

    coords = select_by or find_coords(ds.columns, 3)
    if ds.header is None or ds.header.box_size is None:
        raise ValueError("fof needs header.box_size (periodic box extent)")
    id_col = _pair_id_col(ds)
    return fof_groups(
        ds.df,
        linking_length,
        float(ds.header.box_size),
        id_col=id_col,
        cols=tuple(coords),
    )


def sky_fof(
    ds,
    linking_deg: float,
    select_by: tuple[str, str] | None = None,
):
    """Angular friends-of-friends over a Dataset's sky positions —
    the Dataset-level entry to ``spatial.crossmatch.sky_fof_groups``,
    with RA/Dec resolved like sky regions and the id column passing
    the same uniqueness guard as the 3-D ``fof``."""
    from .spatial.bound import find_coords
    from .spatial.crossmatch import sky_fof_groups

    ra, dec = select_by or find_coords(ds.columns, 2)
    id_col = _pair_id_col(ds)
    return sky_fof_groups(
        ds.df, linking_deg, id_col=id_col, ra_col=ra, dec_col=dec
    )


def w_theta(
    ds,
    bins_deg: list[float],
    select_by: tuple[str, str] | None = None,
    jackknife: bool = False,
    **kw,
):
    """Angular two-point correlation of a Dataset's sky positions
    (Landy-Szalay; ``spatial.crossmatch.w_theta_landy_szalay``) —
    the lightcone-side analysis product. RA/Dec resolve the same way
    sky regions resolve them (``find_coords(.., 2)``); pass
    ``random_df`` for survey-footprint randoms, else full-sky
    uniform randoms are generated (see the estimator's caveat).
    ``jackknife=True`` adds delete-one equal-area-region error bars
    (``spatial.crossmatch.w_theta_jackknife``; ``n_ra`` / ``n_z``
    through ``**kw``)."""
    from .spatial.bound import find_coords
    from .spatial.crossmatch import w_theta_jackknife, w_theta_landy_szalay

    ra, dec = select_by or find_coords(ds.columns, 2)
    id_col = _pair_id_col(ds)
    fn = w_theta_jackknife if jackknife else w_theta_landy_szalay
    return fn(
        ds.df, bins_deg, id_col=id_col, ra_col=ra, dec_col=dec, **kw
    )


def two_point(
    ds,
    bins: list[float],
    select_by: tuple[str, str, str] | None = None,
    estimator: str = "natural",
    **kw,
):
    """Two-point correlation of a Dataset's positions, with
    coordinates and box size resolved from the dataset.
    ``estimator="natural"`` (default) is the periodic-box analytic-RR
    form (``spatial.pairs.two_point_correlation``);
    ``estimator="landy-szalay"`` runs the random-catalog LS estimator
    for non-periodic/survey geometries
    (``spatial.pairs.two_point_landy_szalay``; pass ``random_df`` /
    ``n_random`` / ``seed`` / ``periodic`` through ``**kw``);
    ``estimator="jackknife"`` is the natural estimator with delete-one
    spatial-jackknife error bars
    (``spatial.pairs.two_point_jackknife``; ``n_side`` through
    ``**kw``)."""
    from .spatial.bound import find_coords
    from .spatial.pairs import (
        two_point_correlation,
        two_point_jackknife,
        two_point_landy_szalay,
    )

    coords = select_by or find_coords(ds.columns, 3)
    if ds.header is None or ds.header.box_size is None:
        raise ValueError("two_point needs header.box_size")
    id_col = _pair_id_col(ds)
    if estimator == "landy-szalay":
        return two_point_landy_szalay(
            ds.df, bins, float(ds.header.box_size), id_col=id_col,
            cols=tuple(coords), **kw,
        )
    if estimator == "jackknife":
        return two_point_jackknife(
            ds.df, bins, float(ds.header.box_size), id_col=id_col,
            cols=tuple(coords), **kw,
        )
    if estimator != "natural":
        raise ValueError(
            f"estimator must be 'natural', 'landy-szalay', or "
            f"'jackknife', got {estimator!r}"
        )
    return two_point_correlation(
        ds.df, bins, float(ds.header.box_size), id_col=id_col, cols=tuple(coords)
    )


def make_named_tuple(ds, input_tuple):
    """Typed named-tuple extraction over a Dataset — the Diffsky model
    input helper (parity: reference ``analysis/diffsky.py:16-43``,
    where ``make_named_tuple(dataset, DIFFMAH_INPUT)`` selects the
    tuple's fields and returns the tuple of bare numpy arrays, units
    stripped).

    ``input_tuple`` is a ``namedtuple`` class (or ``typing.NamedTuple``
    subclass); one numpy array per field, in field order, dtypes
    preserved from the parquet columns. Column selection goes through
    ``Dataset.select`` so wildcards/derived-column semantics and the
    missing-column error match the rest of the verb surface — this
    collects, so it is the (driver-small) model-input path, not a
    distributed operator.
    """
    fields = list(input_tuple._fields)
    data = ds.select(fields).get_data("numpy")
    return input_tuple(**{c: data[c] for c in fields})


def power_spectrum(ds, n_mesh: int, select_by=None, **kw):
    """P(k) of a Dataset's positions, with coordinates and box size
    resolved from the dataset (``spatial.power.power_spectrum``
    underneath; ``weight=`` / ``scheme=`` / ``n_bins=`` pass
    through)."""
    from .spatial.bound import find_coords
    from .spatial.power import power_spectrum as _pk

    coords = select_by or find_coords(ds.columns, 3)
    if ds.header is None or ds.header.box_size is None:
        raise ValueError("power_spectrum needs header.box_size")
    return _pk(
        ds.df, n_mesh, float(ds.header.box_size), cols=tuple(coords), **kw
    )


def pairwise_velocity(
    ds,
    bins: list[float],
    select_by: tuple[str, str, str] | None = None,
    vel_by: tuple[str, str, str] | None = None,
    **kw,
):
    """Mean radial pairwise velocity v12(r) of a Dataset — coordinates
    / velocity columns / box size resolved from the dataset
    (``spatial.pairs.pairwise_velocity`` underneath). Velocity columns
    default to the coordinate names prefixed with ``v``
    (x/y/z -> vx/vy/vz), overridable with ``vel_by``."""
    from .spatial.bound import find_coords
    from .spatial.pairs import pairwise_velocity as _v12

    coords = select_by or find_coords(ds.columns, 3)
    vels = vel_by or tuple(f"v{c}" for c in coords)
    missing = [c for c in vels if c not in ds.columns]
    if missing:
        raise ValueError(
            f"pairwise_velocity: velocity columns {missing} not in the "
            f"dataset — pass vel_by explicitly"
        )
    if ds.header is None or ds.header.box_size is None:
        raise ValueError("pairwise_velocity needs header.box_size")
    return _v12(
        ds.df, bins, float(ds.header.box_size), id_col=_pair_id_col(ds),
        cols=tuple(coords), vel_cols=tuple(vels), **kw,
    )


def marked_correlation(
    ds,
    bins: list[float],
    mark_col: str,
    select_by: tuple[str, str, str] | None = None,
    **kw,
):
    """Marked correlation M(r) of a Dataset — coordinates / box size
    resolved from the dataset
    (``spatial.pairs.marked_correlation`` underneath)."""
    from .spatial.bound import find_coords
    from .spatial.pairs import marked_correlation as _mcf

    coords = select_by or find_coords(ds.columns, 3)
    if mark_col not in ds.columns:
        raise ValueError(f"marked_correlation: no column {mark_col!r}")
    if ds.header is None or ds.header.box_size is None:
        raise ValueError("marked_correlation needs header.box_size")
    return _mcf(
        ds.df, bins, float(ds.header.box_size), mark_col=mark_col,
        id_col=_pair_id_col(ds), cols=tuple(coords), **kw,
    )


def counts_in_cells(ds, n_mesh: int, select_by=None, **kw):
    """Counts-in-cells moments of a Dataset's positions at smoothing
    scale box/n_mesh (``spatial.power.counts_in_cells`` underneath;
    ``weight=`` / ``scheme=`` pass through)."""
    from .spatial.bound import find_coords
    from .spatial.power import counts_in_cells as _cic

    coords = select_by or find_coords(ds.columns, 3)
    if ds.header is None or ds.header.box_size is None:
        raise ValueError("counts_in_cells needs header.box_size")
    return _cic(
        ds.df, n_mesh, float(ds.header.box_size), cols=tuple(coords), **kw
    )


def fit_nfw(profile, r_delta: float | None = None) -> dict:
    """Fit an NFW profile rho(r) = rho_s / ((r/r_s)(1 + r/r_s)^2)
    (Navarro, Frenk & White 1996 eq. 3) to a stacked density profile —
    the output of ``spatial.pairs.stacked_radial_profile`` (or any
    DataFrame/pandas frame with ``r_lo``/``r_hi``/``mean_density``
    columns, already driver-small: one row per radial bin).

    The fit is least squares in log rho at the bin mid-radii: for each
    candidate scale radius r_s on a log grid spanning the binned range
    x100 refinement, the best log rho_s is the closed-form mean offset
    (the model is rho_s-linear in log space), so the scan is exact per
    candidate and global over the grid — no iterative optimizer to
    diverge on noisy outer bins. Empty bins (zero density) are
    excluded. Returns ``{rho_s, r_s, log_rms, n_bins}`` plus
    ``concentration`` = r_delta / r_s when ``r_delta`` (the halo
    definition radius, e.g. R200c) is given.

    Cluster cost: none beyond the profile aggregation itself — the
    profile IS the sufficient statistic, so fitting is pure driver
    numpy on ~tens of bins (the same split as the power-spectrum FFT).
    """
    import numpy as np

    if hasattr(profile, "toPandas"):
        pdf = profile.toPandas()
    else:
        pdf = profile
    need = {"r_lo", "r_hi", "mean_density"}
    if not need <= set(pdf.columns):
        raise ValueError(
            f"fit_nfw needs columns {sorted(need)} (a "
            f"stacked_radial_profile output); got {list(pdf.columns)}"
        )
    r = (pdf.r_lo.to_numpy() + pdf.r_hi.to_numpy()) / 2.0
    rho = pdf.mean_density.to_numpy().astype(float)
    ok = (rho > 0) & (r > 0)
    r, rho = r[ok], rho[ok]
    if len(r) < 3:
        raise ValueError(
            f"fit_nfw needs >= 3 non-empty bins, got {len(r)}"
        )
    logrho = np.log(rho)
    best = None
    for rs in np.geomspace(r[0] / 10.0, r[-1] * 10.0, 400):
        x = r / rs
        shape = -np.log(x) - 2.0 * np.log1p(x)  # log of the x-part
        off = float(np.mean(logrho - shape))    # closed-form log rho_s
        rms = float(np.sqrt(np.mean((logrho - shape - off) ** 2)))
        if best is None or rms < best[0]:
            best = (rms, rs, off)
    rms, rs, off = best
    out = {
        "rho_s": float(np.exp(off)),
        "r_s": float(rs),
        "log_rms": rms,
        "n_bins": int(len(r)),
    }
    if r_delta is not None:
        out["concentration"] = float(r_delta) / float(rs)
    return out
