"""Matter power spectrum P(k): distributed mass-assignment gridding
plus a driver-side FFT — the standard two-step every published P(k)
estimator runs (NGP/CIC assignment, |δ(k)|² shell average, optional
window deconvolution; cf. Hockney & Eastwood 1988 for the assignment
schemes and Jing 2005 for the window corrections; the same pipeline
nbodykit exposes on MPI).

Scale shape: the mass assignment is the distributed part and it is
ONE aggregation — each particle contributes to 1 (NGP) or 8 (CIC)
mesh cells via a JVM explode of weighted cell contributions, then a
groupBy(cell) sum. The shuffle carries (8-byte cell id, double), ∝
particles, never particles². The mesh itself is the only thing that
reaches the driver: n_mesh³ doubles (128³ ≈ 16 MB) — the FFT is a
dense O(n³ log n) problem that belongs in numpy, not in a shuffle.
The 100 TB pattern is billions of particles → one aggregation → a
fixed-size mesh, which is exactly how the MPI codes do it too (they
reduce the mesh, then FFT).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def density_mesh(
    df: DataFrame,
    n_mesh: int,
    box_size: float,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    weight: str | None = None,
    scheme: str = "cic",
) -> DataFrame:
    """Periodic mass-assignment mesh: one row per non-empty cell,
    ``(cell, mass)`` with ``cell = (ix*n + iy)*n + iz``.

    ``scheme="ngp"``: nearest grid point — each particle lands in one
    cell. ``scheme="cic"``: cloud-in-cell — trilinear weights over the
    8 surrounding cells, built as a JVM array of (cell, weight)
    structs and exploded; total assigned mass is exactly the total
    particle weight. Positions wrap periodically.
    """
    if scheme not in ("ngp", "cic"):
        raise ValueError(f"scheme must be 'ngp' or 'cic', got {scheme!r}")
    h = box_size / n_mesh
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    xs = [F.col(c).cast("double") for c in cols]

    if scheme == "ngp":
        idx = [
            F.pmod(F.floor(x / h).cast("long"), F.lit(n_mesh)) for x in xs
        ]
        cell = (idx[0] * n_mesh + idx[1]) * n_mesh + idx[2]
        return (
            df.select(cell.alias("cell"), w.alias("__w"))
            .groupBy("cell")
            .agg(F.sum("__w").alias("mass"))
        )

    # CIC: s = p/h - 0.5 puts cell CENTERS on the grid; the particle
    # splits between floor(s) and floor(s)+1 per axis with weights
    # (1-f, f)
    s = [x / h - 0.5 for x in xs]
    i0 = [F.floor(si).cast("long") for si in s]
    f = [si - F.floor(si) for si in s]
    contribs = []
    for dx in (0, 1):
        wx = f[0] if dx else (1.0 - f[0])
        for dy in (0, 1):
            wy = f[1] if dy else (1.0 - f[1])
            for dz in (0, 1):
                wz = f[2] if dz else (1.0 - f[2])
                ix = F.pmod(i0[0] + dx, F.lit(n_mesh))
                iy = F.pmod(i0[1] + dy, F.lit(n_mesh))
                iz = F.pmod(i0[2] + dz, F.lit(n_mesh))
                contribs.append(
                    F.struct(
                        ((ix * n_mesh + iy) * n_mesh + iz).alias("cell"),
                        (w * wx * wy * wz).alias("w"),
                    )
                )
    return (
        df.select(F.explode(F.array(*contribs)).alias("c"))
        .select(F.col("c.cell").alias("cell"), F.col("c.w").alias("__w"))
        .groupBy("cell")
        .agg(F.sum("__w").alias("mass"))
    )


# Driver memory budget for the dense FFT mesh: 512³ doubles = 1 GiB.
# Anything larger is almost certainly a mistake on a shared driver —
# callers that really want it must raise the budget explicitly.
MAX_MESH_CELLS = 512**3


def _check_mesh_budget(n_mesh: int, max_mesh_cells: int) -> None:
    if n_mesh**3 > max_mesh_cells:
        raise ValueError(
            f"n_mesh={n_mesh} needs a dense {n_mesh}^3 = {n_mesh**3:,} "
            f"cell driver mesh ({n_mesh**3 * 8 / 2**30:.1f} GiB), over "
            f"the max_mesh_cells budget of {max_mesh_cells:,}. Pass a "
            "larger max_mesh_cells explicitly if the driver can hold it."
        )


def _mesh_to_numpy(
    mesh_df: DataFrame, n_mesh: int, max_mesh_cells: int = MAX_MESH_CELLS
) -> np.ndarray:
    """Assemble the sparse ``(cell, mass)`` aggregate into the dense
    driver mesh the FFT needs. Arrow transfer (``toPandas``) + one
    vectorized numpy scatter — no per-row Python loop; the transfer
    cost is the occupied-cell count, the dense array is n_mesh³
    doubles. Guarded by ``max_mesh_cells`` (default 512³ = 1 GiB)
    because the dense mesh lives on the driver.
    """
    _check_mesh_budget(n_mesh, max_mesh_cells)
    pdf = mesh_df.toPandas()
    rho = np.zeros(n_mesh**3)
    rho[pdf["cell"].to_numpy(dtype=np.int64)] = pdf["mass"].to_numpy(
        dtype=np.float64
    )
    return rho.reshape(n_mesh, n_mesh, n_mesh)


def power_spectrum(
    df: DataFrame,
    n_mesh: int,
    box_size: float,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    weight: str | None = None,
    scheme: str = "cic",
    n_bins: int | None = None,
    compensated: bool = True,
    subtract_shot_noise: bool = True,
    max_mesh_cells: int = MAX_MESH_CELLS,
) -> dict:
    """Shell-averaged matter power spectrum of a periodic particle
    box. Returns ``{"k": ..., "power": ..., "n_modes": ...,
    "shot_noise": float}`` (numpy arrays; k in 1/length units of the
    box, power in length³).

    Pipeline: ``density_mesh`` (distributed, one aggregation) → driver
    FFT of the overdensity δ = ρ/ρ̄ - 1 → P(k) = |δ(k)|² · V averaged
    in spherical shells of the fundamental-mode width 2π/L.
    ``compensated`` divides out the assignment window (sinc per axis:
    power 1 NGP, 2 CIC — Jing 2005 eq. 20 leading order);
    ``subtract_shot_noise`` removes the V/N Poisson floor (weighted:
    V·Σw²/(Σw)²).
    """
    _check_mesh_budget(n_mesh, max_mesh_cells)
    mesh = density_mesh(df, n_mesh, box_size, cols, weight, scheme)
    if weight:
        stats = df.agg(
            F.sum(F.col(weight).cast("double")).alias("sw"),
            F.sum(F.col(weight).cast("double") ** 2).alias("sw2"),
        ).first()
        total_w, sw2 = float(stats["sw"]), float(stats["sw2"])
    else:
        total_w = float(df.count())
        sw2 = total_w
    if total_w == 0:
        raise ValueError("empty particle set")
    rho = _mesh_to_numpy(mesh, n_mesh, max_mesh_cells)
    volume = box_size**3
    delta = rho / rho.mean() - 1.0
    dk = np.fft.rfftn(delta) / n_mesh**3
    pk3 = np.abs(dk) ** 2 * volume

    kf = 2.0 * np.pi / box_size
    freqs = np.fft.fftfreq(n_mesh, d=1.0 / n_mesh)  # integer wavenumbers
    rfreqs = freqs[: n_mesh // 2 + 1]
    kx = freqs[:, None, None]
    ky = freqs[None, :, None]
    kz = rfreqs[None, None, :]

    if compensated:
        p = {"ngp": 1, "cic": 2}[scheme]

        def win(m):
            return np.sinc(m / n_mesh) ** p

        wgrid = win(kx) * win(ky) * win(kz)
        pk3 = pk3 / wgrid**2

    # rfft stores only half the modes: weight the duplicated ones x2
    mult = np.full(pk3.shape, 2.0)
    mult[:, :, 0] = 1.0
    if n_mesh % 2 == 0:
        mult[:, :, -1] = 1.0

    kmag = np.sqrt(kx**2 + ky**2 + kz**2) * kf
    nb = n_bins or (n_mesh // 2)
    edges = np.linspace(0, kf * (n_mesh // 2), nb + 1)
    idx = np.digitize(kmag.ravel(), edges) - 1
    ok = (idx >= 0) & (idx < nb) & (kmag.ravel() > 0)
    n_modes = np.bincount(idx[ok], weights=mult.ravel()[ok], minlength=nb)
    psum = np.bincount(
        idx[ok], weights=(pk3 * mult).ravel()[ok], minlength=nb
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        power = psum / n_modes
    k_centers = 0.5 * (edges[:-1] + edges[1:])
    shot = volume * sw2 / total_w**2
    if subtract_shot_noise:
        power = power - shot
    keep = n_modes > 0
    return {
        "k": k_centers[keep],
        "power": power[keep],
        "n_modes": n_modes[keep],
        "shot_noise": shot,
    }


def cross_power_spectrum(
    df_a: DataFrame,
    df_b: DataFrame,
    n_mesh: int,
    box_size: float,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    weight_a: str | None = None,
    weight_b: str | None = None,
    scheme: str = "cic",
    n_bins: int | None = None,
    compensated: bool = True,
    max_mesh_cells: int = MAX_MESH_CELLS,
) -> dict:
    """Cross power spectrum P_AB(k) of two tracer sets (halos x
    matter, two samples, ...): Re[δ_A(k) δ_B*(k)] shell-averaged.
    Same distributed gridding per side, one driver FFT each; the
    cross spectrum has no Poisson shot noise for disjoint tracers, so
    none is subtracted. The auto spectrum of the same input equals
    ``power_spectrum(..., subtract_shot_noise=False)`` exactly.
    """
    _check_mesh_budget(n_mesh, max_mesh_cells)
    meshes = []
    for d, wcol in ((df_a, weight_a), (df_b, weight_b)):
        m = density_mesh(d, n_mesh, box_size, cols, wcol, scheme)
        rho = _mesh_to_numpy(m, n_mesh, max_mesh_cells)
        if rho.sum() == 0:
            raise ValueError("empty particle set")
        meshes.append(rho / rho.mean() - 1.0)
    volume = box_size**3
    da = np.fft.rfftn(meshes[0]) / n_mesh**3
    db = np.fft.rfftn(meshes[1]) / n_mesh**3
    pk3 = np.real(da * np.conj(db)) * volume

    kf = 2.0 * np.pi / box_size
    freqs = np.fft.fftfreq(n_mesh, d=1.0 / n_mesh)
    rfreqs = freqs[: n_mesh // 2 + 1]
    kx = freqs[:, None, None]
    ky = freqs[None, :, None]
    kz = rfreqs[None, None, :]
    if compensated:
        p = {"ngp": 1, "cic": 2}[scheme]

        def win(m):
            return np.sinc(m / n_mesh) ** p

        wgrid = win(kx) * win(ky) * win(kz)
        pk3 = pk3 / wgrid**2
    mult = np.full(pk3.shape, 2.0)
    mult[:, :, 0] = 1.0
    if n_mesh % 2 == 0:
        mult[:, :, -1] = 1.0
    kmag = np.sqrt(kx**2 + ky**2 + kz**2) * kf
    nb = n_bins or (n_mesh // 2)
    edges = np.linspace(0, kf * (n_mesh // 2), nb + 1)
    idx = np.digitize(kmag.ravel(), edges) - 1
    ok = (idx >= 0) & (idx < nb) & (kmag.ravel() > 0)
    n_modes = np.bincount(idx[ok], weights=mult.ravel()[ok], minlength=nb)
    psum = np.bincount(
        idx[ok], weights=(pk3 * mult).ravel()[ok], minlength=nb
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        power = psum / n_modes
    k_centers = 0.5 * (edges[:-1] + edges[1:])
    keep = n_modes > 0
    return {
        "k": k_centers[keep],
        "power": power[keep],
        "n_modes": n_modes[keep],
    }


def sample_mesh_at(
    df: DataFrame,
    mesh: DataFrame,
    n_mesh: int,
    box_size: float,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    id_col: str = "halo_tag",
    out_col: str = "delta",
    mesh_total: float | None = None,
) -> DataFrame:
    """Local overdensity δ at each object's position — environment
    tagging (halo-assembly / conformity analyses): trilinearly
    interpolate the ``density_mesh`` field back to the points with
    the SAME CIC kernel that built it.

    Fully distributed, no driver mesh: each object explodes into its
    8 (cell, weight) contributions (identical JVM expressions to the
    assignment side), equi-joins the sparse mesh on the cell id, and
    aggregates Σ wᵢ·δᵢ per object — cells absent from the sparse mesh
    are EMPTY, i.e. δ = -1, handled by the coalesce. Works for meshes
    far too large to broadcast; the shuffles carry (cell id, weight)
    and (id, partial) pairs only. ``mesh_total`` skips the mesh-sum
    job when the caller already knows the total mass.
    """
    h = box_size / n_mesh
    if mesh_total is None:
        mesh_total = float(mesh.agg(F.sum("mass")).first()[0] or 0.0)
    if mesh_total <= 0:
        raise ValueError("empty mesh")
    mean_mass = mesh_total / n_mesh**3

    xs = [F.col(c).cast("double") for c in cols]
    s = [x / h - 0.5 for x in xs]
    i0 = [F.floor(si).cast("long") for si in s]
    f = [si - F.floor(si) for si in s]
    contribs = []
    for dx in (0, 1):
        wx = f[0] if dx else (1.0 - f[0])
        for dy in (0, 1):
            wy = f[1] if dy else (1.0 - f[1])
            for dz in (0, 1):
                wz = f[2] if dz else (1.0 - f[2])
                ix = F.pmod(i0[0] + dx, F.lit(n_mesh))
                iy = F.pmod(i0[1] + dy, F.lit(n_mesh))
                iz = F.pmod(i0[2] + dz, F.lit(n_mesh))
                contribs.append(
                    F.struct(
                        ((ix * n_mesh + iy) * n_mesh + iz).alias("cell"),
                        (wx * wy * wz).alias("w"),
                    )
                )
    ex = df.select(
        F.col(id_col), F.explode(F.array(*contribs)).alias("c")
    ).select(
        id_col, F.col("c.cell").alias("cell"), F.col("c.w").alias("__w")
    )
    delta = F.coalesce(
        F.col("mass") / F.lit(mean_mass) - 1.0, F.lit(-1.0)
    )
    env = (
        ex.join(mesh, "cell", "left")
        .select(id_col, (F.col("__w") * delta).alias("__wd"))
        .groupBy(id_col)
        .agg(F.sum("__wd").alias(out_col))
    )
    return df.join(env, id_col, "left")


def counts_in_cells(
    df: DataFrame,
    n_mesh: int,
    box_size: float,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    weight: str | None = None,
    scheme: str = "ngp",
) -> dict:
    """Counts-in-cells moments of the density field at smoothing scale
    ``box_size / n_mesh`` — the classic one-point clustering statistic
    (Peebles 1980 §36; White 1979): variance, skewness, and kurtosis
    of the cell-count distribution, plus the density-contrast forms
    cosmology actually quotes:

    - ``delta_var``: Var(delta) with delta = m/mbar - 1,
    - ``delta_var_shotnoise_corrected``: Var(delta) - 1/mbar — the
      Poisson shot-noise subtraction (exactly 0 in expectation for an
      unclustered NGP count field),
    - ``s3``: the hierarchical skewness S3 = <delta^3>/<delta^2>^2
      (= 34/7 in perturbation theory for Gaussian initial conditions),
    - ``skewness``/``kurtosis``: standardized central moments of the
      raw cell masses.

    EMPTY cells count: the sparse mesh stores only occupied cells, so
    the raw power sums S_k = sum(m^k) are taken over occupied cells
    (empty ones add zero) and every central moment is formed over the
    FULL n_mesh^3 population on the driver. One ``density_mesh``
    aggregation is the only cluster work; the driver holds five
    numbers, never the mesh. For moments at several smoothing scales,
    call per n_mesh — each is one independent aggregation.
    """
    mesh = density_mesh(df, n_mesh, box_size, cols, weight, scheme)
    m = F.col("mass")
    row = mesh.agg(
        F.count(F.lit(1)).alias("nocc"),
        F.sum(m).alias("s1"),
        F.sum(m * m).alias("s2"),
        F.sum(m * m * m).alias("s3"),
        F.sum(m * m * m * m).alias("s4"),
    ).collect()[0]
    n_cells = n_mesh**3
    nocc = int(row["nocc"] or 0)
    s1 = float(row["s1"] or 0.0)
    s2 = float(row["s2"] or 0.0)
    s3 = float(row["s3"] or 0.0)
    s4 = float(row["s4"] or 0.0)
    mean = s1 / n_cells
    # central moments over ALL cells (empty cells enter through the
    # n_cells denominator and the -mean shifts)
    m2 = s2 / n_cells - mean**2
    m3 = s3 / n_cells - 3 * mean * s2 / n_cells + 2 * mean**3
    m4 = (
        s4 / n_cells
        - 4 * mean * s3 / n_cells
        + 6 * mean**2 * s2 / n_cells
        - 3 * mean**4
    )
    out = {
        "n_mesh": n_mesh,
        "cell_size": box_size / n_mesh,
        "n_cells": n_cells,
        "n_occupied": nocc,
        "mean": mean,
        "variance": m2,
        "skewness": m3 / m2**1.5 if m2 > 0 else 0.0,
        "kurtosis": m4 / m2**2 - 3.0 if m2 > 0 else 0.0,
    }
    if mean > 0:
        dvar = m2 / mean**2
        out["delta_var"] = dvar
        out["delta_var_shotnoise_corrected"] = dvar - 1.0 / mean
        d2 = dvar
        d3 = m3 / mean**3
        out["s3"] = d3 / d2**2 if d2 > 0 else 0.0
    else:
        out["delta_var"] = 0.0
        out["delta_var_shotnoise_corrected"] = 0.0
        out["s3"] = 0.0
    return out


def tracer_bias(
    tracers: DataFrame,
    matter: DataFrame,
    n_mesh: int,
    box_size: float,
    cols: tuple[str, str, str] = ("x", "y", "z"),
    weight_tracers: str | None = None,
    weight_matter: str | None = None,
    scheme: str = "cic",
    n_bins: int | None = None,
    max_mesh_cells: int = MAX_MESH_CELLS,
) -> dict:
    """Scale-dependent tracer bias from the three spectra
    (Dekel & Lahav 1999 conventions):

        b(k) = P_tm(k) / P_mm(k),
        r(k) = P_tm(k) / sqrt(P_tt(k) * P_mm(k))  (stochasticity),

    with P_tm the cross spectrum (no shot noise for distinct
    tracers), P_mm and P_tt the auto spectra WITHOUT shot-noise
    subtraction so a tracer set equal to the matter field gives
    b = r = 1 identically (the estimator-consistency null the tests
    pin). For shot-noise-corrected large-scale bias, read the
    cross/auto ratio at low k where the correction is negligible, or
    subtract ``1/nbar`` from the autos downstream — corrections are a
    modeling choice, not hard-wired.

    Cost: the two mass-assignment aggregations (tracer + matter mesh)
    are the only cluster work — the three spectra share them; FFTs
    and ratios are driver numpy on the fixed-size meshes. Returns
    ``{k, b, r, p_tm, p_tt, p_mm, n_modes}``.
    """
    _check_mesh_budget(n_mesh, max_mesh_cells)
    meshes = []
    for d, wcol in ((tracers, weight_tracers), (matter, weight_matter)):
        m = density_mesh(d, n_mesh, box_size, cols, wcol, scheme)
        rho = _mesh_to_numpy(m, n_mesh, max_mesh_cells)
        if rho.sum() == 0:
            raise ValueError("empty particle set")
        meshes.append(rho / rho.mean() - 1.0)
    volume = box_size**3
    dt = np.fft.rfftn(meshes[0]) / n_mesh**3
    dm = np.fft.rfftn(meshes[1]) / n_mesh**3
    if scheme == "cic":
        # the same Jing (2005) deconvolution power_spectrum applies
        freqs = np.fft.fftfreq(n_mesh, d=1.0 / n_mesh)
        rfreqs = freqs[: n_mesh // 2 + 1]

        def win(m):
            arg = np.pi * m / n_mesh
            w = np.ones_like(m, dtype=float)
            nz = m != 0
            w[nz] = (np.sin(arg[nz]) / arg[nz]) ** 2
            return w

        wx = win(freqs)[:, None, None]
        wy = win(freqs)[None, :, None]
        wz = win(rfreqs)[None, None, :]
        dt = dt / (wx * wy * wz)
        dm = dm / (wx * wy * wz)
    p_tm3 = np.real(dt * np.conj(dm)) * volume
    p_tt3 = np.abs(dt) ** 2 * volume
    p_mm3 = np.abs(dm) ** 2 * volume

    kf = 2.0 * np.pi / box_size
    freqs = np.fft.fftfreq(n_mesh, d=1.0 / n_mesh)
    rfreqs = freqs[: n_mesh // 2 + 1]
    kmag = (
        np.sqrt(
            freqs[:, None, None] ** 2
            + freqs[None, :, None] ** 2
            + rfreqs[None, None, :] ** 2
        )
        * kf
    )
    mult = np.full(kmag.shape, 2.0)
    mult[..., 0] = 1.0
    if n_mesh % 2 == 0:
        mult[..., -1] = 1.0
    nb = n_bins or (n_mesh // 2)
    edges = np.linspace(kf, kf * (n_mesh // 2), nb + 1)
    which = np.digitize(kmag.ravel(), edges) - 1
    ok = (which >= 0) & (which < nb) & (kmag.ravel() > 0)
    w = mult.ravel()[ok]
    idx = which[ok]
    n_modes = np.bincount(idx, weights=w, minlength=nb)
    k_mean = np.bincount(idx, weights=w * kmag.ravel()[ok], minlength=nb)
    ptm = np.bincount(idx, weights=w * p_tm3.ravel()[ok], minlength=nb)
    ptt = np.bincount(idx, weights=w * p_tt3.ravel()[ok], minlength=nb)
    pmm = np.bincount(idx, weights=w * p_mm3.ravel()[ok], minlength=nb)
    keep = n_modes > 0
    k_mean = k_mean[keep] / n_modes[keep]
    ptm, ptt, pmm = (
        ptm[keep] / n_modes[keep],
        ptt[keep] / n_modes[keep],
        pmm[keep] / n_modes[keep],
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        b = np.where(pmm > 0, ptm / pmm, np.nan)
        r = np.where(
            (pmm > 0) & (ptt > 0), ptm / np.sqrt(ptt * pmm), np.nan
        )
    return {
        "k": k_mean.tolist(),
        "b": b.tolist(),
        "r": r.tolist(),
        "p_tm": ptm.tolist(),
        "p_tt": ptt.tolist(),
        "p_mm": pmm.tolist(),
        "n_modes": n_modes[keep].tolist(),
    }
