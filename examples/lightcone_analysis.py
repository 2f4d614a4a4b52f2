"""End-to-end example: lightcone observables — convert an (ra, dec,
redshift) catalog to comoving Cartesian coordinates, then run the
angular and 3-D statistics on the same data.

    python examples/lightcone_analysis.py

Every step is the public package API; the conversion is a pushable
JVM projection, so at survey scale this pipeline adds no shuffle
beyond the statistics themselves.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.collection.lightcone import (  # noqa: E402
    lightcone_to_cartesian,
)
from opencosmo_spark.header import Cosmology  # noqa: E402
from opencosmo_spark.spatial.crossmatch import (  # noqa: E402
    w_theta_jackknife,
)
from opencosmo_spark.spatial.pairs import neighbor_pairs_3d  # noqa: E402


def make_lightcone(spark, n_field=3000, n_clumps=20, seed=13):
    """A shallow mock lightcone: uniform sky + angular clumps, with
    redshifts drawn uniformly in comoving volume-ish fashion."""
    rng = np.random.default_rng(seed)
    ra = rng.uniform(0, 360, n_field)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n_field)))
    cra, cdec = rng.uniform(0, 360, n_clumps), np.degrees(
        np.arcsin(rng.uniform(-0.9, 0.9, n_clumps))
    )
    ra = np.concatenate([ra] + [c + rng.normal(0, 0.4, 60) for c in cra])
    dec = np.concatenate(
        [dec] + [c + rng.normal(0, 0.4, 60) for c in cdec]
    )
    dec = np.clip(dec, -89.9, 89.9)
    z = rng.uniform(0.05, 0.6, len(ra)) ** (1 / 3) * 0.6
    return spark.createDataFrame(
        [
            (i, float(r % 360.0), float(d), float(zz))
            for i, (r, d, zz) in enumerate(zip(ra, dec, z))
        ],
        ["id", "ra", "dec", "redshift"],
    )


def main():
    spark = get_spark("lightcone-example")
    lc = make_lightcone(spark)
    print(f"lightcone: {lc.count()} objects")

    # 1. angular clustering with jackknife error bars
    w = w_theta_jackknife(lc, [0.2, 1.0, 4.0], n_random=6000).collect()
    for r in w:
        print(
            f"w({r['t_lo']:.1f}-{r['t_hi']:.1f} deg) = "
            f"{r['w']:.3f} +- {r['w_err']:.3f}"
        )

    # 2. to comoving Cartesian (Mpc/h) and a 3-D neighbor query
    cart = lightcone_to_cartesian(lc, Cosmology())
    stats = cart.selectExpr(
        "min(comoving_distance) AS dmin", "max(comoving_distance) AS dmax"
    ).collect()[0]
    print(
        f"comoving depth: {stats['dmin']:.0f} - {stats['dmax']:.0f} Mpc/h"
    )
    # non-periodic pair count in a 20 Mpc/h radius — positions span
    # the full sphere, so use a bounding box comfortably containing it
    span = 2.2 * stats["dmax"]
    shifted = cart.selectExpr(
        "id", f"x + {span/2} AS x", f"y + {span/2} AS y",
        f"z + {span/2} AS z",
    )
    pairs = neighbor_pairs_3d(
        shifted, 20.0, span, id_col="id", periodic=False
    )
    print(f"3-D pairs within 20 Mpc/h: {pairs.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
