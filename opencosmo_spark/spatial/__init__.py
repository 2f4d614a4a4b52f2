from .crossmatch import (
    crossmatch_sky,
    sky_fof_groups,
    sky_pairs,
    uniform_sky_catalog,
    w_theta_landy_szalay,
)
from .region import (
    BoxRegion,
    ConeRegion,
    FullSkyRegion,
    HealpixRegion,
    SkyboxRegion,
    make_box,
    make_cone,
    make_skybox,
)

from .pairs import fof_groups, neighbor_pairs_3d, two_point_correlation

__all__ = [
    "crossmatch_sky",
    "sky_fof_groups",
    "sky_pairs",
    "uniform_sky_catalog",
    "w_theta_landy_szalay",
    "neighbor_pairs_3d",
    "two_point_correlation",
    "fof_groups",
    "BoxRegion",
    "ConeRegion",
    "SkyboxRegion",
    "HealpixRegion",
    "FullSkyRegion",
    "make_box",
    "make_cone",
    "make_skybox",
]
