from .crossmatch import crossmatch_sky
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

__all__ = [
    "crossmatch_sky",
    "BoxRegion",
    "ConeRegion",
    "SkyboxRegion",
    "HealpixRegion",
    "FullSkyRegion",
    "make_box",
    "make_cone",
    "make_skybox",
]
