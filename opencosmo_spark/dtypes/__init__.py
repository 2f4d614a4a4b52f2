"""Data-type plugin packages (reference ``python/opencosmo/dtypes/``).

Each dtype module ships the derived-column semantics and maintenance
hooks for one catalog family and registers them on the shared plugin
registry (``opencosmo_spark.plugins``). Import the module (or call its
``register()``) to activate — mirroring the reference's entry-point
loading of dtype plugins.
"""

from . import diffsky

__all__ = ["diffsky"]
