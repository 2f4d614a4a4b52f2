"""SimulationCollection: datasets from different simulations, every
operation broadcast over the members.

Parity target: reference
``python/opencosmo/collection/simulation/simulation.py:32`` (broadcast
at :75-117). Pure driver-side dict wrapper — each member keeps its own
lazy plan.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

from ..dataset import Dataset

_BROADCAST = {
    "filter",
    "select",
    "drop",
    "with_new_columns",
    "take",
    "take_range",
    "sort_by",
    "bound",
    "with_units",
    "cone_search",
    "box_search",
}


class SimulationCollection:
    def __init__(self, members: Mapping[str, Dataset]):
        self._members = dict(members)

    def __getitem__(self, name: str) -> Dataset:
        return self._members[name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._members)

    def __len__(self) -> int:
        return len(self._members)

    def keys(self):
        return self._members.keys()

    def values(self):
        return self._members.values()

    def items(self):
        return self._members.items()

    def __repr__(self) -> str:
        return f"SimulationCollection({sorted(self._members)})"

    def __getattr__(self, name: str):
        if name in _BROADCAST:

            def broadcast(*args, **kwargs) -> "SimulationCollection":
                return SimulationCollection(
                    {
                        k: getattr(ds, name)(*args, **kwargs)
                        for k, ds in self._members.items()
                    }
                )

            return broadcast
        raise AttributeError(name)

    def evaluate(self, func: Callable, **kwargs) -> dict:
        """Broadcast an evaluate over members; returns per-member
        results (reference simulation.py:355-419)."""
        return {
            k: ds.evaluate(func, **kwargs) for k, ds in self._members.items()
        }
