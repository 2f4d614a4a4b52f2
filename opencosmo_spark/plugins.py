"""Plugin hook registry (reference parity stub).

Parity target: reference ``python/opencosmo/plugins/contexts.py:20-27``
— DatasetOpen / DatasetInstantiate / IndexUpdate / PostSort /
Partition hooks consumed by the Diffsky dtype plugin. The Spark engine
exposes the same contexts as driver-side callables; registration is a
plain decorator. Index/partition hooks are no-ops by design (Catalyst
owns those concerns here) but are accepted and invoked for parity.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable

CONTEXTS = (
    "dataset_open",
    "dataset_instantiate",
    "index_update",
    "post_sort",
    "partition",
)

_REGISTRY: dict[str, list[Callable]] = defaultdict(list)


def register(context: str) -> Callable:
    if context not in CONTEXTS:
        raise ValueError(f"unknown plugin context {context!r}; valid: {CONTEXTS}")

    def deco(fn: Callable) -> Callable:
        _REGISTRY[context].append(fn)
        return fn

    return deco


def fire(context: str, obj, **kwargs):
    """Fold registered hooks over ``obj`` (each may return a
    replacement, mirroring the reference's plugin fold)."""
    for fn in _REGISTRY.get(context, ()):
        result = fn(obj, **kwargs)
        if result is not None:
            obj = result
    return obj


def clear(context: str | None = None) -> None:
    if context is None:
        _REGISTRY.clear()
    else:
        _REGISTRY.pop(context, None)
