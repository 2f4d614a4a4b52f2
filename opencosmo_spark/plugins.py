"""Plugin hook registry.

Parity target: reference ``python/opencosmo/plugins/contexts.py:20-27``
and the hook decorator in ``plugins/hook.py`` — DatasetOpen /
DatasetInstantiate / IndexUpdate / PostSort / Partition contexts, with
per-hook ``when`` predicates, consumed by the Diffsky dtype plugin
(``dtypes/diffsky.py``). The Spark engine exposes the same contexts as
driver-side callables firing on plan-construction events:

* ``dataset_open`` — after ``oc.open`` builds a Dataset (io.py);
* ``dataset_instantiate`` — after a typed collection (Lightcone,
  StructureCollection, HealpixMap) is assembled around datasets;
* ``post_sort`` — after ``sort_by`` re-declares the ordering;
* ``partition`` — before a clustered write chooses its layout;
* ``index_update`` — accepted for parity; the reference fires it when
  its row index changes under filters, a concern Catalyst owns here,
  so the engine never fires it itself (tests may, via ``fire``).

Hooks run in registration order; each may return a replacement object
(the reference's fold semantics) or ``None`` to keep the current one.
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

_REGISTRY: dict[str, list[tuple[Callable, Callable | None]]] = defaultdict(list)


def register(context: str, when: Callable | None = None) -> Callable:
    """Decorator registering a hook, optionally gated by a ``when``
    predicate over the hooked object (reference ``hook(..., when=...)``,
    dtypes/diffsky.py:120-123)."""
    if context not in CONTEXTS:
        raise ValueError(f"unknown plugin context {context!r}; valid: {CONTEXTS}")

    def deco(fn: Callable) -> Callable:
        _REGISTRY[context].append((fn, when))
        return fn

    return deco


def fire(context: str, obj, **kwargs):
    """Fold registered hooks over ``obj`` in registration order (each
    may return a replacement, mirroring the reference's plugin fold);
    gated hooks re-evaluate their predicate against the CURRENT fold
    value, so an earlier hook's replacement can enable or disable a
    later one."""
    for fn, when in _REGISTRY.get(context, ()):
        if when is not None and not when(obj):
            continue
        result = fn(obj, **kwargs)
        if result is not None:
            obj = result
    return obj


def clear(context: str | None = None) -> None:
    if context is None:
        _REGISTRY.clear()
    else:
        _REGISTRY.pop(context, None)
