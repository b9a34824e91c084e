"""Item-group union utility — native replacement for the undeclared
``ml_engine.data.grouping.add_items_to_group`` dependency
(used by /root/reference/data/datasets/michigan_dataset.py:57 and
geshaem_dataset.py:61,168).

Semantics: maintain a list of disjoint item groups; adding a list of items
merges every group that intersects it (union-find over incremental sets).
"""

from __future__ import annotations

from typing import Iterable, List, Set


def add_items_to_group(items: Iterable, groups: List[Set]) -> None:
    """Merge ``items`` (and any groups they touch) into a single group
    inside ``groups`` (mutated in place)."""
    items = set(items)
    touching = [g for g in groups if g & items]
    merged = set(items)
    for g in touching:
        merged |= g
        groups.remove(g)
    groups.append(merged)
