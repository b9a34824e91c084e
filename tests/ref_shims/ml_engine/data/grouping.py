"""ml_engine grouping shim -> our re-implementation (same semantics,
locked by tests/test_datasets_misc.py)."""

from vit_ed_tpu.data.grouping import add_items_to_group  # noqa: F401
