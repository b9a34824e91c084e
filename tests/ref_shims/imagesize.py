"""imagesize import stub (never called by the parity tests)."""


def get(*_a, **_k):
    raise RuntimeError("imagesize stub: not available in the parity-test "
                       "environment")
