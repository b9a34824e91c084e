"""torchvision.models stub (resnet factories referenced at call time only)."""


def __getattr__(name):
    if name.startswith("__"):
        raise AttributeError(name)

    def _unavailable(*_a, **_k):
        raise RuntimeError(f"torchvision.models.{name} stub: not available "
                           "in the parity-test environment")
    return _unavailable
