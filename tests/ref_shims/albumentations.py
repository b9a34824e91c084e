"""albumentations import stub — satisfies the reference data modules'
module-level imports; the parity tests never run the augmentations."""


def _unavailable(*_a, **_k):
    raise RuntimeError("albumentations stub: augmentations are not "
                       "available in the parity-test environment")


class _Stub:
    def __init__(self, *a, **k):
        pass

    __call__ = _unavailable


class Compose(_Stub):
    pass


class ShiftScaleRotate(_Stub):
    pass


class RGBShift(_Stub):
    pass


class CoarseDropout(_Stub):
    pass


class GaussNoise(_Stub):
    pass


def __getattr__(name):
    if name.startswith("__"):
        raise AttributeError(name)
    return _Stub
