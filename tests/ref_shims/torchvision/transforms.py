"""torchvision.transforms stub: class names the reference references at
module/class-definition time; every instance raises on use."""

import types


def _unavailable(*_a, **_k):
    raise RuntimeError("torchvision.transforms stub: transforms are not "
                       "available in the parity-test environment")


class _Stub:
    def __init__(self, *a, **k):
        pass

    __call__ = _unavailable


class Compose(_Stub):
    pass


class Resize(_Stub):
    pass


class ToTensor(_Stub):
    pass


class ToPILImage(_Stub):
    pass


class Normalize(_Stub):
    pass


class RandomCrop(_Stub):
    pass


class CenterCrop(_Stub):
    pass


class RandomHorizontalFlip(_Stub):
    pass


class RandomVerticalFlip(_Stub):
    pass


class InterpolationMode:
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    NEAREST = "nearest"


def __getattr__(name):
    if name.startswith("__"):
        raise AttributeError(name)
    return _Stub


def _functional_getattr(name):
    if name.startswith("__"):
        raise AttributeError(name)
    return _unavailable


functional = types.ModuleType("torchvision.transforms.functional")
functional.pad = _unavailable
functional.center_crop = _unavailable
functional.resize = _unavailable
functional.crop = _unavailable
functional.__getattr__ = _functional_getattr
