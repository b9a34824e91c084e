"""Dataset factory (reference data/build.py:83-114): returns
(dataset, repeat) where repeat multiplies the epoch length."""

from __future__ import annotations


def build_dataset(mode, config, transforms):
    patch_size = config.DATA.IMG_SIZE
    repeat = 1
    transform = transforms[mode]
    name = config.DATA.DATASET

    if name == "hisfrag20":
        from vit_ed_tpu.data.hisfrag import HisFrag20

        split = HisFrag20.Split.from_string(mode)
        repeat = 3
        dataset = HisFrag20(config.DATA.DATA_PATH, split, transform=transform)
    elif name == "div2k":
        from vit_ed_tpu.data.div2k import DIV2KPatch

        split = DIV2KPatch.Split.from_string(mode)
        repeat = 5 if split.is_train() else 10
        dataset = DIV2KPatch(config.DATA.DATA_PATH, split, transform=transform,
                             with_negative=True, image_size=patch_size,
                             erosion_ratio=config.DATA.EROSION_RATIO)
    elif name == "div2k_triplet":
        from vit_ed_tpu.data.div2k import Div2kPatchTriplet

        split = Div2kPatchTriplet.Split.from_string(mode)
        repeat = 5 if split.is_train() else 10
        dataset = Div2kPatchTriplet(config.DATA.DATA_PATH, split, transform=transform,
                                    with_negative=True, image_size=patch_size,
                                    erosion_ratio=config.DATA.EROSION_RATIO)
    elif name == "pajigsaw":
        from vit_ed_tpu.data.pajigsaw import Pajigsaw

        split = Pajigsaw.Split.from_string(mode)
        dataset = Pajigsaw(config.DATA.DATA_PATH, split, transform=transform,
                           image_size=patch_size)
    elif name == "michigan":
        from vit_ed_tpu.data.michigan import MichiganDataset

        split = MichiganDataset.Split.from_string(mode)
        repeat = 3 if split.is_train() else 1
        dataset = MichiganDataset(config.DATA.DATA_PATH, split, transforms=transform)
    elif name == "geshaem":
        from vit_ed_tpu.data.geshaem import GeshaemPatch

        split = GeshaemPatch.Split.from_string(mode)
        dataset = GeshaemPatch(config.DATA.DATA_PATH, split, transform=transform)
    else:
        raise NotImplementedError(f"We haven't supported {name}")

    return dataset, repeat
