"""torchvision.datasets shim: VisionDataset is only a base class for the
reference dataset definitions."""


class VisionDataset:
    def __init__(self, root=None, transforms=None, transform=None,
                 target_transform=None):
        self.root = root
        self.transform = transform
        self.target_transform = target_transform
        self.transforms = transforms

    def __len__(self):
        raise NotImplementedError
