"""torchvision import stub — module-level names the reference data/model
files touch (datasets.VisionDataset base class, transforms.*, models.*).
Raises loudly if any transform actually runs: the parity tests feed both
trainers identical pre-built batches, so nothing here should ever be
called."""

import sys

from . import datasets, models, transforms  # noqa: F401

# `import torchvision.transforms.functional as F` needs submodule entries
sys.modules.setdefault(__name__ + ".transforms", transforms)
sys.modules.setdefault(__name__ + ".transforms.functional",
                       transforms.functional)
sys.modules.setdefault(__name__ + ".datasets", datasets)
sys.modules.setdefault(__name__ + ".models", models)
