"""pytorch_metric_learning.utils.common_functions shim: the two pieces the
reference samplers use (data/samplers.py:272-306)."""

import numpy as np

NUMPY_RANDOM = np.random


def get_labels_to_indices(labels):
    labels = np.asarray(labels)
    return {label: np.flatnonzero(labels == label)
            for label in np.unique(labels)}
