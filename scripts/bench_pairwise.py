"""End-to-end sharded pairwise-scan benchmark on synthetic data.

Measures the effective pairs/s of the full PairwiseScorer dataflow
(row-block encode, column-batch token prep, chunked pair scoring with
pipelined dispatch) — the realistic rate of the HisFrag O(N^2) eval.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vit_ed_tpu.models.vit_ed import ViTED
from vit_ed_tpu.parallel.mesh import create_mesh
from vit_ed_tpu.parallel.pairs import PairwiseScorer


class SyntheticDataset:
    def __init__(self, n, size):
        self.n = n
        self.size = size
        self.rng = np.random.default_rng(0)

    def __getitem__(self, i):
        g = np.random.default_rng(i)
        return g.normal(size=(self.size, self.size, 3)).astype(np.float32), i

    def __len__(self):
        return self.n


def main(n=192, img_size=512, patch=16, depth=12, c_depth=12, embed=384,
         heads=6, batch=32, pair_chunk=256):
    model = ViTED(img_size=img_size, patch_size=patch, num_classes=1,
                  embed_dim=embed, depth=depth, c_depth=c_depth,
                  num_heads=heads, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 2, img_size, img_size, 3)))
    mesh = create_mesh()
    scorer = PairwiseScorer(model, variables["params"], mesh, num_outputs=1,
                            pair_chunk=pair_chunk)
    ds = SyntheticDataset(n, img_size)

    # warm the compiled programs on one row block
    t0 = time.time()
    scorer.score_dataset(ds, batch_size=batch, num_workers=8)
    warm = time.time() - t0
    t0 = time.time()
    scorer.score_dataset(ds, batch_size=batch, num_workers=8)
    hot = time.time() - t0
    n_pairs = n * (n + 1) // 2
    print(f"N={n} pairs={n_pairs} warm={warm:.1f}s hot={hot:.1f}s "
          f"-> {n_pairs / hot:.1f} pairs/s (incl. host pipeline)")
    # projected time for HisFrag20 test (N~20000)
    big_n = 20000
    big_pairs = big_n * (big_n + 1) / 2
    print(f"projected HisFrag20 N=20k scan: {big_pairs / (n_pairs / hot) / 3600:.1f} h/chip")


if __name__ == "__main__":
    main()
