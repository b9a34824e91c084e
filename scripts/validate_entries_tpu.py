"""Hardware validation of the remaining CLI entries on the REAL backend.

The pytest suite exercises every entry on the virtual CPU mesh
(tests/test_entries.py, test_michigan.py); bench/verify runs cover
main.py / hisfrag.py / evaluation.py on the actual TPU. This script
drives the REST of the reference CLI surface (SURVEY.md §2.6) on
whatever backend `jax.devices()` gives — on the bench host, the real
v5e chip — with tiny synthetic datasets:

    michigan.py       train epoch + the O(N^2) validate scan
    pajigsaw.py       train (includes puzzle-solving validation)
    main_vit.py       triplet training + puzzle testing -> solver
    hisfrag_vit.py    embedding training + distance-matrix validate
    geshame_evaluation.py   standard all-pairs eval + metrics
    lr_finder.py      LR range test

Prints one PASS/FAIL line per entry; exits non-zero on any failure.
Run: python scripts/validate_entries_tpu.py
"""

import json
import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from PIL import Image


class Args:
    cfg = None
    opts = None
    batch_size = None
    data_path = None
    geshaem_data_path = None
    pretrained = None
    resume = None
    accumulation_steps = None
    use_checkpoint = None
    disable_amp = True
    output = None
    tag = "hwval"
    mode = "train"
    eval = None
    throughput = None
    optim = None
    keep_attn = None
    eval_n_items_per_category = 5
    distance_reduction = "min"


PJS_HEAD = """
MODEL:
  TYPE: pjs
  NAME: {name}
  NUM_CLASSES: {ncls}
  DROP_PATH_RATE: 0.0
  PJS:
    EMBED_DIM: 32
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
    C_DEPTH: 1
"""

VIT_HEAD = """
MODEL:
  TYPE: vit
  NAME: {name}
  NUM_CLASSES: {ncls}
  DROP_PATH_RATE: 0.0
  VIT:
    EMBED_DIM: 32
    PATCH_SIZE: 32
    NUM_HEADS: 2
    DEPTH: 1
"""

TAIL = """
DATA:
  DATASET: {dataset}
  IMG_SIZE: 64
  BATCH_SIZE: {batch}
  TEST_BATCH_SIZE: 16
  NUM_WORKERS: 0
TRAIN:
  EPOCHS: 1
  WARMUP_EPOCHS: 0
SAVE_FREQ: 10
PRINT_FREQ: 20
"""


def _cfg(tmp, head, name, ncls, dataset, batch=1):
    path = os.path.join(tmp, f"{name}.yaml")
    with open(path, "w") as f:
        f.write(head.format(name=name, ncls=ncls)
                + TAIL.format(dataset=dataset, batch=batch))
    return path


def _args(cfg, data, out, **kw):
    a = Args()
    a.cfg = cfg
    a.data_path = data
    a.output = out
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _write_div2k(root, n=4, size=220):
    rng = np.random.default_rng(0)
    for sub in ("DIV2K_train_HR", "DIV2K_valid_HR"):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8)
                            ).save(os.path.join(d, f"{i:04d}.png"))


def _write_hisfrag(root, n_writers=6, frags=3, size=70):
    rng = np.random.default_rng(0)
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    for w in range(n_writers):
        for f in range(frags):
            arr = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"w{w:03d}_0_{f}.jpg"))


def run_michigan(tmp):
    from michigan import MichiganTrainer
    from vit_ed_tpu.data.michigan import MichiganTest

    data = os.path.join(tmp, "michigan")
    rng = np.random.default_rng(0)
    for p in range(4):
        im_name = f"pap{p}"
        for f in range(3):
            path = os.path.join(data, im_name, "front", "detail",
                                f"{im_name}sub", "papyrus", "x", f"f{f}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (80, 80, 3), np.uint8)
                            ).save(path)
    cfg = _cfg(tmp, PJS_HEAD, "hwval_michigan", 1, "michigan")
    trainer = MichiganTrainer(_args(cfg, data, os.path.join(tmp, "out_mich")))
    state = trainer.train()
    assert int(state.step) > 0, "no train step ran"


def run_pajigsaw(tmp):
    from pajigsaw import PajigsawTrainer

    root = os.path.join(tmp, "pjs")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    fragments = []
    for r in range(3):
        for c in range(4):
            rel = f"img0/{r}_{c}.jpg"
            os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)
                            ).save(os.path.join(root, rel))
            fragments.append({"im_path": rel, "row": r, "col": c, "degree": 0,
                              "white_percentage": 0.0})
    manifest = {"img0": {"Fragment1v1Rotate90": fragments}}
    for split in ("train", "val", "test"):
        with open(os.path.join(root, f"{split}.json"), "w") as f:
            json.dump(manifest, f)
    cfg = _cfg(tmp, PJS_HEAD, "hwval_pajigsaw", 4, "pajigsaw")
    trainer = PajigsawTrainer(_args(cfg, root, os.path.join(tmp, "out_pjs")))
    state = trainer.train()
    assert int(state.step) > 0, "no train step ran"


def run_main_vit(tmp):
    from main_vit import VitTripletTrainer

    data = os.path.join(tmp, "div2k_vit")
    _write_div2k(data)
    cfg = _cfg(tmp, VIT_HEAD, "hwval_mainvit", 32, "div2k_triplet")
    trainer = VitTripletTrainer(_args(cfg, data, os.path.join(tmp, "out_vit")))
    state = trainer.train()
    assert int(state.step) > 0, "no train step ran"

    # puzzle testing: per-rotation embedding distances -> solver
    puzzles = os.path.join(tmp, "puzzles_vit", "Cho")
    os.makedirs(puzzles, exist_ok=True)
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (192, 192, 3), np.uint8)
                    ).save(os.path.join(puzzles, "p.jpg"))
    trainer2 = VitTripletTrainer(_args(cfg, os.path.join(tmp, "puzzles_vit"),
                                       os.path.join(tmp, "out_vit2")))
    cwd = os.getcwd()
    os.chdir(tmp)  # testing() writes to ./output
    try:
        trainer2.testing()
    finally:
        os.chdir(cwd)


def run_hisfrag_vit(tmp):
    from hisfrag_vit import HisfragVitTrainer

    data = os.path.join(tmp, "hf_vit")
    _write_hisfrag(data)
    cfg = _cfg(tmp, VIT_HEAD, "hwval_hfvit", 16, "hisfrag20")
    trainer = HisfragVitTrainer(_args(cfg, data, os.path.join(tmp, "out_hfv")))
    state = trainer.train()
    assert int(state.step) > 0, "no train step ran"
    loss = trainer.validate()
    assert 0.0 <= loss <= 1.0, f"validate out of range: {loss}"


def run_geshame_evaluation(tmp):
    from geshame_evaluation import eval_standard
    from hisfrag import HisfragTrainer
    from vit_ed_tpu.metrics import get_metrics

    gesh = os.path.join(tmp, "gesh")
    rng = np.random.default_rng(0)
    for name in ["A_r_c1", "B_r_c1", "A_B_r_c1", "C_r_c1", "D_r_c1"]:
        p = os.path.join(gesh, name, "papyrus", "x", "im.jpg")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (128, 128, 3), np.uint8)).save(p)
    hf = os.path.join(tmp, "hf_gesh")
    _write_hisfrag(hf)
    cfg = _cfg(tmp, PJS_HEAD, "hwval_gesh", 1, "hisfrag20")
    trainer = HisfragTrainer(_args(cfg, hf, os.path.join(tmp, "out_gesh"),
                                   mode="eval"))
    cfgobj = trainer.config
    cfgobj.defrost()
    cfgobj.DATA.DATA_PATH = gesh
    cfgobj.freeze()
    dist, names, frag_idx = eval_standard(cfgobj, trainer, trainer.logger,
                                          trainer.world_size, trainer.rank)
    m_ap, top1, _, _ = get_metrics(dist, frag_idx)
    assert np.isfinite(m_ap) and 0.0 <= m_ap <= 1.0


def run_lr_finder(tmp):
    from lr_finder import LrFinderTrainer

    data = os.path.join(tmp, "div2k_lr")
    _write_div2k(data)
    cfg = _cfg(tmp, PJS_HEAD, "hwval_lrfind", 4, "div2k")
    trainer = LrFinderTrainer(_args(cfg, data, os.path.join(tmp, "out_lr")))
    lr = trainer.find_lr(num_iter=4)
    assert lr is None or lr > 0


def main():
    tmp = tempfile.mkdtemp(prefix="hwval_")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    entries = [
        ("michigan.py", run_michigan),
        ("pajigsaw.py", run_pajigsaw),
        ("main_vit.py", run_main_vit),
        ("hisfrag_vit.py", run_hisfrag_vit),
        ("geshame_evaluation.py", run_geshame_evaluation),
        ("lr_finder.py", run_lr_finder),
    ]
    failed = []
    for name, fn in entries:
        try:
            fn(tmp)
            print(f"PASS {name}", flush=True)
        except Exception:
            failed.append(name)
            print(f"FAIL {name}", flush=True)
            traceback.print_exc()
    if failed:
        sys.exit(f"entries failed on {jax.default_backend()}: {failed}")
    print("all entries validated", flush=True)


if __name__ == "__main__":
    main()
