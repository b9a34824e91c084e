"""Cross-attention relevancy visualization for a scored image pair
(re-creates /root/reference/scripts/visualise_attentions.py, Chefer-style
relevancy via vit_ed_tpu.ops.explain)."""

import argparse
import colorsys
import os
import random
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vit_ed_tpu.config import get_config
from vit_ed_tpu.data import transforms as T
from vit_ed_tpu.models import build_model
from vit_ed_tpu.ops.explain import generate_relevance
from vit_ed_tpu.train import checkpoint as ckpt
from vit_ed_tpu.utils import create_logger


def parse_option():
    parser = argparse.ArgumentParser("Pajigsaw visualising script")
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE")
    parser.add_argument("--opts", default=None, nargs="+")
    parser.add_argument("--pretrained", required=True)
    parser.add_argument("--images", type=str, required=True, nargs="+",
                        help="Path to the two testing images")
    parser.add_argument("--output_dir", type=str, default="visualisation")
    parser.add_argument("--disable_amp", action="store_true")
    parser.add_argument("--threshold", type=float, default=0.6)
    parser.add_argument("--tag", help="tag of experiment")
    args, _ = parser.parse_known_args()
    args.keep_attn = True
    return args, get_config(args)


def random_colors(n, bright=True):
    brightness = 1.0 if bright else 0.7
    hsv = [(i / n, 1, brightness) for i in range(n)]
    colors = [colorsys.hsv_to_rgb(*c) for c in hsv]
    random.shuffle(colors)
    return colors


def show_cam_on_image(img, mask, target_size):
    import cv2

    heatmap = cv2.resize(mask, (target_size, target_size))
    img = cv2.resize(img, (target_size, target_size))
    img = np.float32(img) / 255
    cam = heatmap + img
    cam = cam / np.max(cam)
    return np.uint8(255 * cam)


def main(args, config, logger):
    import jax
    import jax.numpy as jnp

    model = build_model(config)
    s = config.DATA.IMG_SIZE
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 2, s, s, 3)))
    params = ckpt.load_pretrained(config, variables["params"], logger)
    params = jax.device_get(params)

    def transform(img):
        img = T.center_crop(img, s)
        return T.normalize(T.to_tensor(img))

    assert len(args.images) == 2
    imgs = []
    for img_path in args.images:
        with Image.open(img_path) as f:
            imgs.append(f.convert("RGB"))
    first = transform(imgs[0])
    second = transform(imgs[1])
    x_pair = np.stack([first, second])[None]

    cam = generate_relevance(
        params, x_pair, patch=config.MODEL.PJS.PATCH_SIZE,
        heads=config.MODEL.PJS.NUM_HEADS, depth=config.MODEL.PJS.DEPTH,
        c_depth=config.MODEL.PJS.C_DEPTH, target_index=0)

    w_featmap = s // config.MODEL.PJS.PATCH_SIZE
    h_featmap = s // config.MODEL.PJS.PATCH_SIZE
    colours = random_colors(cam.shape[0])

    attn_x1_img = np.zeros([w_featmap, h_featmap, 3], dtype=np.float32)
    attn_x2_img = np.zeros([w_featmap, h_featmap, 3], dtype=np.float32)

    for h in range(w_featmap):
        for w in range(h_featmap):
            x2_feat_point = h * w_featmap + w
            attention_x1 = cam[x2_feat_point, :].reshape(w_featmap, h_featmap)
            if not np.all(attention_x1 <= args.threshold):
                colour = colours[x2_feat_point]
                attn_x2_img[h][w] = colour
                attn_x1_img[attention_x1 > args.threshold] = colour

    os.makedirs(args.output_dir, exist_ok=True)
    first_vis = show_cam_on_image(
        (T.unnormalize(first) * 255).astype(np.uint8), attn_x1_img, s)
    second_vis = show_cam_on_image(
        (T.unnormalize(second) * 255).astype(np.uint8), attn_x2_img, s)
    Image.fromarray(first_vis).save(os.path.join(args.output_dir, "attn_x1.png"))
    Image.fromarray(second_vis).save(os.path.join(args.output_dir, "attn_x2.png"))
    logger.info(f"Saved visualisations to {args.output_dir}")


if __name__ == "__main__":
    args, config = parse_option()
    os.makedirs(config.OUTPUT, exist_ok=True)
    logger = create_logger(output_dir=config.OUTPUT, dist_rank=0,
                           name=f"{config.MODEL.NAME}", affix="_vis")
    main(args, config, logger)
