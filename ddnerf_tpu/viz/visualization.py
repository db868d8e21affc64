"""Visualization: image casts, density-distribution plots, validation image
dumps, results.txt writer.

Rewrite of ``/root/reference/validation_utils/visualization.py`` on NumPy +
matplotlib + imageio (no torch/torchvision).
"""

from __future__ import annotations

import io
import os
from typing import Dict, List

import numpy as np


def cast_to_disparity_image(arr: np.ndarray) -> np.ndarray:
    """Min-max normalize a scalar map to uint8 [1, H, W]
    (reference visualization.py:11-17).  Empty rays (acc=0) yield NaN
    disparity; they are mapped to 0 rather than poisoning the normalization.
    """
    arr = np.asarray(arr, np.float32)
    arr = np.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0)
    rng = arr.max() - arr.min()
    img = (arr - arr.min()) / (rng if rng > 0 else 1.0)
    img = np.clip(img, 0, 1) * 255
    h, w = img.shape
    return img.astype(np.uint8).reshape(1, h, w)


def cast_to_image(arr: np.ndarray) -> np.ndarray:
    """[H, W, 3] float in [0,1] -> uint8 [3, H, W] (channels-first for
    TensorBoard, reference visualization.py:20-27)."""
    arr = np.asarray(arr, np.float32)
    img = np.clip(arr, 0.0, 1.0) * 255
    return np.moveaxis(img.astype(np.uint8), -1, 0)


def gen_plot(x, y_list, legend, colors, gt, t_vals, title, tb_mode=False):
    """Density-distribution figure -> PNG buffer
    (reference visualization.py:37-72)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if tb_mode:
        w, h, dpi, legend_size, font_size = 7, 5, 150, 6, 8
    else:
        w, h, dpi, legend_size, font_size = 9, 6, 150, 15, 15

    plt.figure(figsize=(w, h))
    dy_sctr = 0.9 * float(0.075 * np.max(y_list[0]))

    for i in range(len(y_list)):
        plt.plot(x, y_list[i], c=colors[i], label=legend[i])

    plt.scatter(x=np.asarray(t_vals[0]), y=np.zeros_like(np.asarray(t_vals[0])),
                c=colors[0], label="coarse samples")
    plt.scatter(x=np.asarray(t_vals[1]),
                y=np.zeros_like(np.asarray(t_vals[1])) - dy_sctr,
                c=colors[1], label="fine samples")
    if gt > 0:
        plt.scatter(x=gt, y=dy_sctr, s=100, c="orange", marker="^",
                    label="points of interest")

    plt.legend(fontsize=legend_size, loc="upper left")
    plt.xticks(fontsize=font_size)
    plt.yticks(fontsize=font_size)
    plt.title(title, fontsize=font_size)
    buf = io.BytesIO()
    plt.savefig(buf, format="png", dpi=dpi)
    plt.close()
    buf.seek(0)
    return buf


def get_density_distribution_plots(output, j, gt_depth, near, far, i=0,
                                   tb_mode=True) -> np.ndarray:
    """Per-ray coarse/fine histogram pdfs + Gaussian in-cell pdfs + sample
    ticks + GT depth marker (reference visualization.py:74-98).  Returns a
    [3or4, H, W] uint8 image."""
    from PIL import Image

    x = np.linspace(near, far, 1000)
    gt = gt_depth[j]
    t_vals = [np.asarray(output[0]["t_vals"][j]), np.asarray(output[1]["t_vals"][j])]
    y_list = [
        np.asarray(output[0]["uniform_incell_pdf"][j]),
        np.asarray(output[1]["uniform_incell_pdf"][j]),
    ]
    colors = ["b", "m"]
    legend = ["h-c", "h-f"]

    if "gaussian_incell_pdf" in output[1]:
        y_list.append(np.asarray(output[1]["gaussian_incell_pdf"][j]))
        legend.append("f-dd")
        colors.append("g")
        y_list.append(np.asarray(output[1]["smoothed_gaussian_incell_pdf"][j]))
        legend.append("smoothed f-dd")
        colors.append("r")

    title = f"Distributions and samples - ray_{j}"
    title = title + f"- iteration {i}" if tb_mode else title
    buff = gen_plot(x, y_list, legend, colors, gt, t_vals, title, tb_mode)
    img = Image.open(buff)
    return np.array(img).transpose(2, 0, 1)


def save_validation_images(output_dict: Dict[int, Dict[str, np.ndarray]],
                           path: str) -> None:
    """PNG dumps: rgb/disp/depth per cycle + mu-corrected disparity
    (reference visualization.py:101-135)."""
    import imageio.v2 as imageio

    os.makedirs(path, exist_ok=True)
    imageio.imwrite(os.path.join(path, "rgb_coarse.png"),
                    cast_to_image(output_dict[0]["rgb"]).transpose(1, 2, 0))
    imageio.imwrite(os.path.join(path, "coarse.png"),
                    cast_to_disparity_image(output_dict[0]["disp"]).squeeze())
    imageio.imwrite(os.path.join(path, "depth_coarse.png"),
                    cast_to_disparity_image(output_dict[0]["depth"]).squeeze())
    if output_dict[0].get("corrected_disp_map") is not None:
        imageio.imwrite(
            os.path.join(path, "mus.png"),
            cast_to_disparity_image(output_dict[0]["corrected_disp_map"]).squeeze(),
        )
    imageio.imwrite(os.path.join(path, "rgb_fine.png"),
                    cast_to_image(output_dict[1]["rgb"]).transpose(1, 2, 0))
    imageio.imwrite(os.path.join(path, "depth_fine.png"),
                    cast_to_disparity_image(output_dict[1]["depth"]).squeeze())
    imageio.imwrite(os.path.join(path, "fine.png"),
                    cast_to_disparity_image(output_dict[1]["disp"]).squeeze())


def write_dicts_to_a_file(summary_dict: Dict[str, List[float]],
                          results_dict: Dict, results_file: str) -> None:
    """results.txt: averages + per-image metrics
    (reference visualization.py:137-150)."""
    with open(results_file, "w") as f:
        print("average overall results:\n", file=f)
        for key in summary_dict:
            score = sum(summary_dict[key]) / len(summary_dict[key])
            print(f"{key}: \t {score:.4}", file=f)
        print("\nper image results:\n", file=f)
        for key1 in results_dict:
            for key2 in results_dict[key1]:
                print(f"image {key1} , {key2}: \t {results_dict[key1][key2]:.4}",
                      file=f)
