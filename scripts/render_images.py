"""Flythrough renderer: render rgb/depth/cell-overlay frames from pose files.

Parity target: reference `scripts/render_images.py`. Input dir contains
`poses.txt` (3x4 c2w per line, 12 floats), `intrinsics.txt`
(W H fx fy cx cy per line, divided by val_scale_factor), and
`embeddings.txt` (appearance index per line). Outputs per frame:
`rgbs/{i:06d}.jpg`, `depths/{i:06d}.jpg` (log-inferno), optional
`depths_npz/{i:06d}.npy` (metric depth, scaled by pose_scale_factor), and
`cells/{i:06d}.jpg` (HSV centroid-assignment overlay). Frames shard over
jax processes; `--resume` verifies the last-written artifact parses.
"""

from __future__ import annotations

import sys
import traceback
from argparse import Namespace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mega_nerf_tpu.data.image_metadata import ImageMetadata
from mega_nerf_tpu.data.memory_dataset import generate_image_rays
from mega_nerf_tpu.data.torch_io import load_coordinates, load_pt
from mega_nerf_tpu.opts import get_opts_base, parse_opts
from mega_nerf_tpu.runtime.logging import main_tqdm
from mega_nerf_tpu.runtime.runner import Runner


def _get_render_opts() -> Namespace:
    parser = get_opts_base()
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--dataset_path', type=str, required=True)
    parser.add_argument('--centroids_path', type=str, required=True)
    parser.add_argument('--save_depth_npz', default=False, action='store_true')
    parser.add_argument('--resume', default=False, action='store_true')
    return parse_opts(parser, known_only=True)


def _render_images(hparams: Namespace) -> None:
    import cv2
    import jax
    from PIL import Image

    runner = Runner(hparams, set_experiment_path=False)

    input_path = Path(hparams.input)
    centroids = np.asarray(load_pt(hparams.centroids_path)["centroids"])

    c2ws = [
        np.array([float(x) for x in line.split()], np.float32).reshape(3, 4)
        for line in (input_path / "poses.txt").read_text().splitlines()
        if line.strip()
    ]
    intrinsics = [
        [float(x) / hparams.val_scale_factor for x in line.split()]
        for line in (input_path / "intrinsics.txt").read_text().splitlines()
        if line.strip()
    ]
    embeddings = [
        int(line.strip())
        for line in (input_path / "embeddings.txt").read_text().splitlines()
        if line.strip()
    ]

    output = Path(hparams.output)
    rank = jax.process_index()
    world_size = jax.process_count()
    # Rank 0 keeps the fail-on-existing-output semantics (unless resuming);
    # other ranks create-if-missing — there is no barrier between ranks
    # here, so a fast rank must not depend on rank 0 winning the race.
    for sub in ("rgbs", "depths", "cells") + (
        ("depths_npz",) if hparams.save_depth_npz else ()
    ):
        (output / sub).mkdir(
            parents=True, exist_ok=hparams.resume or rank != 0
        )

    pose_scale_factor = load_coordinates(hparams.dataset_path)[
        "pose_scale_factor"
    ]
    state = runner.make_eval_state()

    def postprocess(i, metadata, results, cell_path):
        """Host-side compositing + disk writes for one rendered frame.

        Pure numpy/PIL/cv2 over host arrays — runs on a background thread
        so frame i's encoding/colormap/cell-cdist overlaps frame i+1's
        device rendering (the reference serializes these,
        `render_images.py:92-129`)."""
        w, h = metadata.W, metadata.H
        typ = "fine" if "rgb_fine" in results else "coarse"

        rgbs = (
            np.clip(np.asarray(results[f"rgb_{typ}"]).reshape(h, w, 3), 0, 1)
            * 255
        ).astype(np.uint8)
        Image.fromarray(rgbs).save(output / "rgbs" / f"{i:06d}.jpg")

        depth = np.nan_to_num(
            np.asarray(results[f"depth_{typ}"], np.float32)
        ).reshape(h, w)
        if hparams.save_depth_npz:
            np.save(
                str(output / "depths_npz" / f"{i:06d}.npy"),
                depth * pose_scale_factor,
            )

        if f"bg_depth_{typ}" in results:
            fg_depth = np.nan_to_num(
                np.asarray(results[f"fg_depth_{typ}"])
            ).reshape(-1)
            while fg_depth.shape[0] > 2**24:
                fg_depth = fg_depth[::2]
            depth = np.clip(depth, None, np.quantile(fg_depth, 0.95))

        depth_vis = Runner.visualize_scalars(np.log(depth + 1e-8))
        Image.fromarray(depth_vis.astype(np.uint8)).save(
            output / "depths" / f"{i:06d}.jpg"
        )

        # Cell-assignment overlay: color each pixel by the submodule that
        # owns its expected termination point.
        rays = generate_image_rays(
            metadata, runner.near, runner.far, runner.ray_altitude_range,
            hparams.center_pixels,
        ).reshape(h, w, 8)
        locations = rays[..., :3] + rays[..., 3:6] * depth[..., None]
        dists = np.linalg.norm(
            locations.reshape(-1, 1, 3) - centroids[None, :, :], axis=-1
        )
        assignments = dists.argmin(axis=1).reshape(h, w).astype(np.float32)
        assignments /= len(centroids)
        overlay = cv2.cvtColor(
            cv2.applyColorMap(
                (assignments * 255).astype(np.uint8), cv2.COLORMAP_HSV
            ),
            cv2.COLOR_BGR2RGB,
        )
        blended = cv2.addWeighted(rgbs, 0.7, overlay, 0.3, 0)
        # The cell overlay is written LAST: --resume probes it as the
        # "frame complete" marker, so every other artifact must already be
        # on disk when it appears.
        Image.fromarray(blended.astype(np.uint8)).save(cell_path)

    from concurrent.futures import ThreadPoolExecutor

    post = ThreadPoolExecutor(max_workers=1)  # keep frame writes ordered
    post_future = None
    try:
        for i in main_tqdm(np.arange(rank, len(c2ws), world_size)):
            i = int(i)
            cell_path = output / "cells" / f"{i:06d}.jpg"
            if hparams.resume and cell_path.exists():
                try:
                    np.array(Image.open(cell_path))  # last artifact: valid?
                    print(f"skipping {cell_path}")
                    continue
                except Exception:
                    traceback.print_exc()

            w, h = int(intrinsics[i][0]), int(intrinsics[i][1])
            metadata = ImageMetadata(
                Path(""), c2ws[i], w, h,
                np.asarray(intrinsics[i][2:], np.float32), embeddings[i], None,
                False,
            )
            results = runner.render_image(metadata, state)
            if post_future is not None:
                post_future.result()  # surface errors; keep one in flight
            post_future = post.submit(
                postprocess, i, metadata, results, cell_path
            )
        if post_future is not None:
            post_future.result()
    finally:
        post.shutdown(wait=True)


def main(hparams: Namespace) -> None:
    assert hparams.ckpt_path is not None or hparams.container_path is not None
    _render_images(hparams)


if __name__ == '__main__':
    main(_get_render_opts())
