"""Worker + scene builders for the 2-process distributed flythrough test
(tests/test_multiprocess_render.py).

Run as a script it initializes a jax.distributed CPU process (2 virtual
devices) and drives the REAL `scripts/render_images.py` path — frames
strided `process_index::process_count` (reference
`render_images.py:80-90`), per-rank file writes — with exact submodule
culling AND occupancy-tightened bounds enabled. The parent test builds the
shared inputs with `build_inputs`, renders the single-process reference
frames itself, and compares.

Usage: multiprocess_render_worker.py <pid> <nprocs> <port> <workdir> [--resume]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

RENDER_FLAGS = dict(
    ray_altitude_range=[-10.0, 10.0],
    coarse_samples=16, fine_samples=16,
)


def build_inputs(workdir: Path) -> None:
    """Scene + K=2 merged container + centroids + occupancy + flythrough
    input files, all deterministic (seeded inits)."""
    import jax

    from mega_nerf_tpu.data.torch_io import save_pt
    from mega_nerf_tpu.models import make_nerf
    from mega_nerf_tpu.models.container import (
        ContainerData,
        save_native_container,
    )
    from mega_nerf_tpu.models.torch_interop import torch_state_from_flax_params
    from tests.synthetic import make_synthetic_dataset, tiny_train_hparams

    ds = make_synthetic_dataset(workdir / "ds", n_train=3, n_val=1,
                                hw=(24, 24))

    hp = tiny_train_hparams(ds, workdir / "unused", **RENDER_FLAGS)
    bundle = make_nerf(hp, appearance_count=0)
    states = [
        torch_state_from_flax_params(
            bundle.config, bundle.init(jax.random.key(i))
        )
        for i in range(2)
    ]
    centroids = np.array([[0.0, -0.7, 0.0], [0.0, 0.7, 0.0]], np.float32)
    save_native_container(
        workdir / "container.pt",
        ContainerData(
            centroids=centroids, grid_dim=(2, 1),
            min_position=np.full(3, -60.0, np.float32),
            max_position=np.full(3, 60.0, np.float32),
            need_viewdir=hp.pos_dir_dim > 0,
            need_appearance_embedding=False, cluster_2d=False,
            fg_states=states, bg_states=[],
        ),
    )
    save_pt(
        {
            "centroids": centroids, "cluster_2d": False, "grid_dim": [2, 1],
            "min_position": np.full(3, -60.0, np.float32),
            "max_position": np.full(3, 60.0, np.float32),
        },
        workdir / "params.pt",
    )

    # Occupancy over world [-4,4]^3: a radius-1 ball around the origin is
    # occupied — cameras sit at distance 1.5, so near-side tightening
    # genuinely bites on every ray.
    res = 16
    c = (np.arange(res, dtype=np.float32) + 0.5) / res * 8.0 - 4.0
    g = np.stack(np.meshgrid(c, c, c, indexing="ij"), -1)
    grid = (np.linalg.norm(g, axis=-1) < 1.0)
    np.savez_compressed(
        workdir / "occupancy.npz",
        occupancy=np.packbits(grid.reshape(-1)), res=np.int64(res),
        invradius3=np.full(3, 1.0 / 8.0, np.float32),
        offset=np.full(3, 0.5, np.float32),
        sigma_thresh=np.float32(0.0),
    )

    # Flythrough input: 4 frames reusing the training poses.
    from mega_nerf_tpu.data.torch_io import load_pt

    metas = sorted((Path(ds) / "train" / "metadata").glob("*.pt"))
    poses, intr = [], []
    for i in range(4):
        m = load_pt(metas[i % len(metas)])
        poses.append(" ".join(str(float(v))
                              for v in np.asarray(m["c2w"]).reshape(-1)))
        fx, fy, cx, cy = [float(v) for v in np.asarray(m["intrinsics"])]
        intr.append(f"{int(m['W'])} {int(m['H'])} {fx} {fy} {cx} {cy}")
    fly = workdir / "input"
    fly.mkdir(exist_ok=True)
    (fly / "poses.txt").write_text("\n".join(poses) + "\n")
    (fly / "intrinsics.txt").write_text("\n".join(intr) + "\n")
    (fly / "embeddings.txt").write_text("0\n" * 4)


def render_hparams(workdir: Path, output: Path, resume: bool = False):
    from tests.synthetic import tiny_train_hparams

    hp = tiny_train_hparams(workdir / "ds", workdir / "unused",
                            **RENDER_FLAGS)
    hp.container_path = str(workdir / "container.pt")
    hp.occupancy_path = str(workdir / "occupancy.npz")
    hp.input = str(workdir / "input")
    hp.output = str(output)
    hp.dataset_path = str(workdir / "ds")
    hp.centroids_path = str(workdir / "params.pt")
    hp.save_depth_npz = False
    hp.resume = resume
    return hp


def main() -> None:
    process_id, num_processes, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        Path(sys.argv[4]),
    )
    resume = "--resume" in sys.argv

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes

    import scripts.render_images as ri

    ri.main(render_hparams(workdir, workdir / "frames_mp", resume=resume))


if __name__ == "__main__":
    main()
