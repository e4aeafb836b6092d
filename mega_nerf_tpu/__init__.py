"""mega_nerf_tpu — a TPU-native (JAX/XLA/Pallas) large-scale NeRF framework.

A from-scratch rebuild of the capabilities of cmusatyalab/mega-nerf
(CVPR 2022: "Mega-NeRF: Scalable Construction of Large-Scale NeRFs for
Virtual Fly-Throughs") designed for TPU hardware:

- pure-functional ops (`mega_nerf_tpu.ops`) — ray generation, stratified and
  hierarchical inverse-CDF sampling, alpha compositing, spherical harmonics,
  image metrics;
- Flax models (`mega_nerf_tpu.models`) — frequency-encoded NeRF MLPs with
  appearance embeddings, coarse/fine cascades, and the spatial MegaNeRF
  mixture-of-submodules;
- a fully jitted volume renderer (`mega_nerf_tpu.render`) with static shapes
  (background rays are computed densely and masked, never gathered);
- host-side data pipeline (`mega_nerf_tpu.data`) honoring the reference's
  on-disk contracts (coordinates.pt, per-image metadata, cluster masks,
  shuffled parquet ray chunks);
- SPMD parallelism (`mega_nerf_tpu.parallel`) over a `jax.sharding.Mesh`:
  data-parallel ray batches and cell-parallel spatial submodules via
  `shard_map` — replacing the reference's NCCL DDP + parscript job fan-out;
- the training/eval runtime (`mega_nerf_tpu.runtime`).
"""

__version__ = "0.1.0"
