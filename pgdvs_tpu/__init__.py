"""pgdvs_tpu — TPU-native pseudo-generalized dynamic view synthesis.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of apple/ml-pgdvs
(ICLR 2024, "Pseudo-Generalized Dynamic View Synthesis from a Video").

Given a monocular video with per-frame cameras, temporally-consistent depth,
optical flow and dynamic-content masks, renders novel (space, time) views with
zero scene-specific training:

  * static background — generalized NeRF transformer (GNT) with epipolar
    sampling over spatially-nearest source views, or an aggregated static
    point cloud rasterized on-device;
  * dynamic foreground — depth+flow lifted point clouds of the two
    temporally-closest frames, motion-interpolated to the target time and
    rendered by softmax splatting / z-buffered point splatting;
  * composition — mask-based static/dynamic composite.

Everything on the device side is a pure, jittable function over fixed shapes;
scaling is expressed through `jax.sharding` meshes (see `pgdvs_tpu.parallel`).
"""

__version__ = "0.1.0"
