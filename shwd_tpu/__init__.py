"""shwd_tpu — TPU-native Sphere-Homeomorphic Wasserstein Distance framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`Satoshi0728/Sphere-Homeomorphic-Wasserstein-Distance-for-Point-Cloud-Registration`:
genus-0 point clouds are mapped onto S^2 by a learned normalizing flow phi and
compared with optimal-transport distances under spherical costs; the distance
drives point-cloud registration (PCRNet-style), Wasserstein gradient flows, and
metric-behaviour studies.

Layout
------
- ``ops``      pure-math kernels: quaternions/SE(3), cost matrices, 1D/circular
               OT, Sinkhorn, sliced projections, Chamfer (XLA + Pallas paths).
- ``flows``    functional normalizing-flow library (Planar, Lipschitz-MLP
               residual, ActNorm) with explicit spectral-norm state.
- ``losses``   SHWD adversarial loss, pseudo-ensemble, spherical sliced-W,
               Chamfer/Sinkhorn baselines, sliced-W zoo.
- ``models``   PointNet encoder + iterative PCRNet.
- ``data``     synthetic geometry, ModelNet-style meshes, rigid-transform
               dataset pipeline (all on-device math).
- ``parallel`` device-mesh sharding: data/slices axes, psum reductions.
- ``train``    trainers, gradient-flow driver, eval harness, sweeps, HPO.
- ``runtime``  native C++ components (exact EMD network simplex oracle).
"""

__version__ = "0.1.0"
