"""contrastive_lift_tpu — a TPU-native (JAX/XLA/Pallas) framework for
3D object-instance segmentation by slow-fast contrastive fusion.

Re-implements, TPU-first, the full capability surface of
yashbhalgat/Contrastive-Lift (NeurIPS 2023 Spotlight): a TensoRF-style
radiance field with semantic / instance-embedding / distilled-feature heads,
volume rendering, the slow-fast contrastive instance loss, post-hoc
mean-shift clustering, and scene-level Panoptic Quality evaluation.

Design notes (vs. the CUDA/PyTorch reference):
  * static shapes everywhere — ray batches, samples-per-ray, label counts are
    padded + masked so every hot path is a single XLA compilation;
  * the VM-factor grid lookups (reference: ``F.grid_sample``) are a fused
    gather+lerp+product+reduce op with an optional Pallas kernel;
  * data parallelism is a ``jax.sharding.Mesh`` with replicated parameters
    and batch-sharded rays (XLA inserts the psum), not NCCL DDP;
  * the two-optimizer "manual optimization" scheme of the reference trainer
    is a single jitted train step with two optax partitions.
"""

__version__ = "0.1.0"
