"""parq_tpu — a TPU-native (JAX/XLA/Pallas) multi-view 3D detection framework.

Re-implements the capabilities of PARQ (Pixel-Aligned Recurrent Queries for
Multi-View 3D Object Detection, ICCV 2023) from scratch for TPU: functional
geometry pytrees, Flax modules, a `lax.scan` recurrent decoder, a Pallas
fused pixel-aligned sampling kernel, pjit data parallelism, and orbax
checkpointing.
"""
__version__ = "0.1.0"
