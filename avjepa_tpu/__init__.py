"""AV-JEPA TPU: a TPU-native (JAX/XLA/Pallas) audio-video joint-embedding-predictive
architecture framework.

Re-implements the capabilities of the reference PyTorch AV-JEPA codebase
(johnshizhu/AVJEPA) with a TPU-first design:

- static-shape dense masking (no ragged token removal, no recompilation storms)
- one shared transformer core for encoder / predictor / probes
- pure-functional jitted train step with in-step EMA and step-derived schedules
- `jax.sharding.Mesh` data/fsdp/tensor parallelism via sharding annotations
- Pallas flash-attention kernels for the hot path
- Orbax checkpointing, C++ (libav) host-side media ingest
"""

__version__ = "0.1.0"
