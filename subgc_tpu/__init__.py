"""subgc_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of Sub-GC image captioning.

Scene-graph-decomposition captioning (ECCV 2020) with the same capability
surface as YiwuZhong/Sub-GC, redesigned for TPU: static-shape graph batches,
one-hot einsum GCN, vectorized sub-graph NMS, scan-based LSTM decoding, and a
sub-graph axis that batches/shards across a device mesh.
"""
__version__ = "0.1.0"

from .config import (DataConfig, EvalConfig, ModelConfig,  # noqa: F401
                     TrainConfig, build_configs)
from .graph import SceneGraph, SubgraphSet  # noqa: F401


def __getattr__(name):
    # lazy heavyweight entry points (keep `import subgc_tpu` jax-free)
    if name == "setup":
        from .models import setup
        return setup
    raise AttributeError(name)
