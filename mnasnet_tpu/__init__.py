"""mnasnet_tpu — TPU-native rebuild of the snakers4/mnasnet-pytorch stack.

Flax/JAX MNASNet-B1 depth-multiplier family with fused Pallas depthwise
kernels, a jit/pjit ImageNet training harness, and a host-sharded
device-prefetching input pipeline. Blueprint: SURVEY.md.
"""

from mnasnet_tpu.models.mnasnet import (
    MNASNet,
    create_model,
    get_depths,
    mnasnet0_35,
    mnasnet0_5,
    mnasnet0_75,
    mnasnet1_0,
    mnasnet1_3,
    mnasnet1_4,
    MODEL_REGISTRY,
)
from mnasnet_tpu.pretrained import load_pretrained

__version__ = "0.1.0"

__all__ = [
    "MNASNet",
    "create_model",
    "get_depths",
    "mnasnet0_35",
    "mnasnet0_5",
    "mnasnet0_75",
    "mnasnet1_0",
    "mnasnet1_3",
    "mnasnet1_4",
    "MODEL_REGISTRY",
    "load_pretrained",
    "__version__",
]
