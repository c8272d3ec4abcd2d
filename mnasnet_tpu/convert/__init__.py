from mnasnet_tpu.convert.torch_converter import torch_to_flax, flax_to_torch  # noqa: F401
