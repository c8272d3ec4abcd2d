"""Pretrained-weight loading — the reference's ``mnasnet1_0(pretrained=True)``
capability (SURVEY.md §2.1 "Pretrained load"), adapted to a no-network world
and JAX's model/params split.

The reference downloads a torchvision state_dict from a URL map. This
environment has no egress, and in JAX the module is a pure function separate
from its variables, so the API is::

    model, variables = load_pretrained("mnasnet1_0", "mnasnet1_0.pth")
    logits = model.apply(variables, images, train=False)

Accepted files: a torch ``.pth/.pth.tar/.pt`` pickle (raw state_dict or a
reference-style ``{"state_dict": ...}`` checkpoint — ``module.`` prefixes are
stripped), or an ``.npz`` of converted arrays keyed by torch names.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mnasnet_tpu.convert.torch_converter import torch_to_flax
from mnasnet_tpu.models.mnasnet import MODEL_REGISTRY, MNASNet


def load_state_dict_file(path: str) -> dict[str, Any]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if path.endswith((".pth", ".pth.tar", ".pt")):
        import torch  # CPU torch is available in dev envs; optional dep

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        return ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    raise ValueError(f"unsupported checkpoint format: {path!r}")


def load_pretrained(arch: str, path: str, rng=None, **model_kwargs):
    """(model, variables) for a reference checkpoint file.

    ``arch`` is a registry name (``mnasnet0_35 .. mnasnet1_4``; no published
    checkpoint exists for 1.4 — it is grid-only).

    Transfer learning: when ``model_kwargs['num_classes']`` differs from the
    checkpoint's classifier width, the backbone loads from the checkpoint
    and the classifier head is freshly initialized (from ``rng``, default
    ``PRNGKey(0)``) — the torch-lineage fine-tuning pattern of swapping the
    final Linear after ``load_state_dict``. Pair with
    ``train.py --freeze-backbone`` (optim.freeze) for a linear probe.
    """
    if arch not in MODEL_REGISTRY:
        raise ValueError(f"unknown arch {arch!r}; choices: {sorted(MODEL_REGISTRY)}")
    model: MNASNet = MODEL_REGISTRY[arch](**model_kwargs)
    sd = load_state_dict_file(path)
    variables = jax.tree.map(jnp.asarray, torch_to_flax(sd, model.alpha))
    ckpt_classes = variables["params"]["classifier"]["kernel"].shape[-1]
    if ckpt_classes != model.num_classes:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        # Image size is irrelevant to parameter shapes (global pool before
        # the head); 32px keeps the init trace cheap.
        init_vars = model.init(
            rng, jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
        )
        params = dict(variables["params"])
        params["classifier"] = init_vars["params"]["classifier"]
        variables = {**variables, "params": params}
    return model, variables
