"""Small-leaf state packing EXPERIMENT (not wired into production).

Measured within noise of the shipped fused='small' optimizer packing
(BASELINE.md round-2 record: the copy storm is mid-graph spills, not
interface staging), so this full state-interface packer lives with the
experiment tool that validates it (tools/bench_packed_step.py) instead of
the production package. The production small-tensor path is
mnasnet_tpu/train/optim.py:fused_flat + steps.py:fused_ema_stats.

An XLA TPU program stages every input/output buffer separately: profiling the
train step at bs128 showed ~600 async HBM↔VMEM copies just for the per-leaf
parameter / optimizer-state interface, dominated by the ~100 tiny 1-D
per-channel BN vectors (16..1280 floats each) — ~1.6 ms (10%) of the step in
latency-bound 128-byte DMAs (tools/profile_step.py, BASELINE.md).

``SmallLeafPacker`` keeps every 1-D leaf packed in ONE flat fp32 vector
*across* the step boundary: the packed state is what jit sees (one staged
buffer), and the logical per-leaf view exists only as in-step slices of the
VMEM-resident vector. Large leaves (conv kernels etc.) stay per-leaf — they
are bandwidth-efficient already, and packing them would serialize the
optimizer behind a concat of all gradients.

The packed form {'vec': f32[n], 'rest': [large leaves...]} is an ordinary
pytree: optax transformations run on it directly (weight-decay mask:
'vec' leaves are exactly the BN-scale/bias + dense-bias group the recipe
excludes from decay; 'rest' is exactly the kernel group that decays —
SURVEY.md §2.2 optimizer row).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


class SmallLeafPacker:
    """Pack/unpack between a logical pytree and {'vec', 'rest'} form.

    Partition rule: leaves with ``ndim == 1`` go into the packed fp32
    vector; everything else stays as-is in ``rest`` (order-preserving).
    The partition is decided once from ``template`` and is purely static.
    """

    def __init__(self, template: Any):
        leaves, treedef = jax.tree.flatten(template)
        self.treedef = treedef
        self.small = [leaf.ndim == 1 for leaf in leaves]
        self.shapes = [leaf.shape for leaf in leaves]
        self.dtypes = [leaf.dtype for leaf in leaves]
        self.sizes = [leaf.size for leaf in leaves]
        self.n_small = sum(self.small)
        self.n_rest = len(leaves) - self.n_small
        self.vec_size = sum(s for s, m in zip(self.sizes, self.small) if m)

    def pack(self, tree: Any) -> dict:
        leaves = self.treedef.flatten_up_to(tree)
        small = [l.ravel().astype(jnp.float32)
                 for l, m in zip(leaves, self.small) if m]
        rest = [l for l, m in zip(leaves, self.small) if not m]
        vec = (jnp.concatenate(small) if small
               else jnp.zeros((0,), jnp.float32))
        return {"vec": vec, "rest": rest}

    def unpack(self, packed: dict) -> Any:
        out, off, ri = [], 0, 0
        for shape, dtype, size, m in zip(
            self.shapes, self.dtypes, self.sizes, self.small
        ):
            if m:
                out.append(
                    packed["vec"][off:off + size].reshape(shape).astype(dtype)
                )
                off += size
            else:
                out.append(packed["rest"][ri])
                ri += 1
        return jax.tree.unflatten(self.treedef, out)

def packed_wd_mask(packer: SmallLeafPacker) -> dict:
    """Weight-decay mask for the packed params tree: the flat vector holds
    the BN-scale/bias/dense-bias group (wd-excluded); 'rest' holds conv /
    dw / dense kernels (wd-applied). Verified structurally: every 1-D param
    leaf of MNASNet is in the excluded group (tests/test_fused_updates.py)."""
    return {"vec": False, "rest": [True] * packer.n_rest}
