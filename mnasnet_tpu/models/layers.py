"""Core layers for the TPU-native MNASNet family.

Design notes (TPU-first, not a torch translation):
  * NHWC everywhere — channels on the 128-lane axis is mandatory for both the
    MXU (conv-as-matmul) and the VPU (depthwise / elementwise).
  * BatchNorm is a hand-rolled module (not ``flax.linen.BatchNorm``) so that
    (a) running-stat semantics exactly mirror the reference's
    ``torch.nn.BatchNorm2d(momentum=1-0.9997)`` EMA (biased batch variance for
    normalisation, *unbiased* for the running estimate — a silent top-1 trap),
    and (b) the module can hand out *folded* (scale, bias) pairs for the fused
    Pallas inference kernels (BN+ReLU folding, see SURVEY.md §2.3 N2/N3).
  * Batch statistics are computed in fp32 regardless of compute dtype; under
    ``jit`` over a sharded batch axis, XLA's GSPMD partitioner turns the batch
    mean/var into a cross-replica reduction automatically (sync-BN for free —
    the reference's per-GPU BN is a *less* exact algorithm; flag-controlled
    at the trainer level by sharding choice).

Reference behavior being matched: SURVEY.md §2.1 (MBConv spec, BN momentum
3e-4, weight init) — reconstructed from the verified torch module tree
(SURVEY.md Appendix A); reference checkout was empty, so no file:line cites
are possible (SURVEY.md §0).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Kaiming-normal, fan_out, relu — matches the reference's Conv2d init
# (SURVEY.md §2.1 "Weight init").
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# Kaiming-uniform, fan_out, sigmoid-gain — matches the reference's final
# Linear init (SURVEY.md §2.1).
dense_kernel_init = nn.initializers.variance_scaling(1.0, "fan_out", "uniform")

BN_MOMENTUM = 0.9997  # EMA decay; torch momentum = 1 - 0.9997 = 3e-4
BN_EPSILON = 1e-5


class PointwiseConv(nn.Module):
    """1×1 conv with an explicitly-owned HWIO kernel param.

    Used instead of ``nn.Conv`` inside MBConv blocks so the fused-block
    Pallas path (ops/pallas/mbconv.py) can read the raw kernel without
    applying the module. Identical param name/shape/init to ``nn.Conv`` —
    the torch converter layout is unchanged.
    """

    in_ch: int
    features: int
    dtype: Any = None
    precision: Any = None
    # Lowering choice: "conv" (conv_general_dilated), "dot" (dot_general
    # over the channel axis — a plain MXU matmul, different XLA emitter),
    # or "auto" (per-mode measured-fastest: conv when train, dot when
    # eval). Measured on the v5e (BASELINE.md round-4 infer campaign):
    # dot lowering is +3% on the bs128 infer step — the (N·H·W, C)
    # matmul view tiles the narrow-channel projections slightly better
    # than the conv emitter — while the train-side dot wgrad was measured
    # negative in the round-2 campaign. The kernel param is identical
    # either way, so checkpoints are lowering-agnostic.
    lowering: str = "conv"

    def setup(self):
        self.kernel = self.param(
            "kernel", conv_kernel_init,
            (1, 1, self.in_ch, self.features), jnp.float32,
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        lowering = self.lowering
        if lowering == "auto":
            lowering = "conv" if train else "dot"
        if lowering == "dot":
            return jax.lax.dot_general(
                x, self.kernel[0, 0].astype(x.dtype),
                (((3,), (0,)), ((), ())),
                precision=self.precision,
            )
        return jax.lax.conv_general_dilated(
            x, self.kernel.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )

    def matrix(self) -> jax.Array:
        """(Cin, Cout) view for matmul-style fused kernels."""
        return self.kernel[0, 0]


class StemConv(nn.Module):
    """The 3×3/stride-2 RGB stem conv, with an optional space-to-depth
    lowering (``s2d=True``).

    C=3 inputs use 3 of the TPU's 128 lanes; the s2d form packs each 2×2
    pixel block into channels ((H,W,3) → (H/2,W/2,12)) and applies an
    *exactly equivalent* 2×2/stride-1 conv whose kernel is the original
    (3,3,3,F) parameter rearranged in-graph (zero tap for the never-used
    corner). Parameter name/shape/init and therefore the torch-converter
    and checkpoint layouts are identical to the plain form; gradients flow
    through the rearrangement onto the original kernel.
    """

    features: int
    dtype: Any = None
    precision: Any = None
    s2d: bool = False

    def setup(self):
        self.kernel = self.param(
            "kernel", conv_kernel_init, (3, 3, 3, self.features), jnp.float32
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        N, H, W, C = x.shape
        # s2d is a TRAIN-time lowering: fwd+bwd amortize the input
        # rearrangement (+2.5% step), while inference-only pays for it
        # (measured −4% infer throughput) — so eval uses the plain conv.
        if not (self.s2d and train) or H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x, self.kernel.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision,
            )
        xs = (
            x.reshape(N, H // 2, 2, W // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(N, H // 2, W // 2, 4 * C)
        )
        # Original output (i,j) sums taps u,v ∈ {-1,0,1} of x[2i+u, 2j+v];
        # in s2d space that window is rows {i-1, i} × cols {j-1, j} with
        # u = 2A+dy-2 — pad the kernel's top-left so (A=0,dy=0) is the zero
        # tap, then regroup (2A+dy) → (A, dy).
        w2 = jnp.pad(self.kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        wp = (
            w2.reshape(2, 2, 2, 2, C, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(2, 2, 4 * C, self.features)
        )
        return jax.lax.conv_general_dilated(
            xs, wp.astype(x.dtype), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-exact running-stat semantics and BN folding.

    Variables:
      params:       ``scale`` (γ, init 1), ``bias`` (β, init 0)
      batch_stats:  ``mean`` (init 0), ``var`` (init 1)

    Training mode uses biased batch variance for normalisation but updates the
    running variance with the *unbiased* estimate (Bessel-corrected), exactly
    like ``torch.nn.BatchNorm2d``. EMA: ``r = momentum * r + (1-momentum) * b``.
    """

    features: int
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPSILON
    dtype: Optional[Any] = None
    # Batch-variance formulation (training mode):
    #   "one_pass": var = max(E[x²] − E[x]², 0) — one read of x; +17%
    #     whole-step train throughput measured on v5e (BN reductions are the
    #     largest slice of the step, see BASELINE.md §profile). The
    #     cancellation noise is ~fp32-epsilon·mean²/var — orders below the
    #     ±0.2% top-1 budget — but it breaks bitwise cross-mesh equivalence.
    #   "two_pass": var = E[(x−m)²] — exact; used by the DDP-equivalence
    #     tests and available for numerically paranoid runs.
    stats: str = "one_pass"
    # Running-stat EMA placement:
    #   "module":   r = momentum·r + (1−momentum)·b inside apply — one tiny
    #     XLA op per BN layer (torch-faithful, safe for direct module users).
    #   "external": the module stores the RAW batch stats (Bessel-corrected
    #     var) into batch_stats; the train step applies the EMA once over the
    #     whole flattened stats tree (train/steps.py) — kills ~100 tiny
    #     fusions + their HBM↔VMEM spill copies per step (profiled 11% of the
    #     step at bs128, see BASELINE.md). Only valid under a step that does
    #     the EMA; Trainer/bench wire it automatically.
    ema: str = "module"

    def setup(self):
        f = (self.features,)
        self.scale = self.param("scale", nn.initializers.ones, f, jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, f, jnp.float32)
        self.mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(f, jnp.float32)
        )
        self.var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(f, jnp.float32)
        )

    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        if use_running_average:
            mean, var = self.mean.value, self.var.value
        else:
            x32 = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=reduce_axes)
            # Biased variance for normalisation (torch behavior); see the
            # ``stats`` field for the one-pass/two-pass trade-off.
            if self.stats == "one_pass":
                var = jnp.maximum(
                    jnp.mean(jnp.square(x32), axis=reduce_axes)
                    - jnp.square(mean),
                    0.0,
                )
            else:
                var = jnp.mean(jnp.square(x32 - mean), axis=reduce_axes)
            if not self.is_initializing():
                n = 1
                for a in reduce_axes:
                    n *= x.shape[a]
                bessel = n / max(n - 1, 1)
                if self.ema == "external":
                    self.mean.value = mean
                    self.var.value = var * bessel
                else:
                    self.mean.value = (
                        self.momentum * self.mean.value + (1.0 - self.momentum) * mean
                    )
                    self.var.value = (
                        self.momentum * self.var.value
                        + (1.0 - self.momentum) * var * bessel
                    )
        # y = x * (γ / sqrt(v+ε)) + (β − m·γ/sqrt(v+ε)); factors in fp32,
        # applied in compute dtype so XLA fuses it into the producing conv.
        inv = self.scale * jax.lax.rsqrt(var + self.epsilon)
        shift = self.bias - mean * inv
        dt = self.dtype or x.dtype
        return x * inv.astype(dt) + shift.astype(dt)

    def relu_train_region(self, x: jax.Array) -> jax.Array:
        """Training-mode BN + ReLU with the Pallas region BACKWARD
        (ops/pallas/bn_bwd.py — VERDICT r2 item 2a). Forward math and
        running-stat updates are identical to ``__call__`` + ``nn.relu``;
        only the autodiff of the normalize+relu region is replaced."""
        from mnasnet_tpu.ops.pallas.bn_bwd import bn_relu_train

        y, mean, var = bn_relu_train(
            x, self.scale, self.bias, self.epsilon, self.stats
        )
        if not self.is_initializing():
            n = x.size // x.shape[-1]
            bessel = n / max(n - 1, 1)
            if self.ema == "external":
                self.mean.value = mean
                self.var.value = var * bessel
            else:
                self.mean.value = (
                    self.momentum * self.mean.value
                    + (1.0 - self.momentum) * mean
                )
                self.var.value = (
                    self.momentum * self.var.value
                    + (1.0 - self.momentum) * var * bessel
                )
        return y

    def folded(self) -> tuple[jax.Array, jax.Array]:
        """Inference-time folded (scale, bias): ``y = x*scale + bias``.

        Feeds the fused Pallas depthwise kernel (BN+ReLU folding clause of the
        rebuild contract).
        """
        inv = self.scale * jax.lax.rsqrt(self.var.value + self.epsilon)
        return inv, self.bias - self.mean.value * inv
