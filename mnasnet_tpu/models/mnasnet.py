"""MNASNet-B1 depth-multiplier family, TPU-native (Flax linen, NHWC).

Architecture contract: SURVEY.md §2.1 — verified numerically against the
published param/MAC grid (reference checkout was empty; the torch module tree
in SURVEY.md Appendix A reproduces all published counts exactly and is the
golden fixture in ``tests/torch_ref.py``).

Macro-architecture (MnasNet-B1, input 224×224×3):
  stem   Conv3x3 s2 → d0
  sep    dw3x3 s1 + pw1x1 (linear) → d1
  s1..s6 MBConv stacks: (k, s, expansion, repeats) =
         (3,2,3,3) (5,2,3,3) (5,2,6,3) (3,1,6,2) (5,2,6,4) (3,1,6,1)
         with out channels d2..d7
  head   Conv1x1→1280, BN, ReLU; global mean; Dropout(0.2); Dense→classes

MBConv: pw-expand → BN → ReLU → dw kxk (stride s) → BN → ReLU → pw-project →
BN (linear bottleneck, no ReLU); residual iff in==out and stride==1. All convs
bias-free; BN EMA decay 0.9997.

TPU-first choices: NHWC layout, bf16 compute with fp32 params/stats, fused
Pallas depthwise path for inference (BN+ReLU folding), pointwise convs left to
XLA (they're MXU matmuls and dominate FLOPs — 87% of MACs, SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mnasnet_tpu.models.layers import (
    BatchNorm,
    PointwiseConv,
    StemConv,
    conv_kernel_init,
    dense_kernel_init,
)
from mnasnet_tpu.ops.depthwise import (
    depthwise_conv2d,
    depthwise_conv_bn_relu_fused,
)

# Base (α=1.0) widths and MBConv stack spec: (kernel, stride, expansion, repeats).
BASE_DEPTHS = (32, 16, 24, 40, 80, 96, 192, 320)
STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3), (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))


def round_to_multiple_of(val: float, divisor: int = 8, round_up_bias: float = 0.9) -> int:
    """Width rounding rule of the reference (SURVEY.md §2.1): round to the
    nearest multiple of ``divisor`` but never go below ``round_up_bias``× the
    requested value."""
    new_val = max(divisor, int(val + divisor / 2) // divisor * divisor)
    return new_val if new_val >= round_up_bias * val else new_val + divisor


def get_depths(alpha: float) -> list[int]:
    return [round_to_multiple_of(d * alpha, 8) for d in BASE_DEPTHS]


def count_macs(alpha: float, image_size: int, num_classes: int = 1000) -> int:
    """Analytic per-image MAC count (verified against the published grid —
    SURVEY.md §2.1 / Appendix A: 314.4M @ α=1.0/224 vs the paper's ~315M)."""
    d = get_depths(alpha)
    macs = 0
    hw = image_size // 2  # stem stride 2
    macs += 3 * 3 * 3 * d[0] * hw * hw          # stem conv
    macs += 3 * 3 * d[0] * hw * hw              # sep dw
    macs += d[0] * d[1] * hw * hw               # sep pw
    in_ch = d[1]
    for s, (k, stride, exp, repeats) in enumerate(STACKS):
        out_ch = d[2 + s]
        for j in range(repeats):
            st = stride if j == 0 else 1
            mid = in_ch * exp
            macs += in_ch * mid * hw * hw       # expand (pre-stride plane)
            hw_out = (hw + 2 * (k // 2) - k) // st + 1
            macs += k * k * mid * hw_out * hw_out   # dw
            macs += mid * out_ch * hw_out * hw_out  # project
            hw = hw_out
            in_ch = out_ch
    macs += in_ch * 1280 * hw * hw              # head conv
    macs += 1280 * num_classes                  # classifier
    return macs


class InvertedResidual(nn.Module):
    """MBConv block (the reference's ``_InvertedResidual``)."""

    in_ch: int
    out_ch: int
    kernel_size: int
    stride: int
    expansion: int
    dtype: Any = jnp.float32
    dw_impl: str = "auto"
    precision: Any = None
    bn_stats: str = "one_pass"
    bn_ema: str = "module"
    bn_momentum: float = 0.9997
    pw_lowering: str = "conv"
    bn_bwd: str = "xla"
    # Pad the expanded width up to a multiple of this (perf experiment —
    # see MNASNet.channel_pad).
    mid_pad: int = 1

    def setup(self):
        mid = -(-self.in_ch * self.expansion // self.mid_pad) * self.mid_pad
        self.apply_residual = self.in_ch == self.out_ch and self.stride == 1
        self.expand_conv = PointwiseConv(
            self.in_ch, mid, dtype=self.dtype, precision=self.precision,
            lowering=self.pw_lowering, name="expand_conv",
        )
        self.expand_bn = BatchNorm(mid, momentum=self.bn_momentum, dtype=self.dtype, stats=self.bn_stats, ema=self.bn_ema, name="expand_bn")
        self.dw_kernel = self.param(
            "dw_kernel", conv_kernel_init,
            (self.kernel_size, self.kernel_size, 1, mid), jnp.float32,
        )
        self.dw_bn = BatchNorm(mid, momentum=self.bn_momentum, dtype=self.dtype, stats=self.bn_stats, ema=self.bn_ema, name="dw_bn")
        self.project_conv = PointwiseConv(
            mid, self.out_ch, dtype=self.dtype, precision=self.precision,
            lowering=self.pw_lowering, name="project_conv",
        )
        self.project_bn = BatchNorm(self.out_ch, momentum=self.bn_momentum, dtype=self.dtype, stats=self.bn_stats, ema=self.bn_ema, name="project_bn")

    def _use_fused_block(self, x: jax.Array, train: bool) -> bool:
        """Route to the single-kernel fused MBConv (ops/pallas/mbconv.py) —
        the block-level fusion that keeps the 6×-expanded tensor out of HBM.
        Explicit opt-in via dw_impl='pallas' only: measured on the target v5e
        (BASELINE.md), XLA's per-op conv lowering is faster for this model at
        batch ≥64 (inference is MXU-bound on the pointwise convs), so 'auto'
        keeps the XLA path as the production default."""
        if train or self.dw_impl != "pallas":
            return False
        from mnasnet_tpu.ops.pallas.mbconv import mbconv_fits_vmem

        # Same mid_pad rounding as setup(): the fit check must see the
        # width of the tensors actually passed to mbconv_fused.
        mid = -(-self.in_ch * self.expansion // self.mid_pad) * self.mid_pad
        return mbconv_fits_vmem(
            x.shape[1], x.shape[2], self.in_ch, mid, self.out_ch,
            self.kernel_size, self.stride,
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self._use_fused_block(x, train):
            from mnasnet_tpu.ops.pallas.mbconv import mbconv_fused

            se, be = self.expand_bn.folded()
            sd, bd = self.dw_bn.folded()
            sp, bp = self.project_bn.folded()
            return mbconv_fused(
                x,
                self.expand_conv.matrix(), se, be,
                self.dw_kernel, sd, bd,
                self.project_conv.matrix(), sp, bp,
                kernel_size=self.kernel_size,
                stride=self.stride,
                residual=self.apply_residual,
            )
        y = self.expand_conv(x, train)
        region = train and self.bn_bwd == "pallas_region"
        if region:
            y = self.expand_bn.relu_train_region(y)
        else:
            y = nn.relu(self.expand_bn(y, use_running_average=not train))
        if not train and self.dw_impl != "xla":
            # Inference fallback: fused dw-conv + folded-BN + ReLU.
            s, b = self.dw_bn.folded()
            y = depthwise_conv_bn_relu_fused(
                y, self.dw_kernel, s, b, stride=self.stride, impl=self.dw_impl,
                precision=self.precision,
            )
        else:
            y = depthwise_conv2d(
                y, self.dw_kernel, stride=self.stride, impl=self.dw_impl,
                precision=self.precision,
            )
            if region:
                y = self.dw_bn.relu_train_region(y)
            else:
                y = nn.relu(self.dw_bn(y, use_running_average=not train))
        y = self.project_conv(y, train)
        y = self.project_bn(y, use_running_average=not train)  # linear bottleneck
        if self.apply_residual:
            y = y + x
        return y


class MNASNet(nn.Module):
    """MNASNet with depth multiplier ``alpha``.

    Constructor signature mirrors the reference
    (``MNASNet(alpha, num_classes=1000, dropout=0.2)``), plus TPU knobs.
    """

    alpha: float
    num_classes: int = 1000
    dropout: float = 0.2
    dtype: Any = jnp.float32
    dw_impl: str = "auto"
    # lax precision for dense/pointwise convs; "highest" for exact-fp32 parity
    # against the torch oracle (XLA's *default* conv precision is reduced even
    # in fp32), None for the fast TPU default.
    precision: Any = None
    # Rematerialize MBConv blocks in the backward pass (jax.checkpoint):
    # trades recompute FLOPs for HBM traffic — a win when training is
    # bandwidth-bound (this chip: see BASELINE.md).
    remat: bool = False
    # BN batch-statistics formulation: "one_pass" (+17% train step, default)
    # or "two_pass" (bitwise cross-mesh exact) — see models/layers.py.
    bn_stats: str = "one_pass"
    # BN running-stat EMA placement: "module" (per-layer, torch-faithful) or
    # "external" (raw batch stats out; the train step EMAs the whole flat
    # stats tree in one fusion — see models/layers.py + train/steps.py).
    bn_ema: str = "module"
    # BN running-stat EMA decay (the reference hardcodes 0.9997; exposed so
    # short runs/tests can use a faster EMA — 0.9997 needs ~10k steps before
    # eval-mode stats are meaningful).
    bn_momentum: float = 0.9997
    # 1x1-conv lowering inside MBConv blocks: "conv" (conv_general_dilated),
    # "dot" (MXU matmul via dot_general — a different XLA emitter), or
    # "auto" (default): conv in training mode, dot in eval mode — the
    # per-mode measured-fastest on the v5e (dot is +3% on the bs128 infer
    # step, the (N·H·W,C)-matmul view tiles the narrow-C_out projections
    # better than the conv emitter — INFER_PROFILE_r04.json — while the
    # train-side dot wgrad measured negative in the round-2 campaign).
    # Checkpoints are lowering-agnostic (identical kernel param), and the
    # lowering is mode-static under jit ("train" is a Python bool at trace
    # time), so "auto" costs nothing. Equivalence: tests/test_model.py.
    pw_lowering: str = "auto"
    # Space-to-depth stem: rewrite the 3x3/s2 RGB stem conv as an exactly
    # equivalent 2x2/s1 conv on a 2x2-block-flattened (H/2, W/2, 12) input.
    # C=3 inputs waste almost the whole 128-lane axis on TPU; packing 4
    # pixels into channels quadruples the work per lane (the classic TPU
    # ResNet trick). The (3,3,3,C) kernel param and its checkpoint/converter
    # layout are UNCHANGED — the kernel is rearranged (pad+reshape) in-graph,
    # so gradients land on the original parameter.
    stem_s2d: bool = False
    # BN(+ReLU) backward implementation: "xla" (autodiff, production) or
    # "pallas_region" (the ops/pallas/bn_bwd.py region fusion — VERDICT r2
    # item 2a; benchmarked in tools/bench_train_variants.py).
    bn_bwd: str = "xla"
    # Round every derived channel width (and MBConv expanded width) up to a
    # multiple of this. Perf EXPERIMENT for the lane-tiling/copy question
    # (VERDICT r2 item 2b): channels already occupy 128 hardware lanes
    # regardless, so explicit padding costs ~no MXU/VPU time — if the padded
    # graph steps faster, XLA's sub-128-lane relayouts were the cost. NOT
    # checkpoint-compatible with the reference widths; A/B only.
    channel_pad: int = 1

    def setup(self):
        d = get_depths(self.alpha)
        if self.channel_pad > 1:
            cp = self.channel_pad
            d = [-(-w // cp) * cp for w in d]
        self.depths = d
        self.stem_conv = StemConv(
            d[0], dtype=self.dtype, precision=self.precision,
            s2d=self.stem_s2d, name="stem_conv",
        )
        self.stem_bn = BatchNorm(d[0], momentum=self.bn_momentum, dtype=self.dtype, stats=self.bn_stats, ema=self.bn_ema, name="stem_bn")
        self.sep_dw_kernel = self.param(
            "sep_dw_kernel", conv_kernel_init, (3, 3, 1, d[0]), jnp.float32
        )
        self.sep_dw_bn = BatchNorm(d[0], momentum=self.bn_momentum, dtype=self.dtype, stats=self.bn_stats, ema=self.bn_ema, name="sep_dw_bn")
        self.sep_pw_conv = nn.Conv(
            d[1], (1, 1), use_bias=False, kernel_init=conv_kernel_init,
            dtype=self.dtype, precision=self.precision, name="sep_pw_conv",
        )
        self.sep_pw_bn = BatchNorm(d[1], momentum=self.bn_momentum, dtype=self.dtype, stats=self.bn_stats, ema=self.bn_ema, name="sep_pw_bn")

        block_cls = InvertedResidual
        if self.remat:
            # static_argnums indexes (x, train) — train must stay static
            block_cls = nn.remat(InvertedResidual, static_argnums=(2,))
        blocks = []
        in_ch = d[1]
        for s, (k, stride, exp, repeats) in enumerate(STACKS):
            out_ch = d[2 + s]
            for j in range(repeats):
                blocks.append(
                    block_cls(
                        in_ch=in_ch,
                        out_ch=out_ch,
                        kernel_size=k,
                        stride=stride if j == 0 else 1,
                        expansion=exp,
                        dtype=self.dtype,
                        dw_impl=self.dw_impl,
                        precision=self.precision,
                        bn_stats=self.bn_stats,
                        bn_ema=self.bn_ema,
                        bn_momentum=self.bn_momentum,
                        pw_lowering=self.pw_lowering,
                        bn_bwd=self.bn_bwd,
                        mid_pad=self.channel_pad,
                        name=f"stage{s}_block{j}",
                    )
                )
                in_ch = out_ch
        self.blocks = blocks

        self.head_conv = nn.Conv(
            1280, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
            dtype=self.dtype, precision=self.precision, name="head_conv",
        )
        self.head_bn = BatchNorm(1280, momentum=self.bn_momentum, dtype=self.dtype, stats=self.bn_stats, ema=self.bn_ema, name="head_bn")
        self.classifier = nn.Dense(
            self.num_classes, kernel_init=dense_kernel_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            precision=self.precision, name="classifier",
        )
        self.dropout_layer = nn.Dropout(self.dropout, name="dropout")

    def features(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Backbone up to the 1280-wide head feature map (pre-pool)."""
        x = x.astype(self.dtype)
        region = train and self.bn_bwd == "pallas_region"

        def bn_relu(bn, v):
            if region:
                return bn.relu_train_region(v)
            return nn.relu(bn(v, use_running_average=not train))

        y = bn_relu(self.stem_bn, self.stem_conv(x, train=train))
        if not train and self.dw_impl != "xla":
            s, b = self.sep_dw_bn.folded()
            y = depthwise_conv_bn_relu_fused(
                y, self.sep_dw_kernel, s, b, stride=1, impl=self.dw_impl,
                precision=self.precision,
            )
        else:
            y = depthwise_conv2d(y, self.sep_dw_kernel, stride=1, impl=self.dw_impl,
                                 precision=self.precision)
            y = bn_relu(self.sep_dw_bn, y)
        y = self.sep_pw_bn(self.sep_pw_conv(y), use_running_average=not train)
        for block in self.blocks:
            y = block(y, train)  # positional: remat static_argnums
        y = bn_relu(self.head_bn, self.head_conv(y))
        return y

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.features(x, train=train)
        y = jnp.mean(y, axis=(1, 2))  # global average pool over H, W
        y = self.dropout_layer(y, deterministic=not train)
        # Classify in fp32 — the 1280→classes matmul is 0.4% of MACs and the
        # logits feed a softmax; keeping it fp32 costs nothing, guards top-1.
        return self.classifier(y.astype(jnp.float32)).astype(jnp.float32)


def _ctor(alpha: float):
    def make(num_classes: int = 1000, dropout: float = 0.2, **kwargs) -> MNASNet:
        return MNASNet(alpha=alpha, num_classes=num_classes, dropout=dropout, **kwargs)

    make.__name__ = f"mnasnet{str(alpha).replace('.', '_')}"
    make.__doc__ = f"MNASNet with depth multiplier {alpha} (reference ctor parity)."
    return make


mnasnet0_35 = _ctor(0.35)
mnasnet0_5 = _ctor(0.5)
mnasnet0_75 = _ctor(0.75)
mnasnet1_0 = _ctor(1.0)
mnasnet1_3 = _ctor(1.3)
# [B:configs[4]] spans the multiplier grid up to 1.4; the reference ctor set
# stops at 1.3, so 1.4 is rebuild-only (param count pinned against the torch
# oracle in tests/test_model.py, no published checkpoint exists for it).
mnasnet1_4 = _ctor(1.4)

MODEL_REGISTRY = {
    "mnasnet0_35": mnasnet0_35,
    "mnasnet0_5": mnasnet0_5,
    "mnasnet0_75": mnasnet0_75,
    "mnasnet1_0": mnasnet1_0,
    "mnasnet1_3": mnasnet1_3,
    "mnasnet1_4": mnasnet1_4,
}


def create_model(name: str, **kwargs) -> MNASNet:
    """Build a model by arch name.

    Registry names cover the reference ctor set plus 1.4; any other
    ``mnasnet<int>_<frac>`` spelling (e.g. ``mnasnet0_9``) constructs the
    corresponding depth multiplier directly, so the full [B:configs[4]]
    NAS-style grid is reachable from the CLI without code edits.
    """
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name](**kwargs)
    if name.startswith("mnasnet"):
        spec = name[len("mnasnet"):]
        parts = spec.split("_")
        if len(parts) == 2 and all(p.isdigit() for p in parts):
            return MNASNet(alpha=float(f"{parts[0]}.{parts[1]}"), **kwargs)
    raise ValueError(
        f"unknown arch {name!r}; choices: {sorted(MODEL_REGISTRY)} "
        "or any mnasnet<int>_<frac> multiplier spelling"
    )
