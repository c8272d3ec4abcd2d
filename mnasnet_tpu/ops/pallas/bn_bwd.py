"""Pallas region fusion for the training BatchNorm+ReLU backward
(VERDICT r2 "what's weak" #1 / next-round item 2a).

The train-step profile (BASELINE.md, tools/profile_step.py) shows the BN
backward — ReLU-mask · dy elementwise chains (``negate_add`` fusions) and the
Σg / Σg·x̂ reductions (``multiply_reduce`` / ``convert_reduce`` fusions) —
as the largest non-conv cost of the step. XLA fuses those chains INTO the
neighboring conv fusions; this module instead owns the whole region
explicitly as Pallas kernels behind one ``custom_vjp``:

  forward   y = relu(x̂·γ + β),  x̂ = (x−μ)·rsqrt(σ²+ε), batch μ/σ² (XLA —
            it fuses into the producing conv exactly like the module path)
  backward  g  = dy · [y > 0]   (mask recomputed in-kernel with the SAME
            compute-dtype expression x·inv + shift the forward clamps —
            an fp32 x̂·γ+β recompute can disagree at sign boundaries under
            bf16 and leak gradient through units the forward clamped)
            dβ = Σ g,   dγ = Σ g·x̂        (kernel 1: plane-streaming reduce)
            dx = γ·rsqrt(σ²+ε) · (g − dβ/n − x̂·dγ/n)   (kernel 2)

Layout follows ops/pallas/dw_conv.py: NHWC, C on the 128-lane axis, grid
over (channel-blocks, batch) with one spatial plane per cell in VMEM; fp32
accumulation; the reduction accumulates across the sequential batch grid
axis.

Traffic accounting (recorded BEFORE measurement): the two kernels read x and
dy twice each and write dx — 5 plane-sized HBM transfers per BN. XLA's
autodiff spends the same chains fused into convs whose reads they share, so
the explicit region adds roughly two plane reads per BN and erects fusion
barriers around each block. The candidate exists to turn round-2's
"re-named, not built" criticism into a measured number either way; routing
stays 'xla' unless the step-level measurement says otherwise (BASELINE.md
"Round 3").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mnasnet_tpu.ops.pallas.dw_conv import _interpret, _pick_c_block


def _relu_mask(xd, mean, inv, gamma, beta):
    """The forward's ReLU mask, bit-faithfully: _fwd_math clamps the
    compute-dtype expression x·inv_c + shift_c (inv_c/shift_c cast to
    x.dtype first, multiply-add in x.dtype), so the recompute must too."""
    inv_total = gamma * inv
    shift = beta - mean * inv_total
    yd = xd * inv_total.astype(xd.dtype) + shift.astype(xd.dtype)
    return (yd > 0).astype(jnp.float32)


def _reduce_kernel(x_ref, dy_ref, mean_ref, inv_ref, gamma_ref, beta_ref,
                   dg_ref, db_ref):
    """Per-(c-block) accumulation of dβ=Σg, dγ=Σg·x̂ over the sequential
    (batch, row-chunk) grid axes; the first cell initializes the fp32
    accumulators. The ReLU mask is recomputed in-kernel (see _relu_mask)."""
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    xd = x_ref[0]
    x = xd.astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    mean = mean_ref[0].astype(jnp.float32)
    inv = inv_ref[0].astype(jnp.float32)  # rsqrt(var+eps), gamma-free
    gamma = gamma_ref[0].astype(jnp.float32)
    beta = beta_ref[0].astype(jnp.float32)
    xhat = (x - mean) * inv
    g = dy * _relu_mask(xd, mean, inv, gamma, beta)
    db = jnp.sum(g, axis=(0, 1))
    dg = jnp.sum(g * xhat, axis=(0, 1))

    @pl.when(first)
    def _init():
        db_ref[0] = db
        dg_ref[0] = dg

    @pl.when(jnp.logical_not(first))
    def _acc():
        db_ref[0] += db
        dg_ref[0] += dg


def _dx_kernel(x_ref, dy_ref, mean_ref, inv_ref, gamma_ref, beta_ref,
               dg_ref, db_ref, dx_ref, *, inv_n: float):
    xd = x_ref[0]
    x = xd.astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    mean = mean_ref[0].astype(jnp.float32)
    inv = inv_ref[0].astype(jnp.float32)
    gamma = gamma_ref[0].astype(jnp.float32)
    beta = beta_ref[0].astype(jnp.float32)
    dg = dg_ref[0].astype(jnp.float32)
    db = db_ref[0].astype(jnp.float32)
    xhat = (x - mean) * inv
    g = dy * _relu_mask(xd, mean, inv, gamma, beta)
    dx = (gamma * inv) * (g - inv_n * db - xhat * (inv_n * dg))
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _chunk_spec(hc, W, cb):
    return pl.BlockSpec((1, hc, W, cb), lambda c, n, h: (n, h, 0, c),
                        memory_space=pltpu.VMEM)


def _vec_spec(cb):
    return pl.BlockSpec((1, cb), lambda c, n, h: (0, c),
                        memory_space=pltpu.VMEM)


# fp32 working-set budget per row chunk; the kernels hold ~5 fp32 chunk
# temporaries (x, dy, x̂, g, dx) plus double-buffered ins/outs, so 256 KiB
# keeps the stack well under the 16 MiB scoped-vmem limit.
_CHUNK_BUDGET = 256 * 1024


def _pick_rows(H, W, cb) -> int:
    if H * W * cb * 4 <= _CHUNK_BUDGET:
        return H
    limit = max(1, _CHUNK_BUDGET // (W * cb * 4))
    for hc in range(min(limit, H), 0, -1):
        if H % hc == 0:
            return hc
    return 1


def _bn_bwd_pallas(x, dy, mean, var, gamma, beta, eps):
    """(dx, dgamma, dbeta) for y = relu((x−mean)·rsqrt(var+eps)·γ + β),
    treating mean/var as batch statistics of x (full BN backward)."""
    N, H, W, C = x.shape
    n_elems = N * H * W
    inv_std = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    cb = min(_pick_c_block(C, H * W), 128)
    if C % cb:
        cb = C  # non-128-divisible widths: whole C, rely on row chunking
    hc = _pick_rows(H, W, cb)
    grid = (pl.cdiv(C, cb), N, H // hc)
    mean2 = mean.astype(jnp.float32).reshape(1, C)
    inv2 = inv_std.reshape(1, C)
    gamma2 = gamma.astype(jnp.float32).reshape(1, C)
    beta2 = beta.astype(jnp.float32).reshape(1, C)

    dg, db = pl.pallas_call(
        _reduce_kernel,
        grid=grid,
        in_specs=[_chunk_spec(hc, W, cb), _chunk_spec(hc, W, cb),
                  _vec_spec(cb), _vec_spec(cb), _vec_spec(cb),
                  _vec_spec(cb)],
        out_specs=[_vec_spec(cb), _vec_spec(cb)],
        out_shape=[jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(x, dy, mean2, inv2, gamma2, beta2)

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, inv_n=1.0 / n_elems),
        grid=grid,
        in_specs=[_chunk_spec(hc, W, cb), _chunk_spec(hc, W, cb),
                  _vec_spec(cb), _vec_spec(cb), _vec_spec(cb),
                  _vec_spec(cb), _vec_spec(cb), _vec_spec(cb)],
        out_specs=_chunk_spec(hc, W, cb),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
        interpret=_interpret(),
    )(x, dy, mean2, inv2, gamma2, beta2, dg, db)

    return dx, dg[0].astype(gamma.dtype), db[0].astype(beta.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_train(x, gamma, beta, eps: float = 1e-5,
                  stats: str = "one_pass"):
    """Training-mode BN (batch stats) + ReLU with the Pallas region backward.

    Returns (y, mean, biased_var); the caller applies EMA/Bessel to the
    stats exactly like the module path (models/layers.py BatchNorm).
    """
    return _fwd_math(x, gamma, beta, eps, stats)


def _fwd_math(x, gamma, beta, eps, stats):
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    if stats == "one_pass":
        var = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean), 0.0
        )
    else:
        var = jnp.mean(jnp.square(x32 - mean), axis=axes)
    inv = gamma * jax.lax.rsqrt(var + eps)
    shift = beta - mean * inv
    y = jnp.maximum(x * inv.astype(x.dtype) + shift.astype(x.dtype), 0)
    return y, mean, var


def _bn_relu_fwd(x, gamma, beta, eps, stats):
    y, mean, var = _fwd_math(x, gamma, beta, eps, stats)
    return (y, mean, var), (x, gamma, beta, mean, var)


def _bn_relu_bwd(eps, stats, res, grads):
    del stats
    x, gamma, beta, mean, var = res
    dy, _dmean, _dvar = grads  # stats feed the (non-differentiated) EMA only
    dx, dgamma, dbeta = _bn_bwd_pallas(x, dy, mean, var, gamma, beta, eps)
    return dx, dgamma, dbeta


bn_relu_train.defvjp(_bn_relu_fwd, _bn_relu_bwd)
