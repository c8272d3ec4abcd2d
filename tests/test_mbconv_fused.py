"""Fused MBConv kernel vs unfused XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mnasnet_tpu.ops.pallas.mbconv import (
    mbconv_fits_vmem,
    mbconv_fused,
    mbconv_reference,
)


def _mk(h, cin, cmid, cout, k, seed=0):
    r = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32))
    x = f32(2, h, h, cin)
    we = f32(cin, cmid) * 0.2
    wd = f32(k, k, 1, cmid) * 0.3
    wp = f32(cmid, cout) * 0.2
    se, sd, sp = (jnp.asarray(r.uniform(0.5, 1.5, c).astype(np.float32))
                  for c in (cmid, cmid, cout))
    be, bd, bp = (f32(c) * 0.1 for c in (cmid, cmid, cout))
    return x, we, se, be, wd, sd, bd, wp, sp, bp


@pytest.mark.parametrize("h,cin,cmid,cout,k,stride,res", [
    (16, 16, 48, 24, 3, 2, False),   # s1.0-like
    (16, 24, 72, 24, 3, 1, True),    # s1.1-like (residual)
    (14, 40, 240, 80, 5, 2, False),  # s3.0-like
    (14, 80, 480, 80, 5, 1, True),
    (7, 96, 576, 96, 3, 1, True),
    (15, 8, 24, 8, 5, 2, False),     # odd spatial stride-2
])
def test_fused_matches_reference(h, cin, cmid, cout, k, stride, res):
    args = _mk(h, cin, cmid, cout, k)
    kw = dict(kernel_size=k, stride=stride, residual=res)
    ref = mbconv_reference(*args, precision="highest", **kw)
    out = mbconv_fused(*args, **kw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_bf16_end_to_end():
    x, *rest = _mk(14, 40, 240, 80, 5)
    kw = dict(kernel_size=5, stride=1, residual=False)
    ref = mbconv_reference(x, *rest, precision="highest", **kw)
    out = mbconv_fused(x.astype(jnp.bfloat16), *rest, **kw)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1, rtol=0.1
    )


def test_vmem_guard():
    # every MNASNet-1.3@224 block must fit; an absurd plane must not
    assert mbconv_fits_vmem(112, 112, 24, 72, 32, 3, 2)
    assert mbconv_fits_vmem(7, 7, 320, 1920, 320, 3, 1)
    assert not mbconv_fits_vmem(512, 512, 64, 384, 64, 3, 1)


def test_model_integration_fused_blocks_match_xla():
    """Full model with forced-Pallas fused MBConv blocks (interpret mode on
    CPU) must match the XLA composition."""
    from mnasnet_tpu import MNASNet

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = MNASNet(alpha=0.35, num_classes=8).init(
        jax.random.PRNGKey(0), x, train=False
    )
    ref = MNASNet(alpha=0.35, num_classes=8, dw_impl="xla",
                  precision="highest").apply(variables, x, train=False)
    out = MNASNet(alpha=0.35, num_classes=8, dw_impl="pallas",
                  precision="highest").apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)
