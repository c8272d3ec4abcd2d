"""Converter parity: Flax forward on converted torch weights matches torch
forward ≤1e-4 fp32 (SURVEY.md §4.1b, [B:north_star] tolerance clause)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mnasnet_tpu import MNASNet
from mnasnet_tpu.convert import flax_to_torch, torch_to_flax
from tests.torch_ref import TorchMNASNet, randomize_bn_stats


# All five multipliers: the 0.35/1.3 width-rounding paths (max(8,·) clamp and
# the +divisor round-up bias) are exactly where converter shape bugs would hide
# (VERDICT r1 weak #7).
@pytest.mark.parametrize("alpha", [0.35, 0.5, 0.75, 1.0, 1.3, 1.4])
def test_torch_to_flax_forward_parity(alpha):
    torch.manual_seed(0)
    tmodel = TorchMNASNet(alpha).eval()
    randomize_bn_stats(tmodel)

    variables = torch_to_flax(tmodel.state_dict(), alpha)
    variables = jax.tree.map(jnp.asarray, variables)

    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = MNASNet(alpha=alpha, dw_impl="xla", precision="highest")
    f_out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    np.testing.assert_allclose(f_out, t_out, atol=1e-4, rtol=1e-4)


def test_roundtrip_flax_torch_flax():
    alpha = 0.5
    torch.manual_seed(2)
    tmodel = TorchMNASNet(alpha).eval()
    randomize_bn_stats(tmodel, seed=3)
    sd = tmodel.state_dict()

    variables = torch_to_flax(sd, alpha)
    back = flax_to_torch(variables, alpha)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)


def test_module_prefix_stripped():
    alpha = 0.5
    tmodel = TorchMNASNet(alpha).eval()
    sd = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
    variables = torch_to_flax(sd, alpha)  # DataParallel-style checkpoint
    assert "stem_conv" in variables["params"]


def test_fused_inference_path_matches_unfused():
    # dw_impl='auto' on CPU routes to XLA, but the fused folded-BN inference
    # branch is exercised (train=False, dw_impl != 'xla').
    alpha = 0.5
    torch.manual_seed(4)
    tmodel = TorchMNASNet(alpha).eval()
    randomize_bn_stats(tmodel, seed=5)
    variables = jax.tree.map(jnp.asarray, torch_to_flax(tmodel.state_dict(), alpha))
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 64, 64, 3)).astype(np.float32)
    )
    unfused = MNASNet(alpha=alpha, dw_impl="xla", precision="highest").apply(
        variables, x, train=False
    )
    fused = MNASNet(alpha=alpha, dw_impl="auto", precision="highest").apply(
        variables, x, train=False
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=1e-5)


def test_load_pretrained_api(tmp_path):
    import jax.numpy as jnp_

    from mnasnet_tpu import load_pretrained

    tmodel = TorchMNASNet(0.5).eval()
    randomize_bn_stats(tmodel, seed=9)
    path = str(tmp_path / "w.pth")
    torch.save({"state_dict": tmodel.state_dict()}, path)

    model, variables = load_pretrained("mnasnet0_5", path, precision="highest")
    x = np.random.default_rng(9).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=1e-4)

    with pytest.raises(ValueError):
        load_pretrained("resnet50", path)


def test_per_block_activation_parity():
    """SURVEY.md §4.1c: per-stage activations on converted weights match the
    torch oracle — catches BN-folding / layout bugs that logits-level parity
    can miss."""
    alpha = 0.5
    torch.manual_seed(11)
    tmodel = TorchMNASNet(alpha).eval()
    randomize_bn_stats(tmodel, seed=11)
    variables = jax.tree.map(jnp.asarray, torch_to_flax(tmodel.state_dict(), alpha))

    x = np.random.default_rng(12).standard_normal((1, 64, 64, 3)).astype(np.float32)
    acts = {}
    y = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for i, m in enumerate(tmodel.layers):
            y = m(y)
            acts[i] = y.numpy()

    model = MNASNet(alpha=alpha, dw_impl="xla", precision="highest")
    _, inter = model.apply(
        variables, jnp.asarray(x), train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    fi = inter["intermediates"]

    def flax_out(*path):
        node = fi
        for p in path:
            node = node[p]
        return np.asarray(node["__call__"][0]).transpose(0, 3, 1, 2)

    from mnasnet_tpu.models.mnasnet import STACKS

    # torch layers.{8+s} == last block of flax stage s
    checks = [(("sep_pw_bn",), 7)]
    for s, (_k, _st, _e, repeats) in enumerate(STACKS):
        checks.append(((f"stage{s}_block{repeats - 1}",), 8 + s))
    for path, ti in checks:
        ours = flax_out(*path)
        np.testing.assert_allclose(
            ours, acts[ti], atol=5e-5, rtol=1e-4,
            err_msg=f"{path} vs torch layers.{ti}",
        )
