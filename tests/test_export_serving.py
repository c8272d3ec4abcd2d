"""Serving export (tools/export_serving.py): the eval forward serializes to
a StableHLO artifact (jax.export) that reloads and reproduces the live
forward — the TPU-native analogue of the reference lineage's
TorchScript/ONNX deployment path."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import export_serving  # noqa: E402

IMG = 32


def test_export_roundtrip_matches_live_forward(tmp_path):
    fn, x = export_serving.build_forward(
        "mnasnet0_35", 8, "float32", None, IMG, batch_size=4, dw_impl="xla"
    )
    data = export_serving.export_artifact(fn, x, platforms=["cpu"])
    path = tmp_path / "m.shlo"
    path.write_bytes(data)

    exported = jax.export.deserialize(path.read_bytes())
    assert "cpu" in [p.lower() for p in exported.platforms]
    rng = np.random.default_rng(0)
    img = rng.standard_normal((4, IMG, IMG, 3), dtype=np.float32)
    got = np.asarray(exported.call(img))
    want = np.asarray(fn(jnp.asarray(img)))
    assert got.shape == (4, 8) and got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_export_bakes_weights_as_constants(tmp_path):
    """Two different weight sets must produce artifacts that disagree —
    i.e. the weights ride inside the artifact, not outside it."""
    from mnasnet_tpu import create_model

    model = create_model("mnasnet0_35", num_classes=8, dw_impl="xla")
    v1 = model.init(jax.random.PRNGKey(1),
                    jnp.zeros((1, IMG, IMG, 3)), train=False)
    v2 = model.init(jax.random.PRNGKey(2),
                    jnp.zeros((1, IMG, IMG, 3)), train=False)
    outs = []
    img = np.random.default_rng(0).standard_normal(
        (2, IMG, IMG, 3), dtype=np.float32
    )
    for v in (v1, v2):
        fn, x = export_serving.build_forward(
            "mnasnet0_35", 8, "float32", v, IMG, batch_size=2,
            dw_impl="xla",
        )
        exported = jax.export.deserialize(
            export_serving.export_artifact(fn, x, platforms=["cpu"])
        )
        outs.append(np.asarray(exported.call(img)))
    assert not np.array_equal(outs[0], outs[1])


def test_symbolic_batch_serves_any_batch_size():
    fn, x = export_serving.build_forward(
        "mnasnet0_35", 8, "float32", None, IMG, batch_size=4, dw_impl="xla"
    )
    exported = jax.export.deserialize(
        export_serving.export_artifact(
            fn, x, platforms=["cpu"], symbolic_batch=True
        )
    )
    rng = np.random.default_rng(0)
    for b in (1, 3, 16):
        img = rng.standard_normal((b, IMG, IMG, 3), dtype=np.float32)
        got = np.asarray(exported.call(img))
        want = np.asarray(fn(jnp.asarray(img)))
        assert got.shape == (b, 8)
        np.testing.assert_array_equal(got, want)


def test_raw_input_artifact_matches_host_normalize():
    """--raw-input bakes /255 + mean/std into the artifact; feeding it raw
    uint8 must equal the host-side transforms.normalize path feeding the
    float32 artifact (same fp32 math, just relocated on-accelerator)."""
    from mnasnet_tpu.data.transforms import normalize

    from mnasnet_tpu import create_model

    model = create_model("mnasnet0_35", num_classes=8, dw_impl="xla")
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, IMG, IMG, 3)), train=False)

    fn_f32, x_f32 = export_serving.build_forward(
        "mnasnet0_35", 8, "float32", v, IMG, batch_size=2, dw_impl="xla"
    )
    fn_raw, x_raw = export_serving.build_forward(
        "mnasnet0_35", 8, "float32", v, IMG, batch_size=2, dw_impl="xla",
        raw_input=True,
    )
    assert x_raw.dtype == jnp.uint8
    raw_art = jax.export.deserialize(
        export_serving.export_artifact(fn_raw, x_raw, platforms=["cpu"])
    )

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, IMG, IMG, 3), dtype=np.uint8)
    got = np.asarray(raw_art.call(u8))
    host_norm = np.stack(
        [normalize(im.astype(np.float32) / 255.0) for im in u8]
    )
    want = np.asarray(fn_f32(jnp.asarray(host_norm)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_rejects_wrong_shape(tmp_path):
    fn, x = export_serving.build_forward(
        "mnasnet0_35", 8, "float32", None, IMG, batch_size=4, dw_impl="xla"
    )
    exported = jax.export.deserialize(
        export_serving.export_artifact(fn, x, platforms=["cpu"])
    )
    bad = np.zeros((3, IMG, IMG, 3), np.float32)  # batch 3 != exported 4
    with pytest.raises(ValueError):
        exported.call(bad)


def test_load_serving_matches_live_and_routes_per_batch(tmp_path):
    """mnasnet_tpu.serving.load_serving: the fleet-side loader — accepts a
    path / bytes / Exported, serves every batch size of a symbolic-batch
    artifact through the batch-routed jit, and reproduces the live forward
    exactly (on CPU all routes resolve to bare compiles; the routing itself
    is pinned in tests/test_xla_options.py)."""
    from mnasnet_tpu.serving import load_serving

    fn, x = export_serving.build_forward(
        "mnasnet0_35", 8, "float32", None, IMG, batch_size=4, dw_impl="xla"
    )
    data = export_serving.export_artifact(fn, x, platforms=["cpu"],
                                          symbolic_batch=True)
    path = tmp_path / "m.shlo"
    path.write_bytes(data)

    rng = np.random.default_rng(0)
    for source in (str(path), data, jax.export.deserialize(data)):
        predict = load_serving(source)
        for bs in (1, 4):
            img = rng.standard_normal((bs, IMG, IMG, 3), dtype=np.float32)
            got = np.asarray(predict(img))
            want = np.asarray(fn(jnp.asarray(img)))
            np.testing.assert_array_equal(got, want)


def test_load_serving_explicit_options_passthrough(tmp_path):
    """compiler_options=None gives a plain jit of the call (the A/B
    baseline route); a dict is attached verbatim (expert override) — on
    CPU only an empty dict is compilable, which still exercises the
    non-auto path."""
    from mnasnet_tpu.serving import load_serving

    fn, x = export_serving.build_forward(
        "mnasnet0_35", 8, "float32", None, IMG, batch_size=2, dw_impl="xla"
    )
    data = export_serving.export_artifact(fn, x, platforms=["cpu"])
    img = np.random.default_rng(1).standard_normal(
        (2, IMG, IMG, 3), dtype=np.float32)
    want = np.asarray(fn(jnp.asarray(img)))
    for opts in (None, {}):
        predict = load_serving(data, compiler_options=opts)
        np.testing.assert_array_equal(np.asarray(predict(img)), want)
