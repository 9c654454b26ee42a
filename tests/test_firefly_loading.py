"""Firefly codec checkpoint loading: reference torch weight names -> our
pytrees, validated by inverting an initialized pytree into a reference-
named safetensors file and loading it back.

Name layout cross-checked against the reference's VarBuilder paths
(codec/convnext.rs:192-315, codec/quantizer.rs:33-88,
codec/hifi_gan.rs:30-184, codec/utils/mod.rs:28-39)."""

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import save_file

from fish_speech_tpu.io.checkpoint import load_firefly_params
from fish_speech_tpu.models.codec.firefly import FireflyCodec, init_firefly_params
from tests.test_server import CODEC_CFG, NUM_CODEBOOKS


def firefly_params_to_state_dict(params, cfg, fish_infix="conv."):
    """Inverse of load_firefly_params. Fish 1.4+ wraps every Fish conv in a
    `conv.` prefix; Fish 1.2 uses bare names (reference:
    codec/utils/mod.rs:28-39) — pass fish_infix="" for 1.2 naming."""
    sd = {}

    def a(x):
        return np.ascontiguousarray(np.asarray(x, np.float32))

    def put_conv(name, p, fish=True):
        pre = f"{name}.{fish_infix}".rstrip(".") if fish else name
        sd[f"{pre}.weight"] = a(p["w"])
        sd[f"{pre}.bias"] = a(p["b"])

    def put_norm(name, p):
        sd[f"{name}.weight"] = a(p["w"])
        sd[f"{name}.bias"] = a(p["b"])

    def put_linear(name, p):
        sd[f"{name}.weight"] = np.ascontiguousarray(a(p["w"]).T)
        if "b" in p:
            sd[f"{name}.bias"] = a(p["b"])

    def put_block(name, blk):
        put_conv(f"{name}.dwconv", blk["dwconv"])
        put_norm(f"{name}.norm", blk["norm"])
        put_linear(f"{name}.pwconv1", blk["pwconv1"])
        put_linear(f"{name}.pwconv2", blk["pwconv2"])
        if "gamma" in blk:
            sd[f"{name}.gamma"] = a(blk["gamma"])

    bb = params["backbone"]
    put_conv("backbone.downsample_layers.0.0", bb["stem"]["conv"])
    put_norm("backbone.downsample_layers.0.1", bb["stem"]["norm"])
    for j, blk in enumerate(bb["stem"]["blocks"]):
        put_block(f"backbone.stages.0.{j}", blk)
    for i, mid in enumerate(bb["mid"], start=1):
        put_norm(f"backbone.downsample_layers.{i}.0", mid["norm"])
        put_conv(f"backbone.downsample_layers.{i}.1", mid["conv"], fish=False)
        for j, blk in enumerate(mid["blocks"]):
            put_block(f"backbone.stages.{i}.{j}", blk)
    put_norm("backbone.norm", bb["final_norm"])

    q = params["quantizer"]
    for kind in ("downsample", "upsample"):
        for i, st in enumerate(q[kind]):
            put_conv(f"quantizer.{kind}.{i}.0", st["conv"])
            put_block(f"quantizer.{kind}.{i}.1", st["block"])
    for g, rvq in enumerate(q["rvqs"]):
        put_linear(f"quantizer.residual_fsq.rvqs.{g}.project_in", rvq["project_in"])
        put_linear(f"quantizer.residual_fsq.rvqs.{g}.project_out", rvq["project_out"])

    h = params["head"]
    put_conv("head.conv_pre", h["conv_pre"])
    for i, up in enumerate(h["ups"]):
        put_conv(f"head.ups.{i}", up)
    for i, stage in enumerate(h["resblocks"]):
        for j, rb in enumerate(stage):
            for t, c in enumerate(rb["convs1"]):
                put_conv(f"head.resblocks.{i}.blocks.{j}.convs1.{t}", c)
            for t, c in enumerate(rb["convs2"]):
                put_conv(f"head.resblocks.{i}.blocks.{j}.convs2.{t}", c)
    put_conv("head.conv_post", h["conv_post"])
    return sd


def test_firefly_safetensors_roundtrip(tmp_path):
    orig = init_firefly_params(jax.random.PRNGKey(7), CODEC_CFG)
    sd = firefly_params_to_state_dict(orig, CODEC_CFG)
    path = tmp_path / "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors"
    save_file(sd, str(path))

    loaded = load_firefly_params(tmp_path, CODEC_CFG, dtype=np.float32)

    flat_o, _ = jax.tree_util.tree_flatten_with_path(orig)
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    flat_l = {jax.tree_util.keystr(k): v for k, v in flat_l.items()}
    assert len(flat_o) == len(flat_l)
    for k, v in flat_o:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_l[key]), np.asarray(v), rtol=1e-6, err_msg=key
        )

    # and the loaded tree actually decodes
    codec = FireflyCodec(loaded, CODEC_CFG, buckets=(8,))
    codes = np.random.default_rng(0).integers(
        0, 999, size=(NUM_CODEBOOKS, 6)
    ).astype(np.int32)
    ref = FireflyCodec(orig, CODEC_CFG, buckets=(8,)).decode(codes)
    got = codec.decode(codes)
    np.testing.assert_allclose(got, ref, atol=1e-6)
