"""DPT-hybrid tests: piece-level numerical goldens vs torch restatements of
the reference modules, full-model shape contract, and bridge key/shape
round-trip (SURVEY.md §7 flags DPT as the most port-risky module)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_resize_align_corners_matches_torch(rng):
    from depth_image_captioning_pub_tpu.models.dpt import resize_align_corners
    x = rng.standard_normal((2, 12, 12, 5)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = torch.nn.functional.interpolate(
        tx, scale_factor=2, mode="bilinear",
        align_corners=True).permute(0, 2, 3, 1).numpy()
    got = resize_align_corners(jnp.asarray(x), (24, 24))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_std_conv_matches_torch(rng):
    """Weight-standardized conv == timm StdConv2dSame restated in torch."""
    from depth_image_captioning_pub_tpu.models.dpt import StdConv
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    w = rng.standard_normal((7, 7, 3, 8)).astype(np.float32)
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))
    mean = tw.mean(dim=[1, 2, 3], keepdim=True)
    var = tw.var(dim=[1, 2, 3], keepdim=True, unbiased=False)
    tw_std = (tw - mean) / torch.sqrt(var + 1e-6)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    # timm StdConv2dSame pads TF-style: total = (ceil(in/s)-1)*s + k - in,
    # split low = total//2, high = total - low
    total = (-(-16 // 2) - 1) * 2 + 7 - 16
    lo, hi = total // 2, total - total // 2
    tx = torch.nn.functional.pad(tx, (lo, hi, lo, hi))
    expected = torch.nn.functional.conv2d(
        tx, tw_std, stride=2).permute(0, 2, 3, 1).numpy()
    mod = StdConv(8, (7, 7), (2, 2))
    out, _ = mod.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x),
                       mutable=[])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_vit_block_matches_torch(rng):
    from depth_image_captioning_pub_tpu.models.dpt import ViTBlock
    dim, heads, n, b = 32, 4, 10, 2
    x = rng.standard_normal((b, n, dim)).astype(np.float32)

    blk = ViTBlock(dim=dim, heads=heads)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    # torch restatement (timm ViT block: pre-LN attention + MLP)
    tx = torch.from_numpy(x)
    ln1 = torch.nn.LayerNorm(dim, eps=1e-6)
    ln1.weight.data = torch.from_numpy(np.asarray(p["norm1"]["scale"]))
    ln1.bias.data = torch.from_numpy(np.asarray(p["norm1"]["bias"]))
    qkv = torch.nn.Linear(dim, 3 * dim)
    qkv.weight.data = torch.from_numpy(np.asarray(p["qkv"]["kernel"]).T)
    qkv.bias.data = torch.from_numpy(np.asarray(p["qkv"]["bias"]))
    proj = torch.nn.Linear(dim, dim)
    proj.weight.data = torch.from_numpy(np.asarray(p["proj"]["kernel"]).T)
    proj.bias.data = torch.from_numpy(np.asarray(p["proj"]["bias"]))
    ln2 = torch.nn.LayerNorm(dim, eps=1e-6)
    ln2.weight.data = torch.from_numpy(np.asarray(p["norm2"]["scale"]))
    ln2.bias.data = torch.from_numpy(np.asarray(p["norm2"]["bias"]))
    fc1 = torch.nn.Linear(dim, 4 * dim)
    fc1.weight.data = torch.from_numpy(np.asarray(p["fc1"]["kernel"]).T)
    fc1.bias.data = torch.from_numpy(np.asarray(p["fc1"]["bias"]))
    fc2 = torch.nn.Linear(4 * dim, dim)
    fc2.weight.data = torch.from_numpy(np.asarray(p["fc2"]["kernel"]).T)
    fc2.bias.data = torch.from_numpy(np.asarray(p["fc2"]["bias"]))

    with torch.no_grad():
        h = ln1(tx)
        q, k, v = qkv(h).reshape(b, n, 3, heads, dim // heads).permute(
            2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(b, n, dim)
        tx2 = tx + proj(h)
        h = fc2(torch.nn.functional.gelu(fc1(ln2(tx2))))
        expected = (tx2 + h).numpy()

    got = blk.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_dpt():
    from depth_image_captioning_pub_tpu.models.dpt import DPTDepthModel
    model = DPTDepthModel(vit_blocks=3, hooks=(1, 2),
                          resnet_layers=(1, 1, 1), vit_dim=64, vit_heads=4,
                          features=32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_dpt_forward_shape(tiny_dpt):
    model, variables = tiny_dpt
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 64, 64)
    assert np.all(np.asarray(out) >= 0.0)  # non_negative head


def test_dpt_pos_embed_resize(tiny_dpt):
    """Non-384 input exercises _resize_pos_embed (vit.py:102-116)."""
    model, variables = tiny_dpt
    out = model.apply(variables, jnp.zeros((1, 96, 96, 3)))
    assert out.shape == (1, 96, 96)


def test_dpt_bridge_shapes(tiny_dpt):
    """Synthesize a torch-layout state dict from flax shapes, bridge it, and
    require the result to tree-match init exactly."""
    from depth_image_captioning_pub_tpu.utils.torch_bridge import dpt_to_flax
    model, variables = tiny_dpt
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])

    rng = np.random.default_rng(0)
    sd = {}

    def put_lin(name, kernel_shape):
        sd[name + ".weight"] = rng.standard_normal(
            kernel_shape[::-1]).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(
            (kernel_shape[1],)).astype(np.float32)

    def put_conv(name, k, bias=True):
        sd[name + ".weight"] = rng.standard_normal(
            (k[3], k[2], k[0], k[1])).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.standard_normal((k[3],)).astype(np.float32)

    p = variables["params"]
    pre = "pretrained.model."
    put_conv(pre + "patch_embed.backbone.stem.conv",
             p["resnet"]["stem_conv"]["kernel"].shape, bias=False)
    sd[pre + "patch_embed.backbone.stem.norm.weight"] = rng.standard_normal(
        p["resnet"]["stem_norm"]["gn"]["scale"].shape).astype(np.float32)
    sd[pre + "patch_embed.backbone.stem.norm.bias"] = rng.standard_normal(
        p["resnet"]["stem_norm"]["gn"]["bias"].shape).astype(np.float32)
    for si in range(3):
        blk = p["resnet"][f"stage{si}_0"]
        src = f"{pre}patch_embed.backbone.stages.{si}.blocks.0."
        for ci in (1, 2, 3):
            put_conv(src + f"conv{ci}", blk[f"conv{ci}"]["kernel"].shape,
                     bias=False)
            for nm, arr in blk[f"norm{ci}"]["gn"].items():
                key = "weight" if nm == "scale" else "bias"
                sd[src + f"norm{ci}.{key}"] = rng.standard_normal(
                    arr.shape).astype(np.float32)
        put_conv(src + "downsample.conv", blk["ds_conv"]["kernel"].shape,
                 bias=False)
        for nm, arr in blk["ds_norm"]["gn"].items():
            key = "weight" if nm == "scale" else "bias"
            sd[src + f"downsample.norm.{key}"] = rng.standard_normal(
                arr.shape).astype(np.float32)
    put_conv(pre + "patch_embed.proj", p["patch_proj"]["kernel"].shape)
    sd[pre + "cls_token"] = rng.standard_normal(
        p["cls_token"].shape).astype(np.float32)
    sd[pre + "pos_embed"] = rng.standard_normal(
        p["pos_embed"].shape).astype(np.float32)
    for i in range(3):
        bp = p[f"block{i}"]
        src = f"{pre}blocks.{i}."
        for ln_name in ("norm1", "norm2"):
            sd[src + ln_name + ".weight"] = rng.standard_normal(
                bp[ln_name]["scale"].shape).astype(np.float32)
            sd[src + ln_name + ".bias"] = rng.standard_normal(
                bp[ln_name]["bias"].shape).astype(np.float32)
        put_lin(src + "attn.qkv", bp["qkv"]["kernel"].shape)
        put_lin(src + "attn.proj", bp["proj"]["kernel"].shape)
        put_lin(src + "mlp.fc1", bp["fc1"]["kernel"].shape)
        put_lin(src + "mlp.fc2", bp["fc2"]["kernel"].shape)
    put_lin("pretrained.act_postprocess3.0.project.0",
            p["pp3_readout"]["project"]["kernel"].shape)
    put_conv("pretrained.act_postprocess3.3", p["pp3_conv"]["kernel"].shape)
    put_lin("pretrained.act_postprocess4.0.project.0",
            p["pp4_readout"]["project"]["kernel"].shape)
    put_conv("pretrained.act_postprocess4.3", p["pp4_conv"]["kernel"].shape)
    put_conv("pretrained.act_postprocess4.4", p["pp4_down"]["kernel"].shape)
    for i in range(1, 5):
        put_conv(f"scratch.layer{i}_rn", p[f"layer{i}_rn"]["kernel"].shape,
                 bias=False)
        rf = p[f"refinenet{i}"]
        put_conv(f"scratch.refinenet{i}.out_conv",
                 rf["out_conv"]["kernel"].shape)
        for res in ("res1", "res2"):
            trc = "resConfUnit1" if res == "res1" else "resConfUnit2"
            if res not in rf:   # refinenet4 has no res1 at init
                put_conv(f"scratch.refinenet{i}.{trc}.conv1",
                         rf["res2"]["conv1"]["kernel"].shape)
                put_conv(f"scratch.refinenet{i}.{trc}.conv2",
                         rf["res2"]["conv2"]["kernel"].shape)
                continue
            put_conv(f"scratch.refinenet{i}.{trc}.conv1",
                     rf[res]["conv1"]["kernel"].shape)
            put_conv(f"scratch.refinenet{i}.{trc}.conv2",
                     rf[res]["conv2"]["kernel"].shape)
    put_conv("scratch.output_conv.0", p["head_conv1"]["kernel"].shape)
    put_conv("scratch.output_conv.2", p["head_conv2"]["kernel"].shape)
    put_conv("scratch.output_conv.4", p["head_conv3"]["kernel"].shape)

    bridged = dpt_to_flax(sd, resnet_layers=(1, 1, 1), vit_blocks=3)["params"]

    # every init param must exist in the bridged tree with matching shape
    bridged_flat = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_leaves_with_path(bridged)}
    for k, v in flat:
        ks = jax.tree_util.keystr(k)
        assert ks in bridged_flat, f"missing {ks}"
        assert bridged_flat[ks] == v.shape, ks

    # and the model must run with the bridged params
    model.apply({"params": bridged}, jnp.zeros((1, 64, 64, 3)))


def test_depth_estimator_pipeline(tiny_dpt):
    """Full provider chain: [0,1] 224 image -> standardized 224 depth map."""
    from depth_image_captioning_pub_tpu.models.dpt import DPTDepthEstimator
    from depth_image_captioning_pub_tpu.models.dpt import DPTDepthModel
    est = DPTDepthEstimator()
    est.model = DPTDepthModel(vit_blocks=3, hooks=(1, 2),
                              resnet_layers=(1, 1, 1), vit_dim=64,
                              vit_heads=4, features=32)
    est.image_size = 64
    variables = est.model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    fn = jax.jit(est.depth_fn())
    out = fn(variables, jnp.asarray(np.random.default_rng(0).random(
        (2, 224, 224, 3), dtype=np.float32)))
    assert out.shape == (2, 224, 224, 1)
    vals = np.asarray(out)
    assert vals.min() >= 0.0 and vals.max() <= 1.0 + 1e-6