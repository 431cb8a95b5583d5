"""DPT-hybrid tests: piece-level numerical goldens vs torch restatements of
the reference modules, full-model shape contract, and bridge key/shape
round-trip (SURVEY.md §7 flags DPT as the most port-risky module)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# Compile-heavy single-device tests (pipeline caches / DPT twins /
# interpret-mode kernels): their own suite chunk on slow rigs --
# `pytest -m heavy` (README Testing section).
pytestmark = pytest.mark.heavy

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


def test_upsample2x_two_tap_equals_matmul_form():
    """The closed-form two-tap x2 upsample (UPSAMPLE2X_TWO_TAP) computes
    the interp-matmul form's only-nonzero terms with bit-identical weights
    (checked exactly against _interp_matrix), so in f32 the two forms can
    differ only by the dot kernel's FMA rounding — pinned at a few f32
    ulps — and must match torch F.interpolate to the looser kernel-
    precision bound. Local rng: order-independent inputs."""
    from depth_image_captioning_pub_tpu.models import dpt

    rng = np.random.default_rng(42)
    for (h, w, c) in [(12, 12, 5), (7, 9, 3), (1, 4, 2), (24, 24, 8),
                      (96, 48, 1)]:
        # tap weights account for the full interp matrix, bit-exactly
        for n in (h, w):
            wep, wes, wos, won = dpt._two_tap_weights(n)
            mat = dpt._interp_matrix(n, 2 * n)
            rec = np.zeros_like(mat)
            idx = np.arange(n)
            rec[2 * idx, np.maximum(idx - 1, 0)] += wep
            rec[2 * idx, idx] += wes
            rec[2 * idx + 1, idx] += wos
            rec[2 * idx + 1, np.minimum(idx + 1, n - 1)] += won
            np.testing.assert_array_equal(rec, mat)

        x = rng.standard_normal((2, h, w, c)).astype(np.float32)
        two_tap = np.asarray(
            dpt._upsample2x_axis(dpt._upsample2x_axis(jnp.asarray(x), 1), 2))
        mh = jnp.asarray(dpt._interp_matrix(h, 2 * h))
        mw = jnp.asarray(dpt._interp_matrix(w, 2 * w))
        mat = jnp.einsum("oh,bhwc->bowc", mh, jnp.asarray(x))
        mat = np.asarray(jnp.einsum("pw,bowc->bopc", mw, mat))
        tol = dict(rtol=0, atol=4 * np.spacing(np.abs(mat).max()))
        np.testing.assert_allclose(two_tap, mat, **tol)

        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        expected = torch.nn.functional.interpolate(
            tx, scale_factor=2, mode="bilinear",
            align_corners=True).permute(0, 2, 3, 1).numpy()
        # torch evaluates the 2-D 4-tap blend in one pass and computes the
        # source positions at kernel precision (our weights follow the
        # f64-exact formula), so the bound is looser — same deviation the
        # matmul form has vs torch at these sizes
        np.testing.assert_allclose(two_tap, expected, rtol=0, atol=2e-5)


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


def test_vit_block_padding_exact(rng):
    """Zero-padding the token axis with n_valid masking must reproduce the
    unpadded forward exactly on the real tokens (pad keys get -inf scores
    -> zero softmax weight; per-token ops do not mix tokens)."""
    from depth_image_captioning_pub_tpu.models.dpt import ViTBlock
    blk = ViTBlock(dim=32, heads=4)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)
    base = blk.apply(variables, x)
    xp = jnp.pad(x, ((0, 0), (0, 6), (0, 0)))
    padded = blk.apply(variables, xp, n_valid=10)[:, :10]
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base),
                               atol=1e-6)


def test_fusion_out_conv_commutes_with_resize(rng):
    """The hoisted 1x1 out_conv (conv-then-resize) must equal the
    reference's resize-then-conv order: a 1x1 conv is pointwise affine and
    align-corners interpolation rows sum to 1, so the two orders are the
    same map in real arithmetic (reference order: blocks.py:329-341)."""
    from depth_image_captioning_pub_tpu.models import dpt as dpt_mod

    blk = dpt_mod.FeatureFusionBlock(features=16)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 16)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((2, 6, 6, 16)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x, skip)
    assert dpt_mod.OUT_CONV_BEFORE_RESIZE  # shipped default
    hoisted = blk.apply(variables, x, skip)
    try:
        dpt_mod.OUT_CONV_BEFORE_RESIZE = False
        reference_order = blk.apply(variables, x, skip)
    finally:
        dpt_mod.OUT_CONV_BEFORE_RESIZE = True
    np.testing.assert_allclose(np.asarray(hoisted),
                               np.asarray(reference_order),
                               atol=1e-5, rtol=1e-5)


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


def _make_tiny_sd(variables, seed=0):
    """Synthesize a torch-layout DPT state dict with random weights whose
    shapes mirror the tiny flax model's init tree (torch source names follow
    the reference checkpoint layout, DPT_model.py:32-41)."""
    rng = np.random.default_rng(seed)
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
    return sd


def test_dpt_bridge_shapes(tiny_dpt):
    """Synthesize a torch-layout state dict from flax shapes, bridge it, and
    require the result to tree-match init exactly."""
    from depth_image_captioning_pub_tpu.utils.torch_bridge import dpt_to_flax
    model, variables = tiny_dpt
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    sd = _make_tiny_sd(variables)

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


def _torch_twin_forward(sd, x_np, heads=4, blocks=3, hooks=(1, 2),
                        pretrain_grid=24, n_stages=3):
    """Torch restatement of the WHOLE reference DPT-hybrid forward
    (dpt_depth.py:67-99, vit.py:61-155, blocks.py:230-341), weights from a
    checkpoint-layout state dict: patch-embed backbone -> cls+pos (with
    bilinear grid resize) -> blocks with taps -> project readout ->
    reassembly convs -> scratch -> refinenets -> monocular head."""
    import torch.nn.functional as F

    t = lambda k: torch.from_numpy(sd[k])
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)

    def pad_same(x, k, s, value=0.0):
        ih, iw = x.shape[-2:]
        ph = max((-(-ih // s) - 1) * s + k - ih, 0)
        pw = max((-(-iw // s) - 1) * s + k - iw, 0)
        return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2),
                     value=value)

    def stdconv(x, key, s):
        w = t(key + ".weight")
        mean = w.mean(dim=[1, 2, 3], keepdim=True)
        var = w.var(dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-6)
        return F.conv2d(pad_same(x, w.shape[-1], s), w, stride=s)

    def gn(x, key, act=True):
        y = F.group_norm(x, 32, t(key + ".weight"), t(key + ".bias"),
                         eps=1e-5)
        return F.relu(y) if act else y

    pre = "pretrained.model."
    x = gn(stdconv(x, pre + "patch_embed.backbone.stem.conv", 2),
           pre + "patch_embed.backbone.stem.norm")
    x = F.max_pool2d(pad_same(x, 3, 2, value=float("-inf")), 3, stride=2)
    taps = []
    for si in range(n_stages):
        src = f"{pre}patch_embed.backbone.stages.{si}.blocks.0."
        stride = 2 if si > 0 else 1
        sc = gn(stdconv(x, src + "downsample.conv", stride),
                src + "downsample.norm", act=False)
        y = gn(stdconv(x, src + "conv1", 1), src + "norm1")
        y = gn(stdconv(y, src + "conv2", stride), src + "norm2")
        y = gn(stdconv(y, src + "conv3", 1), src + "norm3", act=False)
        x = F.relu(y + sc)
        taps.append(x)
    tap1, tap2, feat16 = taps

    tokens = F.conv2d(feat16, t(pre + "patch_embed.proj.weight"),
                      t(pre + "patch_embed.proj.bias"))
    B, C, gh, gw = tokens.shape
    tokens = tokens.flatten(2).transpose(1, 2)           # [B, N, C]
    cls = t(pre + "cls_token").expand(B, 1, C)
    pos = t(pre + "pos_embed")
    if (gh, gw) != (pretrain_grid, pretrain_grid):
        tok, grid = pos[:, :1], pos[:, 1:]
        grid = grid.reshape(1, pretrain_grid, pretrain_grid, C).permute(
            0, 3, 1, 2)
        grid = F.interpolate(grid, size=(gh, gw), mode="bilinear")
        grid = grid.flatten(2).transpose(1, 2)
        pos = torch.cat([tok, grid], dim=1)
    tokens = torch.cat([cls, tokens], dim=1) + pos

    def lnorm(h, key):
        return F.layer_norm(h, (C,), t(key + ".weight"), t(key + ".bias"),
                            eps=1e-6)

    tapmap = {}
    for i in range(blocks):
        src = f"{pre}blocks.{i}."
        h = lnorm(tokens, src + "norm1")
        N = h.shape[1]
        qkv = h @ t(src + "attn.qkv.weight").T + t(src + "attn.qkv.bias")
        q, k, v = qkv.reshape(B, N, 3, heads, C // heads).permute(
            2, 0, 3, 1, 4)
        attn = ((q @ k.transpose(-2, -1)) * (C // heads) ** -0.5).softmax(-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, C)
        tokens = tokens + (h @ t(src + "attn.proj.weight").T
                           + t(src + "attn.proj.bias"))
        h = lnorm(tokens, src + "norm2")
        h = F.gelu(h @ t(src + "mlp.fc1.weight").T + t(src + "mlp.fc1.bias"))
        tokens = tokens + (h @ t(src + "mlp.fc2.weight").T
                           + t(src + "mlp.fc2.bias"))
        if i == hooks[0]:
            tapmap[3] = tokens
        if i == hooks[1]:
            tapmap[4] = tokens

    def readout_map(tok, which):
        cls_t, patches = tok[:, :1], tok[:, 1:]
        rd = torch.cat([patches, cls_t.expand_as(patches)], dim=-1)
        w = t(f"pretrained.act_postprocess{which}.0.project.0.weight")
        b = t(f"pretrained.act_postprocess{which}.0.project.0.bias")
        y = F.gelu(rd @ w.T + b)
        return y.transpose(1, 2).reshape(B, C, gh, gw)

    l3 = F.conv2d(readout_map(tapmap[3], 3),
                  t("pretrained.act_postprocess3.3.weight"),
                  t("pretrained.act_postprocess3.3.bias"))
    l4 = F.conv2d(readout_map(tapmap[4], 4),
                  t("pretrained.act_postprocess4.3.weight"),
                  t("pretrained.act_postprocess4.3.bias"))
    l4 = F.conv2d(l4, t("pretrained.act_postprocess4.4.weight"),
                  t("pretrained.act_postprocess4.4.bias"), stride=2,
                  padding=1)

    rns = [F.conv2d(l, t(f"scratch.layer{i}_rn.weight"), padding=1)
           for i, l in ((1, tap1), (2, tap2), (3, l3), (4, l4))]

    def rcu(x, key):
        y = F.relu(x)
        y = F.conv2d(y, t(key + ".conv1.weight"), t(key + ".conv1.bias"),
                     padding=1)
        y = F.relu(y)
        y = F.conv2d(y, t(key + ".conv2.weight"), t(key + ".conv2.bias"),
                     padding=1)
        return y + x

    def fusion(i, x, skip=None):
        key = f"scratch.refinenet{i}"
        if skip is not None:
            x = x + rcu(skip, key + ".resConfUnit1")
        x = rcu(x, key + ".resConfUnit2")
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return F.conv2d(x, t(key + ".out_conv.weight"),
                        t(key + ".out_conv.bias"))

    p1 = fusion(1, fusion(2, fusion(3, fusion(4, rns[3]), rns[2]), rns[1]),
                rns[0])
    y = F.conv2d(p1, t("scratch.output_conv.0.weight"),
                 t("scratch.output_conv.0.bias"), padding=1)
    y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=True)
    y = F.conv2d(y, t("scratch.output_conv.2.weight"),
                 t("scratch.output_conv.2.bias"), padding=1)
    y = F.relu(y)
    y = F.conv2d(y, t("scratch.output_conv.4.weight"),
                 t("scratch.output_conv.4.bias"))
    return F.relu(y)[:, 0].numpy()


@pytest.mark.parametrize("hw", [(64, 64), (96, 96)])
def test_tiny_dpt_full_forward_matches_torch_twin(tiny_dpt, hw):
    """Full-model differential test (VERDICT r1 item 5): the entire tiny
    hybrid — patch-embed, pos-embed interpolation, blocks with taps,
    readout, reassembly, refinenet chaining, head — bridged via dpt_to_flax
    and compared against the torch twin forward. Catches wiring bugs
    (tap indices, readout order, fusion chaining) that the component
    goldens above cannot. The 96x96 case shrinks the pos-embed grid
    (24 -> 6), exercising _resize_pos_embed's antialias=False parity."""
    from depth_image_captioning_pub_tpu.utils.torch_bridge import dpt_to_flax
    model, variables = tiny_dpt
    sd = _make_tiny_sd(variables, seed=7)
    # Scale down: random-normal weights compound activation magnitude over
    # the conv chain; keep values in a float32-friendly range.
    sd = {k: (v * 0.25).astype(np.float32) for k, v in sd.items()}
    bridged = dpt_to_flax(sd, resnet_layers=(1, 1, 1), vit_blocks=3)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
    with torch.no_grad():
        expected = _torch_twin_forward(sd, x)
    got = np.asarray(model.apply(bridged, jnp.asarray(x)))
    assert got.shape == expected.shape == (2, *hw)
    scale = max(1.0, float(np.abs(expected).max()))
    np.testing.assert_allclose(got, expected, atol=1e-4 * scale, rtol=1e-4)


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

def test_make_depth_fn_applies_gelu_knob(monkeypatch, tmp_path):
    """cfg.dpt_gelu drives models.dpt.GELU_APPROXIMATE inside make_depth_fn:
    tanh maps differ from erf maps (same random weights), and a subsequent
    erf build restores the parity default."""
    from depth_image_captioning_pub_tpu import cli
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.models import dpt as dpt_mod

    monkeypatch.setenv("DCAP_TINY_DPT", "1")
    monkeypatch.chdir(tmp_path)  # no stray exp_result writes
    imgs = jnp.asarray(np.random.default_rng(0).random(
        (1, 64, 64, 3), dtype=np.float32))
    try:
        cfg = ConfigEval()
        cfg.dpt_gelu = "tanh"
        fn, variables = cli.make_depth_fn(cfg)
        assert dpt_mod.GELU_APPROXIMATE is True
        tanh_maps = np.asarray(fn(variables, imgs))

        cfg.dpt_gelu = "erf"
        fn2, variables2 = cli.make_depth_fn(cfg)
        assert dpt_mod.GELU_APPROXIMATE is False
        erf_maps = np.asarray(fn2(variables2, imgs))

        # same PRNGKey(0) random init both times -> only the GELU differs
        assert tanh_maps.shape == erf_maps.shape == (1, 224, 224, 1)
        assert np.isfinite(tanh_maps).all() and np.isfinite(erf_maps).all()
        assert not np.array_equal(tanh_maps, erf_maps)

        cfg.dpt_gelu = "bogus"
        with pytest.raises(ValueError):
            cli.make_depth_fn(cfg)
    finally:
        dpt_mod.GELU_APPROXIMATE = False


def test_head_lowres_knob():
    """HEAD_LOW_RES (--dpt-head lowres): same output shape and params, head
    convs run pre-upsample — a documented approximation, so the result must
    DIFFER from the default (falsifiable knob) while staying non-negative
    (the head's final relu) and using the identical variable set."""
    import numpy as np
    from depth_image_captioning_pub_tpu.models import dpt as dpt_mod
    from depth_image_captioning_pub_tpu.models.dpt import DPTDepthModel

    model = DPTDepthModel(vit_blocks=2, hooks=(0, 1), resnet_layers=(1, 1, 1),
                          vit_dim=64, vit_heads=4, features=32,
                          dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(variables, x)
    assert dpt_mod.HEAD_LOW_RES is False        # parity default
    dpt_mod.HEAD_LOW_RES = True
    try:
        # identical variable structure: the knob reorders ops, no reinit
        v2 = model.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v2) == \
            jax.tree_util.tree_structure(variables)
        low = model.apply(variables, x)
    finally:
        dpt_mod.HEAD_LOW_RES = False
    assert low.shape == full.shape
    assert np.all(np.asarray(low) >= 0)
    assert not np.allclose(np.asarray(low), np.asarray(full))


def test_head_lowres_cli_threading(tmp_path, monkeypatch):
    """--dpt-head reaches dpt.HEAD_LOW_RES through cli.make_depth_fn and
    rejects unknown values."""
    import pytest
    from depth_image_captioning_pub_tpu import cli
    from depth_image_captioning_pub_tpu.config import ConfigTrain
    from depth_image_captioning_pub_tpu.models import dpt as dpt_mod

    monkeypatch.setenv("DCAP_TINY_DPT", "1")
    cfg = ConfigTrain()
    cfg.dpt_head = "lowres"
    try:
        cli.make_depth_fn(cfg)
        assert dpt_mod.HEAD_LOW_RES is True
    finally:
        dpt_mod.HEAD_LOW_RES = False
    cfg.dpt_head = "sideways"
    with pytest.raises(ValueError):
        cli.make_depth_fn(cfg)
