"""Numeric bridge tests: torch modules shaped exactly like the reference's
(torchvision ResNet naming, Depth_CNN_endoder / Depth_MLP_endoder naming)
are bridged through utils/torch_bridge and must produce the same outputs as
our flax modules — the encoder-side half of checkpoint parity (the decoder
half lives in test_token_parity.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

TINY = (1, 1, 1, 1)


class TorchBottleneck(nn.Module):
    """torchvision-v1.5-shaped bottleneck with torchvision param names."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = self.downsample(x) if self.downsample is not None else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        return torch.relu(self.bn3(self.conv3(y)) + idt)


class TorchTinyResNet(nn.Module):
    """1-block-per-stage ResNet with torchvision's state-dict names."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for si, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if si == 0 else 2
            setattr(self, f"layer{si + 1}",
                    nn.Sequential(TorchBottleneck(cin, planes, stride)))
            cin = planes * 4

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        return x


def _randomize_bn_stats(module, rng):
    """Default BN stats (0 mean / 1 var) would hide transpose bugs."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data = torch.from_numpy(
                rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.3)
            m.running_var.data = torch.from_numpy(
                (rng.random(m.running_var.shape).astype(np.float32) + 0.5))


def test_resnet_bridge_output_matches(rng):
    from depth_image_captioning_pub_tpu.models.resnet import ResNetBackbone
    from depth_image_captioning_pub_tpu.utils.torch_bridge import resnet_to_flax
    torch.manual_seed(0)
    tnet = TorchTinyResNet().eval()
    _randomize_bn_stats(tnet, rng)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, resnet_to_flax(sd, layers=TINY))
    jnet = ResNetBackbone(layers=TINY, dtype=jnp.float32)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = tnet(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    got = jnet.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


def test_attention_encoder_bridge_with_sequential_names(rng):
    """The reference saves its encoder as Sequential-wrapped names
    (backbone.0.*, backbone.4.0.*; base_caption_models.py:29-30)."""
    from depth_image_captioning_pub_tpu.models.resnet import AttentionGridEncoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import encoder_to_flax
    torch.manual_seed(1)
    tnet = TorchTinyResNet().eval()
    _randomize_bn_stats(tnet, rng)
    seq_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}
    sd = {}
    for k, v in tnet.state_dict().items():
        head, _, rest = k.partition(".")
        sd[f"backbone.{seq_map[head]}.{rest}"] = v.detach().numpy()
    variables = jax.tree_util.tree_map(
        jnp.asarray, encoder_to_flax(sd, layers=TINY))
    jenc = AttentionGridEncoder(layers=TINY, dtype=jnp.float32)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        fm = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
        pooled = nn.AdaptiveAvgPool2d(14)(fm)
        expected = pooled.permute(0, 2, 3, 1).flatten(1, 2).numpy()
    got = jenc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


def test_depth_cnn_bridge_output_matches(rng):
    """Depth_CNN_endoder-shaped torch module -> DepthCNNEncoder
    (reference: depth_models.py:12-56)."""
    from depth_image_captioning_pub_tpu.models.depth_encoders import DepthCNNEncoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import depth_cnn_to_flax

    class TorchDepthCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 128, 7, stride=3)
            self.bn1 = nn.BatchNorm2d(128)
            self.conv2 = nn.Conv2d(128, 512, 3)
            self.bn2 = nn.BatchNorm2d(512)
            self.conv3 = nn.Conv2d(512, 2048, 1)
            self.bn3 = nn.BatchNorm2d(2048)

        def forward(self, x):
            mp = nn.MaxPool2d((3, 3))
            x = mp(torch.relu(self.bn1(self.conv1(x))))
            x = mp(torch.relu(self.bn2(self.conv2(x))))
            x = torch.relu(self.bn3(self.conv3(x)))
            x = nn.AdaptiveAvgPool2d(14)(x)
            return x.permute(0, 2, 3, 1).flatten(1, 2)

    torch.manual_seed(2)
    tnet = TorchDepthCNN().eval()
    _randomize_bn_stats(tnet, rng)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    bundle = jax.tree_util.tree_map(jnp.asarray, depth_cnn_to_flax(sd))
    jnet = DepthCNNEncoder(dtype=jnp.float32)
    x = rng.standard_normal((1, 224, 224, 1)).astype(np.float32)
    with torch.no_grad():
        expected = tnet(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = jnet.apply({"params": bundle["params"],
                      "batch_stats": bundle["batch_stats"]},
                     jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expected, atol=3e-3)


def test_depth_mlp_bridge_output_matches(rng):
    """Depth_MLP_endoder-shaped torch module -> DepthMLPEncoder + unfold
    (reference: depth_models.py:58-91)."""
    from depth_image_captioning_pub_tpu.models.depth_encoders import (
        DepthMLPEncoder, img_to_patch)
    from depth_image_captioning_pub_tpu.utils.torch_bridge import depth_mlp_to_flax

    torch.manual_seed(3)
    l1, l2, l3 = nn.Linear(256, 128), nn.Linear(128, 64), nn.Linear(64, 32)
    sd = {}
    for name, mod in (("l1", l1), ("l2", l2), ("l3", l3)):
        sd[f"{name}.weight"] = mod.weight.detach().numpy()
        sd[f"{name}.bias"] = mod.bias.detach().numpy()
    params = jax.tree_util.tree_map(jnp.asarray, depth_mlp_to_flax(sd))
    jnet = DepthMLPEncoder(dtype=jnp.float32)
    x = rng.standard_normal((2, 224, 224, 1)).astype(np.float32)
    with torch.no_grad():
        unf = nn.Unfold((16, 16), stride=16)(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 1)
        expected = torch.relu(l3(torch.relu(l2(torch.relu(l1(unf)))))).numpy()
    got = jnet.apply({"params": params}, img_to_patch(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
