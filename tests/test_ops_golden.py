"""Numerical-parity golden tests of ops/ against PyTorch CPU.

The reference offers no tests (SURVEY.md §4); instead we verify our functional
primitives produce the same numbers as the torch modules the reference is
built from: nn.LSTMCell / nn.LSTM, AdaptiveAvgPool2d / MaxPool2d, and the
Soft_Attention forward math (reference: attention.py:81-95).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_lstm_cell_matches_torch(rng):
    from depth_image_captioning_pub_tpu.ops.lstm import LSTMCellParams, lstm_cell
    d_in, d_h, b = 12, 8, 4
    cell = torch.nn.LSTMCell(d_in, d_h)
    x = rng.standard_normal((b, d_in)).astype(np.float32)
    h = rng.standard_normal((b, d_h)).astype(np.float32)
    c = rng.standard_normal((b, d_h)).astype(np.float32)
    with torch.no_grad():
        th, tc = cell(torch.from_numpy(x),
                      (torch.from_numpy(h), torch.from_numpy(c)))
    p = LSTMCellParams(
        jnp.asarray(cell.weight_ih.detach().numpy().T),
        jnp.asarray(cell.weight_hh.detach().numpy().T),
        jnp.asarray(cell.bias_ih.detach().numpy()),
        jnp.asarray(cell.bias_hh.detach().numpy()))
    jh, jc = lstm_cell(p, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=1e-5)


def test_stacked_lstm_matches_torch(rng):
    from depth_image_captioning_pub_tpu.ops.lstm import (
        LSTMCellParams, StackedLSTMParams, stacked_lstm)
    d_in, d_h, layers, b, t = 10, 6, 2, 3, 5
    lstm = torch.nn.LSTM(d_in, d_h, layers, batch_first=True)
    xs = rng.standard_normal((b, t, d_in)).astype(np.float32)
    with torch.no_grad():
        touts, (thn, tcn) = lstm(torch.from_numpy(xs))
    params = []
    for li in range(layers):
        params.append(LSTMCellParams(
            jnp.asarray(getattr(lstm, f"weight_ih_l{li}").detach().numpy().T),
            jnp.asarray(getattr(lstm, f"weight_hh_l{li}").detach().numpy().T),
            jnp.asarray(getattr(lstm, f"bias_ih_l{li}").detach().numpy()),
            jnp.asarray(getattr(lstm, f"bias_hh_l{li}").detach().numpy())))
    p = StackedLSTMParams(tuple(params))
    h0 = jnp.zeros((layers, b, d_h))
    outs, hn, cn = stacked_lstm(p, jnp.asarray(xs), h0, h0)
    np.testing.assert_allclose(np.asarray(outs), touts.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), thn.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), tcn.numpy(), atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [(7, 14), (7, 7), (22, 7), (73, 24)])
def test_adaptive_avg_pool_matches_torch(rng, in_size, out_size):
    from depth_image_captioning_pub_tpu.ops.pooling import adaptive_avg_pool2d
    x = rng.standard_normal((2, in_size, in_size, 3)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ty = torch.nn.AdaptiveAvgPool2d(out_size)(tx).permute(0, 2, 3, 1)
    jy = adaptive_avg_pool2d(jnp.asarray(x), out_size)
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-5)


@pytest.mark.parametrize("size,window,stride,pad", [(73, 3, 3, 0), (22, 3, 3, 0),
                                                    (112, 3, 2, 1)])
def test_max_pool_matches_torch(rng, size, window, stride, pad):
    from depth_image_captioning_pub_tpu.ops.pooling import max_pool2d
    x = rng.standard_normal((2, size, size, 4)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ty = torch.nn.MaxPool2d(window, stride=stride, padding=pad)(tx)
    jy = max_pool2d(jnp.asarray(x), window, stride, pad)
    np.testing.assert_allclose(np.asarray(jy),
                               ty.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_soft_attention_matches_reference_math(rng):
    """Against a torch re-statement of Soft_Attention.forward
    (reference: attention.py:81-95)."""
    from depth_image_captioning_pub_tpu.ops.attention import (
        AttentionParams, project_features, soft_attention)
    b, k, d, h_dim, a = 3, 196, 32, 16, 8
    feats = rng.standard_normal((b, k, d)).astype(np.float32)
    hid = rng.standard_normal((b, h_dim)).astype(np.float32)
    enc = torch.nn.Linear(d, a)
    dec = torch.nn.Linear(h_dim, a)
    full = torch.nn.Linear(a, 1)
    with torch.no_grad():
        att1 = enc(torch.from_numpy(feats))
        att2 = dec(torch.from_numpy(hid))
        att = full(torch.relu(att1 + att2.unsqueeze(1))).squeeze(2)
        alpha_t = att.softmax(dim=1)
        ctx_t = (torch.from_numpy(feats) * alpha_t.unsqueeze(2)).sum(dim=1)
    p = AttentionParams(
        jnp.asarray(enc.weight.detach().numpy().T),
        jnp.asarray(enc.bias.detach().numpy()),
        jnp.asarray(dec.weight.detach().numpy().T),
        jnp.asarray(dec.bias.detach().numpy()),
        jnp.asarray(full.weight.detach().numpy()[0]),
        jnp.asarray(full.bias.detach().numpy()[0]))
    fp = project_features(p, jnp.asarray(feats))
    ctx, alpha = soft_attention(p, jnp.asarray(feats), fp, jnp.asarray(hid))
    np.testing.assert_allclose(np.asarray(alpha), alpha_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx), ctx_t.numpy(), atol=1e-5)


def test_gumbel_max_attention_is_onehot_gather(rng):
    from depth_image_captioning_pub_tpu.ops.attention import (
        AttentionParams, gumbel_max_attention, project_features)
    b, k, d, h_dim, a = 4, 9, 6, 5, 7
    feats = jnp.asarray(rng.standard_normal((b, k, d)).astype(np.float32))
    hid = jnp.asarray(rng.standard_normal((b, h_dim)).astype(np.float32))
    p = AttentionParams(
        jnp.asarray(rng.standard_normal((d, a)).astype(np.float32)),
        jnp.zeros((a,)),
        jnp.asarray(rng.standard_normal((h_dim, a)).astype(np.float32)),
        jnp.zeros((a,)),
        jnp.asarray(rng.standard_normal((a,)).astype(np.float32)),
        jnp.float32(0.0))
    fp = project_features(p, feats)
    ctx, alpha = gumbel_max_attention(p, feats, fp, hid, jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(alpha.sum(axis=1)), 1.0)
    pos = np.asarray(alpha.argmax(axis=1))
    np.testing.assert_allclose(np.asarray(ctx),
                               np.asarray(feats)[np.arange(b), pos], atol=1e-6)


def test_standardize_depth_map_matches_torch(rng):
    from depth_image_captioning_pub_tpu.ops.image_ops import standardize_depth_map
    x = rng.standard_normal((3, 8, 8, 1)).astype(np.float32)
    x[0, 0, 0, 0] = np.nan
    # torch re-statement of DPT_model.py:43-61
    tx = torch.nan_to_num(torch.from_numpy(x).permute(0, 3, 1, 2), nan=0.5)
    flat = tx.flatten(2, 3)
    maxs = flat.max(dim=2).values.reshape(3, 1, 1, 1)
    mins = flat.min(dim=2).values.reshape(3, 1, 1, 1)
    expected = ((tx - mins) / (maxs - mins)).permute(0, 2, 3, 1).numpy()
    got = standardize_depth_map(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_img_to_patch_matches_torch_unfold(rng):
    from depth_image_captioning_pub_tpu.models.depth_encoders import img_to_patch
    x = rng.standard_normal((2, 224, 224, 1)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        unf = torch.nn.Unfold(kernel_size=(16, 16), stride=16)(tx)
        expected = unf.permute(0, 2, 1).numpy()   # [B, 196, 256]
    got = img_to_patch(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_resize_bilinear_matches_torch(rng):
    """jax.image.resize 'bilinear' == torch F.interpolate align_corners=False
    — the depth path's 224->384->224 resizes (ops/image_ops.resize_bilinear)."""
    from depth_image_captioning_pub_tpu.ops.image_ops import resize_bilinear
    x = rng.standard_normal((2, 14, 14, 3)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = torch.nn.functional.interpolate(
        tx, size=(24, 24), mode="bilinear",
        align_corners=False).permute(0, 2, 3, 1).numpy()
    got = resize_bilinear(jnp.asarray(x), (24, 24))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_resize_bilinear_downscale_matches_torch(rng):
    """DOWNSCALE parity (384->224 depth resize, depth_train.py:190): torch
    F.interpolate never antialiases; jax.image.resize defaults antialias=True
    — this test pins the antialias=False choice (they differ by ~0.1 rms on
    this input if antialias is left on)."""
    from depth_image_captioning_pub_tpu.ops.image_ops import resize_bilinear
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = torch.nn.functional.interpolate(
        tx, size=(14, 14), mode="bilinear",
        align_corners=False).permute(0, 2, 3, 1).numpy()
    got = resize_bilinear(jnp.asarray(x), (14, 14))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_normalizations_match_torchvision_math(rng):
    from depth_image_captioning_pub_tpu.ops.image_ops import (
        IMAGENET_MEAN, IMAGENET_STD, dpt_normalize, imagenet_normalize,
        to_unit_float)
    u8 = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    x01 = u8.astype(np.float32) / 255.0
    # to_unit_float(u8) == ToTensor's /255
    np.testing.assert_allclose(
        np.asarray(to_unit_float(jnp.asarray(u8))), x01, atol=1e-7)
    # imagenet_normalize == T.Normalize(mean, std)
    expected = (x01 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(
        np.asarray(imagenet_normalize(jnp.asarray(x01))), expected,
        atol=1e-5)
    # dpt_normalize == T.Normalize(0.5, 0.5)
    np.testing.assert_allclose(
        np.asarray(dpt_normalize(jnp.asarray(x01))), (x01 - 0.5) / 0.5,
        atol=1e-6)
