"""Greedy token-ID parity vs a torch restatement of the reference decoder.

The driver criterion demands captions whose token IDs match the PyTorch
checkpoints (BASELINE.json). Real reference checkpoints don't exist in this
environment, so we do the next-strongest thing: restate the reference's
soft-attention decoder semantics in torch (same module graph as
base_caption_models.py:49-250), bridge its randomly-initialized state dict
through utils/torch_bridge, and require our lax.scan decoder to produce
IDENTICAL greedy token IDs and matching teacher-forcing logits in float32.

Also covers the NIC decoder (nic.py:61-175) the same way.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

VOCAB, D_ATT, D_EMB, D_ENC, D_HID, K = 50, 16, 12, 24, 20, 196


class TorchSoftDecoder(nn.Module):
    """Reference-semantics soft-attention decoder (greedy batch path).

    ``d_enc`` defaults to D_ENC; the MD_* concat-fusion twin passes the
    concatenated channel dim (reference mlp_dim_encoder, config.py:19)."""

    def __init__(self, d_enc=D_ENC):
        super().__init__()
        class Att(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder_att = nn.Linear(d_enc, D_ATT)
                self.decoder_att = nn.Linear(D_HID, D_ATT)
                self.full_att = nn.Linear(D_ATT, 1)

            def forward(self, feats, h):
                a = self.full_att(torch.relu(
                    self.encoder_att(feats)
                    + self.decoder_att(h).unsqueeze(1))).squeeze(2)
                alpha = a.softmax(dim=1)
                return (feats * alpha.unsqueeze(2)).sum(dim=1), alpha

        self.attention = Att()
        self.embed = nn.Embedding(VOCAB, D_EMB)
        self.decode_step = nn.LSTMCell(D_EMB + d_enc, D_HID)
        self.init_linear = nn.Linear(d_enc, D_HID * 2)
        self.f_beta = nn.Linear(D_HID, d_enc)
        self.linear = nn.Linear(D_HID, VOCAB)

    @torch.no_grad()
    def batch_sample(self, feats, start_id, max_length=30):
        h, c = self.init_linear(feats.mean(dim=1)).chunk(2, dim=1)
        prev = torch.full((feats.shape[0],), start_id, dtype=torch.long)
        out = []
        for _ in range(max_length):
            ctx, _ = self.attention(feats, h)
            gate = torch.sigmoid(self.f_beta(h))
            x = torch.cat([self.embed(prev), gate * ctx], dim=1)
            h, c = self.decode_step(x, (h, c))
            prev = self.linear(h).softmax(dim=1).argmax(dim=1)
            out.append(prev.numpy().copy())
        return np.stack(out, axis=1)

    @torch.no_grad()
    def teacher_forcing(self, feats, captions):
        h, c = self.init_linear(feats.mean(dim=1)).chunk(2, dim=1)
        emb = self.embed(captions)
        logits = []
        alphas = []
        for t in range(captions.shape[1] - 1):
            ctx, alpha = self.attention(feats, h)
            gate = torch.sigmoid(self.f_beta(h))
            x = torch.cat([emb[:, t], gate * ctx], dim=1)
            h, c = self.decode_step(x, (h, c))
            logits.append(self.linear(h))
            alphas.append(alpha)
        return torch.stack(logits, 1).numpy(), torch.stack(alphas, 1).numpy()


def _state_dict_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def bridged():
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        attention_decoder_to_flax)
    torch.manual_seed(0)
    tdec = TorchSoftDecoder().eval()
    params = attention_decoder_to_flax(_state_dict_np(tdec))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    jdec = AttentionDecoder(vocab_size=VOCAB, dim_attention=D_ATT,
                            dim_embedding=D_EMB, dim_encoder=D_ENC,
                            dim_decoder=D_HID, attention_kind="soft",
                            dtype=jnp.float32)
    return tdec, jdec, params


def test_greedy_token_ids_match(bridged):
    tdec, jdec, params = bridged
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((6, K, D_ENC)).astype(np.float32)
    expected = tdec.batch_sample(torch.from_numpy(feats), start_id=3)
    got, _ = jdec.apply({"params": params}, jnp.asarray(feats), 3,
                        max_length=30,
                        method=jdec.greedy_sample)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_teacher_forcing_logits_and_alphas_match(bridged):
    tdec, jdec, params = bridged
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((4, K, D_ENC)).astype(np.float32)
    caps = rng.integers(0, VOCAB, (4, 9)).astype(np.int64)
    exp_logits, exp_alphas = tdec.teacher_forcing(torch.from_numpy(feats),
                                                  torch.from_numpy(caps))
    logits, alphas = jdec.apply({"params": params}, jnp.asarray(feats),
                                jnp.asarray(caps.astype(np.int32)),
                                train=False, rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(logits), exp_logits, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alphas), exp_alphas, atol=2e-5)


def test_train_loss_and_gradients_match_torch_twin(bridged):
    """The COMPLETE training objective — teacher-forced forward + masked CE
    (the reference's pack_padded semantics) + the 0.7 doubly-stochastic
    penalty — and its PARAMETER GRADIENTS match the torch twin under
    autograd, on the same bridged weights and batch. Token parity pins the
    inference forward and test_train_smoke pins the CE function alone;
    this pins the composed training math at the gradient level
    (reference: base_train.py:134-167). Torch gradients are mapped to
    flax shapes through the same bridge as the weights (pure per-tensor
    transposes, so it is also the correct gradient map)."""
    import torch.nn.functional as F
    from depth_image_captioning_pub_tpu.engine.losses import caption_loss
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        attention_decoder_to_flax)

    tdec, jdec, params = bridged
    rng = np.random.default_rng(11)
    B, L = 5, 9
    feats_np = rng.standard_normal((B, K, D_ENC)).astype(np.float32)
    caps_np = rng.integers(1, VOCAB, (B, L)).astype(np.int64)
    caps_np[:, 0] = 3                                  # <start> column
    lengths_np = np.array([9, 7, 5, 4, 2], np.int32)   # incl. min length 2

    # ---- torch: grad-enabled restatement of the reference train forward
    tdec.zero_grad()
    feats_t = torch.from_numpy(feats_np)
    caps_t = torch.from_numpy(caps_np)
    h, c = tdec.init_linear(feats_t.mean(dim=1)).chunk(2, dim=1)
    emb = tdec.embed(caps_t)
    logits, alphas = [], []
    for t in range(L - 1):
        ctx, alpha = tdec.attention(feats_t, h)
        gate = torch.sigmoid(tdec.f_beta(h))
        x = torch.cat([emb[:, t], gate * ctx], dim=1)
        h, c = tdec.decode_step(x, (h, c))
        logits.append(tdec.linear(h))
        alphas.append(alpha)
    tl, ta = torch.stack(logits, 1), torch.stack(alphas, 1)
    tmask = (torch.arange(L - 1)[None]
             < torch.from_numpy(lengths_np)[:, None] - 1)
    nll = F.cross_entropy(tl.reshape(-1, VOCAB), caps_t[:, 1:].reshape(-1),
                          reduction="none").reshape(B, L - 1)
    loss_t = (nll * tmask).sum() / tmask.sum()         # packed-CE mean
    ta = ta * tmask[..., None]                         # padded steps: zero
    loss_t = loss_t + 0.7 * ((1.0 - ta.sum(dim=1)) ** 2).mean()
    loss_t.backward()
    grads_exp = attention_decoder_to_flax(
        {k: p.grad.detach().numpy() for k, p in tdec.named_parameters()})

    # ---- jax: the engine's actual objective on the same weights
    def loss_fn(p):
        lj, aj = jdec.apply({"params": p}, jnp.asarray(feats_np),
                            jnp.asarray(caps_np.astype(np.int32)),
                            train=False, rng=jax.random.PRNGKey(0))
        loss, _ = caption_loss(lj, jnp.asarray(caps_np.astype(np.int32)),
                               jnp.asarray(lengths_np), aj, alpha_reg=0.7)
        return loss

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=3e-6, atol=3e-6)
    assert set(grads_exp) == set(grads_j)
    for name in grads_exp:
        np.testing.assert_allclose(np.asarray(grads_j[name]),
                                   grads_exp[name], rtol=2e-4, atol=2e-5,
                                   err_msg=name)


def test_depth_add_fusion_token_ids_match(bridged):
    """CD_* decoders differ from base only by features.add(depth_features)
    before everything (reference depth_models.py:163): a fusion='add'
    decoder with the SAME bridged weights must reproduce the torch twin run
    on pre-summed features, token for token."""
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    tdec, _, params = bridged
    jdec = AttentionDecoder(vocab_size=VOCAB, dim_attention=D_ATT,
                            dim_embedding=D_EMB, dim_encoder=D_ENC,
                            dim_decoder=D_HID, attention_kind="soft",
                            fusion="add", dtype=jnp.float32)
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((5, K, D_ENC)).astype(np.float32)
    depth = rng.standard_normal((5, K, D_ENC)).astype(np.float32)
    expected = tdec.batch_sample(torch.from_numpy(feats + depth), start_id=3)
    got, _ = jdec.apply({"params": params}, jnp.asarray(feats), 3,
                        jnp.asarray(depth), max_length=30,
                        method=jdec.greedy_sample)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_depth_concat_fusion_token_ids_match():
    """MD_* decoders concat depth on the channel dim (depth_models.py:376);
    the twin is the same decoder sized to the concatenated channels
    (mlp_dim_encoder semantics, config.py:19) run on concatenated input."""
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        attention_decoder_to_flax)
    d_dep = 8
    torch.manual_seed(4)
    tdec = TorchSoftDecoder(d_enc=D_ENC + d_dep).eval()
    params = attention_decoder_to_flax(_state_dict_np(tdec))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    jdec = AttentionDecoder(vocab_size=VOCAB, dim_attention=D_ATT,
                            dim_embedding=D_EMB, dim_encoder=D_ENC,
                            dim_decoder=D_HID, attention_kind="soft",
                            fusion="concat", dim_depth=d_dep,
                            dtype=jnp.float32)
    rng = np.random.default_rng(8)
    feats = rng.standard_normal((5, K, D_ENC)).astype(np.float32)
    depth = rng.standard_normal((5, K, d_dep)).astype(np.float32)
    cat = np.concatenate([feats, depth], axis=-1)
    expected = tdec.batch_sample(torch.from_numpy(cat), start_id=3)
    got, _ = jdec.apply({"params": params}, jnp.asarray(feats), 3,
                        jnp.asarray(depth), max_length=30,
                        method=jdec.greedy_sample)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_hard_attention_train_loss_and_gradients_match_torch_twin(bridged):
    """Hard-attention TRAINING objective + gradients vs the torch twin
    with IDENTICAL injected Gumbel draws: alpha = softmax((e+g)/temp)
    (the Gumbel-softmax relaxation, reference attention.py:132-148), CE
    only (the 0.7 penalty is soft-only, base_train.py:162 vs :208). The
    per-step draws are precomputed with the decoder's own key schedule
    (key_t = split(fold_in(rng, t))[0]) and replayed in torch, isolating
    the documented RNG-source deviation away from the gradient math.
    dropout=0.0 so no dropout-mask replication is needed."""
    import torch.nn.functional as F
    from depth_image_captioning_pub_tpu.engine.losses import caption_loss
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        attention_decoder_to_flax)

    tdec, _, params = bridged
    jdec = AttentionDecoder(vocab_size=VOCAB, dim_attention=D_ATT,
                            dim_embedding=D_EMB, dim_encoder=D_ENC,
                            dim_decoder=D_HID, attention_kind="hard",
                            dropout=0.0, dtype=jnp.float32)

    rng = np.random.default_rng(13)
    B, L, temp = 4, 8, 0.73
    feats_np = rng.standard_normal((B, K, D_ENC)).astype(np.float32)
    caps_np = rng.integers(1, VOCAB, (B, L)).astype(np.int64)
    caps_np[:, 0] = 3
    lengths_np = np.array([8, 6, 4, 3], np.int32)
    base_key = jax.random.PRNGKey(21)
    gs = [np.asarray(jax.random.gumbel(
              jax.random.split(jax.random.fold_in(base_key, t))[0],
              (B, K), dtype=jnp.float32)) for t in range(L - 1)]

    # ---- torch: same loop as the soft twin, alpha from (e+g)/temp
    tdec.zero_grad()
    feats_t = torch.from_numpy(feats_np)
    caps_t = torch.from_numpy(caps_np)
    att = tdec.attention
    h, c = tdec.init_linear(feats_t.mean(dim=1)).chunk(2, dim=1)
    emb = tdec.embed(caps_t)
    logits = []
    for t in range(L - 1):
        e = att.full_att(torch.relu(
            att.encoder_att(feats_t)
            + att.decoder_att(h).unsqueeze(1))).squeeze(2)
        alpha = ((e + torch.from_numpy(gs[t])) / temp).softmax(dim=1)
        ctx = (feats_t * alpha.unsqueeze(2)).sum(dim=1)
        gate = torch.sigmoid(tdec.f_beta(h))
        x = torch.cat([emb[:, t], gate * ctx], dim=1)
        h, c = tdec.decode_step(x, (h, c))
        logits.append(tdec.linear(h))
    tl = torch.stack(logits, 1)
    tmask = (torch.arange(L - 1)[None]
             < torch.from_numpy(lengths_np)[:, None] - 1)
    nll = F.cross_entropy(tl.reshape(-1, VOCAB), caps_t[:, 1:].reshape(-1),
                          reduction="none").reshape(B, L - 1)
    loss_t = (nll * tmask).sum() / tmask.sum()
    loss_t.backward()
    grads_exp = attention_decoder_to_flax(
        {k: p.grad.detach().numpy() for k, p in tdec.named_parameters()})

    # ---- jax: the engine's hard-attention train forward, same key
    def loss_fn(p):
        lj, aj = jdec.apply({"params": p}, jnp.asarray(feats_np),
                            jnp.asarray(caps_np.astype(np.int32)),
                            train=True, temp=temp, rng=base_key)
        loss, _ = caption_loss(lj, jnp.asarray(caps_np.astype(np.int32)),
                               jnp.asarray(lengths_np), aj, alpha_reg=0.0)
        return loss

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=3e-6, atol=3e-6)
    assert set(grads_exp) == set(grads_j)
    for name in grads_exp:
        np.testing.assert_allclose(np.asarray(grads_j[name]),
                                   grads_exp[name], rtol=2e-4, atol=2e-5,
                                   err_msg=name)


class TorchNICDecoder(nn.Module):
    """Reference-semantics NIC decoder (nic.py:61-175)."""

    def __init__(self, d_emb=14, d_hid=10):
        super().__init__()
        self.embed = nn.Embedding(VOCAB, d_emb)
        self.lstm = nn.LSTM(d_emb, d_hid, 2, batch_first=True)
        self.linear = nn.Linear(d_hid, VOCAB)

    @torch.no_grad()
    def batch_sample(self, features, max_length=20):
        inputs = features.unsqueeze(1)
        states = None
        out = []
        for _ in range(max_length):
            hiddens, states = self.lstm(inputs, states)
            preds = self.linear(hiddens.squeeze(1)).softmax(1).argmax(1)
            out.append(preds.numpy().copy())
            inputs = self.embed(preds).unsqueeze(1)
        return np.stack(out, axis=1)


def test_nic_greedy_token_ids_match():
    from depth_image_captioning_pub_tpu.models.nic import NICDecoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        nic_decoder_to_flax)
    torch.manual_seed(1)
    tdec = TorchNICDecoder().eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, nic_decoder_to_flax(_state_dict_np(tdec)))
    jdec = NICDecoder(vocab_size=VOCAB, dim_embedding=14, dim_hidden=10,
                      num_layers=2, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((5, 14)).astype(np.float32)
    expected = tdec.batch_sample(torch.from_numpy(feats))
    got = jdec.apply({"params": params}, jnp.asarray(feats), max_length=20,
                     method=jdec.greedy_sample)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_nic_train_loss_and_gradients_match_torch_twin():
    """NIC training objective + gradients vs the torch twin (same pattern
    as the attention twin above): step 0 consumes the image embedding and
    predicts <start>, then shifted tokens, CE over un-shifted lengths
    (reference: nic.py:102-118, :282-285)."""
    import torch.nn.functional as F
    from depth_image_captioning_pub_tpu.engine.losses import nic_loss
    from depth_image_captioning_pub_tpu.models.nic import NICDecoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        nic_decoder_to_flax)

    torch.manual_seed(2)
    tdec = TorchNICDecoder().eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, nic_decoder_to_flax(_state_dict_np(tdec)))
    jdec = NICDecoder(vocab_size=VOCAB, dim_embedding=14, dim_hidden=10,
                      num_layers=2, dropout=0.0, dtype=jnp.float32)

    rng = np.random.default_rng(12)
    B, L = 4, 7
    feats_np = rng.standard_normal((B, 14)).astype(np.float32)
    caps_np = rng.integers(1, VOCAB, (B, L)).astype(np.int64)
    lengths_np = np.array([7, 6, 4, 2], np.int32)

    # torch: image embed prepended to word embeds, 2-layer LSTM, CE over
    # the first ``length`` steps of each row
    tdec.zero_grad()
    feats_t = torch.from_numpy(feats_np)
    caps_t = torch.from_numpy(caps_np)
    xs = torch.cat([feats_t.unsqueeze(1), tdec.embed(caps_t[:, :-1])], dim=1)
    hiddens, _ = tdec.lstm(xs)
    tl = tdec.linear(hiddens)                                  # [B, L, V]
    tmask = torch.arange(L)[None] < torch.from_numpy(lengths_np)[:, None]
    nll = F.cross_entropy(tl.reshape(-1, VOCAB), caps_t.reshape(-1),
                          reduction="none").reshape(B, L)
    loss_t = (nll * tmask).sum() / tmask.sum()
    loss_t.backward()
    grads_exp = nic_decoder_to_flax(
        {k: p.grad.detach().numpy() for k, p in tdec.named_parameters()})

    def loss_fn(p):
        lj = jdec.apply({"params": p}, jnp.asarray(feats_np),
                        jnp.asarray(caps_np.astype(np.int32)), train=False)
        loss, _ = nic_loss(lj, jnp.asarray(caps_np.astype(np.int32)),
                           jnp.asarray(lengths_np))
        return loss

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=3e-6, atol=3e-6)
    assert set(grads_exp) == set(grads_j)
    for name in grads_exp:
        np.testing.assert_allclose(np.asarray(grads_j[name]),
                                   grads_exp[name], rtol=2e-4, atol=2e-5,
                                   err_msg=name)
