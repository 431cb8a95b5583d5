"""k-step training-TRAJECTORY twin vs the torch restatement (VERDICT r3
item 2): the chain was pinned link by link — forward logits
(test_token_parity), loss+gradients (ditto), AdamW update rule
(test_optimizer_twin) — but nothing composed them. Here k=4 steps of the
reference training loop restated in torch (teacher-forced forward + masked
packed-CE + 0.7 doubly-stochastic penalty + backward + torch.optim.AdamW;
reference: base_train.py:134-167) run against k steps of the ENGINE's
actual jitted train step (engine/steps.make_attention_train_step +
make_optimizer) on shared bridged weights and identical per-step batches,
asserting the f32 loss sequence and the final parameters agree.

With no real COCO/pretrained weights in this environment (STATUS.md), a
matching multi-step trajectory is the strongest available evidence that
training HERE reproduces training THERE."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_token_parity import (  # noqa: E402  (pytest puts tests/ on path)
    TorchSoftDecoder, D_ATT, D_EMB, D_ENC, D_HID, K, VOCAB)

LR, WD, ALPHA_REG, STEPS = 1e-3, 0.01, 0.7, 4
B, L = 5, 9


def _state_dict_copy(module):
    """COPIES, not views: ``tensor.numpy()`` aliases torch storage and
    ``jnp.asarray`` is zero-copy on CPU, so without the copy the torch
    trajectory's in-place ``opt.step()`` would silently rewrite the
    'initial' weights the engine starts from (observed: the engine then
    reproduces a trajectory from torch's FINAL weights)."""
    return {k: v.detach().numpy().copy()
            for k, v in module.state_dict().items()}


def _make_batches(steps: int):
    """Per-step batches: fresh features/captions/lengths each step, fixed
    seed — both loops must consume the IDENTICAL stream."""
    rng = np.random.default_rng(31)
    out = []
    for _ in range(steps):
        feats = rng.standard_normal((B, K, D_ENC)).astype(np.float32)
        caps = rng.integers(1, VOCAB, (B, L)).astype(np.int64)
        caps[:, 0] = 3                                    # <start> column
        lengths = rng.integers(2, L + 1, (B,)).astype(np.int32)
        out.append((feats, caps, lengths))
    return out


def _torch_trajectory(tdec, batches):
    """The reference loop: forward (teacher forcing + masked CE with pack
    semantics + alpha penalty), backward, AdamW step — per batch."""
    import torch.nn.functional as F
    opt = torch.optim.AdamW(tdec.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    losses = []
    for feats_np, caps_np, lengths_np in batches:
        opt.zero_grad()
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
        nll = F.cross_entropy(tl.reshape(-1, VOCAB),
                              caps_t[:, 1:].reshape(-1),
                              reduction="none").reshape(B, L - 1)
        loss = (nll * tmask).sum() / tmask.sum()
        ta = ta * tmask[..., None]
        loss = loss + ALPHA_REG * ((1.0 - ta.sum(dim=1)) ** 2).mean()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def test_soft_training_trajectory_matches_torch():
    from depth_image_captioning_pub_tpu.engine.steps import (
        TrainState, make_attention_train_step, make_optimizer)
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        attention_decoder_to_flax)

    torch.manual_seed(5)
    tdec = TorchSoftDecoder().train()
    params0 = jax.tree_util.tree_map(
        jnp.asarray, attention_decoder_to_flax(_state_dict_copy(tdec)))
    jdec = AttentionDecoder(vocab_size=VOCAB, dim_attention=D_ATT,
                            dim_embedding=D_EMB, dim_encoder=D_ENC,
                            dim_decoder=D_HID, attention_kind="soft",
                            dropout=0.0, dtype=jnp.float32)
    batches = _make_batches(STEPS)

    # ---- torch: k reference steps (mutates tdec in place)
    losses_t = _torch_trajectory(tdec, batches)

    # ---- engine: the ACTUAL jitted step the train loop runs per batch,
    # in its --feature-cache form (the frozen encoder is not part of the
    # twin; its output IS the features stream both sides consume)
    def decoder_apply(dec_params, features, captions, depth_features=None,
                      *, train, temp=1.0, rng=None,
                      hard_eval_sampling=False):
        return jdec.apply({"params": dec_params}, features, captions,
                          train=train, rng=rng)

    opt = make_optimizer(LR, weight_decay=WD)
    fn = make_attention_train_step(
        lambda enc, feats: feats, decoder_apply, opt,
        alpha_reg=ALPHA_REG, features_input=True, donate=False)
    params = {"decoder": params0}
    state = TrainState(params, opt.init(params), {"encoder": {}}, {},
                       jnp.int32(0))
    losses_j = []
    for i, (feats_np, caps_np, lengths_np) in enumerate(batches):
        batch = {"features": jnp.asarray(feats_np),
                 "captions": jnp.asarray(caps_np.astype(np.int32)),
                 "lengths": jnp.asarray(lengths_np),
                 "pad_mask": jnp.ones((B,), bool)}
        state, metrics = fn(state, batch, jax.random.PRNGKey(i),
                            jnp.float32(1.0))
        losses_j.append(float(metrics["loss"]))

    # loss sequence: same trajectory, not just the same first step
    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-5, atol=1e-5)
    assert losses_j[0] != pytest.approx(losses_j[-1], abs=1e-4), \
        "trajectory did not move — the twin would pass vacuously"

    # final parameters: k composed forward+backward+AdamW applications
    # agree tensor for tensor (torch finals mapped through the same bridge
    # as the initial weights)
    finals_t = attention_decoder_to_flax(
        {k: v.detach().numpy() for k, v in tdec.state_dict().items()})
    got = state.params["decoder"]
    assert set(finals_t) == set(got)
    for name in finals_t:
        np.testing.assert_allclose(np.asarray(got[name]), finals_t[name],
                                   rtol=1e-3, atol=2e-5, err_msg=name)


def test_hard_training_trajectory_matches_torch():
    """Same composition for the HARD-attention objective: k steps with
    IDENTICAL injected Gumbel draws per step (the decoder's own key
    schedule replayed in torch, isolating the documented RNG-source
    deviation away from the trajectory math; reference hard loop:
    base_train.py:248-461, CE only — no alpha penalty)."""
    import torch.nn.functional as F
    from depth_image_captioning_pub_tpu.engine.steps import (
        TrainState, make_attention_train_step, make_optimizer)
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    from depth_image_captioning_pub_tpu.utils.torch_bridge import (
        attention_decoder_to_flax)

    torch.manual_seed(6)
    tdec = TorchSoftDecoder().train()
    params0 = jax.tree_util.tree_map(
        jnp.asarray, attention_decoder_to_flax(_state_dict_copy(tdec)))
    jdec = AttentionDecoder(vocab_size=VOCAB, dim_attention=D_ATT,
                            dim_embedding=D_EMB, dim_encoder=D_ENC,
                            dim_decoder=D_HID, attention_kind="hard",
                            dropout=0.0, dtype=jnp.float32)
    batches = _make_batches(STEPS)
    temp = 0.8
    step_keys = [jax.random.PRNGKey(100 + i) for i in range(STEPS)]
    # the decoder's per-timestep schedule: key_t = split(fold_in(rng, t))[0]
    gs = [[np.asarray(jax.random.gumbel(
               jax.random.split(jax.random.fold_in(k, t))[0],
               (B, K), dtype=jnp.float32)) for t in range(L - 1)]
          for k in step_keys]

    # ---- torch trajectory with the replayed draws
    opt_t = torch.optim.AdamW(tdec.parameters(), lr=LR, betas=(0.9, 0.999),
                              eps=1e-8, weight_decay=WD)
    losses_t = []
    for (feats_np, caps_np, lengths_np), g_step in zip(batches, gs):
        opt_t.zero_grad()
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
            alpha = ((e + torch.from_numpy(g_step[t])) / temp).softmax(dim=1)
            ctx = (feats_t * alpha.unsqueeze(2)).sum(dim=1)
            gate = torch.sigmoid(tdec.f_beta(h))
            x = torch.cat([emb[:, t], gate * ctx], dim=1)
            h, c = tdec.decode_step(x, (h, c))
            logits.append(tdec.linear(h))
        tl = torch.stack(logits, 1)
        tmask = (torch.arange(L - 1)[None]
                 < torch.from_numpy(lengths_np)[:, None] - 1)
        nll = F.cross_entropy(tl.reshape(-1, VOCAB),
                              caps_t[:, 1:].reshape(-1),
                              reduction="none").reshape(B, L - 1)
        loss = (nll * tmask).sum() / tmask.sum()
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss.detach()))

    # ---- engine trajectory, same step keys
    def decoder_apply(dec_params, features, captions, depth_features=None,
                      *, train, temp=1.0, rng=None,
                      hard_eval_sampling=False):
        return jdec.apply({"params": dec_params}, features, captions,
                          train=train, temp=temp, rng=rng)

    opt = make_optimizer(LR, weight_decay=WD)
    fn = make_attention_train_step(
        lambda enc, feats: feats, decoder_apply, opt,
        alpha_reg=0.0, features_input=True, donate=False)
    params = {"decoder": params0}
    state = TrainState(params, opt.init(params), {"encoder": {}}, {},
                       jnp.int32(0))
    losses_j = []
    for (feats_np, caps_np, lengths_np), key in zip(batches, step_keys):
        batch = {"features": jnp.asarray(feats_np),
                 "captions": jnp.asarray(caps_np.astype(np.int32)),
                 "lengths": jnp.asarray(lengths_np),
                 "pad_mask": jnp.ones((B,), bool)}
        state, metrics = fn(state, batch, key, jnp.float32(temp))
        losses_j.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-5, atol=1e-5)
    finals_t = attention_decoder_to_flax(
        {k: v.detach().numpy() for k, v in tdec.state_dict().items()})
    got = state.params["decoder"]
    for name in finals_t:
        np.testing.assert_allclose(np.asarray(got[name]), finals_t[name],
                                   rtol=1e-3, atol=2e-5, err_msg=name)
