"""On-chip validation of the NIC whole-sequence Pallas kernel (ADVICE r3).

The kernel shipped during a chip outage with CPU interpret-mode
bit-equality only. This drives, in ONE process (no claim churn):
  1. real-Mosaic compile + execute of ops/pallas/nic_seq via
     make_caption_fn(use_pallas=True) on the NIC model,
  2. token agreement vs the XLA scan (near-tie argmax flips possible on
     real Mosaic — the documented --pallas-decode caveat; report the %),
  3. the shard_map batch dispatch (pallas_mesh over the single real chip —
     exercises decode_seq.shard_over_batch's pad/slice layers on Mosaic),
  4. a quick A/B timing (batch 256, fetch-clocked).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_check_nic_pallas.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

VOCAB = 9956
BATCH = 256
HW = (224, 224)
MAX_LEN = 20


def main():
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch)

    cfg = ConfigEval()
    cap = build_captioner("nic", VOCAB, cfg, encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.random((BATCH, *HW, 3), dtype=np.float32))
    key = jax.random.PRNGKey(0)

    fn_xla = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN)
    fn_pal = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                             use_pallas=True)
    toks_xla = np.asarray(fn_xla(frozen, params, stats, imgs, key))
    toks_pal = np.asarray(fn_pal(frozen, params, stats, imgs, key))
    agree = float(np.mean(toks_xla == toks_pal))
    rows = float(np.mean(np.all(toks_xla == toks_pal, axis=1)))
    print(f"NIC pallas kernel on real Mosaic: compiled + ran, "
          f"token agreement {agree:.4%} (identical rows {rows:.4%})")

    # sharded dispatch on the real chip (1-device mesh exercises the
    # shard_map + pad/slice layers under Mosaic)
    mesh = make_mesh(jax.devices()[:1])
    fn_sh = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                            use_pallas=True, pallas_mesh=mesh)
    rep = replicate(mesh, (frozen, params, stats))
    imgs_sh = shard_batch(mesh, {"images": np.asarray(imgs)})["images"]
    toks_sh = np.asarray(fn_sh(rep[0], rep[1], rep[2], imgs_sh, key))
    assert np.array_equal(toks_sh, toks_pal), (
        "shard_map dispatch changed tokens vs direct pallas call")
    print("NIC pallas shard_map dispatch == direct kernel call (exact)")

    def clock(fn, *a):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(*a)
        np.asarray(out)
        return 4 * BATCH / (time.perf_counter() - t0)

    clock(fn_xla, frozen, params, stats, imgs, key)   # warm timing path
    for rep_i in range(2):
        rx = clock(fn_xla, frozen, params, stats, imgs, key)
        rp = clock(fn_pal, frozen, params, stats, imgs, key)
        print(f"rep{rep_i}: xla {rx:.0f} caps/s   pallas {rp:.0f} caps/s   "
              f"ratio {rp / rx:.3f}x")


if __name__ == "__main__":
    main()
