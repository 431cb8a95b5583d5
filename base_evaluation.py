#!/usr/bin/env python
"""Evaluate the base caption models: metric scoring and attention samples.

Grammar identical to the reference CLI (reference: base_evaluation.py:
340-368, README.md:81-99):

    python base_evaluation.py {soft|hard} score {coco|rem_coco|rem_original}
    python base_evaluation.py {soft|hard} sample <pic_name> {coco|original}
    python base_evaluation.py nic

Score mode captions the frozen val subset (data_index/np_val_index.npy,
4000 images) with batched greedy decode for each of 3 checkpoint sets and
pickles per-metric score lists to <save_dir>/<useData>_scores.pkl
(reference: base_evaluation.py:123-166). Sample mode writes per-word
attention-overlay PNGs + caption.txt under <sample_dir>/base_<atten>
(reference: base_evaluation.py:171-336).
"""

import os
import sys

import numpy as np

from depth_image_captioning_pub_tpu.cli import (
    eval_data_selection, eval_tables, load_eval_components,
    resnet_layers_from_env, seed_everything)
from depth_image_captioning_pub_tpu.config import ConfigEval
from depth_image_captioning_pub_tpu.data.coco import (
    CocoCaptions, Subset, load_index_file)
from depth_image_captioning_pub_tpu.data.vocab import load_vocab
from depth_image_captioning_pub_tpu.models.captioner import build_captioner


def _load_vocabs(w2i_path, i2w_path):
    import pickle
    with open(w2i_path, "rb") as f:
        word_to_id = pickle.load(f)
    if os.path.exists(i2w_path):
        with open(i2w_path, "rb") as f:
            id_to_word = pickle.load(f)
    else:
        id_to_word = {i: w for w, i in word_to_id.items()}
    return word_to_id, id_to_word


def score_mode(atten: str, use_data: str, cfg: ConfigEval, kind_prefix="base",
               depth=False, depth_fn=None, dpt_variables=None, num_sets=3,
               beam_size=1, use_pallas=False, depth_eval_cache=True,
               eval_cache_dir=None, encoder="cnn") -> int:
    """``encoder="mlp"`` (depth only) scores the MLP-depth (mdepth_*)
    checkpoints — additive: the reference's MLP eval path doesn't exist
    (its import crashes, SURVEY §4.1). The scores pickle gets an
    ``mdepth_`` prefix so it never clobbers the CNN-depth scores sharing
    the same save dir."""
    from depth_image_captioning_pub_tpu.engine.evaluate import evaluate
    w2i_p, i2w_p, anno, index_file, use_ori = eval_data_selection(cfg, use_data)
    word_to_id, id_to_word = _load_vocabs(w2i_p, i2w_p)
    save_directory, tables = eval_tables(cfg, atten, use_ori, depth,
                                         encoder=encoder)
    ds = CocoCaptions(cfg.val_img_directory, anno)
    if index_file:
        ds = Subset(ds, load_index_file(index_file))
        print(f"subset size : {len(ds)}")
    mlp = depth and encoder == "mlp"
    kind = f"{('mdepth' if mlp else 'depth') if depth else 'base'}-{atten}"
    cap = build_captioner(kind, len(word_to_id), cfg,
                          resnet_layers=resnet_layers_from_env())

    def loader(set_idx):
        return load_eval_components(save_directory, tables[set_idx], cap)

    pickle_name = f"{'mdepth_' if mlp else ''}{use_data}_scores.pkl"
    scores = evaluate(kind, use_data, cap, loader, ds, word_to_id,
                      id_to_word, cfg, depth_fn=depth_fn,
                      dpt_variables=dpt_variables, num_sets=num_sets,
                      beam_size=beam_size, use_pallas=use_pallas,
                      depth_eval_cache=depth_eval_cache,
                      eval_cache_dir=eval_cache_dir,
                      scores_pickle=f"{save_directory}/{pickle_name}")
    print({k: float(np.mean(v)) for k, v in scores.items()})
    return 0


def sample_mode(atten: str, pic_name: str, use_data: str, cfg: ConfigEval,
                depth=False, depth_fn=None, dpt_variables=None,
                sampling=None, seed=0, encoder="cnn") -> int:
    """Caption + attention-overlay the images of one sample_pic set.

    ``sampling`` (new; reference is greedy-only,
    base_caption_models.py:165-204): a {"temperature","top_k","top_p"}
    dict switches the decode to stochastic draws
    (AttentionDecoder.stochastic_sample) — each image gets its own key
    derived from ``seed`` and its position, so re-runs with the same seed
    reproduce the same captions and overlays.

    ``encoder="mlp"`` (depth only) samples the MLP-depth checkpoints;
    overlays land under <sample_dir>/mdepth_<atten>.
    """
    import jax
    import jax.numpy as jnp
    from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL
    from depth_image_captioning_pub_tpu.engine.visualize import sample_directory
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    from depth_image_captioning_pub_tpu.ops.image_ops import imagenet_normalize

    if pic_name not in cfg.sample_dirs:
        print("Input correct name")
        return 1
    use_ori = use_data == "original"
    w2i_p = cfg.ori_word_to_id_file if use_ori else cfg.word_to_id_file
    i2w_p = cfg.ori_id_to_word_file if use_ori else cfg.id_to_word_file
    word_to_id, id_to_word = _load_vocabs(w2i_p, i2w_p)
    save_directory, tables = eval_tables(cfg, atten, use_ori, depth,
                                         encoder=encoder)
    mlp = depth and encoder == "mlp"
    kind = f"{('mdepth' if mlp else 'depth') if depth else 'base'}-{atten}"
    cap = build_captioner(kind, len(word_to_id), cfg,
                          resnet_layers=resnet_layers_from_env())
    frozen_enc, params, stats = load_eval_components(save_directory,
                                                     tables[1], cap)
    enc_apply = cap.encoder_apply()
    samp = cap.sample_apply()
    dep_apply = cap.depth_encoder_apply()
    start_id = word_to_id[SPECIAL.start]

    @jax.jit
    def run(img, dpt_vars, rng):
        feats = enc_apply(frozen_enc, imagenet_normalize(img))
        dep = None
        if dep_apply is not None:
            dmap = depth_fn(dpt_vars, img)
            dep, _ = dep_apply(params["depth_encoder"], stats, dmap,
                               train=False)
        if sampling is not None:
            return cap.decoder.apply(
                {"params": params["decoder"]}, feats, start_id, rng, dep,
                max_length=cfg.max_length,
                temperature=sampling.get("temperature", 1.0),
                top_k=sampling.get("top_k", 0),
                top_p=sampling.get("top_p", 1.0),
                method=AttentionDecoder.stochastic_sample)
        # greedy keeps the reference-pinned fixed key (soft ignores it;
        # hard's Gumbel-max draws stay reproducible run-to-run)
        return samp(params["decoder"], feats, start_id, dep,
                    max_length=cfg.max_length, rng=jax.random.PRNGKey(0))

    base_key = jax.random.PRNGKey(seed)
    counter = iter(range(1 << 30))

    def caption_one(arr):
        key = jax.random.fold_in(base_key, next(counter))
        toks, alphas = run(jnp.asarray(arr)[None], dpt_variables, key)
        return np.asarray(toks)[0], np.asarray(alphas)[0]

    src = cfg.sample_dirs[pic_name]
    out = os.path.join(
        src, f"{('mdepth' if mlp else 'depth') if depth else 'base'}_{atten}")
    caps = sample_directory(src, out, caption_one, id_to_word)
    for p, c in caps.items():
        print(f"{os.path.basename(p)}: {c}")
    return 0


def nic_mode(cfg: ConfigEval, num_sets=3, beam_size=1,
             depth_eval_cache=True, eval_cache_dir=None) -> int:
    """NIC scoring (reference: nic.py:360-455)."""
    from depth_image_captioning_pub_tpu.engine.evaluate import evaluate
    word_to_id, id_to_word = _load_vocabs(cfg.word_to_id_file,
                                          cfg.id_to_word_file)
    ds = Subset(CocoCaptions(cfg.val_img_directory, cfg.val_anno_file),
                load_index_file(cfg.index_dir))
    cap = build_captioner("nic", len(word_to_id), cfg,
                          resnet_layers=resnet_layers_from_env())

    def loader(set_idx):
        return load_eval_components(cfg.save_directory_nic,
                                    cfg.nic_parameter_files[set_idx], cap)

    scores = evaluate("nic", "coco", cap, loader, ds, word_to_id, id_to_word,
                      cfg, num_sets=num_sets, beam_size=beam_size,
                      depth_eval_cache=depth_eval_cache,
                      eval_cache_dir=eval_cache_dir,
                      scores_pickle=f"{cfg.save_directory_nic}/nic_scores.pkl")
    print({k: float(np.mean(v)) for k, v in scores.items()})
    return 0


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    cfg = ConfigEval()
    num_sets = 3
    beam_size = 1
    use_pallas = False
    eval_cache = True
    eval_cache_dir = os.environ.get("DCAP_EVAL_CACHE_DIR") or None
    stochastic = False
    temperature, top_k, top_p, seed = 1.0, 0, 1.0, 0
    rest = []
    it = iter(args)
    for a in it:
        if a == "--num-sets":
            num_sets = int(next(it))
        elif a == "--eval-cache-dir":
            # persist the frozen-stage outputs to DIR: later invocations
            # replay them bit-exactly instead of re-decoding/re-encoding
            # the subset (engine/eval_cache_store.py; also
            # $DCAP_EVAL_CACHE_DIR)
            eval_cache_dir = next(it)
        elif a == "--beam":
            beam_size = int(next(it))
        elif a == "--pallas-decode":
            use_pallas = True
        elif a == "--no-eval-cache":
            # recompute every frozen stage per checkpoint set, as the
            # reference does; the cache is exact, so this exists for
            # memory-constrained runs, not for parity
            eval_cache = False
        elif a == "--stochastic":
            stochastic = True  # sample mode only: draw instead of argmax
        elif a == "--temperature":
            temperature = float(next(it))
        elif a == "--top-k":
            top_k = int(next(it))
        elif a == "--top-p":
            top_p = float(next(it))
        elif a == "--seed":
            seed = int(next(it))
        else:
            rest.append(a)
    args = rest
    sampling = ({"temperature": temperature, "top_k": top_k, "top_p": top_p}
                if stochastic else None)
    seed_everything(cfg.seed)
    evaluation_datas = ("coco", "rem_coco", "rem_original")
    sample_datas = ("coco", "original")
    if len(args) == 3 and args[1] == "score":
        if args[2] not in evaluation_datas:
            print("input coco or rem_coco or rem_original")
            return 1
        return score_mode(args[0], args[2], cfg, num_sets=num_sets,
                          beam_size=beam_size, use_pallas=use_pallas,
                          depth_eval_cache=eval_cache,
                          eval_cache_dir=eval_cache_dir)
    if len(args) == 4 and args[1] == "sample":
        if args[3] not in sample_datas:
            print("input coco or original")
            return 1
        return sample_mode(args[0], args[2], args[3], cfg,
                           sampling=sampling, seed=seed)
    if args and args[0] == "nic":
        return nic_mode(cfg, num_sets=num_sets, beam_size=beam_size,
                        depth_eval_cache=eval_cache,
                        eval_cache_dir=eval_cache_dir)
    print("base_evaluation.py {soft/hard} {score/sample sample_pic} {useData}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
