"""Configuration dataclasses.

Field names and default values mirror the reference's two god-objects
``ConfigTrain`` / ``ConfigEval`` (reference: Captioning_models/config.py:3-209)
so that a user of the reference finds every knob under the same name, while
fixing its defects: paths are parameters instead of ``os.getcwd()`` string
concatenation, the device field expresses a JAX platform rather than a
hardcoded ``'cuda:0'``, and TPU-specific knobs (dtype, mesh shape) are new.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple


def _d(path: str) -> str:
    return os.path.join(os.getcwd(), path)


@dataclasses.dataclass
class ConfigTrain:
    """Training hyperparameters (reference: config.py:3-71)."""

    # Model dimensions (reference: config.py:11-19)
    enc_img_size: int = 14        # attention grid side -> 196 regions
    dim_attention: int = 128
    dim_embedding: int = 128
    dim_encoder: int = 2048       # RGB annotation-vector channels
    dim_hidden: int = 128         # LSTM hidden size
    dim_l1: int = 128             # depth-MLP layer sizes
    dim_l2: int = 64
    dim_out: int = 32
    mlp_dim_encoder: int = 2080   # 2048 + 32 for concat fusion

    # Optimization (reference: config.py:20-26)
    lr: float = 1e-3
    dropout: float = 0.5
    batch_size: int = 30
    num_epochs: int = 150
    lr_drop: List[int] = dataclasses.field(default_factory=lambda: [20])
    temp_sch: int = 10            # hard-attention temperature update cadence
    grad_accum: int = 1           # microbatches per step (new; lax.scan
                                  # accumulation — activation memory / accum)
    decoder_dtype: str = "float32"  # decoder compute dtype for TRAINING
                                  # (new; "bfloat16" = mixed precision:
                                  # bf16 activations, f32 params/optimizer.
                                  # Eval stays f32 for token-ID parity)
    checkpoint_keep: int = 0      # retain only the newest K full-state
                                  # checkpoints (new; 0 = keep all)

    # NIC (reference: config.py:28-29)
    nic_dim_embedding: int = 300
    num_layers: int = 2
    nic_dropout: float = 0.1      # NIC decoder default (reference: nic.py:71)

    # Sequence / decode
    max_length: int = 30          # greedy decode steps (reference: base_caption_models.py:167)
    max_caption_len: int = 32     # fixed pad length for train batches (<start> + 30 + <end>)

    # Regularization / schedules
    alpha_reg: float = 0.7        # doubly-stochastic attention reg (reference: base_train.py:22)

    # Paths (reference: config.py:32-57); resolved lazily relative to cwd
    train_img_directory: str = dataclasses.field(default_factory=lambda: _d("dataset/coco2014/train2014"))
    val_img_directory: str = dataclasses.field(default_factory=lambda: _d("dataset/coco2014/val2014"))
    train_anno_file: str = dataclasses.field(default_factory=lambda: _d("dataset/coco2014/captions_train2014.json"))
    val_anno_file: str = dataclasses.field(default_factory=lambda: _d("dataset/coco2014/captions_val2014.json"))
    ori_train_anno_file: str = dataclasses.field(default_factory=lambda: _d("dataset/original_dataset/original_dataset.json"))
    ori_val_anno_file: str = dataclasses.field(default_factory=lambda: _d("dataset/original_dataset/original_val_dataset.json"))
    word_to_id_file: str = dataclasses.field(default_factory=lambda: _d("dataset/coco2014/word_to_id.pkl"))
    ori_word_to_id_file: str = dataclasses.field(default_factory=lambda: _d("dataset/original_dataset/ori_word_to_id.pkl"))
    save_directory_soft: str = dataclasses.field(default_factory=lambda: _d("exp_result/base_soft"))
    save_directory_soft_ori: str = dataclasses.field(default_factory=lambda: _d("exp_result/base_soft_ori"))
    save_directory_Cdep_soft: str = dataclasses.field(default_factory=lambda: _d("exp_result/CNN_depth_soft"))
    save_directory_Cdep_soft_ori: str = dataclasses.field(default_factory=lambda: _d("exp_result/CNN_depth_soft_ori"))
    # The reference saves hard-attention runs into the *soft* directory by a
    # bug (reference: base_train.py:253-258 vs config.py:148-151); we use the
    # directory its eval side expects.
    save_directory_hard: str = dataclasses.field(default_factory=lambda: _d("exp_result/base_hard"))
    save_directory_hard_ori: str = dataclasses.field(default_factory=lambda: _d("exp_result/base_hard_ori"))
    save_directory_Cdep_hard: str = dataclasses.field(default_factory=lambda: _d("exp_result/CNN_depth_hard"))
    save_directory_Cdep_hard_ori: str = dataclasses.field(default_factory=lambda: _d("exp_result/CNN_depth_hard_ori"))
    save_directory_nic: str = dataclasses.field(default_factory=lambda: _d("exp_result/NIC"))

    # Pretrained backbone weights (the reference hardcodes a home path for
    # DPT, reference: DPT_model.py:23; torchvision downloads ResNet-152).
    resnet_weights: Optional[str] = None   # .pth / .npz; random init if None
    dpt_weights: Optional[str] = None      # omnidata_dpt_depth_v2.ckpt / .npz
    # DPT input resolution. 384 reproduces the reference exactly (it
    # UPSCALES the 224 tensor to 384 before DPT, util.py:14-15). 224 runs
    # DPT at native resolution via pos-embed interpolation — measured 2.8x
    # faster (542 vs 192 depth maps/s on v5e) with no extra input
    # information, but depth values differ slightly from the reference.
    dpt_image_size: int = 384
    # GELU flavor for the DPT ViT MLPs. "erf" (exact, torch.nn.GELU's
    # default) reproduces the reference; "tanh" is the measured +5.4%
    # depth-soft throughput knob (models/dpt.GELU_APPROXIMATE, PERF.md) at
    # ~1e-3 relative activation error. CLI: --gelu {erf,tanh}.
    dpt_gelu: str = "erf"
    # "lowres" runs the monocular-head convs before its x2 upsample
    # (throughput-over-parity knob, models/dpt.HEAD_LOW_RES; PERF.md)
    dpt_head: str = "full"

    # Host data pipeline (reference: config.py:65 num_workers=4)
    num_workers: int = 4

    # Device / TPU execution (replaces reference: config.py:68 'cuda:0')
    device: str = "tpu"
    compute_dtype: str = "bfloat16"   # encoder/matmul dtype on TPU
    param_dtype: str = "float32"
    mesh_shape: Tuple[int, ...] = (-1,)   # 1-D data mesh over all devices
    mesh_axis_names: Tuple[str, ...] = ("data",)
    seed: int = 123                   # reference: base_main.py:8-13

    # Logging (reference: config.py:71)
    moving_avg: int = 100
    log_jsonl: bool = True            # structured metrics alongside CSVs
    # jax.profiler trace dir (new; reference had no profiling, SURVEY.md §5).
    # When set, the train loop traces steps [profile_start, profile_stop).
    profile_dir: Optional[str] = None
    profile_start: int = 10
    profile_stop: int = 15

    def save_dir(self, kind: str, use_ori: bool) -> str:
        table = {
            ("soft", False): self.save_directory_soft,
            ("soft", True): self.save_directory_soft_ori,
            ("hard", False): self.save_directory_hard,
            ("hard", True): self.save_directory_hard_ori,
            ("depth_soft", False): self.save_directory_Cdep_soft,
            ("depth_soft", True): self.save_directory_Cdep_soft_ori,
            ("depth_hard", False): self.save_directory_Cdep_hard,
            ("depth_hard", True): self.save_directory_Cdep_hard_ori,
            ("nic", False): self.save_directory_nic,
            ("nic", True): self.save_directory_nic,
        }
        return table[(kind, use_ori)]


def _param_files(prefix: str, use_data: str, with_depth: bool) -> Dict[int, List[str]]:
    """Checkpoint-filename tables (reference: config.py:121-179)."""
    out = {}
    for i in range(3):
        files = [f"{prefix}_encoder_best_{use_data}{i}.pth",
                 f"{prefix}_decoder_best_{use_data}{i}.pth"]
        if with_depth:
            files.append(f"{prefix}_D_encoder_best_{use_data}{i}.pth")
        out[i + 1] = files
    return out


@dataclasses.dataclass
class ConfigEval(ConfigTrain):
    """Evaluation config (reference: config.py:74-209).

    Inherits every training field; overrides the eval batch size and adds the
    fixed-subset index files, checkpoint tables, and sample-picture dirs.
    """

    batch_size: int = 50              # reference: config.py:90
    # The reference's eval config points word_to_id at a 'model/' subdir that
    # its own notebook never writes (reference: config.py:114); we default to
    # the path the vocabulary builder actually produces.

    id_to_word_file: str = dataclasses.field(default_factory=lambda: _d("dataset/coco2014/id_to_word.pkl"))
    ori_id_to_word_file: str = dataclasses.field(default_factory=lambda: _d("dataset/original_dataset/ori_id_to_word.pkl"))
    rem_ori_val_anno_file: str = dataclasses.field(default_factory=lambda: _d("dataset/original_dataset/rem_original_val_dataset.json"))
    remCOCO_ori_val_anno_file: str = dataclasses.field(default_factory=lambda: _d("dataset/original_dataset/remCOCO_original_val_dataset.json"))

    index_dir: str = dataclasses.field(default_factory=lambda: _d("data_index/np_val_index.npy"))
    Ori2000_index_dir: str = dataclasses.field(default_factory=lambda: _d("data_index/np_index_for_ori_val.npy"))
    remCOCO_500_ori_index_dir: str = dataclasses.field(default_factory=lambda: _d("data_index/remCOCO_500_ori.npy"))

    # Sample-picture directories (reference: config.py:181-192)
    sample_dirs: Dict[str, str] = dataclasses.field(default_factory=lambda: {
        name: _d(f"sample_pic/{name}")
        for name in ("sample1", "sample2", "sample3", "airbus", "cycling",
                     "dog", "football", "soccer", "river", "seagull", "bird")
    })

    # Checkpoint tables (reference: config.py:121-179). Our engine writes
    # orbax checkpoints under the same basenames (no .pth suffix dependence:
    # the bridge loads either).
    base_soft_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("base_soft", "coco", False))
    base_soft_ori_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("base_soft", "original", False))
    base_hard_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("base_hard", "coco", False))
    base_hard_ori_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("base_hard", "original", False))
    depth_soft_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("depth_soft", "coco", True))
    depth_soft_ori_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("depth_soft", "original", True))
    depth_hard_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("depth_hard", "coco", True))
    depth_hard_ori_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("depth_hard", "original", True))
    nic_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: {i + 1: [f"nic_encoder_best{i}.pth",
                                         f"nic_decoder_best{i}.pth"]
                                 for i in range(3)})
    # MLP-depth tables (additive: the reference imports its MD_ classes but
    # has no eval tables for them — the whole MLP path crashes at import,
    # SURVEY §4.1. Our depth_main trains them, so eval must load them; the
    # mdepth_* checkpoints share the CNN_depth_* save dirs, mirroring
    # engine/train._save_dir_kind.)
    mdepth_soft_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("mdepth_soft", "coco", True))
    mdepth_soft_ori_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("mdepth_soft", "original", True))
    mdepth_hard_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("mdepth_hard", "coco", True))
    mdepth_hard_ori_parameter_files: Dict[int, List[str]] = dataclasses.field(
        default_factory=lambda: _param_files("mdepth_hard", "original", True))
